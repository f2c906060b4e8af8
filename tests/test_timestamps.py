"""F6 timestamp normalization parity (warcit/warcit.py:262-269 semantics).

Expected values hand-computed from the warcio algorithm the reference
calls: strip non-digits, pad down with '10000101000000', parse as
YYYYMMDDHHMMSS, format ISO-8601 Z.
"""

from pyspark.sql import functions as F

from warcit_spark.functions.timestamps import (
    iso8601z_expr,
    normalize_ts14_expr,
    pad14_down_expr,
    ts14_expr,
)

CASES = [
    ("2011-02", "2011-02-01T00:00:00Z"),
    ("2017", "2017-01-01T00:00:00Z"),
    ("20170304123456", "2017-03-04T12:34:56Z"),
    ("2017-03-04T12:34:56Z", "2017-03-04T12:34:56Z"),
    ("2017-03-04 12:34", "2017-03-04T12:34:00Z"),
    ("", "1000-01-01T00:00:00Z"),
    ("2011-13", None),  # month 13: invalid -> NULL (engine surfaces, not dies)
]


def test_normalize_golden(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], ["t"])
    got = [
        r.iso
        for r in df.select(normalize_ts14_expr(F.col("t")).alias("iso")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_pad14_down(spark):
    df = spark.createDataFrame([("201102",)], ["t"])
    assert df.select(pad14_down_expr(F.col("t")).alias("p")).first().p == "20110201000000"


def test_iso_roundtrip(spark):
    df = spark.createDataFrame([("2015-06-07 08:09:10",)], ["s"]).select(
        F.to_timestamp("s").alias("ts")
    )
    row = df.select(
        iso8601z_expr(F.col("ts")).alias("iso"), ts14_expr(F.col("ts")).alias("t14")
    ).first()
    assert row.iso == "2015-06-07T08:09:10Z"
    assert row.t14 == "20150607080910"
