"""Local stand-in for the driver's DuckDB oracle gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
twin in DuckDB over the same parquet, then compares row count, sorted
column names, and an order-insensitive canonical value hash — the same
shape of check the driver records in CORRECTNESS_r{N}.json.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def frame_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(canon_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from warcit_spark import get_spark

    spark = get_spark("correctness-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only check)")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = sorted(d[0] for d in res.description)
            # fetch via the pandas path like the driver does: DECIMAL and
            # HUGEINT coerce to float64 there, so renderings must survive it
            odf = res.df()
            orows = [
                tuple(None if v is pd.NaT else v for v in row)
                for row in odf.itertuples(index=False, name=None)
            ]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if scols != ocols:
            print(f"FAIL  {name}: columns differ spark={scols} duck={ocols}")
            ok = False
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(orows)}")
            ok = False
        if ok:
            shash, slines = frame_hash(srows, sdf.columns)
            ohash, olines = frame_hash(orows, [d[0] for d in res.description])
            if shash != ohash:
                print(f"FAIL  {name}: value hash mismatch ({len(srows)} rows)")
                diff = [
                    (a, b) for a, b in zip(slines, olines) if a != b
                ][:3]
                for a, b in diff:
                    print(f"        spark: {a[:160]}")
                    print(f"        duck : {b[:160]}")
                ok = False
        if ok:
            print(f"ok    {name}: {len(srows)} rows")
        else:
            failures.append(name)

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
