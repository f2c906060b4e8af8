"""S8-S10: YAML sidecar sources -> broadcast DataFrames.

The reference materializes these fully in driver RAM (converter.py:198-203,
220-230, 70-95); the Spark analog is a driver-side ``yaml.safe_load``
followed by ``createDataFrame`` — they are side *inputs*, never the big
side of anything.

Schemas (FIXTURES.md §5-6):
- conversions(source_url, url, output, success, metadata{name, ext,
  command, mime, skip_as_source})
- transclusions(media_url, contain_url, contain_ts, selector,
  metadata_file)
- rules: returned as plain Python config (regexes become ``rlike``
  literals at plan-build time — the Catalyst analog of the reference's
  ``re.compile`` precompilation, SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

CONVERSIONS_SCHEMA = StructType(
    [
        StructField("source_url", StringType()),
        # position of the result within its source_url list — the
        # conversion-file order the reference iterates in (converter.py:257)
        StructField("seq", IntegerType()),
        StructField("url", StringType()),
        StructField("output", StringType()),
        StructField("success", BooleanType()),
        StructField(
            "metadata",
            StructType(
                [
                    StructField("name", StringType()),
                    StructField("ext", StringType()),
                    StructField("command", StringType()),
                    StructField("mime", StringType()),
                    StructField("skip_as_source", BooleanType()),
                ]
            ),
        ),
    ]
)

TRANSCLUSIONS_SCHEMA = StructType(
    [
        StructField("media_url", StringType()),
        StructField("contain_url", StringType()),
        StructField("contain_ts", StringType()),
        StructField("selector", StringType()),
        StructField("metadata_file", StringType()),
    ]
)


def conversions_from_dict(spark: SparkSession, doc: dict) -> DataFrame:
    """Flatten ``{conversions: {source_url: [result...]}}``
    (converter.py:171-178)."""
    rows = []
    for source_url, results in (doc.get("conversions") or {}).items():
        for seq, r in enumerate(results or []):
            md = r.get("metadata") or {}
            rows.append(
                (
                    source_url,
                    seq,
                    r.get("url"),
                    r.get("output"),
                    bool(r.get("success", False)),
                    (
                        md.get("name"),
                        md.get("ext"),
                        md.get("command"),
                        md.get("mime"),
                        md.get("skip_as_source"),
                    )
                    if md
                    else None,
                )
            )
    return spark.createDataFrame(rows, CONVERSIONS_SCHEMA)


def transclusions_from_dict(spark: SparkSession, doc: dict) -> DataFrame:
    """Flatten ``{transclusions: {media_url: [{url, timestamp, selector,
    metadata_file?}...]}}`` (converter.py:220-238); entries without a
    contain url are skipped (warn-skip path, converter.py:234-236)."""
    rows = []
    for media_url, entries in (doc.get("transclusions") or {}).items():
        for e in entries or []:
            if not e.get("url"):
                continue
            rows.append(
                (
                    media_url,
                    e.get("url"),
                    str(e.get("timestamp")) if e.get("timestamp") is not None else None,
                    e.get("selector"),
                    e.get("metadata_file"),
                )
            )
    return spark.createDataFrame(rows, TRANSCLUSIONS_SCHEMA)


def load_yaml(path: str) -> dict:
    if yaml is None:  # pragma: no cover
        raise NotImplementedError("PyYAML not installed")
    with open(path) as fh:
        return yaml.safe_load(fh) or {}


def read_conversions(spark: SparkSession, path: str) -> DataFrame:
    return conversions_from_dict(spark, load_yaml(path))


def read_transclusions(spark: SparkSession, path: str) -> DataFrame:
    return transclusions_from_dict(spark, load_yaml(path))
