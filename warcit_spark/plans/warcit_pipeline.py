"""The reference's primary workflow, end to end: files -> WARC records ->
WARC file (warcit/warcit.py:395-448 restated as one DataFrame DAG).

    scan (S1/S2, binaryFile)                 sources/binary_files.py
      -> include/exclude (F1, pushed down)   operators/filters.py
      -> mapfile suffix join (J1, broadcast) operators/joins.py
      -> MIME chain (F3/F4) + charset (F5)   functions/mime.py, operators/charset.py
      -> field resolution (F7, coalesce)     here
      -> index-revisit derivation (D1)       here
      -> WARC sink (K1/K2)                   sinks/warc.py

A user of the reference runs ``warcit http://example.com/ ./site/``; the
Spark user calls :func:`warcit_run` with the same inputs and gets the same
record set (counts and per-record header semantics asserted by
tests/test_warcit_pipeline.py against the reference's test expectations,
/root/reference/test/test_warcit.py:43-134).

Record order: the reference's order is filesystem-enumeration order; the
engine *defines* the deterministic total order (url ASC, resource before
its revisit) — SURVEY.md §7.3 #1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warcit_spark.functions.mime import (
    DEFAULT_MIME,
    guess_mime_expr,
    mime_override_expr,
    mimetypes_table,
    url_extension_expr,
)
from warcit_spark.functions.timestamps import iso8601z_expr, normalize_ts14_expr
from warcit_spark.operators.charset import detect_charsets_batch
from warcit_spark.functions.mime import charset_suffix_expr
from warcit_spark.operators.filters import apply_include_exclude
from warcit_spark.operators.joins import mapfile_suffix_join
from warcit_spark.sinks.warc import write_warc_files
from warcit_spark.sources.binary_files import scan_files

DEFAULT_INDEX_FILES = ("index.html", "index.htm")


def files_to_warc_records(
    spark: SparkSession,
    input_dir: str,
    url_prefix: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
    mapfile: DataFrame | None = None,
    mime_overrides: dict[str, str] | None = None,
    no_xhtml: bool = False,
    charset: str | None = "auto",
    fixed_dt: str | None = None,
    index_files: tuple[str, ...] = DEFAULT_INDEX_FILES,
) -> DataFrame:
    """One DataFrame of WARC records: (url, record_type, warc_date,
    content_type, payload, payload_digest, source_uri, size)."""
    files = scan_files(spark, input_dir, url_prefix)

    # F1 — before any mime/mapfile work (predicate pushdown, warcit.py:466-475)
    files = apply_include_exclude(files, "filename", include, exclude)

    # J1 — mapfile lookup; unmatched rows keep NULLs
    if mapfile is not None:
        files = mapfile_suffix_join(files, mapfile)
    else:
        files = (
            files.withColumn("map_url", F.lit(None).cast("string"))
            .withColumn("map_timestamp", F.lit(None).cast("string"))
            .withColumn("map_ct", F.lit(None).cast("string"))
        )

    # F3 — mime precedence: mapfile ≻ overrides ≻ extension guess ≻ default
    mime_dim = spark.createDataFrame(mimetypes_table(), "_ext string, _mime string")
    files = (
        files.withColumn("_ext", url_extension_expr(F.col("url")))
        .join(F.broadcast(mime_dim), on="_ext", how="left")
        .drop("_ext")
    )
    override = (
        mime_override_expr(F.col("url"), mime_overrides)
        if mime_overrides
        else F.lit(None).cast("string")
    )
    mime = guess_mime_expr(
        F.col("map_ct"), override, F.col("_mime"), no_xhtml=no_xhtml
    )
    files = files.withColumn("mime", mime).drop("_mime")

    # F5 — charset: detect only for text/* when enabled; suppression rules
    if charset == "auto":
        udf = F.pandas_udf(detect_charsets_batch, "string")
        detected = F.when(F.col("mime").startswith("text/"), udf(F.col("content")))
    else:
        detected = F.lit(None).cast("string")
    suffix = charset_suffix_expr(
        F.col("mime"),
        F.col("map_ct"),
        detected,
        enabled=charset is not None,
        fixed_charset=charset if charset not in (None, "auto") else None,
    )
    files = files.withColumn("content_type", F.concat(F.col("mime"), suffix))

    # F7 — field resolution: mapfile URL/timestamp win; else fixed_dt; else mtime
    url = F.coalesce(F.col("map_url"), F.col("url"))
    fixed = (
        normalize_ts14_expr(F.lit(fixed_dt))  # pad-down like _set_fixed_dt
        if fixed_dt is not None
        else F.lit(None).cast("string")
    )
    warc_date = F.coalesce(
        normalize_ts14_expr(F.col("map_timestamp")), fixed,
        iso8601z_expr(F.col("warc_ts")),
    )
    resources = files.select(
        url.alias("url"),
        F.lit("resource").alias("record_type"),
        warc_date.alias("warc_date"),
        "content_type",
        F.col("content").alias("payload"),
        F.sha1(F.col("content")).alias("payload_digest"),
        F.concat(F.lit("file://"), F.col("filename")).alias("source_uri"),
        F.col("size"),
        F.lit(None).cast("string").alias("refers_to_target_uri"),
        F.lit(None).cast("string").alias("refers_to_target_date"),
    )

    # D1 — index revisit: lowercased url ends with /<index file>.  The
    # revisit refers back to the index record it deduplicates
    # (make_index_revisit, warcit/warcit.py:546-556: Refers-To-Target-URI
    # is the original index.html url, Refers-To-Target-Date its date).
    index_match = F.lit(False)
    for name in index_files:
        index_match = index_match | F.lower(F.col("url")).endswith("/" + name)
    revisits = resources.where(index_match).select(
        F.regexp_replace(F.col("url"), "[^/]+$", "").alias("url"),
        F.lit("revisit").alias("record_type"),
        "warc_date",
        "content_type",
        F.lit(None).cast("binary").alias("payload"),
        "payload_digest",
        "source_uri",
        F.lit(0).cast("long").alias("size"),
        F.col("url").alias("refers_to_target_uri"),
        F.col("warc_date").alias("refers_to_target_date"),
    )
    return resources.unionByName(revisits)


def warcit_run(
    spark: SparkSession,
    input_dir: str,
    url_prefix: str,
    out_dir: str,
    mode: str = "xb",
    gzip_records: bool = True,
    **kwargs,
) -> DataFrame:
    """The full CLI-equivalent run: records -> single ordered .warc.gz.

    Deterministic order: (source_uri ASC, record_type ASC) — each file's
    resource directly followed by its revisit, files in path order (the
    engine's defined replacement for the reference's enumeration order).
    Returns the write manifest."""
    records = files_to_warc_records(spark, input_dir, url_prefix, **kwargs)
    ordered = records.coalesce(1).sortWithinPartitions(
        F.col("source_uri").asc(), F.col("record_type").asc()
    )
    return write_warc_files(ordered, out_dir, gzip_records=gzip_records, mode=mode)
