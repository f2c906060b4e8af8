"""Derived-record generators D1-D3 and the A2 reverse-index aggregation
(SURVEY.md §2.4-2.5).

- D1 index-revisit derivation lives in plans/crawl.py (derive_fetch_records).
- D2 conversion fan-out (warcit/warcit.py:568-578): per successful
  conversion of a written resource, a ``conversion`` record carrying
  refer-back headers to the original.
- D3 + A2 transclusion metadata (warcit/warcit.py:580-618,
  converter.py:240-277): per transclusion of a media url, a ``resource``
  record at ``urn:embeds:<contain_url>`` whose payload is the formats
  reverse-index JSON — **byte-identical** to the reference's
  ``json.dumps(..., indent=2, sort_keys=True)`` (asserted by the
  reference's own test, test/test_warcit.py:326-327).

Plan shape: the grouping/joining is pure DataFrame (broadcast equi-joins +
``collect_list`` aggregation); only the final JSON serialization is a
vectorized pandas UDF, because byte-exact ``indent=2, sort_keys=True``
output with null-key omission is a serialization format, not a relational
computation (SURVEY.md §2.4 A2).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from warcit_spark.functions.timestamps import normalize_ts14_expr

TRANSCLUSION_CONTENT_TYPE = "application/vnd.youtube-dl_formats+json"


def json_metadata_batch(md):
    """Serialize the conversion-metadata struct exactly like the reference's
    ``json.dumps(metadata)`` (warcit/warcit.py:576): default ``': '``
    separator, keys in dict order, absent (None) keys omitted — byte
    fidelity ``F.to_json`` cannot give (no space after ':', fixed struct
    field order, different null handling)."""
    # a struct column reaches a pandas UDF as a pd.DataFrame (one column per
    # field, field order preserved); a NULL struct row is a row of nulls —
    # indistinguishable from an all-null struct, and both map to "no header"
    # exactly like the reference's `if metadata:` guard on an empty dict.
    out = []
    for row in md.itertuples(index=False):
        clean = {}
        for k, v in zip(md.columns, row):
            # None / scalar NaN only — `v != v` on a list/ndarray-valued
            # cell (array/map struct field) is ambiguous-truth, so the
            # NaN probe is gated to float scalars; np.floating covers
            # FloatType cells, which pandas hands over as np.float32
            if v is None or (
                isinstance(v, (float, np.floating)) and v != v
            ):
                continue
            if isinstance(v, (list, tuple)):
                clean[k] = [x.item() if hasattr(x, "item") else x for x in v]
            elif hasattr(v, "tolist"):  # numpy array cell
                clean[k] = v.tolist()
            elif hasattr(v, "item"):
                clean[k] = v.item()
            else:
                clean[k] = v
        out.append(json.dumps(clean) if clean else None)
    return pd.Series(out, dtype="object")


def conversion_records(resources: DataFrame, conversions: DataFrame) -> DataFrame:
    """D2: one derived record per successful conversion of a resource.

    ``resources`` needs (url, record_id, warc_date); output carries the
    refer-back headers of warcit/warcit.py:569-576.
    """
    rec_type = (
        F.col("rec_type") if "rec_type" in conversions.columns else F.lit(None)
    )
    seq = F.col("seq") if "seq" in conversions.columns else F.lit(0)
    conv = conversions.where(F.col("success")).select(
        F.col("source_url").alias("url"),
        F.col("url").alias("conv_url"),
        F.col("output").alias("conv_output"),
        F.col("metadata").alias("conv_metadata"),
        F.coalesce(rec_type, F.lit("conversion")).alias("_rec_type"),
        seq.cast("int").alias("seq"),
    )
    joined = resources.join(F.broadcast(conv), on="url", how="inner")
    return joined.select(
        F.col("conv_url").alias("url"),
        F.col("_rec_type").alias("record_type"),
        F.col("record_id").alias("refers_to"),
        F.col("url").alias("refers_to_target_uri"),
        F.col("warc_date").alias("refers_to_target_date"),
        pandas_udf(json_metadata_batch, "string")(F.col("conv_metadata")).alias("json_metadata"),
        F.col("conv_output").alias("source_path"),
        F.col("seq"),
    )


def _formats_json_batch(
    contain_url: pd.Series,
    contain_ts: pd.Series,
    selector: pd.Series,
    media_url: pd.Series,
    orig_mime: pd.Series,
    formats: pd.Series,
    metadata_file: pd.Series,
) -> pd.Series:
    """Byte-exact reference JSON (converter.py:250-276 + warcit.py:589).

    ``formats`` arrives as a list of dict-like structs (converted formats,
    reference order); the original format dict is appended last with
    ``ext = url.rsplit('.')[-1]`` and optional ``mime``.  When
    ``metadata_file`` is set the file's text is dumped instead — including
    the reference's quirk of json.dumps on the raw string
    (converter.py:246-248 then warcit.py:589).
    """

    def build(cu, ts, sel, mu, mime, fmts, mf):
        if mf is not None:
            with open(mf) as fh:
                return json.dumps(fh.read(), indent=2, sort_keys=True)
        md = {"webpage_url": cu, "webpage_timestamp": str(ts)}
        if sel is not None:
            md["selector"] = sel
        out_formats = []
        for f in fmts if fmts is not None else []:
            d = {k: v for k, v in dict(f).items() if v is not None}
            d.pop("_seq", None)  # ordering key only, not reference payload
            d["url"] = d.pop("conv_url", d.get("url"))
            d["original_url"] = mu
            out_formats.append(d)
        orig = {"url": mu, "ext": mu.rsplit(".")[-1], "original": True}
        if mime is not None:
            orig["mime"] = mime
        out_formats.append(orig)
        md["formats"] = out_formats
        return json.dumps(md, indent=2, sort_keys=True)

    return pd.Series(
        [
            build(*args)
            for args in zip(
                contain_url, contain_ts, selector, media_url, orig_mime,
                formats, metadata_file,
            )
        ]
    )


def transclusion_metadata_records(
    transclusions: DataFrame,
    conversions: DataFrame | None = None,
    orig_mime_col: str | None = None,
) -> DataFrame:
    """D3+A2: one ``metadata`` record per transclusion entry.

    ``transclusions``: (media_url, contain_url, contain_ts, selector) [+
    optionally a resolved ``orig_mime`` column].  ``conversions`` feeds the
    formats list (A3 grouping, converter.py:257-267).
    """
    tr = transclusions.where(F.col("contain_url").isNotNull())

    if conversions is not None:
        conv_seq = (
            F.col("seq") if "seq" in conversions.columns else F.lit(0)
        ).cast("int")
        conv_lists = (
            conversions.withColumn("seq", conv_seq)
            .where(F.col("success"))
            .groupBy(F.col("source_url").alias("media_url"))
            .agg(
                # collect_list order is nondeterministic after shuffles, and
                # the reference's payload carries conversion-file order
                # (converter.py:257-267) — sort on the carried seq index
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("seq").alias("_seq"),
                            F.col("metadata.name").alias("name"),
                            F.col("metadata.ext").alias("ext"),
                            F.col("metadata.command").alias("command"),
                            F.col("metadata.mime").alias("mime"),
                            F.col("metadata.skip_as_source").alias("skip_as_source"),
                            F.col("url").alias("conv_url"),
                        )
                    )
                ).alias("_formats")
            )
        )
        tr = tr.join(F.broadcast(conv_lists), on="media_url", how="left")
    else:
        tr = tr.withColumn(
            "_formats",
            F.lit(None).cast(
                "array<struct<_seq:int,name:string,ext:string,command:string,"
                "mime:string,skip_as_source:boolean,conv_url:string>>"
            ),
        )

    orig_mime = (
        F.col(orig_mime_col) if orig_mime_col else F.lit(None).cast("string")
    )
    # pandas_udf is built lazily (needs an active session at wrap time)
    _formats_json_udf = pandas_udf(_formats_json_batch, "string")
    metadata_file = (
        F.col("metadata_file")
        if "metadata_file" in tr.columns
        else F.lit(None).cast("string")
    )
    payload = _formats_json_udf(
        F.col("contain_url"),
        F.col("contain_ts"),
        F.col("selector"),
        F.col("media_url"),
        orig_mime,
        F.col("_formats"),
        metadata_file,
    )
    seq = F.col("seq") if "seq" in tr.columns else F.lit(0)
    # WARC-Type is 'resource' like the reference's embeds record
    # (warcit.py:601 create_warc_record(..., 'resource')); 'metadata' only
    # appears in the reference's CSV logfile.
    return tr.select(
        F.concat(F.lit("urn:embeds:"), F.col("contain_url")).alias("url"),
        F.lit("resource").alias("record_type"),
        normalize_ts14_expr(F.col("contain_ts")).alias("warc_date"),
        F.lit(TRANSCLUSION_CONTENT_TYPE).alias("content_type"),
        payload.alias("payload_json"),
        F.col("media_url").alias("refers_to_target_uri"),
        F.col("media_url"),
        seq.cast("int").alias("seq"),
    )


def wet_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Common-Crawl-style WET sidecar derivation: one ``conversion``
    record per fetched HTML page whose payload is the page's extracted
    visible text (functions/html.py) as UTF-8, ``text/plain``, with
    refer-back target headers to the original response — the published
    WET convention (CC's WET files are WARC conversion records over the
    crawl's responses).

    The whole derivation is a row-local JVM projection (extraction
    chain + encode + sha1); it streams straight into the sink's
    per-partition writer with zero shuffles — the WET sweep over a
    100-TB crawl is exactly one pass over the pages table.
    """
    from warcit_spark.functions.html import html_text_expr
    from warcit_spark.functions.timestamps import iso8601z_expr

    html_str = F.decode(F.col(html_col), "UTF-8")
    payload = F.encode(html_text_expr(html_str), "UTF-8")
    warc_date = iso8601z_expr(F.col(ts_col))
    return pages.select(
        F.col(url_col).alias("url"),
        F.lit("conversion").alias("record_type"),
        warc_date.alias("warc_date"),
        F.lit("text/plain").alias("content_type"),
        payload.alias("payload"),
        F.sha1(payload).alias("payload_digest"),
        F.col(url_col).alias("refers_to_target_uri"),
        warc_date.alias("refers_to_target_date"),
    )


def wat_records(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Common-Crawl-style WAT sidecar derivation: one ``metadata``
    record per page whose JSON payload carries the page's envelope
    metadata (title, extracted-text length, outlink count).  JSON is
    built with ``to_json`` in the JVM (stable key order from the struct
    field order) — unlike the A2 reverse-index (whose byte format the
    reference pins to Python ``json.dumps``), WAT payloads are ours to
    define, so the fast path is fine.  Zero shuffles, one pass.
    """
    from warcit_spark.functions.html import html_text_expr, html_title_expr
    from warcit_spark.functions.timestamps import iso8601z_expr
    from warcit_spark.operators.links import hrefs_expr

    html_str = F.decode(F.col(html_col), "UTF-8")
    meta = F.struct(
        html_title_expr(html_str).alias("title"),
        F.length(html_text_expr(html_str)).alias("text_chars"),
        F.size(hrefs_expr(F.col(html_col))).alias("n_links"),
    )
    payload = F.encode(F.to_json(meta), "UTF-8")
    warc_date = iso8601z_expr(F.col(ts_col))
    return pages.select(
        F.col(url_col).alias("url"),
        F.lit("metadata").alias("record_type"),
        warc_date.alias("warc_date"),
        F.lit("application/json").alias("content_type"),
        payload.alias("payload"),
        F.sha1(payload).alias("payload_digest"),
        F.col(url_col).alias("refers_to_target_uri"),
        warc_date.alias("refers_to_target_date"),
    )
