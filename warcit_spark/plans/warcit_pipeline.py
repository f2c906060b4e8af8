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
    sniff_mime_expr,
    tika_charset_detect_expr,
    tika_has_hint_expr,
    tika_mime_expr,
    url_extension_expr,
)
from warcit_spark.functions.timestamps import iso8601z_expr, normalize_ts14_expr
from warcit_spark.operators.charset import detect_charsets_batch
from warcit_spark.functions.mime import charset_suffix_expr
from warcit_spark.operators.filters import apply_include_exclude
from warcit_spark.operators.joins import (
    STRICT_CHECKED,
    mapfile_suffix_join,
    strict_check_of,
    verify_mapfile_uniqueness,
)
from warcit_spark.operators.records import (
    json_metadata_batch,
    transclusion_metadata_records,
)
from warcit_spark.sinks.warc import write_warc_files
from warcit_spark.sources.binary_files import scan_input, union_scans

DEFAULT_INDEX_FILES = ("index.html", "index.htm")


def _record_ids_batch(record_type, url, warc_date):
    import pandas as pd

    from warcit_spark.sinks.warc import record_id_for

    return pd.Series(
        [
            record_id_for(t, u, d) if u is not None else None
            for t, u, d in zip(record_type, url, warc_date)
        ]
    )


def _read_fileinfo_batch(paths):
    """(path) -> (content bytes, mtime as ISO-8601Z) per Arrow batch.

    Conversion outputs live on a filesystem visible to executors (the same
    assumption the reference's FileInfo(filename=conv['output']) makes,
    converter.py:215); missing files yield NULLs rather than failing the
    stage — the skip-with-warning analog.
    """
    import datetime as _dt
    import os as _os

    import pandas as pd

    contents, mtimes = [], []
    for p in paths:
        try:
            with open(p, "rb") as fh:
                b = fh.read()
            iso = _dt.datetime.fromtimestamp(
                _os.path.getmtime(p), _dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
        except (OSError, TypeError):
            b, iso = None, None
        contents.append(b)
        mtimes.append(iso)
    return pd.DataFrame({"content": contents, "mtime_iso": mtimes})


_REC_COLS = [
    "url", "record_type", "warc_date", "content_type", "payload",
    "payload_digest", "source_uri", "size", "refers_to_target_uri",
    "refers_to_target_date", "record_id", "refers_to", "json_metadata",
    "_sort_uri", "_class", "_seq",
]


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
    conversions: DataFrame | None = None,
    transclusions: DataFrame | None = None,
    mime_method: str = "filename",
    tika_results: DataFrame | None = None,
    strict_mapfile: str = "eager",
) -> DataFrame:
    """One DataFrame of WARC records: (url, record_type, warc_date,
    content_type, payload, payload_digest, source_uri, size, refer-back
    headers, record_id) plus hidden (_sort_uri, _class, _seq) ordering keys.

    ``conversions``/``transclusions`` (sidecar DataFrames, sources/
    sidecars.py) compose the reference's --conversions/--transclusions
    workflow: per written resource, its ``conversion`` records in file
    order then its ``urn:embeds:`` resource record — the record sequence
    the reference's own test asserts (test/test_warcit.py:257-299).

    ``mime_method``: 'filename' (extension table), 'magic' (content sniff
    of the first 2048 bytes, warcit.py:638-640), or 'tika' — the full
    --use-magic slot set.  'tika' (warcit.py:642-652) consumes
    ``tika_results``: a caller-supplied DataFrame (url, tika_results
    TIKA_RESULTS_SCHEMA) produced by an external tika-server run (the
    sandbox ships no tika JVM; the method plumbing and suppression rules
    are the engine contract).  ``charset='tika'`` reads Content-Encoding
    from the same column with the reference's default-8-bit suppression
    (warcit.py:686-703).
    """
    if (mime_method == "tika" or charset == "tika") and tika_results is None:
        raise ValueError(
            "mime_method='tika' / charset='tika' needs a tika_results "
            "DataFrame (url, tika_results) — see TIKA_RESULTS_SCHEMA"
        )
    # single dir/file/zip-path or a list of them (S11 multi-input union,
    # warcit/warcit.py:44-46); zip inner-prefix forms resolve per input
    if isinstance(input_dir, (list, tuple)):
        files = union_scans([scan_input(spark, i, url_prefix) for i in input_dir])
    else:
        files = scan_input(spark, input_dir, url_prefix)

    # F1 — before any mime/mapfile work (predicate pushdown, warcit.py:466-475)
    files = apply_include_exclude(files, "filename", include, exclude)

    # J1 — mapfile lookup; unmatched rows keep NULLs.  Strictness:
    # "eager" (default — safe for ANY direct caller) verifies uniqueness
    # NOW via the observation's column-pruned fallback scan (one
    # filename-only job, far cheaper than the old full-materialize
    # check); "deferred" attaches the check to the records frame so
    # warcit_run can let it ride the write job (zero extra actions).
    strict_check = None
    if mapfile is not None:
        files = mapfile_suffix_join(files, mapfile)
        strict_check = strict_check_of(files)
        if strict_mapfile == "eager" and strict_check is not None:
            verify_mapfile_uniqueness(strict_check)
            strict_check = STRICT_CHECKED
    else:
        files = (
            files.withColumn("map_url", F.lit(None).cast("string"))
            .withColumn("map_timestamp", F.lit(None).cast("string"))
            .withColumn("map_ct", F.lit(None).cast("string"))
        )

    # F3 — mime precedence: mapfile ≻ overrides ≻ method guess ≻ default.
    # The method slot is 'filename' (extension table) or 'magic' (content
    # sniff) — the sniff *replaces* the extension guess, like _guess_type.
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
    if tika_results is not None:
        # external tika metadata joins in by url (broadcast — tika output
        # is a sidecar, small relative to the corpus); unmatched files keep
        # a NULL struct, which every tika expr maps to "no answer"
        files = files.join(
            F.broadcast(tika_results.select("url", "tika_results")),
            on="url",
            how="left",
        )
    if mime_method == "magic":
        guessed = sniff_mime_expr(F.col("content"))
    elif mime_method == "tika":
        guessed = tika_mime_expr(F.col("tika_results"))
    else:
        guessed = F.col("_mime")
    mime = guess_mime_expr(F.col("map_ct"), override, guessed, no_xhtml=no_xhtml)
    files = files.withColumn("mime", mime).drop("_mime")

    # F5 — charset: detect only for text/* when enabled; suppression rules
    if charset == "auto":
        udf = F.pandas_udf(detect_charsets_batch, "string")
        detected = F.when(F.col("mime").startswith("text/"), udf(F.col("content")))
    elif charset == "tika":
        detected = tika_charset_detect_expr(F.col("tika_results"))
    else:
        detected = F.lit(None).cast("string")
    suffix = charset_suffix_expr(
        F.col("mime"),
        F.col("map_ct"),
        detected,
        enabled=charset is not None,
        fixed_charset=charset if charset not in (None, "auto", "tika") else None,
        # tika keeps a literal 'ascii' (no cchardet ascii rule) but
        # suppresses default-assigned 8-bit charsets unless hinted
        # (warcit.py:683-684 vs :697-703)
        suppress_ascii=(charset != "tika"),
        suppress_default_8bit=(charset == "tika"),
        has_hint=(
            tika_has_hint_expr(F.col("tika_results"))
            if charset == "tika"
            else None
        ),
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
    rid_udf = F.pandas_udf(_record_ids_batch, "string")
    null_s = F.lit(None).cast("string")
    resources = files.select(
        url.alias("url"),
        F.lit("resource").alias("record_type"),
        warc_date.alias("warc_date"),
        "content_type",
        F.col("content").alias("payload"),
        F.sha1(F.col("content")).alias("payload_digest"),
        F.concat(F.lit("file://"), F.col("filename")).alias("source_uri"),
        F.col("size"),
        null_s.alias("refers_to_target_uri"),
        null_s.alias("refers_to_target_date"),
        null_s.alias("refers_to"),
        null_s.alias("json_metadata"),
    ).withColumn(
        "record_id", rid_udf(F.col("record_type"), F.col("url"), F.col("warc_date"))
    ).withColumn("_sort_uri", F.col("source_uri")) \
     .withColumn("_class", F.lit(0)).withColumn("_seq", F.lit(0))

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
        null_s.alias("refers_to"),
        null_s.alias("json_metadata"),
        null_s.alias("record_id"),
        F.col("_sort_uri"),
        F.lit(1).alias("_class"),
        F.lit(0).alias("_seq"),
    )

    out = resources.select(*_REC_COLS).unionByName(revisits.select(*_REC_COLS))

    # D2 — conversion records, composed (make_conversions, warcit.py:568-578):
    # per successful conversion of a *written* resource, a full record over
    # the conversion's output file, refer-back headers to the original,
    # emitted in conversion-file (seq) order right after its resource.
    if conversions is not None:
        src = resources.select(
            F.col("url").alias("source_url"),
            F.col("record_id").alias("_src_rid"),
            F.col("warc_date").alias("_src_date"),
            F.col("_sort_uri").alias("_src_sort"),
        )
        rec_type = (
            F.col("rec_type") if "rec_type" in conversions.columns
            else F.lit(None).cast("string")
        )
        seq = (
            F.col("seq") if "seq" in conversions.columns else F.lit(0)
        ).cast("int")
        conv = conversions.where(F.col("success")).select(
            "source_url",
            F.col("url").alias("_conv_url"),
            F.col("output").alias("_output"),
            F.col("metadata").alias("_md"),
            F.coalesce(rec_type, F.lit("conversion")).alias("_rec_type"),
            seq.alias("_cseq"),
        )
        fileinfo_udf = F.pandas_udf(
            _read_fileinfo_batch, "content binary, mtime_iso string"
        )
        cj = (
            src.join(F.broadcast(conv), on="source_url", how="inner")
            .withColumn("_fi", fileinfo_udf(F.col("_output")))
            # unreadable output file -> the record is skipped, like the
            # reference skipping a FileInfo it cannot stat/open
            .where(F.col("_fi.content").isNotNull())
            .withColumn("_ext", url_extension_expr(F.col("_conv_url")))
            .join(F.broadcast(mime_dim), on="_ext", how="left")
        )
        conv_override = (
            mime_override_expr(F.col("_conv_url"), mime_overrides)
            if mime_overrides
            else null_s
        )
        if mime_method == "magic":
            conv_guessed = sniff_mime_expr(F.col("_fi.content"))
        elif mime_method == "tika":
            # converted outputs get their own tika row, keyed by the
            # conversion url (the reference runs _guess_type over the
            # converted FileInfo, which carries its own tika_results)
            cj = cj.join(
                F.broadcast(
                    tika_results.select(
                        F.col("url").alias("_conv_url"),
                        F.col("tika_results").alias("_conv_tika"),
                    )
                ),
                on="_conv_url",
                how="left",
            )
            conv_guessed = tika_mime_expr(F.col("_conv_tika"))
        else:
            conv_guessed = F.col("_mime")
        conv_mime = guess_mime_expr(null_s, conv_override, conv_guessed,
                                    no_xhtml=no_xhtml)
        conv_date = F.coalesce(fixed, F.col("_fi.mtime_iso"))
        conv_records = cj.select(
            F.col("_conv_url").alias("url"),
            F.col("_rec_type").alias("record_type"),
            conv_date.alias("warc_date"),
            conv_mime.alias("content_type"),
            F.col("_fi.content").alias("payload"),
            F.sha1(F.col("_fi.content")).alias("payload_digest"),
            F.concat(F.lit("file://"), F.col("_output")).alias("source_uri"),
            F.coalesce(F.length(F.col("_fi.content")), F.lit(0)).cast("long").alias("size"),
            F.col("source_url").alias("refers_to_target_uri"),
            F.col("_src_date").alias("refers_to_target_date"),
            null_s.alias("record_id"),
            F.col("_src_rid").alias("refers_to"),
            F.pandas_udf(json_metadata_batch, "string")(F.col("_md")).alias("json_metadata"),
            F.col("_src_sort").alias("_sort_uri"),
            F.lit(2).alias("_class"),
            F.col("_cseq").alias("_seq"),
        )
        out = out.unionByName(conv_records.select(*_REC_COLS))

    # D3 — urn:embeds records, composed (make_transclusion_metadata,
    # warcit.py:580-618): only for media urls actually written, payload is
    # the byte-exact formats JSON, no refer-back headers (the reference
    # sets only Date/Creation-Date on embeds records).
    if transclusions is not None:
        media = resources.select(
            F.col("url").alias("media_url"),
            F.col("content_type").alias("_orig_ct"),
            F.col("_sort_uri").alias("_media_sort"),
        )
        trj = transclusions.join(F.broadcast(media), on="media_url", how="inner")
        emb = transclusion_metadata_records(
            trj, conversions, orig_mime_col="_orig_ct"
        )
        emb = emb.join(
            F.broadcast(media.select("media_url", "_media_sort")),
            on="media_url",
            how="inner",
        )
        emb_payload = F.encode(F.col("payload_json"), "UTF-8")
        emb_records = emb.select(
            "url",
            "record_type",
            "warc_date",
            "content_type",
            emb_payload.alias("payload"),
            F.sha1(emb_payload).alias("payload_digest"),
            null_s.alias("source_uri"),
            F.length(emb_payload).cast("long").alias("size"),
            null_s.alias("refers_to_target_uri"),
            null_s.alias("refers_to_target_date"),
            null_s.alias("record_id"),
            null_s.alias("refers_to"),
            null_s.alias("json_metadata"),
            F.col("_media_sort").alias("_sort_uri"),
            F.lit(3).alias("_class"),
            F.col("seq").alias("_seq"),
        )
        out = out.unionByName(emb_records.select(*_REC_COLS))

    # every record gets the sink's deterministic id plan-side, so derived
    # records' refer-back ids and written ids always agree
    out = out.withColumn(
        "record_id",
        F.coalesce(
            F.col("record_id"),
            rid_udf(F.col("record_type"), F.col("url"), F.col("warc_date")),
        ),
    )
    out._mapfile_strict_check = strict_check
    return out


def warcit_run(
    spark: SparkSession,
    input_dir: str,
    url_prefix: str,
    out_dir: str,
    mode: str = "xb",
    gzip_records: bool = True,
    one_file: bool = False,
    num_parts: int | None = None,
    warcinfo: bool = True,
    cmdline: str | None = None,
    records: DataFrame | None = None,
    warcinfo_filename: str | None = None,
    **kwargs,
) -> DataFrame:
    """The full CLI-equivalent run: records -> ordered .warc.gz part files.

    Deterministic total order (the engine's defined replacement for the
    reference's enumeration order): source file path ASC, then per file
    resource < revisit < conversions (file order) < embeds — the record
    sequence the reference's conversion-workflow test asserts
    (test/test_warcit.py:257-299).

    Default output is range-partitioned multi-part (part file N holds a
    contiguous slice of the total order, so ``cat part-*`` is the ordered
    whole) — the shape that scales; ``one_file=True`` is the single-file
    fidelity mode matching the reference CLI.  Returns the write manifest.
    """
    if records is None:
        # deferred strict check: it rides the write job below (zero extra
        # actions in the happy path)
        records = files_to_warc_records(
            spark, input_dir, url_prefix, strict_mapfile="deferred", **kwargs
        )
        if kwargs.get("mapfile") is not None and strict_check_of(records) is None:
            # The strict payload rides as a Python attribute (it does not
            # survive DataFrame transformations); eager-checked paths set
            # the STRICT_CHECKED sentinel, so a bare None here means the
            # deferred check was silently lost — fail LOUD rather than
            # skip the reference's uniqueness guarantee (warcit.py:335-337).
            raise AssertionError(
                "mapfile strict check payload missing on the records frame "
                "built with strict_mapfile='deferred' — a pipeline edit "
                "dropped the attribute; re-attach it on the FINAL frame"
            )
    sort_cols = [
        F.col("_sort_uri").asc(), F.col("_class").asc(), F.col("_seq").asc()
    ]
    if one_file:
        ordered = records.coalesce(1).sortWithinPartitions(*sort_cols)
    else:
        n = num_parts or spark.sparkContext.defaultParallelism
        ordered = records.repartitionByRange(n, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    ordered = ordered.drop("_sort_uri", "_class", "_seq")
    # warcinfo cmdline: the CLI-equivalent invocation (warcit.py:454)
    if cmdline is None:
        cmdline = f"warcit-spark {url_prefix} {input_dir}"
    strict_check = strict_check_of(records)
    if mode == "wb" and strict_check is not None:
        # destructive overwrite: verify BEFORE touching out_dir (one
        # filename-only scan) so a doomed strict-mapfile run cannot
        # clobber a previous good output; xb/ab keep the zero-extra-job
        # ride-the-write path (xb writes into an empty dir, ab appends
        # new generations — nothing pre-existing is destroyed either way)
        verify_mapfile_uniqueness(strict_check)
        strict_check = None
    manifest = write_warc_files(
        ordered, out_dir, gzip_records=gzip_records, mode=mode, cmdline=cmdline,
        warcinfo=warcinfo, warcinfo_filename=warcinfo_filename,
    )
    # run the write HERE so the mapfile strict check (observe metrics
    # riding the write job — zero extra actions in the happy path) can
    # raise before the manifest is handed back; the returned frame is a
    # local relation, so callers' .collect() is free
    rows = manifest.collect()
    verify_mapfile_uniqueness(strict_check)
    return spark.createDataFrame(rows, manifest.schema)
