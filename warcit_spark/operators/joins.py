"""Lookup joins J1-J3 (SURVEY.md §2.3) — broadcast joins with the
reference's match semantics.

- J1 mapfile suffix-match join (warcit/warcit.py:332-342): probe each file
  against mapfile rows by ``filename.endswith(row['file'])``; the FIRST row
  (mapfile order) wins for a file; a mapfile row matching a SECOND file is a
  hard job failure (``sys.exit(1)`` in the reference).
- J2 conversions equi-join (converter.py:205-216): inner join on source
  url, keep only ``success`` rows (unsuccessful are warn+skip).
- J3 transclusions equi-join (converter.py:232-238): inner join on media
  url; rows missing the contain-url are skipped.

Physical shapes: J1 is an in-row first-match scan over an array literal of
the mapfile (zero shuffle; the mapfile side is small by construction — the
reference materializes it fully in RAM, warcit/warcit.py:303-304).  J2/J3
are broadcast hash equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MapfileUniquenessError(RuntimeError):
    """A mapfile row matched more than one file (warcit/warcit.py:335-337)."""


# Above this many mapfile rows the array-literal plan would bloat Catalyst /
# codegen (tens of thousands of struct literals); fall back to a broadcast
# theta join + first-match aggregation instead.
MAPFILE_LITERAL_MAX_ROWS = 10_000


def mapfile_suffix_join(
    files: DataFrame,
    mapfile: DataFrame,
    filename_col: str = "filename",
    strict: bool = True,
) -> DataFrame:
    """J1: left suffix-lookup of files against the mapfile, first match
    (mapfile order) wins.

    Output: ``files.*`` plus ``map_url``, ``map_timestamp``, ``map_ct``
    (NULL when unmatched).  ``strict`` enforces the reference's
    row-uniqueness constraint — a mapfile row matching a second file fails
    the job (warcit/warcit.py:335-337).

    Physical shape: the mapfile is driver-RAM-small by construction (the
    reference loads it fully, warcit.py:303-304), so the lookup is an
    in-row scan of an array literal — ``filter``/``element_at`` inside
    whole-stage codegen, ZERO shuffle of the files relation (the previous
    formulation's first-match window repartitioned every file by name).
    Above ``MAPFILE_LITERAL_MAX_ROWS`` the literal plan would bloat
    Catalyst/codegen, so a broadcast endswith-join + per-file ``min_by``
    first-match aggregation takes over (one shuffle of the files side).
    An empty mapfile short-circuits to NULL map_* columns (the literal
    formulation would produce an ``array<void>`` whose field extraction
    fails analysis).  The strict check is one map-side-combined count over
    the matched indices, not a second join materialization.
    """
    cols = mapfile.columns
    rows = mapfile.withColumn("_i", F.monotonically_increasing_id()).orderBy(
        "_i"
    ).limit(MAPFILE_LITERAL_MAX_ROWS + 1).collect()

    if not rows:
        null_s = F.lit(None).cast("string")
        return files.select(
            "*",
            null_s.alias("map_url"),
            null_s.alias("map_timestamp"),
            null_s.alias("map_ct"),
        )

    fname = F.col(filename_col)

    if len(rows) > MAPFILE_LITERAL_MAX_ROWS:
        out = _mapfile_broadcast_join(files, mapfile, cols, fname)
    else:
        entries = F.array(
            *[
                F.struct(
                    F.lit(i).alias("idx"),
                    F.lit(r["file"]).alias("file"),
                    F.lit(r["URL"] if "URL" in cols else None).cast("string").alias("url"),
                    F.lit(r["timestamp"] if "timestamp" in cols else None).cast("string").alias("ts"),
                    F.lit(r["Content-Type"] if "Content-Type" in cols else None).cast("string").alias("ct"),
                )
                for i, r in enumerate(rows)
            ]
        )
        # try_element_at: NULL on no match (ANSI element_at throws on empty)
        first = F.try_element_at(
            F.filter(entries, lambda e: fname.endswith(e["file"])), F.lit(1)
        )
        out = files.select(
            "*",
            first["url"].alias("map_url"),
            first["ts"].alias("map_timestamp"),
            first["ct"].alias("map_ct"),
            first["idx"].alias("_mf_idx"),
            first["file"].alias("_mf_file"),
        )

    if strict:
        dupes = (
            out.where(F.col("_mf_idx").isNotNull())
            .groupBy("_mf_idx", "_mf_file")
            .count()
            .where(F.col("count") > 1)
            .collect()
        )
        if dupes:
            raise MapfileUniquenessError(
                "mapfile rows matched multiple files: "
                + ", ".join(f"{r['_mf_file']} (x{r['count']})" for r in dupes)
            )

    return out.drop("_mf_idx", "_mf_file")


def _mapfile_broadcast_join(
    files: DataFrame, mapfile: DataFrame, cols: list, fname
) -> DataFrame:
    """Large-mapfile fallback: broadcast endswith theta join, first match
    (lowest mapfile row index) selected with ``min_by`` per file row."""
    null_s = F.lit(None).cast("string")
    mf = mapfile.withColumn("_i", F.monotonically_increasing_id()).select(
        F.col("_i"),
        F.col("file").alias("_mf_pat"),
        (F.col("URL") if "URL" in cols else null_s).cast("string").alias("_mf_url"),
        (F.col("timestamp") if "timestamp" in cols else null_s).cast("string").alias("_mf_ts"),
        (F.col("Content-Type") if "Content-Type" in cols else null_s).cast("string").alias("_mf_ct"),
    )
    file_cols = files.columns
    # row ids are stable across the two plan branches below because the
    # files source is a deterministic scan (binaryFile / parquet order)
    with_id = files.withColumn("_fid", F.monotonically_increasing_id())
    # aggregate matches by row id only (file columns — e.g. binary content —
    # never enter a grouping key or the match shuffle), then join back
    matches = (
        with_id.select("_fid", fname.alias("_fname"))
        .join(F.broadcast(mf), F.col("_fname").endswith(F.col("_mf_pat")), "inner")
        .groupBy("_fid")
        .agg(
            F.min_by(
                F.struct(
                    F.col("_mf_url").alias("url"),
                    F.col("_mf_ts").alias("ts"),
                    F.col("_mf_ct").alias("ct"),
                    F.col("_i").alias("idx"),
                    F.col("_mf_pat").alias("file"),
                ),
                F.col("_i"),
            ).alias("_first")
        )
    )
    out = with_id.join(matches, on="_fid", how="left")
    return out.select(
        *file_cols,
        F.col("_first.url").alias("map_url"),
        F.col("_first.ts").alias("map_timestamp"),
        F.col("_first.ct").alias("map_ct"),
        F.col("_first.idx").alias("_mf_idx"),
        F.col("_first.file").alias("_mf_file"),
    )


def conversions_join(records: DataFrame, conversions: DataFrame) -> DataFrame:
    """J2: per source url, successful conversion results (broadcast inner
    equi-join; ``success=false`` rows are skipped, converter.py:209-211)."""
    conv = conversions.where(F.col("success"))
    return records.join(
        F.broadcast(conv.withColumnRenamed("source_url", "url")), on="url", how="inner"
    )


def transclusions_join(records: DataFrame, transclusions: DataFrame) -> DataFrame:
    """J3: per media url, its transclusion entries (broadcast inner
    equi-join; rows without a contain url were dropped at load,
    converter.py:234-236)."""
    tr = transclusions.where(F.col("contain_url").isNotNull())
    return records.join(
        F.broadcast(tr.withColumnRenamed("media_url", "url")), on="url", how="inner"
    )


def seen_anti_join(candidates: DataFrame, seen: DataFrame, key: str = "url") -> DataFrame:
    """J5: drop candidates already in the seen set (left_anti)."""
    return candidates.join(seen.select(key), on=key, how="left_anti")
