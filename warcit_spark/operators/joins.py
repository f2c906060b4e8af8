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

Physical shapes: J1 is a broadcast nested-loop (theta) join — correct and
cheap because the mapfile side is small by construction (the reference
materializes it fully in RAM, warcit/warcit.py:303-304).  J2/J3 are
broadcast hash equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class MapfileUniquenessError(RuntimeError):
    """A mapfile row matched more than one file (warcit/warcit.py:335-337)."""


def mapfile_suffix_join(
    files: DataFrame,
    mapfile: DataFrame,
    filename_col: str = "filename",
    strict: bool = True,
) -> DataFrame:
    """J1: left theta-join files against the mapfile on suffix match.

    Output: ``files.*`` plus ``map_url``, ``map_timestamp``, ``map_ct``
    (NULL when unmatched).  ``strict`` enforces the row-uniqueness
    constraint by failing the job, exactly like the reference.
    """
    mf = mapfile.select(
        F.col("file").alias("_mf_file"),
        F.col("URL").alias("map_url") if "URL" in mapfile.columns else F.lit(None).alias("map_url"),
        F.col("timestamp").alias("map_timestamp") if "timestamp" in mapfile.columns else F.lit(None).alias("map_timestamp"),
        F.col("Content-Type").alias("map_ct") if "Content-Type" in mapfile.columns else F.lit(None).alias("map_ct"),
    ).withColumn("_mf_idx", F.monotonically_increasing_id())

    joined = files.join(
        F.broadcast(mf), F.col(filename_col).endswith(F.col("_mf_file")), "left"
    )

    # first-matching-row-wins for a file: min mapfile index per file
    w = Window.partitionBy(filename_col).orderBy(F.col("_mf_idx").asc_nulls_last())
    first = (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    if strict:
        # a mapfile row winning two different files is a job failure
        dupes = (
            first.where(F.col("_mf_idx").isNotNull())
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

    return first.drop("_mf_idx", "_mf_file")


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
