"""As-of and range joins — operators Spark lacks natively (SURVEY.md §2.3
notes the reference has none either; training-data pipelines need them for
point-in-time feature lookup).

Two implementations, one semantics:

- :func:`asof_join` (default): the **union-window** formulation — pure
  DataFrame ops, no Python.  Tag left/right rows, union them, and for each
  left row take the last right row at or before it via
  ``last(right_payload, ignorenulls=True)`` over a window ordered by
  (time, right-first tiebreak).  One shuffle on (key), no row explosion,
  scales to arbitrarily many right rows per key.
- :func:`asof_join_pandas`: grouped ``applyInPandas`` with
  ``pandas.merge_asof`` per key group — the Arrow-vectorized fallback for
  semantics the window form can't express (tolerance windows, nearest
  rather than backward).

Range join: :func:`range_join` buckets the range key so the theta join
becomes an equi-join on (key, bucket) + a residual filter — the standard
bucketized-range-join shape that avoids a cartesian blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` (direction='backward') within the same ``by``
    key.  Left rows with no prior right row get NULLs.

    Output: all left columns + the requested right columns (NULL-filled).
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]

    l_tag = left.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols
            ) + ">"
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(by).alias("_k"),
        F.col(on).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType.simpleString()).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    # right rows sort BEFORE left rows at equal time (_is_left asc), so a
    # right row at exactly left.on is visible to that left row (<=)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l_tag.unionByName(r_tag)
    filled = unioned.withColumn("_rlast", F.last("_r", ignorenulls=True).over(w))
    out = filled.where(F.col("_is_left") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        *[F.col("_rlast")[c].alias(c) for c in right_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str] | None = None,
    tolerance=None,
) -> DataFrame:
    """merge_asof per key group via applyInPandas (Arrow batches)."""
    import pandas as pd

    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    l_cols = list(left.columns)
    out_fields = [
        f"`{c}` {left.schema[c].dataType.simpleString()}" for c in l_cols
    ] + [f"`{c}` {right.schema[c].dataType.simpleString()}" for c in right_cols]
    out_schema = ", ".join(out_fields)

    l_tag = left.withColumn("_side", F.lit("l"))
    r_tag = right.select(
        by, on, *right_cols
    ).withColumn("_side", F.lit("r"))
    cols = set(l_tag.columns) | set(r_tag.columns)
    l_full = l_tag.select(
        *[F.col(c) if c in l_tag.columns else F.lit(None).alias(c) for c in cols]
    )
    r_full = r_tag.select(
        *[F.col(c) if c in r_tag.columns else F.lit(None).alias(c) for c in cols]
    )

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["_side"] == "l"][l_cols].sort_values(on)
        rpdf = pdf[pdf["_side"] == "r"][[by, on, *right_cols]].sort_values(on)
        if lpdf.empty:
            return pd.DataFrame(columns=l_cols + right_cols)
        merged = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[by]),
            on=on,
            direction="backward",
            tolerance=tolerance,
            suffixes=("", "_r"),
        )
        return merged[l_cols + right_cols]

    return l_full.unionByName(r_full).groupBy(by).applyInPandas(merge, out_schema)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Point-in-interval join via bucketization: explode each right
    interval into the buckets it covers, equi-join on the bucket, filter
    the residual — one shuffle keyed on bucket, no cartesian product.

    All three columns are timestamps; intervals are [start, end)."""
    b = F.lit(bucket_seconds)
    l_b = left.withColumn("_bucket", (F.unix_timestamp(left_point) / b).cast("long"))
    start_b = (F.unix_timestamp(right_start) / b).cast("long")
    end_b = (F.unix_timestamp(right_end) / b).cast("long")
    r_b = right.withColumn("_bucket", F.explode(F.sequence(start_b, end_b)))
    joined = l_b.join(r_b, on="_bucket", how="inner").where(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("_bucket")
