"""Broadcast Bloom prefilter for the URL-seen set (SURVEY.md §4.2, §7.1-7).

At 10^10 frontier scale the exact seen anti-join is the hot path; most
candidate links are *new*, and shuffling them against the seen table just
to learn that is wasted I/O.  The Bloom filter is a broadcast bitset with
**no false negatives**: candidates it rejects are *definitely new* and
skip the anti-join entirely; only the "maybe seen" residue (true
positives + the false-positive rate) takes the exact anti-join.  The
exact seen set remains the source of truth — the north star demands
exactness, so the Bloom is a prefilter ONLY and the flag cannot change
results (asserted by tests/test_bloom.py).

PySpark exposes no bloomFilter builder (it is Scala-side DataFrameStatFunctions),
so the bitset is built from partial per-partition bitsets (numpy over
Arrow batches in mapInPandas) OR-reduced on the driver — ~2 MiB per 2^24
bits, broadcast once per round.

Hashing: double hashing over Spark-computed xxhash64 pairs
(``idx_i = (h1 + i*h2) mod n_bits``) — the hash computation stays on the
JVM; Python only sets/tests bits, vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_N_BITS = 1 << 24  # 16 Mbit = 2 MiB; ~0.1% fp at 1M keys / k=4
DEFAULT_K = 4


def _hash_cols(df: DataFrame, col: str) -> DataFrame:
    return df.select(
        F.xxhash64(F.col(col)).alias("_h1"),
        F.xxhash64(F.col(col), F.lit(1)).alias("_h2"),
    )


def _indices(h1: np.ndarray, h2: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    h1 = h1.astype(np.uint64)
    h2 = h2.astype(np.uint64)
    ks = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + ks * h2[None, :]) % np.uint64(n_bits)).astype(np.int64)


def build_bloom(
    df: DataFrame, col: str = "url", n_bits: int = DEFAULT_N_BITS, k: int = DEFAULT_K
) -> np.ndarray:
    """Build the bitset (packed uint8 numpy array) over df[col]."""
    n_bytes = n_bits // 8

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            idx = _indices(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), n_bits, k)
            flat = idx.ravel()
            np.bitwise_or.at(bits, flat // 8, (1 << (flat % 8)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = _hash_cols(df, col).mapInPandas(partial, "bits binary").collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in partials:
        out |= np.frombuffer(row.bits, dtype=np.uint8)
    return out


def bloom_maybe_contains(
    df: DataFrame,
    bloom_bytes: bytes,
    col: str = "url",
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
    flag_col: str = "_maybe_seen",
) -> DataFrame:
    """Annotate rows with a membership flag.  False => definitely new."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bloom_bytes)

    def test(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{flag_col: pd.Series([], dtype=bool)})
                continue
            idx = _indices(pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), n_bits, k)
            hit = (bits[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
            yield pdf.assign(**{flag_col: hit.all(axis=0)}).drop(
                columns=[]
            )

    with_h = df.withColumn("_h1", F.xxhash64(F.col(col))).withColumn(
        "_h2", F.xxhash64(F.col(col), F.lit(1))
    )
    schema = with_h.schema.simpleString()[7:-1] + f", {flag_col} boolean"
    out = with_h.mapInPandas(test, schema)
    return out.drop("_h1", "_h2")


def bloom_prefiltered_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    bloom_bytes: bytes,
    key: str = "url",
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact anti-join result, computed cheaply:

    definitely-new rows (bloom miss) pass through WITHOUT joining; only
    maybe-seen rows take the exact anti-join.  Equal to a plain
    ``candidates ANTI JOIN seen`` by the no-false-negative property.
    """
    flagged = bloom_maybe_contains(candidates, bloom_bytes, key, n_bits, k)
    definitely_new = flagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = flagged.where(F.col("_maybe_seen")).drop("_maybe_seen")
    survivors = maybe.join(seen.select(key), on=key, how="left_anti")
    return definitely_new.unionByName(survivors)
