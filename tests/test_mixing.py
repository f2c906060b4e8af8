"""Token-budget corpus mixing (operators/mixing.py)."""

import hashlib
import math

from pyspark.sql import functions as F

from warcit_spark.operators.mixing import source_allocations, token_budget_mix


def _docs(spark):
    rows = []
    # source A: 10 docs x 10 tokens; source B: 2 docs x 10 tokens
    for i in range(10):
        rows.append((i, "A", " ".join(["w"] * 10)))
    for i in range(10, 12):
        rows.append((i, "B", " ".join(["w"] * 10)))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_allocations_sqrt_temperature(spark):
    got = {
        r["source"]: r
        for r in source_allocations(_docs(spark), budget=90, alpha=0.5).collect()
    }
    z = math.sqrt(100) + math.sqrt(20)
    assert got["A"]["tokens_s"] == 100 and got["B"]["tokens_s"] == 20
    assert got["A"]["weight"] == round(math.sqrt(100) / z, 6)
    # sqrt temperature gives B far more than its 1/6 proportional share
    assert got["B"]["weight"] > 20 / 120
    assert got["A"]["alloc_tokens"] == math.floor(90 * round(math.sqrt(100) / z, 6))


def test_mix_respects_budget_and_md5_order(spark):
    kept = token_budget_mix(_docs(spark), budget=90, alpha=0.5).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r)
    # every source stays within its allocation
    alloc = {
        r["source"]: r["alloc_tokens"]
        for r in source_allocations(_docs(spark), budget=90, alpha=0.5).collect()
    }
    for s, rows in by_src.items():
        assert max(r["cum_tokens"] for r in rows) <= alloc[s]
    # kept docs per source are the md5-smallest prefix, not doc_id order
    a_ids = sorted(
        (r["doc_id"] for r in by_src["A"]),
        key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
    )
    expect_n = alloc["A"] // 10  # uniform 10-token docs
    all_a_sorted = sorted(
        range(10), key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )
    assert sorted(r["doc_id"] for r in by_src["A"]) == sorted(
        all_a_sorted[: int(expect_n)]
    )
    assert len(a_ids) == expect_n


def test_alpha_one_is_proportional(spark):
    got = {
        r["source"]: r["weight"]
        for r in source_allocations(_docs(spark), budget=120, alpha=1.0).collect()
    }
    assert got["A"] == round(100 / 120, 6) and got["B"] == round(20 / 120, 6)
