"""CCNet-style char-bigram LM perplexity + quality buckets
(operators/lm_quality.py)."""

import math

import pytest
from pyspark.sql import functions as F

from warcit_spark.operators.lm_quality import (
    LM_MAX_MODEL_ROWS,
    char_bigram_model,
    char_bigrams_expr,
    lm_perplexity,
    lm_quality_buckets,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_bigrams_expr(spark):
    got = (
        _docs(spark, [(0, "AbC"), (1, "x"), (2, "")])
        .select(char_bigrams_expr(F.col("text")).alias("b"))
        .collect()
    )
    assert [r["b"] for r in got] == [["ab", "bc"], [], []]


def test_model_counts(spark):
    m = {
        r["bg"]: r["c"]
        for r in char_bigram_model(_docs(spark, [(0, "aaab"), (1, "ab")])).collect()
    }
    # "aaab" -> aa, aa, ab ; "ab" -> ab
    assert m == {"aa": 2, "ab": 2}


def test_perplexity_matches_python_twin(spark):
    rows = [(0, "the cat sat"), (1, "the cat ran"), (2, "zq zq zq zq")]
    got = {r["doc_id"]: r for r in lm_perplexity(_docs(spark, rows)).collect()}

    # python twin: same Laplace-smoothed self-trained bigram model
    counts, totals, vocab = {}, {}, set()
    for _, t in rows:
        t = t.lower()
        for i in range(len(t) - 1):
            bg = t[i : i + 2]
            counts[bg] = counts.get(bg, 0) + 1
    for bg, c in counts.items():
        totals[bg[0]] = totals.get(bg[0], 0) + c
        vocab.update(bg)
    v = len(vocab)
    for doc_id, t in rows:
        t = t.lower()
        bgs = [t[i : i + 2] for i in range(len(t) - 1)]
        s = sum(math.log2((counts[b] + 1) / (totals[b[0]] + v)) for b in bgs)
        ppl = round(2.0 ** (-s / len(bgs)), 6)
        assert got[doc_id]["n_bigrams"] == len(bgs)
        assert got[doc_id]["ppl"] == pytest.approx(ppl, abs=1e-6)

    # the repetitive doc is the most predictable one under its own model
    assert got[2]["ppl"] < got[0]["ppl"]


def test_buckets_tertile_split(spark):
    # 6 docs, three clearly separated predictability tiers
    rows = [
        (0, "ababababababab"),
        (1, "abababababacab"),
        (2, "the cat sat on the mat"),
        (3, "the dog sat on the log"),
        (4, "q9 zx!7 kv@3 wp#1"),
        (5, "j8 qz%5 xk&2 vn*4"),
    ]
    got = {r["doc_id"]: r["bucket"] for r in lm_quality_buckets(_docs(spark, rows)).collect()}
    assert sorted(got.values()).count("head") == 2
    assert got[0] == "head" and got[1] == "head"
    assert got[4] == "tail" and got[5] == "tail"


def test_short_docs_excluded_and_guard(spark):
    out = lm_perplexity(_docs(spark, [(0, "ab"), (1, "x"), (2, "")])).collect()
    assert [r["doc_id"] for r in out] == [0]

    import warcit_spark.operators.lm_quality as lmq

    old = lmq.LM_MAX_MODEL_ROWS
    lmq.LM_MAX_MODEL_ROWS = 1
    try:
        with pytest.raises(ValueError, match="LM_MAX_MODEL_ROWS"):
            lm_perplexity(_docs(spark, [(0, "abcd")]))
    finally:
        lmq.LM_MAX_MODEL_ROWS = old
    assert LM_MAX_MODEL_ROWS == old  # module constant untouched for others
