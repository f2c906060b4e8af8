"""DSIR importance weighting (operators/dsir.py)."""

import pytest
from pyspark.sql import functions as F

from warcit_spark.operators.dsir import dsir_select, dsir_weights


def _docs(spark):
    return spark.createDataFrame(
        [
            # target distribution: clean prose words
            (0, 1, "the quick brown fox jumps over the lazy dog"),
            (1, 1, "the brown dog sleeps under the quick fox"),
            # raw: one target-like doc, one alien doc
            (2, 0, "the brown fox and the lazy dog"),
            (3, 0, "zzz qqq xxx www vvv kkk jjj"),
        ],
        "doc_id long, t int, text string",
    )


def test_targetlike_raw_doc_outranks_alien(spark):
    got = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_weights(_docs(spark), F.col("t") == 1).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[2] > got[3]
    # target docs score themselves high (sanity property from the docstring)
    assert min(got[0], got[1]) > got[3]


def test_select_keeps_top_raw_half_only(spark):
    kept = dsir_select(_docs(spark), F.col("t") == 1, keep_frac=0.5).collect()
    assert [r["doc_id"] for r in kept] == [2]  # raw docs only, top half

    with pytest.raises(ValueError, match="keep_frac"):
        dsir_select(_docs(spark), F.col("t") == 1, keep_frac=0.0)


def test_hashed_buckets_match_exact_when_collision_free(spark):
    d = _docs(spark)
    exact = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_weights(d, F.col("t") == 1).collect()
    }
    hashed = {
        r["doc_id"]: r["dsir_logratio"]
        for r in dsir_weights(d, F.col("t") == 1, n_buckets=1 << 20).collect()
    }
    # 2^20 buckets over ~20 distinct words: collision-free with
    # overwhelming probability, so the scores must agree exactly
    assert exact == hashed
