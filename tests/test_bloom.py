"""Bloom prefilter: no false negatives; prefiltered anti-join == exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from warcit_spark.plans.bloom import (
    bloom_maybe_contains,
    bloom_prefiltered_anti_join,
    build_bloom,
)

N_BITS = 1 << 16  # small filter -> measurable fp rate, exercises both paths


def test_no_false_negatives(spark):
    seen = spark.range(2000).select(
        F.concat(F.lit("http://s.test/p"), F.col("id")).alias("url")
    )
    bloom = build_bloom(seen, n_bits=N_BITS)
    flagged = bloom_maybe_contains(seen, bloom.tobytes(), n_bits=N_BITS)
    # every member must be flagged maybe-seen
    assert flagged.where(~F.col("_maybe_seen")).count() == 0


def test_prefiltered_anti_join_exact(spark):
    seen = spark.range(3000).select(
        F.concat(F.lit("http://s.test/p"), F.col("id")).alias("url")
    )
    # candidates: half overlap, half new
    candidates = spark.range(1500, 4500).select(
        F.concat(F.lit("http://s.test/p"), F.col("id")).alias("url"),
        (F.col("id") % 100).alias("payload"),
    )
    bloom = build_bloom(seen, n_bits=N_BITS)
    fast = bloom_prefiltered_anti_join(
        candidates, seen, bloom.tobytes(), n_bits=N_BITS
    )
    exact = candidates.join(seen, on="url", how="left_anti")
    assert fast.count() == exact.count() == 1500
    assert fast.exceptAll(exact).count() == 0
    assert exact.exceptAll(fast).count() == 0


def test_bloom_actually_prefilters(spark):
    """Most definitely-new rows must bypass the join (fp rate sane)."""
    seen = spark.range(1000).select(
        F.concat(F.lit("http://s.test/p"), F.col("id")).alias("url")
    )
    new = spark.range(100000, 105000).select(
        F.concat(F.lit("http://s.test/p"), F.col("id")).alias("url")
    )
    bloom = build_bloom(seen, n_bits=N_BITS)
    flagged = bloom_maybe_contains(new, bloom.tobytes(), n_bits=N_BITS)
    fp = flagged.where(F.col("_maybe_seen")).count()
    assert fp / 5000 < 0.05  # k=4, 1000 keys in 65536 bits -> fp << 5%


def test_crawl_with_bloom_identical_state(spark, tmp_path_factory):
    """use_bloom=True must not change any crawl output (flag is perf-only)."""
    from warcit_spark.plans.crawl import CrawlConfig, run_crawl
    from warcit_spark.plans.state import CrawlState
    from warcit_spark.sources.fixture import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )

    pages = generate_pages(spark, 120)
    seeds, robots = generate_seeds(spark), generate_robots(spark)
    states = {}
    for flag in (False, True):
        root = str(tmp_path_factory.mktemp(f"bloom_crawl_{flag}"))
        cfg = CrawlConfig(
            host_budget=10, max_rounds=4, n_salt=4, use_bloom=flag,
            bloom_bits=1 << 16,
        )
        run_crawl(spark, CrawlState(root), pages, seeds, robots, cfg)
        states[flag] = CrawlState(root)
    for table in ("seen", "fetched", "frontier"):
        a = states[False].read_table(spark, table)
        b = states[True].read_table(spark, table)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
