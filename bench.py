"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and one crawl-loop
benchmark over a generated synthetic pages corpus, then prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}.

Each query is forced end-to-end with a noop-format write (full compute,
no driver collect overhead).  The crawl benchmark reports urls/sec
(scheduled+fetched per second — the BASELINE.json target metric) alongside
the suite seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "j1_suffix_join",
    "j4_equi_join_pushdown",
    "j5_anti_join_seen",
    "a2_reverse_index",
    "w1_politeness_topk",
    "w3_tumbling_window",
    "f2_url_synthesis",
    "f6_ts_normalize",
    "t1_token_count",
    "t4_exact_dedup",
    "t5_ngram_jaccard",
    "x1_minhash_lsh",
    "x2_simhash",
    "ann1_cosine_topk",
    "crawl_canonicalize",
]

CRAWL_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "200000"))
CRAWL_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
CRAWL_BUDGET = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "2000"))
CRAWL_HOSTS = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "64"))
CRAWL_SEEDS = int(os.environ.get("SPARK_GRAFT_BENCH_SEEDS", "50000"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def bench_crawl(spark) -> dict:
    from warcit_spark.plans.crawl import CrawlConfig, run_crawl
    from warcit_spark.plans.state import CrawlState
    from warcit_spark.sources.fixture import (
        generate_pages,
        generate_robots,
        generate_seed_sample,
    )

    # pre-hash-partition + sort by url: the in-memory analog of a
    # url-bucketed Iceberg pages table — rounds shuffle only the selection
    pages = (
        generate_pages(spark, CRAWL_PAGES, n_hosts=CRAWL_HOSTS)
        .repartition(64, "url")
        .sortWithinPartitions("url")
        .persist()
    )
    pages.count()  # materialize outside the timed section
    seeds = generate_seed_sample(spark, CRAWL_PAGES, CRAWL_SEEDS, CRAWL_HOSTS)
    robots = generate_robots(spark)
    root = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        cfg = CrawlConfig(
            host_budget=CRAWL_BUDGET,
            max_rounds=CRAWL_ROUNDS,
            n_salt=16,
            broadcast_fetch=False,  # pages are pre-bucketed above
        )
        t0 = time.perf_counter()
        summaries = run_crawl(spark, CrawlState(root), pages, seeds, robots, cfg)
        wall = time.perf_counter() - t0
        urls = sum(s.get("urls_emitted", 0) for s in summaries)
        links = sum(s.get("links_found", 0) for s in summaries)
        return {
            "crawl_sec": round(wall, 3),
            "crawl_urls_emitted": urls,
            "crawl_links_found": links,
            "crawl_urls_per_sec": round(urls / wall, 1) if wall > 0 else 0.0,
            "crawl_rounds": len(summaries),
        }
    finally:
        pages.unpersist()
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from warcit_spark import get_spark

    spark = get_spark("warcit-spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = bench_queries(spark, sf_dir)
    crawl = bench_crawl(spark)

    total = round(sum(queries.values()) + crawl["crawl_sec"], 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": {**queries, "crawl_loop": crawl["crawl_sec"]},
        "sf": sf,
        "cpus": cpus,
        "crawl": crawl,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
