"""spark-submit entry point for the crawl loop.

Usage (the north-rule shipping shape):

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/warcit_spark.zip \
        jobs/crawl_job.py --pages <path-or-synthetic:N> --state <dir> \
        [--budget B] [--rounds R] [--hosts H] [--seeds S]

On a cluster, --pages points at the Iceberg/parquet pages table; in the
sandbox, ``synthetic:N`` generates the deterministic fixture corpus.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet path or synthetic:N")
    ap.add_argument("--state", required=True)
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--hosts", type=int, default=5)
    ap.add_argument("--seeds", type=int, default=0, help="0 = fixture seed list")
    args = ap.parse_args()

    # getOrCreate inherits the spark-submit master/conf; imports resolve
    # from the shipped --py-files zip on every executor
    spark = SparkSession.builder.appName("warcit-spark-crawl").getOrCreate()

    from warcit_spark.plans.crawl import CrawlConfig, run_crawl
    from warcit_spark.plans.state import CrawlState
    from warcit_spark.sources.fixture import (
        generate_pages,
        generate_robots,
        generate_seed_sample,
        generate_seeds,
    )

    if args.pages.startswith("synthetic:"):
        n = int(args.pages.split(":", 1)[1])
        pages = generate_pages(spark, n, n_hosts=args.hosts)
        seeds = (
            generate_seed_sample(spark, n, args.seeds, args.hosts)
            if args.seeds
            else generate_seeds(spark)
        )
    else:
        pages = spark.read.parquet(args.pages)
        seeds = generate_seeds(spark)
    pages = pages.repartition(64, "url").sortWithinPartitions("url").persist()

    cfg = CrawlConfig(host_budget=args.budget, max_rounds=args.rounds)
    summaries = run_crawl(
        spark, CrawlState(args.state), pages, seeds, generate_robots(spark), cfg
    )
    print(json.dumps({"rounds": summaries}))
    spark.stop()


if __name__ == "__main__":
    main()
