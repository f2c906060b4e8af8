"""Crawl-only measurement harness for round 6 (bench.py stays frozen).

Runs bench.py's two crawl benchmarks (light + CC-weight) once each and
prints their round walls and urls/sec, so crawl_round changes can be
iterated without paying for the query suite.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import bench_crawl  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from warcit_spark import get_spark

    spark = get_spark("warcit-spark-bench-crawl", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {}
    if which in ("light", "both"):
        out["light"] = bench_crawl(spark)
    if which in ("cc", "both"):
        out["cc"] = bench_crawl(
            spark,
            n_pages=400_000, n_hosts=256, n_seeds=200_000, n_rounds=3,
            body_kb=8, extra_links=20, warmup_rounds=1,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
