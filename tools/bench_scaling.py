"""Two-parallelism-level scaling evidence (BASELINE.md sandbox protocol).

Runs the SAME crawl job on the SAME generated input at local[8] and
local[32] (N -> 4N cores, the sandbox stand-in for N -> 4N executors) in
separate subprocesses (fresh JVM each), and reports throughput at both plus
scaling efficiency = (T_8 / T_32) / 4 ... expressed on throughput:
eff = (urls_per_sec_32 / urls_per_sec_8) / 4.  Writes BENCH/SCALING.json.

Usage: python tools/bench_scaling.py [n_pages] [rounds] [budget]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, tempfile, shutil, time
sys.path.insert(0, {repo!r})
from warcit_spark import get_spark
from warcit_spark.plans.crawl import CrawlConfig, run_crawl
from warcit_spark.plans.state import CrawlState
from warcit_spark.sources.fixture import (
    generate_pages, generate_robots, generate_seed_sample)

cpus = {cpus}
n_hosts = {n_hosts}
# identical plan at both levels: only the core count differs
spark = get_spark("scaling-bench", master=f"local[{{cpus}}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages = generate_pages(spark, {n_pages}, n_hosts=n_hosts).persist()
pages.count()
root = tempfile.mkdtemp(prefix="scalebench_")
try:
    cfg = CrawlConfig(host_budget={budget}, max_rounds={rounds}, n_salt=16)
    t0 = time.perf_counter()
    summaries = run_crawl(spark, CrawlState(root), pages,
                          generate_seed_sample(spark, {n_pages}, {n_seeds}, n_hosts),
                          generate_robots(spark), cfg)
    wall = time.perf_counter() - t0
    urls = sum(s.get("urls_emitted", 0) for s in summaries)
    print("RESULT " + json.dumps({{"cpus": cpus, "wall_sec": round(wall, 3),
        "urls_emitted": urls, "urls_per_sec": round(urls / wall, 1),
        "rounds": len(summaries), "summaries": summaries}}))
finally:
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
"""


N_HOSTS = 128
N_SEEDS = 200_000


def run_level(cpus: int, n_pages: int, rounds: int, budget: int) -> dict:
    code = CHILD.format(
        repo=REPO, cpus=cpus, n_pages=n_pages, rounds=rounds, budget=budget,
        n_hosts=N_HOSTS, n_seeds=N_SEEDS,
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child (cpus={cpus}) produced no RESULT:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

    lo = run_level(8, n_pages, rounds, budget)
    hi = run_level(32, n_pages, rounds, budget)
    eff = round((hi["urls_per_sec"] / lo["urls_per_sec"]) / 4, 3)
    out = {
        "n_pages": n_pages,
        "n_hosts": N_HOSTS,
        "n_seeds": N_SEEDS,
        "rounds": rounds,
        "host_budget": budget,
        "local8": lo,
        "local32": hi,
        "scaling_efficiency": eff,
        "target": 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
