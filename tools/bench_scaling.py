"""Two-parallelism-level scaling evidence (BASELINE.md sandbox protocol).

Runs the SAME crawl job on the SAME deterministic input at two core counts
(N -> 4N cores, the sandbox stand-in for N -> 4N executors), in separate
subprocesses (fresh JVM each), and reports steady-state throughput at both
plus scaling efficiency = (urls_per_sec_4N / urls_per_sec_N) / 4.

Protocol details (each is a measured finding, see BASELINE.md):
- identical plan at both levels: shuffle_partitions pinned to 64; only the
  core count differs.
- pages are pre-hash-partitioned + sorted by url and cached (the in-memory
  analog of a url-bucketed Iceberg table), so the per-round fetch join
  shuffles only the selected side.
- round 0 is JVM/codegen warmup and is excluded; throughput is measured
  over the subsequent rounds (steady state).
- state tables and spark local dirs live on tmpfs: a single box has ONE
  disk, while N -> 4N *executors* scale disks/network with cores; leaving
  state on the shared disk measures the box, not the engine.
- two pairs are reported: (2 -> 8) cores, where the box's memory bandwidth
  is not saturated (the faithful executor-scaling analog), and (8 -> 32),
  where all 32 threads share one memory bus — its efficiency is a lower
  bound distorted by single-socket bandwidth, reported for transparency.

Usage: python tools/bench_scaling.py  (writes BENCH/SCALING.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import time, tempfile, shutil, json, sys
sys.path.insert(0, {repo!r})
from warcit_spark import get_spark
from warcit_spark.plans.crawl import (
    CrawlConfig, crawl_round, canonical_seed_frontier, _mime_dim)
from warcit_spark.plans.state import CrawlState
from warcit_spark.sources.fixture import (
    generate_pages, generate_robots, generate_seed_sample)

cpus = {cpus}
spark = get_spark("scaling-bench", master=f"local[{{cpus}}]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
pages = (generate_pages(spark, {n_pages}, n_hosts={n_hosts})
         .repartition(64, "url").sortWithinPartitions("url").persist())
pages.count()
root = tempfile.mkdtemp(prefix="scalebench_", dir={state_dir!r})
try:
    cfg = CrawlConfig(host_budget={budget}, max_rounds={rounds}, n_salt=16,
                      broadcast_fetch=False)
    state = CrawlState(root)
    state.write_delta(canonical_seed_frontier(
        generate_seed_sample(spark, {n_pages}, {n_seeds}, {n_hosts})), "frontier", 0)
    md = _mime_dim(spark).persist(); md.count()
    times, emitted = [], []
    for r in range({rounds}):
        t0 = time.perf_counter()
        s = crawl_round(spark, state, pages, generate_robots(spark), r, cfg, md)
        times.append(round(time.perf_counter() - t0, 2))
        emitted.append(s["urls_emitted"])
    steady_urls = sum(emitted[1:]); steady_sec = sum(times[1:])
    print("RESULT " + json.dumps({{
        "cpus": cpus, "round_sec": times, "round_urls": emitted,
        "steady_urls": steady_urls, "steady_sec": round(steady_sec, 2),
        "urls_per_sec": round(steady_urls / steady_sec, 1)}}))
finally:
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
"""

STATE_DIR = "/dev/shm" if os.path.isdir("/dev/shm") else None

PAIRS = [
    # (label, n_lo, n_hi, n_pages, n_seeds, budget, n_hosts, rounds)
    ("2to8", 2, 8, 16_000_000, 4_000_000, 40_000, 512, 2),
    ("8to32", 8, 32, 16_000_000, 4_000_000, 40_000, 512, 2),
]


def run_level(cpus, n_pages, n_seeds, budget, n_hosts, rounds) -> dict:
    code = CHILD.format(
        repo=REPO, cpus=cpus, n_pages=n_pages, n_seeds=n_seeds,
        budget=budget, n_hosts=n_hosts, rounds=rounds,
        state_dir=STATE_DIR or "/tmp",
    )
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="24g")
    if STATE_DIR:
        env["SPARK_LOCAL_DIRS"] = STATE_DIR
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3000, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"child (cpus={cpus}) produced no RESULT:\n{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}"
    )


def main():
    out = {"protocol": "steady-state urls/sec, round 0 excluded (warmup); "
                       "identical plan (shuffle_partitions=64); tmpfs state"}
    for label, lo, hi, n_pages, n_seeds, budget, n_hosts, rounds in PAIRS:
        lo_res = run_level(lo, n_pages, n_seeds, budget, n_hosts, rounds)
        hi_res = run_level(hi, n_pages, n_seeds, budget, n_hosts, rounds)
        eff = round((hi_res["urls_per_sec"] / lo_res["urls_per_sec"]) / (hi / lo), 3)
        out[label] = {
            "n_pages": n_pages, "n_seeds": n_seeds, "host_budget": budget,
            "n_hosts": n_hosts, "rounds": rounds,
            f"local{lo}": lo_res, f"local{hi}": hi_res,
            "scaling_efficiency": eff, "target": 0.8,
        }
        print(json.dumps({label: out[label]}, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "SCALING.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote BENCH/SCALING.json")


if __name__ == "__main__":
    main()
