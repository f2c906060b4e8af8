"""Per-phase round profiling: where does a crawl round spend wall time,
and which parts fail to scale with cores?

Runs one child (fresh JVM) at a given core count on the scaling-bench
corpus, timing each phase of every round separately:
  - action: the single lineage.collect() driver action
  - w_seen / w_fetched / w_frontier / w_lineage: the four delta writes

Usage: python tools/profile_round.py <cpus> [n_pages] [n_seeds] [rounds]
                                     [body_kb] [extra_links]
(body_kb/extra_links nonzero = the CC-weight corpus bench_scaling uses)
Prints one RESULT json line (same contract as bench_scaling children).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    n_seeds = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    body_kb = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    extra_links = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    n_hosts = 256 if body_kb else 512
    budget = 40_000

    from warcit_spark import get_spark
    from warcit_spark.plans import crawl as C
    from warcit_spark.plans.crawl import (
        CrawlConfig, canonical_seed_frontier, crawl_round, _mime_dim)
    from warcit_spark.plans.state import CrawlState
    from warcit_spark.sources.fixture import (
        generate_pages, generate_robots, generate_seed_sample)

    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    pages = (generate_pages(spark, n_pages, n_hosts=n_hosts,
                            body_kb=body_kb, extra_links=extra_links)
             .select("url", "warc_ts", "html")
             .repartition(64, "url").sortWithinPartitions("url").persist())
    pages.count()

    state_dir = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    root = tempfile.mkdtemp(prefix="profile_", dir=state_dir)
    state = CrawlState(root, seen_buckets=int(os.environ.get("SEEN_BUCKETS", "0")))

    # time each write by wrapping write_delta
    phase: dict[str, float] = {}
    orig_write = state.write_delta

    def timed_write(df, table, round_id, **kw):
        t0 = time.perf_counter()
        orig_write(df, table, round_id, **kw)
        phase[f"w_{table}"] = phase.get(f"w_{table}", 0.0) + (
            time.perf_counter() - t0)

    state.write_delta = timed_write

    # time the lineage.collect action by wrapping DataFrame.collect is
    # invasive; instead time the whole round and subtract writes
    cfg = CrawlConfig(host_budget=budget, max_rounds=rounds, n_salt=16,
                      broadcast_fetch=False)
    state.write_delta(canonical_seed_frontier(
        generate_seed_sample(spark, n_pages, n_seeds, n_hosts)), "frontier", 0)
    phase.clear()
    md = _mime_dim(spark).persist(); md.count()
    robots = generate_robots(spark)

    tracker = spark.sparkContext.statusTracker()
    out_rounds = []
    import shutil
    try:
        for r in range(rounds):
            phase.clear()
            jobs_before = len(tracker.getJobIdsForGroup() or [])
            t0 = time.perf_counter()
            s = crawl_round(spark, state, pages, robots, r, cfg, md)
            wall = time.perf_counter() - t0
            writes = {k: round(v, 2) for k, v in phase.items()}
            out_rounds.append({
                "round": r, "wall": round(wall, 2),
                "writes_total": round(sum(phase.values()), 2),
                "action_and_plan": round(wall - sum(phase.values()), 2),
                **writes,
                "urls_emitted": s["urls_emitted"],
                "links_found": s.get("links_found", 0),
            })
            print("ROUND " + json.dumps(out_rounds[-1]), flush=True)
        steady = out_rounds[1:]
        urls = sum(r["urls_emitted"] for r in steady)
        sec = sum(r["wall"] for r in steady)
        print("RESULT " + json.dumps({
            "cpus": cpus, "rounds": out_rounds,
            "steady_urls_per_sec": round(urls / sec, 1) if sec else 0,
        }), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
