"""Per-PHASE decomposition of one CC-weight crawl round.

The scaling pair's round-1 efficiency (1→4 CC-weight, BENCH/SCALING.json)
is the drag on the median; this probe answers WHICH phase fails to scale
there.  It replays crawl_round's exact dataflow for one round, forcing
each stage separately (persist+count / noop write) so the wall time of
every phase is isolated:

  frontier   read + persist the round's frontier delta
  prerank    robots broadcast + salted stage-1 window (persist force)
  rank       exact stage-2 window over survivors (persist force)
  fetch      J4 right-outer join vs bucketed pages (persist force)
  records    derive_fetch_records -> noop
  links      link extraction + canonicalize (persist force)
  dedup      within-round groupBy(url) max-priority -> noop
  anti       bucketed-seen anti-join chain -> noop
  writes     the four delta writes + lineage action (as in crawl_round)

Usage: python tools/profile_phases.py <cpus> [round_to_profile]
Env: PP_PAGES/PP_SEEDS/PP_HOSTS/PP_BODY_KB/PP_EXTRA_LINKS override the
default CC-weight corpus (400k pages x ~8KiB/25 links, 200k seeds).
Prints PHASE lines and one RESULT json line.  Run one child at a time
(fresh JVM; never alongside other Spark work).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    profile_round = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_pages = int(os.environ.get("PP_PAGES", "400000"))
    n_seeds = int(os.environ.get("PP_SEEDS", "200000"))
    n_hosts = int(os.environ.get("PP_HOSTS", "256"))
    body_kb = int(os.environ.get("PP_BODY_KB", "8"))
    extra_links = int(os.environ.get("PP_EXTRA_LINKS", "20"))
    budget = 40_000

    from pyspark.sql import functions as F

    from warcit_spark import get_spark
    from warcit_spark.functions.urls import canonicalize_url_expr, host_expr
    from warcit_spark.operators.links import extract_links
    from warcit_spark.operators.robots import apply_robots
    from warcit_spark.plans.crawl import (
        CrawlConfig,
        _mime_dim,
        canonical_seed_frontier,
        crawl_round,
        derive_fetch_records,
    )
    from warcit_spark.plans.politeness import politeness_prerank, politeness_rank
    from warcit_spark.plans.state import CrawlState
    from warcit_spark.sources.fixture import (
        generate_pages,
        generate_robots,
        generate_seed_sample,
    )

    spark = get_spark(
        "profile-phases", master=f"local[{cpus}]", shuffle_partitions=64,
        extra_conf={"spark.driver.memory": os.environ.get("PP_HEAP", "12g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = (
        generate_pages(
            spark, n_pages, n_hosts=n_hosts, body_kb=body_kb,
            extra_links=extra_links,
        )
        .select("url", "warc_ts", "html")
        .repartition(64, "url")
        .sortWithinPartitions("url")
        .persist()
    )
    pages.count()

    state_dir = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    root = tempfile.mkdtemp(prefix="profile_phases_", dir=state_dir)
    state = CrawlState(root, seen_buckets=64)
    cfg = CrawlConfig(
        host_budget=budget, max_rounds=profile_round + 1, n_salt=16,
        broadcast_fetch=False,
    )
    state.write_delta(
        canonical_seed_frontier(
            generate_seed_sample(spark, n_pages, n_seeds, n_hosts)
        ),
        "frontier", 0,
    )
    md = _mime_dim(spark).persist()
    md.count()
    robots = generate_robots(spark)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    phases: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        phases[name] = round(time.perf_counter() - t0, 2)
        print(f"PHASE {name}: {phases[name]}", flush=True)
        return out

    try:
        # PP_WARM=1: replicate the scaling child's context — a throwaway
        # 2-round crawl at full seed size in a separate state dir BEFORE
        # profiling (needed to study the post-warmup round-0 anomaly)
        if os.environ.get("PP_WARM") == "1":
            from warcit_spark.plans.state import CrawlState as _CS

            wroot = tempfile.mkdtemp(prefix="ppwarm_", dir=state_dir)
            wstate = _CS(wroot, seen_buckets=64)
            wstate.write_delta(
                canonical_seed_frontier(
                    generate_seed_sample(spark, n_pages, n_seeds, n_hosts)
                ),
                "frontier", 0,
            )
            for r in range(2):
                crawl_round(spark, wstate, pages, robots, r, cfg, md)
            shutil.rmtree(wroot, ignore_errors=True)

        # run preceding rounds through the real loop so the profiled round
        # sees genuine state (bucketed seen table, deferred backlog)
        for r in range(profile_round):
            crawl_round(spark, state, pages, robots, r, cfg, md)

        r = profile_round
        # ---- the phases, exactly crawl_round's dataflow -----------------
        frontier = timed(
            "frontier",
            lambda: (lambda f: (f.count(), f)[1])(
                state.read_round_delta(spark, "frontier", r)
                .select("url", "host", "priority", "round_added")
                .persist()
            ),
        )
        with_rules = apply_robots(frontier, robots)
        pre = timed(
            "prerank",
            lambda: (lambda p: (p.count(), p)[1])(
                politeness_prerank(
                    with_rules, cfg.host_budget, n_salt=cfg.n_salt,
                    allowed_col="allowed",
                ).persist()
            ),
        )
        ranked = timed(
            "rank",
            lambda: (lambda p: (p.count(), p)[1])(
                politeness_rank(
                    pre.where(F.col("_pre_ok")), cfg.host_budget
                ).persist()
            ),
        )
        denied = pre.where(~F.col("allowed"))
        selected = ranked.where(F.col("selected"))
        base_cols = ["url", "host", "priority", "round_added"]
        deferred = (
            pre.where(F.col("allowed") & ~F.col("_pre_ok")).select(*base_cols)
            .unionByName(ranked.where(~F.col("selected")).select(*base_cols))
        )
        pages_r = pages.withColumnRenamed("url", "_purl")
        fetched = timed(
            "fetch",
            lambda: (lambda f: (f.count(), f)[1])(
                pages_r.join(
                    selected, F.col("_purl") == selected["url"], "right_outer"
                )
                .drop("_purl")
                .select(
                    F.lit(r).alias("round"), "url", "host", "priority",
                    "rank_in_host", "warc_ts", "html",
                    F.col("warc_ts").isNotNull().alias("fetched"),
                    F.when(F.col("warc_ts").isNotNull(), F.lit("fetched"))
                    .otherwise(F.lit("missing")).alias("reason"),
                )
                .persist()
            ),
        )
        records = derive_fetch_records(fetched, md, cfg.index_suffixes)
        timed("records", lambda: noop(records))
        html_pages = fetched.where(
            F.col("fetched") & F.col("url").endswith(".html")
            | F.col("fetched") & ~F.col("url").rlike(r"\.[A-Za-z0-9]+$")
        )
        # r6 shape: collapse duplicate raw links BEFORE canonicalizing
        # (mirrors plans/crawl.py; keep this replay in sync with it)
        raw_grouped = extract_links(html_pages, carry=("priority",)).groupBy(
            "link"
        ).agg(
            F.max("priority").alias("priority"),
            F.count(F.lit(1)).alias("_n"),
        )
        candidates = timed(
            "links",
            lambda: (lambda c: (c.count(), c)[1])(
                raw_grouped.select(
                    canonicalize_url_expr(F.col("link")).alias("url"),
                    (F.col("priority") * cfg.link_decay).alias("priority"),
                    "_n",
                )
                .withColumn("host", host_expr(F.col("url")))
                .where(F.col("host").isNotNull())
                .persist()
            ),
        )
        deduped = candidates.groupBy("url").agg(
            F.max("priority").alias("priority"), F.first("host").alias("host")
        )
        timed("dedup", lambda: noop(deduped))
        seen_prev = state.read_table(spark, "seen", upto_round=r - 1)
        seen_delta = (
            selected.select("url", "host")
            .withColumn("reason", F.lit("scheduled"))
            .unionByName(
                denied.select("url", "host").withColumn("reason", F.lit("robots"))
            )
            .withColumn("round_seen", F.lit(r))
        )
        round_sized = seen_delta.select("url").unionByName(deferred.select("url"))
        survivors = deduped.join(round_sized, on="url", how="left_anti")
        if seen_prev is not None:
            survivors = survivors.join(
                seen_prev.select("url"), on="url", how="left_anti"
            )
        timed("anti", lambda: noop(survivors))
        new_urls = survivors.select(
            "url", "host", "priority", F.lit(r + 1).alias("round_added")
        )
        next_frontier = deferred.unionByName(new_urls).withColumn(
            "round", F.lit(r + 1)
        )
        def do_writes():
            # same three delta writes as crawl_round (run serially here so
            # the phase time is attributable; crawl_round overlaps them)
            state.write_delta(seen_delta, "seen", r)
            state.write_delta(records, "fetched", r)
            state.write_delta(next_frontier, "frontier", r + 1)
        timed("writes", do_writes)
        total = round(sum(phases.values()), 2)
        print(
            "RESULT "
            + json.dumps({"cpus": cpus, "round": r, "phases": phases,
                          "total": total}),
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
