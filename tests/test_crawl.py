"""End-to-end crawl parity: distributed engine vs sequential oracle.

The golden-test style of the reference (/root/reference/test/test_warcit.py
— run the whole pipeline on a fixture, assert exact outputs) applied to the
engine's own spec: URL-seen set equality, total crawl-order equality,
record-count parity (resources + revisits), byte-identical extracted text,
and exact resume-after-kill semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests import oracle as seq
from warcit_spark.plans.crawl import CrawlConfig, run_crawl
from warcit_spark.plans.state import CrawlState
from warcit_spark.sources.fixture import (
    extract_text_expr,
    generate_pages,
    generate_robots,
    generate_seeds,
)

N_PAGES = 200
CFG = CrawlConfig(host_budget=12, max_rounds=6, n_salt=4, n_lineage_partitions=8)


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    pages = generate_pages(spark, N_PAGES).persist()
    pages.count()
    return pages, generate_seeds(spark), generate_robots(spark)


@pytest.fixture(scope="module")
def oracle_result(spark, fixture_dfs):
    pages, seeds, robots = fixture_dfs
    pages_dict = {
        r.url: {"warc_ts": r.warc_ts, "html": bytes(r.html), "text": r.text, "lang": r.lang}
        for r in pages.collect()
    }
    return seq.crawl(
        pages_dict,
        [(r.url, r.priority) for r in seeds.collect()],
        [tuple(r) for r in robots.collect()],
        host_budget=CFG.host_budget,
        max_rounds=CFG.max_rounds,
    )


@pytest.fixture(scope="module")
def engine_result(spark, fixture_dfs, tmp_path_factory):
    pages, seeds, robots = fixture_dfs
    state = CrawlState(str(tmp_path_factory.mktemp("crawl_state")))
    summaries = run_crawl(spark, state, pages, seeds, robots, CFG)
    return state, summaries


def test_seen_set_matches_oracle(spark, engine_result, oracle_result):
    state, _ = engine_result
    seen = state.read_table(spark, "seen")
    got = {
        (r.url, r.round, r.reason)
        for r in seen.select("url", "round", "reason").collect()
    }
    want = {(u, rnd, reason) for u, (rnd, reason) in oracle_result.seen.items()}
    assert got == want


def test_crawl_order_matches_oracle(spark, engine_result, oracle_result):
    state, _ = engine_result
    fetched = state.read_table(spark, "fetched")
    got = [
        (r.round, r.host, r.rank_in_host, r.url)
        for r in fetched.where(F.col("record_type") == "resource")
        .orderBy("round", "host", "rank_in_host")
        .collect()
    ]
    want = sorted(oracle_result.order)
    assert got == want


def test_record_derivation_matches_oracle(spark, engine_result, oracle_result):
    state, _ = engine_result
    fetched = state.read_table(spark, "fetched")
    got = {
        (r.round, r.url, r.record_type, r.content_type, r.fetched, r.reason)
        for r in fetched.collect()
    }
    want = {
        (
            rec["round"],
            rec["url"],
            rec["record_type"],
            rec["content_type"],
            rec["fetched"],
            rec["reason"],
        )
        for rec in oracle_result.records
    }
    assert got == want


def test_revisit_count_semantics(spark, engine_result, oracle_result):
    """Mirrors the reference's '24 resources = 22 files + 2 index revisits'
    count assertions (/root/reference/test/test_warcit.py:43)."""
    state, _ = engine_result
    fetched = state.read_table(spark, "fetched")
    by_type = dict(
        fetched.groupBy("record_type").count().rdd.map(tuple).collect()
    )
    want_revisits = sum(
        1 for rec in oracle_result.records if rec["record_type"] == "revisit"
    )
    assert by_type.get("revisit", 0) == want_revisits
    assert want_revisits > 0  # fixture must actually exercise D1


def test_extracted_text_byte_identical(spark, fixture_dfs):
    """Per-row invariant (BASELINE.json input_hint): engine-extracted text
    == golden text column, byte-for-byte, for every html page."""
    pages, _, _ = fixture_dfs
    html_pages = pages.where(F.col("lang") == "en")
    mismatch = html_pages.where(
        extract_text_expr(F.decode(F.col("html"), "UTF-8")) != F.col("text")
    ).count()
    assert mismatch == 0
    # and against the oracle's independent Python implementation
    sample = html_pages.limit(50).collect()
    for r in sample:
        assert seq.extract_text(bytes(r.html).decode("utf-8")) == r.text


def test_lineage_counters_consistent(spark, engine_result, oracle_result):
    state, summaries = engine_result
    lineage = state.read_table(spark, "lineage")
    per_round = {
        r.round: (r.urls_in, r.robots_denied, r.urls_emitted)
        for r in lineage.groupBy("round")
        .agg(
            F.sum("urls_in").alias("urls_in"),
            F.sum("robots_denied").alias("robots_denied"),
            F.sum("urls_emitted").alias("urls_emitted"),
        )
        .collect()
    }
    for s in oracle_result.summaries:
        got = per_round[s["round"]]
        assert got == (s["urls_in"], s["robots_denied"], s["urls_emitted"])


def test_robots_denied_host_never_fetched(spark, engine_result):
    state, _ = engine_result
    fetched = state.read_table(spark, "fetched")
    assert fetched.where(F.col("host") == "www.host3.test").count() == 0
    seen = state.read_table(spark, "seen")
    denied = seen.where(F.col("reason") == "robots")
    assert denied.where(F.col("host") == "www.host3.test").count() > 0


def test_resume_exactly(spark, fixture_dfs, tmp_path_factory, engine_result):
    """Kill-after-round-k resume: partial run + resumed run == one-shot run
    (SURVEY.md §7.3 #4)."""
    pages, seeds, robots = fixture_dfs
    root = str(tmp_path_factory.mktemp("crawl_resume"))

    partial_cfg = CrawlConfig(**{**CFG.__dict__, "max_rounds": 2})
    state2 = CrawlState(root)
    run_crawl(spark, state2, pages, seeds, robots, partial_cfg)
    assert state2.committed_round() == 1

    # resume with a fresh state object (new "driver process")
    state3 = CrawlState(root)
    run_crawl(spark, state3, pages, seeds, robots, CFG)

    state_full, _ = engine_result
    for table in ("seen", "fetched"):
        a = state_full.read_table(spark, table)
        b = state3.read_table(spark, table)
        assert a.count() == b.count()
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_bucketed_seen_parity_and_plan(spark, fixture_dfs, engine_result, tmp_path_factory):
    """seen_buckets>0 (Hive-bucketed seen, the Iceberg bucket(N,url)
    analog): identical crawl results, and the per-round anti-join scans
    seen co-partitioned — Bucketed: true, no Exchange on the seen side."""
    pages, seeds, robots = fixture_dfs
    root = str(tmp_path_factory.mktemp("crawl_state_bucketed"))
    state_b = CrawlState(root, seen_buckets=8)
    run_crawl(spark, state_b, pages, seeds, robots, CFG)

    state_ref, _ = engine_result
    ref_seen = {
        (r.url, r.round, r.reason)
        for r in state_ref.read_table(spark, "seen")
        .select("url", "round", "reason").collect()
    }
    got_seen = {
        (r.url, r.round_seen, r.reason)
        for r in state_b.read_table(spark, "seen")
        .select("url", "round_seen", "reason").collect()
    }
    assert got_seen == ref_seen

    ref_order = [
        (r.round, r.host, r.rank_in_host, r.url)
        for r in state_ref.read_table(spark, "fetched")
        .where(F.col("record_type") == "resource")
        .orderBy("round", "host", "rank_in_host").collect()
    ]
    got_order = [
        (r.round, r.host, r.rank_in_host, r.url)
        for r in state_b.read_table(spark, "fetched")
        .where(F.col("record_type") == "resource")
        .orderBy("round", "host", "rank_in_host").collect()
    ]
    assert got_order == ref_order

    # plan audit: anti-join against the bucketed seen table has the seen
    # scan Bucketed: true with no Exchange between the scan and the join.
    # (At fixture scale AQE would broadcast the tiny table and hide the
    # bucketing; force the SMJ path the 10^10-row table would take.)
    seen = state_b.read_table(spark, "seen")
    cand = spark.range(50).select(
        F.concat(F.lit("http://probe/"), F.col("id")).alias("url")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = cand.join(seen.select("url"), "url", "left_anti")._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Bucketed: true" in plan
    seen_scan_section = plan[plan.index("LeftAnti"):]
    # the seen (right) side of the SMJ must go Sort->Filter->FileScan with
    # no Exchange; the candidate side may exchange freely
    import re as _re
    right_side = seen_scan_section[_re.search(r"FileScan parquet [^\n]*seen_b", seen_scan_section).start()-400:]
    assert "Exchange hashpartitioning(url" not in right_side


def test_politeness_annotate_matches_single_window_twin(spark):
    """Spark politeness_annotate == the pure-Python single-window spec twin
    (tests/test_properties.py proves twin == two-stage for arbitrary salts;
    this parity transfers those properties to the Spark operator)."""
    from warcit_spark.plans.politeness import politeness_annotate
    from tests.test_properties import _pol_single_window

    rows = []
    delays = {"a.test": 1.0, "b.test": 2.0, "c.test": 0.0}
    pri = [0.0, 0.5, 1.0, 1.0, 2.0]
    for i in range(120):
        host = ["a.test", "b.test", "c.test"][i % 3]
        rows.append(
            (host, f"http://{host}/p{i:03d}", pri[i % 5], delays[host],
             (i % 7) != 0)
        )
    frontier = spark.createDataFrame(
        rows, "host string, url string, priority double, crawl_delay double, allowed boolean"
    )
    got = {
        r.url: r.rank_in_host
        for r in politeness_annotate(
            frontier, host_budget=5, n_salt=4, allowed_col="allowed"
        ).collect()
        if r.selected
    }
    twin_rows = [
        {"host": h, "url": u, "priority": p, "delay": d, "allowed": a}
        for (h, u, p, d, a) in rows
    ]
    assert got == _pol_single_window(twin_rows, 5)


def test_parse_robots_txt_grammar(spark):
    from warcit_spark.operators.robots import apply_robots, parse_robots_txt

    body = "\r\n".join(
        [
            "# global group",
            "User-agent: gobbler",
            "User-Agent: *",          # consecutive UA lines -> one group
            "Disallow: /private/",
            "Allow: /private/ok",
            "Crawl-Delay: 2.5",
            "Disallow:",              # empty value = allow all -> no rule
            "",
            "User-agent: other-bot",  # new group, does not apply to us
            "Disallow: /",
            "Crawl-delay: 99",
            "",
            "User-agent: *",
            "Disallow: /tmp/*/x",     # interior wildcard -> prefix cut at '*'
            "Disallow: /exact$",      # '$'-anchored -> dropped (documented)
            "Sitemap: http://h.test/sm.xml",  # unknown key ends UA run only
        ]
    )
    df = spark.createDataFrame([("h.test", body)], "host string, body string")
    rules = parse_robots_txt(df)
    got = {
        (r.path_prefix, r.allow, r.crawl_delay) for r in rules.collect()
    }
    assert got == {
        ("/private/", False, 2.5),
        ("/private/ok", True, 2.5),
        ("/tmp/", False, 2.5),
        ("", True, 2.5),          # delay-carrying default-allow row
    }

    # end-to-end: parsed rules drive apply_robots longest-prefix verdicts
    frontier = spark.createDataFrame(
        [
            ("http://h.test/private/doc", "h.test"),
            ("http://h.test/private/ok/doc", "h.test"),
            ("http://h.test/free", "h.test"),
            ("http://h.test/tmp/a/x", "h.test"),
            ("http://nohost.test/x", "nohost.test"),  # no rules -> default
        ],
        "url string, host string",
    )
    out = {r.url: (r.allowed, r.crawl_delay) for r in apply_robots(frontier, rules).collect()}
    assert out["http://h.test/private/doc"] == (False, 2.5)
    assert out["http://h.test/private/ok/doc"] == (True, 2.5)
    assert out["http://h.test/free"] == (True, 2.5)
    assert out["http://h.test/tmp/a/x"] == (False, 2.5)
    assert out["http://nohost.test/x"] == (True, 1.0)


def test_parse_robots_txt_delay_only_and_agent_match(spark):
    from warcit_spark.operators.robots import parse_robots_txt

    df = spark.createDataFrame(
        [
            ("a.test", "User-agent: warcit-spark\nCrawl-delay: 7"),
            ("b.test", "User-agent: nope\nDisallow: /"),
        ],
        "host string, body string",
    )
    rules = parse_robots_txt(df, agent="WARCit-Spark")
    got = {(r.host, r.path_prefix, r.allow, r.crawl_delay) for r in rules.collect()}
    # a: delay survives with zero path rules; b: group doesn't apply
    assert got == {
        ("a.test", "", True, 7.0),
        ("b.test", "", True, 1.0),
    }


def test_pagerank_scores_drive_crawl_order(spark, fixture_dfs, tmp_path_factory):
    """Composition the north-star describes: authority scores computed on
    the engine's own link graph feed the frontier as seed priorities, and
    the round-0 per-host fetch order follows them exactly."""
    from warcit_spark.operators.graph import pagerank
    from warcit_spark.operators.links import extract_links
    from warcit_spark.plans.crawl import CrawlConfig, run_crawl
    from warcit_spark.plans.state import CrawlState

    pages, _seeds, robots = fixture_dfs
    edges = extract_links(
        pages.withColumn("priority", F.lit(0.0)), carry=()
    ).select(F.col("url").alias("src"), F.col("link").alias("dst"))
    pr = pagerank(edges, iters=3)

    # every known page seeded with its pagerank as priority
    seeds = pr.select(F.col("node").alias("url"), F.col("rank").alias("priority"))
    state = CrawlState(str(tmp_path_factory.mktemp("pr_crawl")))
    cfg = CrawlConfig(max_rounds=1, host_budget=5)
    run_crawl(spark, state, pages, seeds, robots, cfg)

    fetched = spark.read.parquet(f"{state.root}/fetched")
    got = {
        (r.host, r.rank_in_host): r.url
        for r in fetched.select("host", "rank_in_host", "url").collect()
    }
    # the engine canonicalizes seeds and collapses collisions keeping the
    # max priority — replay that collapse for the expected-score lookup
    from warcit_spark.functions.urls import canonicalize_url_expr

    prc = (
        pr.select(canonicalize_url_expr(F.col("node")).alias("url"), "rank")
        .groupBy("url")
        .agg(F.max("rank").alias("rank"))
    )
    ranks = {r.url: r.rank for r in prc.collect()}
    # within every host, fetch order must be non-increasing pagerank.
    # Derived index-alias records (dir/ <-> dir/index.html revisits) ride
    # in the fetched frame with urls that were never seeds — skip those;
    # the check runs over the seeded urls' relative order.
    by_host = {}
    for (host, rk), url in got.items():
        if url in ranks:
            by_host.setdefault(host, []).append((rk, ranks[url]))
    assert sum(len(v) for v in by_host.values()) >= 5, by_host
    for host, lst in by_host.items():
        lst.sort()
        scores = [s for _, s in lst]
        assert scores == sorted(scores, reverse=True), host
