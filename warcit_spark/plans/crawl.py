"""The crawl loop: iterative-batch frontier scheduling over a pages oracle.

One round r (SURVEY.md §3.1 restated for the new engine):

    frontier_r -> robots (broadcast, in-row longest-prefix)
               -> politeness (two flagged frames: salted pre-rank over the
                  full frontier, exact rank over the bounded survivors)
               -> fetch = left-join semantics vs pages ON url (J4; pages
                  side pre-bucketed/cached so only the selection shuffles)
               -> record derivation (resource + index-revisit rows, D1/A4)
               -> link extraction (JVM regex, D4) -> canonicalize
               -> within-round dedup (groupBy max-priority)
               -> ONE anti-join vs (seen UNION deferred)  (J5)
               -> frontier_{r+1} = deferred UNION new
    writes: seen delta, fetched delta, frontier_{r+1}, lineage; then the
    atomic round-commit marker (plans/state.py).

Crawl-order contract (SURVEY.md §7.3 #1): the engine *defines* the total
order as (round, host ASC, rank_in_host) with rank ordered by (priority
DESC, url ASC).  The sequential oracle (tests/oracle.py) implements the
same spec in plain Python; tests assert set- and order-equality.

Determinism notes: lineage partition ids are ``pmod(xxhash64(host), P)`` —
a *content-defined* partitioning, stable across parallelism levels (unlike
``spark_partition_id()``), so local[8] and local[32] runs produce
comparable lineage for the scaling-efficiency evidence.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warcit_spark.functions.mime import DEFAULT_MIME, mimetypes_table, url_extension_expr
from warcit_spark.functions.timestamps import iso8601z_expr
from warcit_spark.functions.urls import canonicalize_with_host_expr
from warcit_spark.operators.links import hrefs_expr, resolve_hrefs
from warcit_spark.operators.robots import apply_robots
from warcit_spark.plans.politeness import politeness_prerank, politeness_rank
from warcit_spark.plans.state import CrawlState

FRONTIER_SCHEMA = "url string, host string, priority double, round_added int"
DEFAULT_INDEX_SUFFIXES = ("/index.html", "/index.htm")


@dataclass
class CrawlConfig:
    host_budget: int = 50          # per-host per-round budget before delay scaling
    max_rounds: int = 20
    link_decay: float = 0.8        # child priority = parent priority * decay
    n_salt: int = 16               # politeness pre-rank salt slots
    n_lineage_partitions: int = 32
    index_suffixes: tuple[str, ...] = DEFAULT_INDEX_SUFFIXES
    # fetch-join strategy.  False (default): sort-merge join against the
    # pages oracle — the scale path when pages are provided url-bucketed/
    # pre-partitioned (bucketize or ``repartition(N, 'url').persist()``
    # them once; then only the selection shuffles per round).  Measured
    # faster than broadcasting at bench scale (BENCH/ANALYSIS.md remedy 3).
    # True: flip to pages RIGHT OUTER broadcast(selected) — the
    # small-corpus / un-bucketed-pages mode; a round's selection must fit
    # in executor memory.
    broadcast_fetch: bool = False
    # Bloom-prefilter the seen anti-join (plans/bloom.py): definitely-new
    # candidates bypass the join; correctness unchanged (no false
    # negatives — asserted by tests).  Pays one extra action per round to
    # build the broadcast bitset, so it is off below ~10^7-row seen sets.
    use_bloom: bool = False
    bloom_bits: int = 1 << 24
    extra: dict = field(default_factory=dict)


def canonical_seed_frontier(seeds: DataFrame) -> DataFrame:
    """seeds(url, priority) -> frontier_0: canonicalize, collapse collisions
    keeping the max priority (deterministic agg)."""
    canon = seeds.select(
        canonicalize_with_host_expr(F.col("url")).alias("_cu"),
        F.col("priority").cast("double").alias("priority"),
    ).select("_cu.url", "_cu.host", "priority")
    return (
        canon.groupBy("url", "host")  # host is a pure function of url
        .agg(F.max("priority").alias("priority"))
        .select("url", "host", "priority", F.lit(0).alias("round_added"))
        .where(F.col("host").isNotNull())
    )


def _mime_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(mimetypes_table(), "_ext string, _mime string")


def derive_fetch_records(
    fetched: DataFrame, mime_dim: DataFrame, index_suffixes: tuple[str, ...]
) -> DataFrame:
    """Fetched pages -> WARC-analog record rows (reference make_record +
    make_index_revisit semantics, warcit/warcit.py:464-566).

    - content_type: extension guess ≻ default text/html (F3 tail of the
      precedence chain; mapfile/override stages live in operators/records.py
      and apply when those side-inputs exist).
    - payload digest: sha1 over the payload (warcit.py:544 analog, A4).
    - D1: fetched urls (lowercased) ending in an index suffix emit an extra
      ``revisit`` row for the directory URL carrying the same digest/date.

    Accepts either a raw ``html`` binary column (digest/size computed here)
    or pre-computed ``payload_digest``/``size`` columns — crawl_round fuses
    those into the fetch-join projection so the 8 KiB body never needs to
    be cached (only the ~40 B digest rides the persisted round frame).
    """
    if "payload_digest" in fetched.columns:
        digest_col = F.col("payload_digest")
        size_col = F.col("size")
    else:
        digest_col = F.when(F.col("fetched"), F.sha1(F.col("html")))
        size_col = F.coalesce(F.length(F.col("html")), F.lit(0)).cast("long")
    with_mime = (
        fetched.withColumn("_ext", url_extension_expr(F.col("url")))
        .join(F.broadcast(mime_dim), on="_ext", how="left")
        .drop("_ext")
    )
    resources = with_mime.select(
        "round",
        "url",
        "host",
        "priority",
        "rank_in_host",
        F.lit("resource").alias("record_type"),
        F.coalesce(F.col("_mime"), F.lit(DEFAULT_MIME)).alias("content_type"),
        iso8601z_expr(F.col("warc_ts")).alias("warc_date"),
        digest_col.alias("payload_digest"),
        size_col.alias("size"),
        "fetched",
        "reason",
        F.lit(None).cast("string").alias("refers_to_target_uri"),
        F.lit(None).cast("string").alias("refers_to_target_date"),
    )
    index_match = F.lower(F.col("url")).endswith(index_suffixes[0])
    for suf in index_suffixes[1:]:
        index_match = index_match | F.lower(F.col("url")).endswith(suf)
    # revisit refers back to its original (make_index_revisit,
    # warcit/warcit.py:546-556 sets Refers-To-Target-URI/-Date)
    revisits = resources.where(F.col("fetched") & index_match).select(
        "round",
        F.regexp_replace(F.col("url"), "[^/]+$", "").alias("url"),
        "host",
        "priority",
        "rank_in_host",
        F.lit("revisit").alias("record_type"),
        "content_type",
        "warc_date",
        "payload_digest",
        F.lit(0).cast("long").alias("size"),
        "fetched",
        F.lit("revisit").alias("reason"),
        F.col("url").alias("refers_to_target_uri"),
        F.col("warc_date").alias("refers_to_target_date"),
    )
    return resources.unionByName(revisits)


_LINEAGE_COUNTERS = (
    "urls_in",
    "robots_denied",
    "urls_emitted",
    "deferred",
    "links_found",
    "new_urls",
)


def _lineage_single_pass(
    pre: DataFrame,
    ranked: DataFrame,
    candidates: DataFrame,
    new_urls: DataFrame,
    round_id: int,
    n_parts: int,
) -> DataFrame:
    """All six lineage counters in ONE aggregation: tag minimal (host,
    counter-increment) projections of the four round frames, union them,
    and groupBy the content-defined partition id.

    This replaces four separate groupBys + three full-outer joins (seven
    shuffle/join stages of driver scheduling per round) with a single
    exchange whose map-side partial aggregation reduces every input task
    to <= n_parts rows — the per-round serial stage-barrier floor shrinks
    while the shuffled volume stays O(n_parts), not O(rows).
    """
    z = F.lit(0)

    def tagged(df: DataFrame, **counters: F.Column) -> DataFrame:
        cols = [
            counters.get(c, z).cast("long").alias(c) for c in _LINEAGE_COUNTERS
        ]
        return df.select(F.col("host"), *cols)

    one = F.lit(1)
    unioned = (
        tagged(
            pre,
            urls_in=one,
            robots_denied=(~F.col("allowed")).cast("int"),
            deferred=(F.col("allowed") & ~F.col("_pre_ok")).cast("int"),
        )
        .unionByName(
            tagged(
                ranked,
                urls_emitted=F.col("selected").cast("int"),
                deferred=(~F.col("selected")).cast("int"),
            )
        )
        .unionByName(tagged(candidates, links_found=F.col("_n")))
        .unionByName(tagged(new_urls, new_urls=one))
    )
    pid = F.pmod(F.xxhash64("host"), F.lit(n_parts)).cast("int")
    return unioned.groupBy(pid.alias("partition_id")).agg(
        *[F.sum(c).alias(c) for c in _LINEAGE_COUNTERS]
    ).select(
        F.lit(round_id).alias("round"), "partition_id", *_LINEAGE_COUNTERS
    )


def crawl_round(
    spark: SparkSession,
    state: CrawlState,
    pages: DataFrame,
    robots: DataFrame,
    round_id: int,
    cfg: CrawlConfig,
    mime_dim: DataFrame | None = None,
) -> dict:
    """Run one crawl round and commit it.  Returns the round summary.

    ``mime_dim``: pass a persisted dim from run_crawl so the ~1000-row
    extension table is not re-shipped from the driver every round.
    """
    if mime_dim is None:
        mime_dim = _mime_dim(spark)
    # single-delta read: the round's frontier is one partition directory;
    # unioning history and filtering would grow the analyzed plan (and the
    # driver's serial planning time) linearly with crawl length
    frontier = state.read_round_delta(spark, "frontier", round_id)
    if frontier is None:
        raise RuntimeError(f"no frontier delta for round {round_id}")
    frontier = frontier.select("url", "host", "priority", "round_added")
    # no count() probe: emptiness falls out of the lineage action below
    # (urls_in == 0) — one fewer driver action per round
    frontier = frontier.persist()

    # ---- robots + politeness: two flagged frames, no anti-join -------------
    # robots is a broadcast join with in-row rule resolution (no shuffle on
    # the frontier side).  Stage 1 flags salted-pre-rank survivors over the
    # full frontier (hot host fans out across n_salt tasks); stage 2 ranks
    # only the bounded survivor set, so no task ever sorts a hot host's
    # whole backlog.  denied/selected/deferred are narrow filters and a
    # union of these two persisted frames.
    with_rules = apply_robots(frontier, robots)
    pre = politeness_prerank(
        with_rules, cfg.host_budget, n_salt=cfg.n_salt, allowed_col="allowed"
    ).persist()
    ranked = politeness_rank(
        pre.where(F.col("_pre_ok")), cfg.host_budget
    ).persist()
    denied = pre.where(~F.col("allowed"))
    selected = ranked.where(F.col("selected"))
    base_cols = ["url", "host", "priority", "round_added"]
    deferred = (
        pre.where(F.col("allowed") & ~F.col("_pre_ok"))
        .select(*base_cols)
        .unionByName(ranked.where(~F.col("selected")).select(*base_cols))
    )

    # ---- fetch: J4 against the pages oracle --------------------------------
    # left-join semantics (every selected URL yields a row) with the SMALL
    # side broadcast: pages RIGHT OUTER broadcast(selected).  The wide pages
    # relation is streamed in place — never shuffled, never broadcast.
    # column-prune the pages side to what the round consumes (url for the
    # join, warc_ts for dates, html for digests/links): text/lang would
    # ride the join, the persist, and every downstream scan for nothing —
    # at 4M+ cached pages that is gigabytes of memory bandwidth per round
    pages_r = pages.select("url", "warc_ts", "html").withColumnRenamed(
        "url", "_purl"
    )
    if not cfg.broadcast_fetch:
        # Pin the fetch join to sort-merge: the pages side must NEVER be
        # the broadcast build side.  Parquet/Iceberg-backed corpora report
        # COMPRESSED size to the planner — a 3.2-GiB (decompressed) corpus
        # whose zstd files read 57 MB slips under autoBroadcastJoinThreshold
        # and the planner builds a multi-GiB single-threaded hash relation
        # per round (measured: a parallelism-independent ~180 s stall at
        # every level of the table-corpus scaling pair).  At the design
        # point (100-TB pages table) broadcasting the corpus is never the
        # plan; the hint makes small-file stats incapable of flipping it.
        pages_r = pages_r.hint("merge")
    sel_side = F.broadcast(selected) if cfg.broadcast_fetch else selected
    # digest + size + raw hrefs are fused into THIS projection so the 8 KiB
    # html body is consumed exactly once, streaming out of the join, and is
    # never persisted: the cached round frame carries the 20-byte digest and
    # the ~1 KiB href array instead of the body.  At CC weight that cuts
    # ~3 full-corpus body copies per round (cache write + two consumer
    # reads) — memory-copy bandwidth is the measured scaling ceiling.
    is_fetched = F.col("warc_ts").isNotNull()
    is_linkable = F.col("url").endswith(".html") | ~F.col("url").rlike(
        r"\.[A-Za-z0-9]+$"
    )
    fetched = (
        pages_r.join(sel_side, F.col("_purl") == selected["url"], "right_outer")
        .drop("_purl")
        .select(
            F.lit(round_id).alias("round"),
            "url",
            "host",
            "priority",
            "rank_in_host",
            "warc_ts",
            F.when(is_fetched, F.sha1(F.col("html"))).alias("payload_digest"),
            F.coalesce(F.length(F.col("html")), F.lit(0))
            .cast("long")
            .alias("size"),
            F.when(is_fetched & is_linkable, hrefs_expr(F.col("html"))).alias(
                "_hrefs"
            ),
            is_fetched.alias("fetched"),
            F.when(is_fetched, F.lit("fetched"))
            .otherwise(F.lit("missing"))
            .alias("reason"),
        )
        .persist()
    )

    records = derive_fetch_records(
        fetched.drop("_hrefs"), mime_dim, cfg.index_suffixes
    )

    # ---- link extraction + canonicalization (D4) ---------------------------
    raw_links = resolve_hrefs(
        fetched.where(F.col("_hrefs").isNotNull()), carry=("priority",)
    )
    # Collapse duplicate RAW links first (map-side combined groupBy), then
    # canonicalize only the distinct links: at CC weight ~6x fewer
    # canonicalize evaluations, a ~6x smaller persisted candidates frame,
    # and the lineage branch reads distinct rows weighted by ``_n`` (the
    # occurrence count) so every per-host counter is unchanged — all
    # occurrences of one raw link share its host, and max(priority) per
    # canonical url == max over raw-link maxes (associativity; decay > 0
    # commutes with max).  Canonical url + politeness host stay fused in
    # ONE projection: the struct shares the single try_parse_url validity
    # parse between both columns.
    raw_grouped = raw_links.groupBy("link").agg(
        F.max("priority").alias("priority"),
        F.count(F.lit(1)).alias("_n"),
    )
    candidates = (
        raw_grouped.select(
            canonicalize_with_host_expr(F.col("link")).alias("_cu"),
            (F.col("priority") * cfg.link_decay).alias("priority"),
            "_n",
        )
        .select("_cu.url", "_cu.host", "priority", "_n")
        .where(F.col("host").isNotNull())
        .persist()
    )

    # within-round dedup: deterministic max-priority per url
    deduped = candidates.groupBy("url").agg(
        F.max("priority").alias("priority"), F.first("host").alias("host")
    )

    # ---- seen-set update + anti-joins (J5) ---------------------------------
    seen_prev = state.read_table(spark, "seen", upto_round=round_id - 1)
    seen_delta = (
        selected.select("url", "host")
        .withColumn("reason", F.lit("scheduled"))
        .unionByName(
            denied.select("url", "host").withColumn("reason", F.lit("robots"))
        )
        .withColumn("round_seen", F.lit(round_id))
    )
    seen_all = (
        seen_prev.select("url").unionByName(seen_delta.select("url"))
        if seen_prev is not None
        else seen_delta.select("url")
    )
    if state.seen_buckets > 0 and not cfg.use_bloom:
        # bucketed-seen layout: keep the big seen table OUT of the union
        # (a union would destroy its bucketing) and anti-join it
        # separately — the seen scan is co-partitioned (Bucketed: true,
        # zero Exchange on the seen side); only round-sized frames
        # (candidates, this round's delta, deferred) ever shuffle, at
        # O(delta), never O(|seen|).  This is what survives 10^10 URLs.
        round_sized = seen_delta.select("url").unionByName(deferred.select("url"))
        survivors = deduped.join(round_sized, on="url", how="left_anti")
        if seen_prev is not None:
            # merge-pin: the seen side must NEVER be the broadcast build
            # side — the same compressed-stats hazard as the fetch join
            # (parquet FileScans report zstd/snappy bytes, so a
            # multi-hundred-MB decompressed seen set slips under
            # autoBroadcastJoinThreshold and every round pays an
            # O(|seen|) single-threaded broadcast build that only grows).
            # Pinned to sort-merge the join uses the bucketed layout
            # (Bucketed: true, zero Exchange on the seen side) and was
            # ALSO measured faster locally at 2.4M seen rows (1.3s vs
            # 1.9s broadcast).
            survivors = survivors.join(
                seen_prev.select("url").hint("merge"), on="url", how="left_anti"
            )
    else:
        # one anti-join against (seen ∪ deferred) instead of two passes
        not_new = seen_all.unionByName(deferred.select("url"))
        if cfg.use_bloom:
            from warcit_spark.plans.bloom import (
                bloom_prefiltered_anti_join,
                build_bloom,
            )

            bloom = build_bloom(not_new, "url", n_bits=cfg.bloom_bits)
            survivors = bloom_prefiltered_anti_join(
                deduped, not_new, bloom.tobytes(), key="url", n_bits=cfg.bloom_bits
            )
        else:
            survivors = deduped.join(not_new, on="url", how="left_anti")
    new_urls = (
        survivors
        .select(
            "url", "host", "priority", F.lit(round_id + 1).alias("round_added")
        )
        .persist()
    )
    next_frontier = deferred.select(
        "url", "host", "priority", "round_added"
    ).unionByName(new_urls).withColumn("round", F.lit(round_id + 1))

    # ---- lineage (content-defined partitions, stable across cluster sizes) -
    # all six counters in one tagged-union aggregation: one exchange of
    # <= n_parts rows per input task instead of four groupBys + three joins
    lineage = _lineage_single_pass(
        pre, ranked, candidates, new_urls, round_id, cfg.n_lineage_partitions
    )

    # ---- writes + lineage action, OVERLAPPED (deltas first, marker last) ---
    # Phase 1: the lineage collect runs CONCURRENTLY with the seen and
    # fetched delta writes — three driver jobs whose heavy subtrees
    # (fetch join, link extraction, dedup anti-joins) overlap instead of
    # stacking the lineage action in front of the write IO (the r4 2->8
    # scaling diagnosis: small rounds are stage-latency-bound at higher
    # parallelism; the BlockManager's per-block compute lock shares the
    # persisted intermediates across the racing jobs).
    #
    # The FRONTIER write deliberately waits for the lineage action: it is
    # the only other consumer of new_urls, whose plan contains the
    # bucketed-seen CATALOG TABLE scan, and two concurrent jobs racing to
    # first-evaluate that cached subtree were observed to intermittently
    # evaluate it EMPTY (an AQE/cache interaction; sequential evaluation
    # in either order is always correct).  After lin_future.result() the
    # new_urls cache is materialized, so the phase-2 frontier write is a
    # pure cache read — still overlapped with the lineage delta write and
    # any seen/fetched IO tail.  The bucketed-seen catalog refresh is
    # ALSO deferred below the barrier: refreshTable invalidates every
    # cached plan referencing the table, which would yank new_urls' cache
    # out from under the in-flight jobs (state.py:_write_seen_bucketed).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        lin_future = pool.submit(lineage.collect)
        futures = [
            pool.submit(
                state.write_delta, seen_delta, "seen", round_id, refresh=False
            ),
            pool.submit(state.write_delta, records, "fetched", round_id),
        ]
        lin_rows = lin_future.result()

        def _sum(col: str) -> int:
            return int(sum(r[col] for r in lin_rows))

        n_links, n_new = _sum("links_found"), _sum("new_urls")
        summary = {
            "urls_in": _sum("urls_in"),
            "robots_denied": _sum("robots_denied"),
            "urls_emitted": _sum("urls_emitted"),
            "links_found": n_links,
            "new_urls": n_new,
            "dupes_dropped": n_links - n_new,
            "frontier_next": _sum("deferred") + n_new,
        }
        lineage_out = spark.createDataFrame(lin_rows, lineage.schema).withColumn(
            "dupes_dropped", F.lit(n_links - n_new).cast("long")
        )
        futures += [
            pool.submit(
                state.write_delta, next_frontier, "frontier", round_id + 1
            ),
            pool.submit(state.write_delta, lineage_out, "lineage", round_id),
        ]
        for f in futures:
            f.result()  # re-raise any write failure before committing
    state.refresh_seen(spark)  # publish the deferred bucketed-seen append
    state.commit_round(round_id, summary)

    for df in (frontier, pre, ranked, fetched, candidates, new_urls):
        df.unpersist()
    return summary


def run_crawl(
    spark: SparkSession,
    state: CrawlState,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    cfg: CrawlConfig | None = None,
) -> list[dict]:
    """Run (or resume) a crawl to completion.  Resume semantics: rounds are
    atomic; any uncommitted debris is dropped and the round re-runs
    idempotently (SURVEY.md §7.3 #4)."""
    cfg = cfg or CrawlConfig()
    state.drop_uncommitted()
    start_round = state.committed_round() + 1
    if start_round == 0:
        state.write_delta(canonical_seed_frontier(seeds), "frontier", 0)

    mime_dim = _mime_dim(spark).persist()
    summaries = []
    try:
        for r in range(start_round, cfg.max_rounds):
            summary = crawl_round(spark, state, pages, robots, r, cfg, mime_dim)
            summaries.append(summary)
            if summary.get("frontier_next", 0) == 0:
                break
    finally:
        mime_dim.unpersist()
    return summaries
