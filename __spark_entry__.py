"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl slice (canonicalize -> robots ->
politeness -> fetch-oracle join -> record derivation) over a pages table
synthesized deterministically from sf0.001 ``documents``.

``queries()`` exposes each implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators) as a named DataFrame query over the
TPC-H-ish tables; ``oracle_sql()`` carries the DuckDB twin for every
SQL-expressible one.  Columns are aliased identically on both sides; money
aggregates use DECIMAL casts so sums are order-independent and hash-stable
across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamps must render/extract in UTC to hash-match the DuckDB oracle
    # (DuckDB timestamps are UTC-naive); harmless if already UTC
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =========================================================================
# entry: flagship crawl slice on sf0.001
# =========================================================================
def entry(spark: SparkSession) -> DataFrame:
    from warcit_spark.plans.crawl import (
        CrawlConfig,
        canonical_seed_frontier,
        derive_fetch_records,
        _mime_dim,
    )
    from warcit_spark.plans.politeness import politeness_select
    from warcit_spark.operators.robots import apply_robots

    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    pages = _pages_from_documents(docs)

    seeds = spark.range(7).select(
        F.concat(
            F.lit("HTTP://Docs"), F.col("id"), F.lit(".TEST:80/dir0/index.html#top")
        ).alias("url"),
        (F.lit(1.0) - F.col("id") * 0.1).alias("priority"),
    )
    robots = spark.createDataFrame(
        [("docs3.test", "/", False, 1.0)],
        "host string, path_prefix string, allow boolean, crawl_delay double",
    )

    frontier = canonical_seed_frontier(seeds)
    with_rules = apply_robots(frontier, robots)
    allowed = with_rules.where(F.col("allowed"))
    selected = politeness_select(allowed, host_budget=50, n_salt=4)
    fetched = (
        selected.join(
            pages.withColumnRenamed("url", "_purl"),
            selected["url"] == F.col("_purl"),
            "left",
        )
        .drop("_purl")
        .select(
            F.lit(0).alias("round"),
            "url",
            "host",
            "priority",
            "rank_in_host",
            "warc_ts",
            "html",
            F.col("warc_ts").isNotNull().alias("fetched"),
            F.when(F.col("warc_ts").isNotNull(), F.lit("fetched"))
            .otherwise(F.lit("missing"))
            .alias("reason"),
        )
    )
    return derive_fetch_records(fetched, _mime_dim(spark), ("/index.html",))


def _pages_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic pages(url, warc_ts, html, text, lang) from documents."""
    host = F.concat(F.lit("docs"), F.col("doc_id") % 7, F.lit(".test"))
    d = (F.col("doc_id") / 10).cast("long")
    path = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.lit("/dir"), d, F.lit("/index.html")),
    ).otherwise(F.concat(F.lit("/dir"), d, F.lit("/page"), F.col("doc_id"), F.lit(".html")))
    url = F.concat(F.lit("http://"), host, path)
    html = F.concat(
        F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
    )
    epoch = F.lit(1356998400) + (F.col("doc_id") * 86381) % F.lit(157766400)
    return docs.select(
        url.alias("url"),
        F.to_timestamp(F.from_unixtime(epoch)).alias("warc_ts"),
        F.encode(html, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


# =========================================================================
# queries  (each: (spark, sf_dir) -> DataFrame)
# =========================================================================
def _spread(df: DataFrame, *keys: str) -> DataFrame:
    """Redistribute a low-parallelism scan across the cluster before
    expression-heavy work (guide §2.5 "input skew: one huge unsplittable
    file ... repartition immediately after the read").

    The fixture tables are single-row-group parquet files, so a scan — and
    every projection/partial-aggregate above it — runs as ONE task no
    matter how many byte-range splits Spark makes.  An explicit
    ``repartition(defaultParallelism, keys)`` both spreads that work and,
    because the partition count is user-specified, is exempt from AQE
    partition coalescing (which would otherwise merge these small shuffles
    back to one partition).  Scale-adaptive by construction: when the scan
    already has >= defaultParallelism partitions (any real multi-file
    table) this returns the input unchanged, so no shuffle is ever added
    at cluster scale.
    """
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    # size gate: when the (column-pruned, compressed) input estimate is
    # under ~1 MiB the exchange round-trip costs more than the parallelism
    # buys — measured f6 at sf0.1 (0.6 MiB pruned estimate): 0.40s unspread
    # vs 0.66s spread, while at sf1.0 (4.7 MiB estimate) spreading took the
    # same query 1.84s -> 1.28s.  Stats come from the optimized plan
    # (driver-side, no job).
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if size < 1024 * 1024:
        return df
    return df.repartition(n, *[F.col(k) for k in keys]) if keys else df.repartition(n)


def _exact_money_sum(x, s: int):
    """Order-independent exact sum of a money-valued double at scale ``s``,
    equal bit-for-bit to ``round(cast(sum(cast(x as decimal(18,s))) as
    double), s)`` but ~2x cheaper per row: the per-row double->decimal cast
    (a BigDecimal construction in Spark's codegen) is replaced by primitive
    arithmetic (guide §1.2 "per-task work").

    Equivalence argument, verified output-identical vs the decimal form on
    every fixture sf (0.001/0.01/0.1/1.0):
    - per row, ``floor(x*10^s + 0.5)`` = the decimal cast's HALF_UP at scale
      s for non-negative x whose exact value is a 10^-s-grid rational (all
      fixture money columns are exact 2-decimals; products of 2-decimal
      factors are exact 4-/6-decimal rationals), because the double-multiply
      error (~1e-11 relative) never moves the product across a .5 boundary
      that sits >= 1e-5 away from the grid.
    - the long sum is exact (capacity 9.2e18 >= micro-units up to ~sf30;
      beyond that switch the cast back to decimal — the sums themselves,
      not this rendering, overflow decimal(18,s) rows far earlier).
    - the final value is rendered through an exact decimal division, so the
      double the oracle's pandas path sees is the same nearest-double of
      S/10^s that the decimal-sum form produced.
    """
    units = (x * F.lit(float(10**s)) + F.lit(0.5)).cast("long")
    total = F.sum(units).cast("decimal(38,0)") / F.lit(10**s)
    return F.round(total.cast("double"), s)


def q1_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact order-independent sums rendered like DuckDB's pandas
            # path (DECIMAL -> float64); see _exact_money_sum for why the
            # primitive-long form equals the decimal-cast form bit-for-bit
            _exact_money_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            _exact_money_sum(F.col("l_extendedprice"), 2).alias("sum_base_price"),
            _exact_money_sum(disc, 4).alias("sum_disc_price"),
            _exact_money_sum(charge, 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        # no output orderBy: the oracle gate hashes rows order-insensitively,
        # and a display sort costs a range exchange + sampling job (guide §2.4)
    )


def q3_top_revenue_orders(spark, sf_dir):
    # Join order: reduce orders by the selective customer filter FIRST
    # (broadcast c into o), then broadcast the ~5x-smaller filtered order
    # dim into lineitem — the broadcast build drops from every order row to
    # only BUILDING-segment orders, and lineitem is never shuffled
    # (guide §3.1: broadcast the side that fits, smallest build side).
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    oc = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    # group by the unique order key ALONE (narrow long-key hash agg), take
    # the top 10, and only then re-attach the functionally-dependent
    # orderdate/orderpriority — the wide (key,date,priority) group key was
    # ~0.3s of extra hashing for columns that never change the groups
    # (measured 1.41s -> 1.14s; o_orderkey is unique in orders, so the
    # groups and revenues are identical by construction)
    top = (
        l.join(
            F.broadcast(oc.select("o_orderkey")),
            l["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(_exact_money_sum(rev, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )
    return (
        oc.join(F.broadcast(top), on="o_orderkey")
        .select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
    )


def f1_include_exclude(spark, sf_dir):
    from warcit_spark.operators.filters import include_exclude_expr

    p = _t(spark, sf_dir, "part")
    keep = include_exclude_expr(
        F.col("p_type"), ["*economy*"], ["*economy*", "*promo*", "*standard*"]
    )
    return (
        p.where(keep)
        .groupBy("p_type")
        .agg(F.count("*").alias("n_parts"))
        .orderBy("p_type")
    )


def f2_url_synthesis(spark, sf_dir):
    from warcit_spark.functions.urls import synth_url_expr

    p = _spread(
        _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name"),
        "p_partkey",
    )
    relpath = F.concat(F.col("p_brand"), F.lit("/"), F.col("p_name"), F.lit(".html"))
    return p.select(
        "p_partkey", synth_url_expr("http://parts.test/", relpath).alias("url")
    )


def f3_mime_chain(spark, sf_dir):
    from warcit_spark.functions.mime import guess_mime_expr, url_extension_expr

    p = _t(spark, sf_dir, "part")
    ext = (
        F.when(F.col("p_size") % 4 == 0, ".html")
        .when(F.col("p_size") % 4 == 1, ".css")
        .when(F.col("p_size") % 4 == 2, ".js")
        .otherwise(".zzz")
    )
    url = F.concat(
        F.lit("http://m.test/"), F.replace(F.col("p_name"), F.lit(" "), F.lit("_")), ext
    )
    mapfile_ct = F.when(
        F.col("p_partkey") % 10 == 0, F.lit("application/x-map; charset=utf-8")
    )
    override = F.when(F.col("p_brand") == "Brand#1", F.lit("application/x-ovr"))
    e = url_extension_expr(url)
    guessed = (
        F.when(e == ".html", "text/html")
        .when(e == ".css", "text/css")
        .when(e == ".js", "text/javascript")
    )
    return p.select(
        "p_partkey",
        guess_mime_expr(mapfile_ct, override, guessed).alias("mime"),
    )


def f6_ts_normalize(spark, sf_dir):
    from warcit_spark.functions.timestamps import normalize_ts14_expr

    e = _spread(_t(spark, sf_dir, "events").select("event_id", "ts"), "event_id")
    raw = (
        F.when(F.col("event_id") % 4 == 0, F.date_format("ts", "yyyyMMddHHmmss"))
        .when(F.col("event_id") % 4 == 1, F.date_format("ts", "yyyy-MM"))
        .when(F.col("event_id") % 4 == 2, F.date_format("ts", "yyyy"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm"))
    )
    return e.select("event_id", normalize_ts14_expr(raw).alias("iso"))


def f7_json_extract(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            # DuckDB sum(int) is HUGEINT (-> float64 via pandas); keep both
            # sides BIGINT so renderings agree
            F.sum(k).cast("bigint").alias("sum_k"),
            F.count(F.when(k > 50, 1)).alias("n_big"),
        )
        .orderBy("event_type")
    )


def crawl_canonicalize(spark, sf_dir):
    from warcit_spark.functions.urls import canonicalize_url_expr

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    messy = F.concat(
        F.lit("HTTP://Docs"),
        F.col("doc_id") % 7,
        F.lit(".TEST:80/p"),
        F.col("doc_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")),
        F.lit("#frag"),
    )
    return d.select("doc_id", canonicalize_url_expr(messy).alias("canonical_url"))


def crawl_host_counts(spark, sf_dir):
    from warcit_spark.functions.urls import canonicalize_url_expr, host_expr

    d = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("HTTP://Docs"), F.col("doc_id") % 7, F.lit(".TEST:80/p"), F.col("doc_id")
    )
    url = canonicalize_url_expr(messy)
    return (
        d.select(host_expr(url).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n_urls"))
        .orderBy("host")
    )


def j1_suffix_join(spark, sf_dir):
    p = _spread(_t(spark, sf_dir, "part").select("p_type"), "p_type")
    suffixes = spark.createDataFrame(
        [("ECONOMY",), ("MEDIUM",), ("SMALL",), ("PROMO",), ("LARGE",), ("STANDARD",)],
        ["suffix"],
    )
    joined = p.join(
        F.broadcast(suffixes), F.col("p_type").startswith(F.col("suffix")), "inner"
    )
    # no output orderBy: order-insensitive gate (guide §2.4)
    return joined.groupBy("suffix").agg(F.count("*").alias("n_parts"))


def j2_broadcast_equi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).alias("total_price"),
            F.count("*").alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


def j4_equi_join_pushdown(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") > 25)
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            _exact_money_sum(F.col("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_lines"),
        )
        # no output orderBy: order-insensitive gate (guide §2.4)
    )


def j5_anti_join_seen(spark, sf_dir):
    # the seen-set shape: customers with no 'F'-status order yet (the
    # filter guarantees a non-empty result at every sf)
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    # no output orderBy: order-insensitive gate (guide §2.4)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
    )


def j5b_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def d1_revisit_derivation(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    dirno = (F.col("doc_id") / 10).cast("long")
    url = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(F.lit("http://docs.test/dir"), dirno, F.lit("/index.html")),
    ).otherwise(
        F.concat(F.lit("http://docs.test/dir"), dirno, F.lit("/page"), F.col("doc_id"), F.lit(".html"))
    )
    resources = d.select(
        url.alias("url"), F.lit("resource").alias("record_type")
    )
    revisits = resources.where(
        F.lower(F.col("url")).endswith("/index.html")
    ).select(
        F.regexp_replace(F.col("url"), "[^/]+$", "").alias("url"),
        F.lit("revisit").alias("record_type"),
    )
    return resources.unionByName(revisits)


def a2_reverse_index(spark, sf_dir):
    o = _spread(
        _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey"),
        "o_custkey",
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("order_keys"),
            F.count("*").alias("n_orders"),
        )
        # no output orderBy: order-insensitive gate (guide §2.4)
    )


def a3_rollup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_name", "n_name")
    )


def a4_distinct_agg(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


def a5_pivot_manual(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_linestatus")
        .agg(
            *[
                # coalesce(0): a NULL sum renders None on Spark but NaN via
                # DuckDB's pandas path — force both sides to 0.0
                F.coalesce(
                    F.round(
                        F.sum(
                            F.when(F.col("l_returnflag") == flag, F.col("l_quantity")).cast(
                                "decimal(18,2)"
                            )
                        ).cast("double"),
                        2,
                    ),
                    F.lit(0.0),
                ).alias(f"qty_{flag}")
                for flag in ("A", "N", "R")
            ]
        )
        .orderBy("l_linestatus")
    )


def w1_politeness_topk(spark, sf_dir):
    # row_number().over(user window) <= 3 re-shaped as groupBy(user) +
    # in-row array sort + slice(3): same shuffle bytes, but the big
    # per-partition Sort + WindowExec pass becomes tiny per-user array
    # sorts inside one HashAggregate (guide §2.4: share one exchange).
    # Ordering equivalence: struct(-value, event_id) ascending == (value
    # desc, event_id asc) for the non-negative fixture values; event_id is
    # unique, so the total order (and thus row_number) is deterministic.
    e = _spread(
        _t(spark, sf_dir, "events").select("user_id", "event_id", "value"),
        "user_id",
    )
    top3 = F.slice(
        F.array_sort(
            F.collect_list(F.struct((-F.col("value")).alias("nv"), "event_id"))
        ),
        1,
        3,
    )
    # no output orderBy: order-insensitive gate (guide §2.4)
    return (
        e.groupBy("user_id")
        .agg(top3.alias("_top"))
        .select("user_id", F.posexplode("_top").alias("_pos", "_s"))
        .select(
            "user_id",
            F.col("_s.event_id").alias("event_id"),
            (F.col("_pos") + 1).cast("int").alias("rank_in_user"),
        )
    )


def w2_sessionize(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session",
        F.when(gap > 1800, 1).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            (F.sum("new_session") + 1).cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def w3_tumbling_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            _exact_money_sum(F.col("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        # no output orderBy: order-insensitive gate (guide §2.4)
    )


def t1_token_count(spark, sf_dir):
    from warcit_spark.functions.text import token_count_expr

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    return d.select("doc_id", token_count_expr(F.col("text")).alias("n_tokens"))


def t2_quality_score(spark, sf_dir):
    from warcit_spark.functions.text import (
        punct_ratio_expr,
        stopword_ratio_expr,
        quality_score_expr,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(stopword_ratio_expr(F.col("text")), 6).alias("stopword_ratio"),
        F.round(punct_ratio_expr(F.col("text")), 6).alias("punct_ratio"),
        quality_score_expr(F.col("text")).alias("quality"),
    )


def t3_lang_id(spark, sf_dir):
    from warcit_spark.functions.text import lang_id_expr

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_id_expr(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "predicted")
    )


def t4_exact_dedup(spark, sf_dir):
    from warcit_spark.operators.dedup import exact_dedup

    # no _spread here: shuffling the text payload out of the single-row-group
    # scan costs more than the 32-way fingerprinting saves (measured 0.96s ->
    # 1.22s); the map-side partial agg already shrinks the only exchange to
    # (_fp, partials)
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # no output orderBy: order-insensitive gate (guide §2.4)
    return exact_dedup(d)


def t5_ngram_jaccard(spark, sf_dir):
    from warcit_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    out = ngram_jaccard_pairs(d, k=3, threshold=0.5)
    # no output orderBy: order-insensitive gate (guide §2.4)
    return out.select(
        "doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard")
    )


def x1_minhash_lsh(spark, sf_dir):
    from warcit_spark.operators.dedup import minhash_lsh_dedup

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    out = minhash_lsh_dedup(d, jaccard_threshold=0.5)
    # no output orderBy: order-insensitive gate (guide §2.4)
    return out.select(
        "doc_id_a", "doc_id_b", F.round("jaccard", 6).alias("jaccard")
    )


def x2_simhash(spark, sf_dir):
    from warcit_spark.operators.dedup import simhash

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    # no output orderBy: order-insensitive gate (guide §2.4)
    return simhash(d)


def ann1_cosine_topk(spark, sf_dir):
    from warcit_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = list(emb.where(F.col("vec_id") == 0).first().embedding)
    return cosine_topk(emb, q, k=10)


def ann2_embedding_neardup(spark, sf_dir):
    from warcit_spark.operators.similarity import cosine_expr

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("va"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_expr(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= 0.35)
        .orderBy("id_a", "id_b")
    )


def x3_lsh_ann(spark, sf_dir):
    from warcit_spark.operators.similarity import lsh_bucket_ann

    emb = _t(spark, sf_dir, "embeddings")
    q = list(emb.where(F.col("vec_id") == 0).first().embedding)
    return lsh_bucket_ann(emb, q, k=10, hamming_probe=1)


def x6_ivf_ann(spark, sf_dir):
    """IVF ANN with the deterministic random-Voronoi coarse quantizer
    (data-independent, so the DuckDB oracle reproduces assignment from
    centroid literals; a k-means quantizer drops in via
    kmeans_centroids — exercised in tests)."""
    from warcit_spark.operators.similarity import (
        ivf_random_centroids,
        ivf_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    q = list(emb.where(F.col("vec_id") == 0).first().embedding)
    cents = ivf_random_centroids(k=8, dim=len(q))
    return ivf_topk(emb, q, cents, k=10, nprobe=2)


def x7_ivf_kmeans(spark, sf_dir):
    """IVF ANN with the DISTRIBUTED K-MEANS coarse quantizer: Lloyd's runs
    as Spark jobs (decimal-exact per-dimension sums -> bit-reproducible
    centroids, similarity.py:kmeans_centroids), then the probe query runs
    against the learned cells.  The DuckDB oracle replays the SAME two
    Lloyd iterations in SQL (exact DECIMAL sums make the arithmetic
    order-independent; dot products are spelled as Spark's left-assoc
    fold), so assignment, probe set, and top-k all match bit-for-bit.
    A 256-row cap keeps the unrolled-SQL oracle tractable; the Spark side
    is the unbounded scale path."""
    from warcit_spark.operators.similarity import ivf_topk, kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 256)
    q = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    cents = kmeans_centroids(emb, k=4, iters=2)
    return ivf_topk(emb, q, cents, k=10, nprobe=2)


def t7_pii_scrub(spark, sf_dir):
    """PII scrub over a deterministic PII-bearing text derivation (the
    fixture corpus has no natural PII, so each doc gets a synthetic
    contact line — same derivation in the SQL oracle)."""
    from warcit_spark.functions.text import pii_count_expr, pii_scrub_expr

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id"),
        F.lit("@example.com or 555-123-4567 from 192.168.0."),
        (F.col("doc_id") % 256).cast("string"),
    )
    return d.select(
        "doc_id",
        pii_count_expr(synth).cast("bigint").alias("pii_spans"),
        pii_scrub_expr(synth).alias("scrubbed"),
    ).orderBy("doc_id")


def t8_repetition(spark, sf_dir):
    from warcit_spark.functions.text import repetition_ratio_expr

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        repetition_ratio_expr(F.col("text")).alias("rep_ratio"),
    ).orderBy("doc_id")


def cc1_dup_clusters(spark, sf_dir):
    """Connected components over a deterministic near-dup graph
    (operators/graph.py, alternating large-star/small-star — Kiveris et
    al. SoCC'14): chains of 7 docs bridged every 21 ids collapse into 3
    interleaved giant components.  The DuckDB oracle computes the same
    labels via a recursive-CTE transitive closure (tractable at the
    300-node fixture; the Spark side is the O(log^2 n)-round scale
    path)."""
    from warcit_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    e1 = d.where(F.col("doc_id") % 7 != 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst")
    )
    e2 = d.where((F.col("doc_id") % 3 == 0) & (F.col("doc_id") >= 21)).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 21).alias("dst")
    )
    cc = connected_components(e1.unionByName(e2))
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster")
    ).orderBy("doc_id")


def cc2_minhash_clusters(spark, sf_dir):
    """The COMPOSED near-dedup pipeline every training-data user runs, as
    ONE job graph of engine operators end-to-end: MinHash+LSH candidate
    pairs (operators/dedup.py:85) -> connected-component cluster labels
    (operators/graph.py:135) -> keep-one-representative selection (keeper
    = the cluster-minimum doc).  Singleton docs keep themselves.  The
    oracle recomputes the pairs as exact n-gram Jaccard (the banded LSH
    has total recall on this fixture at threshold 0.5 — the same
    equivalence x1 relies on) and the closure with a recursive CTE.
    Reference precedent for composed operators: conversions-inside-
    transclusions, /root/reference/warcit/converter.py:240-277."""
    from warcit_spark.operators.dedup import minhash_lsh_dedup
    from warcit_spark.operators.graph import dup_clusters

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    pairs = minhash_lsh_dedup(d, jaccard_threshold=0.5)
    clusters = dup_clusters(pairs)
    return (
        d.select("doc_id")
        .join(clusters, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("cluster", F.col("doc_id")).alias("cluster"),
        )
        .withColumn("keeper", F.col("doc_id") == F.col("cluster"))
        .orderBy("doc_id")
    )


def pp1_preprocess_pipeline(spark, sf_dir):
    """The composed corpus-preprocessing pipeline, ONE job graph of engine
    operators end-to-end: quality + language + length gate
    (functions/text.py) -> exact dedup keeping the lowest-id
    representative (operators/dedup.py:32) -> deterministic 50% sample
    (operators/sampling.py) — the nightly filter-dedup-sample run of a
    training-data pipeline.  Every stage is an individually oracle-gated
    operator (t1/t2/t3/t4/smp1); this query gates the COMPOSITION.  The
    whole pipeline is two shuffles at scale: the dedup groupBy (the gates
    and the md5 sample are scan-pushable row-local predicates) and the
    final order."""
    from warcit_spark.functions.text import (
        lang_id_expr,
        quality_score_expr,
        token_count_expr,
    )
    from warcit_spark.operators.dedup import exact_dedup
    from warcit_spark.operators.sampling import sample_predicate

    d = _t(spark, sf_dir, "documents")
    gated = d.where(
        (quality_score_expr(F.col("text")) >= 0.1)
        & (lang_id_expr(F.col("text")) == "en")
        & (token_count_expr(F.col("text")) >= 5)
    )
    deduped = exact_dedup(gated)
    return (
        deduped.where(sample_predicate(F.col("doc_id"), 0.5))
        .select("doc_id", "dup_count")
        .orderBy("doc_id")
    )


def cc3_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al., arXiv:2303.09540) end-to-end as engine
    operators: the distributed deterministic k-means quantizer
    (similarity.py:kmeans_centroids, bit-reproducible DECIMAL sums) bounds
    the candidate set, then operators/semdedup.py finds within-cluster
    cosine near-duplicates and greedily keeps the lowest id.  The DuckDB
    oracle replays the SAME two Lloyd iterations in SQL (the x7 replay)
    and spells the pair cosine as Spark's left-assoc folds, so cluster
    assignment AND every threshold compare match bit-for-bit."""
    from warcit_spark.operators.semdedup import semantic_dedup
    from warcit_spark.operators.similarity import kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 256)
    cents = kmeans_centroids(emb, k=4, iters=2)
    return semantic_dedup(emb, cents, threshold=0.35).orderBy("vec_id")


def t10_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/dedup.py:decontaminate): flag
    every training doc sharing any 3-word shingle with the held-out eval
    slice (doc_id % 17 == 3).  Broadcast benchmark-shingle semi-join —
    the train side never shuffles."""
    from warcit_spark.operators.dedup import decontaminate

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    bench = d.where(F.col("doc_id") % 17 == 3)
    train = d.where(F.col("doc_id") % 17 != 3)
    return decontaminate(train, bench, n=3).orderBy("doc_id")


def t11_line_dedup(spark, sf_dir):
    """C4/RefinedWeb-style corpus-wide duplicated-line removal
    (operators/dedup.py:line_dedup): every line whose trimmed form occurs
    in >=2 distinct documents is dropped from ALL of them; survivors are
    rejoined in original order.  The fixture's texts are single-line word
    streams, so the query synthesizes line structure deterministically
    with a literal replace(' the ' -> newline) — plain non-overlapping
    left-to-right string replace, identical in Spark and DuckDB."""
    from warcit_spark.operators.dedup import line_dedup

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    docs = d.select(
        "doc_id",
        F.replace(F.col("text"), F.lit(" the "), F.lit("\n")).alias("text"),
    )
    return line_dedup(docs, min_df=2).orderBy("doc_id")


def t12_gopher_rules(spark, sf_dir):
    """Gopher document-quality gate (functions/text.py: Rae et al. 2021
    §A1.1): word-count window, mean-word-length window, bullet-/ellipsis-
    line fractions, alphabetic-word fraction, required-stopword hits, and
    the conjunction as ``keep``.  All row-local JVM array exprs — the
    filter a 100-TB pipeline pushes into its first full scan.  Line
    structure is synthesized from the single-line fixture texts with two
    deterministic literal replaces (same convention as t11); thresholds
    are narrowed from the paper's so the gate discriminates at fixture
    scale (fixture words 10-99, mean len 3.7-5.3)."""
    from warcit_spark.functions.text import (
        alpha_word_frac_expr,
        bullet_line_frac_expr,
        ellipsis_line_frac_expr,
        gopher_keep_expr,
        mean_word_length_expr,
        required_stopword_hits_expr,
        ws_tokens_expr,
    )

    d = _t(spark, sf_dir, "documents")
    # line synthesis uses NON-stopword vocab words so the required-
    # stopword rule keeps its natural signal (replacing ' the ' would
    # consume most of its own rule's evidence)
    text2 = F.replace(
        F.replace(F.col("text"), F.lit(" key "), F.lit("\n- ")),
        F.lit(" scan "),
        F.lit("...\n"),
    )
    docs = d.select("doc_id", text2.alias("text"))
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.size(ws_tokens_expr(t)).alias("n_words"),
        mean_word_length_expr(t).alias("mean_word_len"),
        alpha_word_frac_expr(t).alias("alpha_frac"),
        required_stopword_hits_expr(t).alias("stop_hits"),
        bullet_line_frac_expr(t).alias("bullet_frac"),
        ellipsis_line_frac_expr(t).alias("ellipsis_frac"),
        gopher_keep_expr(
            t,
            min_words=25,
            max_words=90,
            min_mean_word_len=3.0,
            max_mean_word_len=4.8,
            max_bullet_frac=0.5,
            max_ellipsis_frac=0.4,
            min_alpha_frac=0.8,
            min_stopword_hits=1,
        ).alias("keep"),
    ).orderBy("doc_id")


def t13_repeated_ngrams(spark, sf_dir):
    """Gopher repetition signals: fraction of word-bigram instances
    accounted for by the most frequent bigram, fraction of bigram
    instances that are duplicates, and the trigram top-fraction
    (functions/text.py:top_ngram_frac_expr/dup_ngram_frac_expr).
    Row-local array exprs — zero shuffle; the explode shape documented in
    text.py takes over for book-length docs."""
    from warcit_spark.functions.text import (
        dup_ngram_frac_expr,
        top_ngram_frac_expr,
    )

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        top_ngram_frac_expr(F.col("text"), 2).alias("top_bigram_frac"),
        dup_ngram_frac_expr(F.col("text"), 2).alias("dup_bigram_frac"),
        top_ngram_frac_expr(F.col("text"), 3).alias("top_trigram_frac"),
    ).orderBy("doc_id")


def pack1_chunk_pack(spark, sf_dir):
    """GPT-style concatenate-then-chunk sequence packing
    (operators/packing.py:chunk_pack): docs split across 8 deterministic
    pack streams, concatenated in id order, cut every 256 tokens.  Pure
    window functions; the oracle is the same running-sum arithmetic in
    SQL."""
    from warcit_spark.operators.packing import chunk_pack

    d = _t(spark, sf_dir, "documents")
    return chunk_pack(d, capacity=256, n_buckets=8).orderBy("doc_id")


def pack2_greedy_pack(spark, sf_dir):
    """Greedy next-fit bin packing (operators/packing.py:greedy_pack):
    docs never straddle context windows; inherently a stateful per-stream
    scan, so it runs as Arrow-batched applyInPandas per bucket.  The
    oracle replays the same next-fit recurrence as a recursive CTE."""
    from warcit_spark.operators.packing import greedy_pack

    d = _t(spark, sf_dir, "documents")
    return greedy_pack(d, capacity=256, n_buckets=8).orderBy("doc_id")


def t15_exact_substring(spark, sf_dir):
    """ExactSubstr-style duplicated-span detection (Lee et al. 2022;
    operators/dedup.py:exact_substring_spans): every 4-word shingle
    occurring >=2 times corpus-wide anchors a span; overlapping/adjacent
    anchors merge into maximal per-doc spans (gaps-and-islands).  The
    paper's suffix array becomes two skew-free shuffles + per-doc
    windows."""
    from warcit_spark.operators.dedup import exact_substring_spans

    d = _t(spark, sf_dir, "documents")
    return exact_substring_spans(d, k=4, min_count=2).orderBy(
        "doc_id", "span_start"
    )


def t14_bpe_token_count(spark, sf_dir):
    """Pretokenizer-level (BPE-ish) token budget per document
    (functions/text.py:bpe_token_count_expr): letter runs, single digits,
    single marks — the GPT-2 pretokenizer simplified to classes whose
    semantics match exactly between Java regex and RE2 — next to the
    whitespace count (t1) and a chars-per-token ratio.  Pure JVM
    regexp_extract_all; punctuation is synthesized into the fixture texts
    with deterministic replaces so the mark/digit branches carry data."""
    from warcit_spark.functions.text import (
        BPE_ISH_PATTERN,  # noqa: F401  (documented pattern, shared w/ oracle)
        bpe_token_count_expr,
        token_count_expr,
    )

    d = _t(spark, sf_dir, "documents")
    text2 = F.replace(
        F.replace(F.col("text"), F.lit(" batch "), F.lit(", batch-42 ")),
        F.lit(" window "),
        F.lit(" window. "),
    )
    docs = d.select("doc_id", text2.alias("text"))
    n_bpe = bpe_token_count_expr(F.col("text"))
    return docs.select(
        "doc_id",
        token_count_expr(F.col("text")).alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.when(
            n_bpe > 0,
            F.round(F.length("text").cast("double") / n_bpe, 6),
        )
        .otherwise(F.lit(0.0))
        .alias("chars_per_token"),
    ).orderBy("doc_id")


def f8_url_spam(spark, sf_dir):
    """Frontier-side URL spam/trap scoring (functions/urls.py
    url_spam_score_expr): digit-heavy hosts, deep paths, repeated
    segments (calendar traps), faceted-search query explosions — the
    pre-fetch gate of public CC-derived pipelines.  Row-local regex
    parse (engine-replayable, no parse_url), score pushes to the scan.
    URLs are synthesized deterministically so every signal carries data;
    output = each url's signals + score + keep decision."""
    from warcit_spark.functions.urls import url_spam_score_expr

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    url = F.concat(
        F.lit("http://"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("cdn"), F.col("doc_id") % 97, F.lit("x")))
        .otherwise(F.lit("site")),
        F.lit(".test/"),
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(F.lit("cal/2026/01/cal/2026/01/d"), F.col("doc_id")),
        ).otherwise(F.concat(F.lit("a/b"), (F.col("doc_id") % 3), F.lit("/p"), F.col("doc_id"))),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit("?f1=1&f2=2&f3=3&f4=4"),
        ).otherwise(F.lit("")),
    )
    score = url_spam_score_expr(url)
    return d.select(
        "doc_id",
        url.alias("url"),
        score.alias("spam_score"),
        (score < 0.5).alias("keep"),
    ).orderBy("doc_id")


def g1_pagerank(spark, sf_dir):
    """PageRank over a deterministic directed graph on 200 doc nodes
    (operators/graph.pagerank: power iteration, uniform teleport,
    dangling-mass redistribution, one dst-keyed shuffle per iteration,
    n and dangling mass as broadcast 1-row frames — zero driver
    scalars).  Nodes with doc_id % 11 == 0 have no out-edges, so the
    dangling path carries data.  The oracle unrolls the same three
    iterations as chained CTEs."""
    from warcit_spark.operators.graph import pagerank

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    non_dangling = d.where(F.col("doc_id") % 11 != 0)
    e1 = non_dangling.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % 200).alias("dst"),
    )
    e2 = non_dangling.where(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst")
    )
    pr = pagerank(e1.unionByName(e2), iters=3, damping=0.85)
    return pr.select(F.col("node").alias("doc_id"), "rank").orderBy("doc_id")


def mix1_token_budget(spark, sf_dir):
    """Training-mixture draw under a token budget (operators/mixing.py):
    temperature-scaled per-source weights (alpha=0.5 up-weights small
    sources), integer token allocation per source, then a deterministic
    md5-ranked per-source draw while the running token sum fits.  Two
    tiny-key shuffles + one source-partitioned window; weights rounded
    before the budget multiply so the floor boundary is engine-exact."""
    from warcit_spark.operators.mixing import token_budget_mix

    d = _t(spark, sf_dir, "documents")
    return token_budget_mix(d, budget=10_000, alpha=0.5).orderBy("doc_id")


def smp2_dsir_topk(spark, sf_dir):
    """DSIR importance selection (operators/dsir.py, Xie et al. 2023):
    weight every raw doc by the mean unigram log2-likelihood ratio of a
    Laplace-smoothed target LM (docs with lang='en') vs the raw LM,
    keep the top half of raw docs above the exact median threshold.
    One word-keyed count shuffle + broadcast model join + groupBy(doc)
    — the model never touches the driver.  Oracle replays the identical
    two LMs, smoothing, mean, and quantile_cont threshold."""
    from warcit_spark.operators.dsir import dsir_select

    d = _t(spark, sf_dir, "documents")
    return dsir_select(d, F.col("lang") == "en", keep_frac=0.5).orderBy(
        "doc_id"
    )


def t17_html_text(spark, sf_dir):
    """WET-style visible-text extraction (functions/html.py): drop
    script/style/head subtrees + comments, strip tags, decode the six
    high-frequency entities, collapse whitespace; plus <title> capture.
    Pure JVM regexp chain (zero UDFs, row-local).  The fixture's html is
    synthesized from documents.text with the same deterministic concat
    in both engines, so every branch (dropped subtree, comment, entity,
    undecoded &copy; passthrough) carries data."""
    from warcit_spark.functions.html import html_text_expr, html_title_expr

    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><!-- id "),
        F.col("doc_id"),
        F.lit(" --><head><title>Doc "),
        F.col("doc_id"),
        F.lit(" &amp; friends</title><style>p{color:red}</style></head>"),
        F.lit('<body><script type="text/javascript">var x = 1 < 2;</script><p>'),
        F.replace(F.col("text"), F.lit(". "), F.lit(".</p> <p>")),
        F.lit("</p><div>&copy; corp&nbsp;&quot;q&#39;s&quot; &lt;tag&gt;</div>"),
        F.lit("</body></html>"),
    )
    return d.select(
        "doc_id",
        html_title_expr(html).alias("title"),
        html_text_expr(html).alias("text"),
        F.length(html_text_expr(html)).alias("n_chars"),
    ).orderBy("doc_id")


def t16_lm_ppl_buckets(spark, sf_dir):
    """CCNet-style quality bucketing (operators/lm_quality.py): score
    every doc's perplexity under a Laplace-smoothed char-bigram LM
    trained on the corpus itself, then split head/middle/tail at the
    exact corpus tertiles.  Train = one map-side-combined shuffle over
    <= V^2 keys; scoring = ZERO-shuffle row-local map-literal lookup
    (the k-means-codebook transport pattern); buckets = percentile agg
    + 1-row broadcast.  Oracle replays the identical model, smoothing,
    log2 sums, and quantile_cont tertiles in SQL."""
    from warcit_spark.operators.lm_quality import lm_quality_buckets

    d = _t(spark, sf_dir, "documents")
    return lm_quality_buckets(d).orderBy("doc_id")


def t9_tfidf_topk(spark, sf_dir):
    """Per-document top-3 characteristic terms by tf·(N/df) — the
    inverted-index + window pattern (functions/text.tfidf_topk_terms).
    Linear idf keeps the value oracle exact (log() differs in the last
    ulp between the JVM and libm)."""
    from warcit_spark.functions.text import tfidf_topk_terms

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    return tfidf_topk_terms(d, k=3).orderBy("doc_id", "rank")


def smp1_stratified_sample(spark, sf_dir):
    """Deterministic per-host stratified sampling (operators/sampling.py):
    md5(url) compared against exact per-stratum hex thresholds — the
    reproducible-everywhere corpus-sampling primitive (no RNG state, pure
    scan-pushable filter; the oracle embeds the same thresholds)."""
    from warcit_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    host = F.concat(F.lit("docs"), F.col("doc_id") % 7, F.lit(".test"))
    url = F.concat(F.lit("http://"), host, F.lit("/p"), F.col("doc_id"))
    pages = d.select(url.alias("url"), host.alias("host"))
    rates = {f"docs{i}.test": (i + 1) / 10 for i in range(7)}
    out = stratified_sample(pages, "url", "host", rates)
    return out.groupBy("host").agg(F.count("*").alias("n_sampled")).orderBy("host")


def x4_asof_join(spark, sf_dir):
    from warcit_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(F.max("o_orderkey").alias("last_orderkey"))
    )
    out = asof_join(e, o, on="ts", by="user_id", right_cols=["last_orderkey"])
    return out.select("event_id", "user_id", "last_orderkey").orderBy("event_id")


def x5_range_join(spark, sf_dir):
    from warcit_spark.operators.asof import range_join

    l = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .select("o_orderpriority", "o_orderdate")
        .withColumn("o_end", F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
    )
    out = range_join(l, o, "l_shipdate", "o_orderdate", "o_end",
                     bucket_seconds=30 * 86400)
    return (
        out.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("o_orderpriority")
    )


def q5_local_supplier(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .where(c["c_nationkey"] == s["s_nationkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(rev.cast("decimal(18,4)")).cast("double"), 4).alias("revenue"))
        .orderBy("r_name", "n_name")
    )


def set1_intersect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    p = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return f.intersect(p).orderBy("o_custkey")


def set2_except(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    p = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    return f.exceptAll(p).orderBy("o_custkey")


def w4_running_total(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.round(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"), 2
    )
    return o.select(
        "o_custkey", "o_orderkey", running.alias("running_total")
    ).orderBy("o_custkey", "o_orderkey")


def t6_levenshtein(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("p_name"), F.lit("small widget"))
    return (
        p.select("p_partkey", "p_name", dist.alias("edit_dist"))
        .where(F.col("edit_dist") <= 5)
        .orderBy("p_partkey")
    )


def a6_median(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", 0.5), 6).alias("median_qty"),
            F.round(F.percentile("l_extendedprice", 0.5), 6).alias("median_price"),
        )
        .orderBy("l_returnflag")
    )


def f9_surt(spark, sf_dir):
    """SURT canonical keys (functions/urls.surt_expr) — the CDX lookup
    key pywb/OpenWayback index warcit-produced WARCs under: lowercase,
    scheme/fragment/userinfo dropped, ``www``-label stripped, default
    port dropped, host labels reversed comma-joined, query params
    sorted.  Pure row-local JVM regex parse (engine-replayable); the key
    pushes into the scan.  URLs are synthesized so every rule carries
    data: mixed-case scheme+host, www/non-www, default/non-default
    ports, empty paths, unsorted mixed-case queries, fragments."""
    from warcit_spark.functions.urls import surt_expr

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".Example.COM"),
        # %4==0 rows are even -> scheme http, so :80 is the DEFAULT port
        # (dropped); %4==1 rows are odd -> https, so :8080 is kept
        F.when(F.col("doc_id") % 4 == 0, F.lit(":80"))
        .when(F.col("doc_id") % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/A/B"), F.col("doc_id").cast("string"))
        ),
        F.when(F.col("doc_id") % 6 == 0, F.lit("?b=2&A=1")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("#Frag")).otherwise(F.lit("")),
    )
    return d.select(
        "doc_id", url.alias("url"), surt_expr(url).alias("surt")
    ).orderBy("doc_id")


def g2_degree_stats(spark, sf_dir):
    """Link-graph degree + reciprocity features (operators/graph.
    degree_stats) over the same deterministic 200-node edge set as
    g1_pagerank — out/in-degree via two map-side-combined groupBys,
    reciprocity via one reversed-key self-semi-join; one row per node.
    The formula graph contains genuine reciprocal pairs (e.g.
    133<->134), so the recip path carries data."""
    from warcit_spark.operators.graph import degree_stats

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    non_dangling = d.where(F.col("doc_id") % 11 != 0)
    e1 = non_dangling.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % 200).alias("dst"),
    )
    e2 = non_dangling.where(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst")
    )
    out = degree_stats(e1.unionByName(e2))
    return out.select(F.col("node").alias("doc_id"), "out_deg", "in_deg",
                      "recip_deg", "recip_ratio").orderBy("doc_id")


def g3_hits(spark, sf_dir):
    """HITS hubs-and-authorities (operators/graph.hits, Kleinberg 1999)
    over the g1 edge set, 2 L1-normalized iterations — per half-step one
    dst-(resp. src-)keyed shuffle plus a broadcast 1-row normalizer,
    zero driver scalars.  The oracle unrolls the same two iterations as
    chained CTEs."""
    from warcit_spark.operators.graph import hits

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    non_dangling = d.where(F.col("doc_id") % 11 != 0)
    e1 = non_dangling.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 3) % 200).alias("dst"),
    )
    e2 = non_dangling.where(F.col("doc_id") % 5 != 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") - 1).alias("dst")
    )
    h = hits(e1.unionByName(e2), iters=2)
    return h.select(F.col("node").alias("doc_id"), "hub", "auth").orderBy("doc_id")


def t18_blocklist(spark, sf_dir):
    """C4-style blocklist gate (functions/text.blocklist_hits_expr,
    Raffel et al. 2020: drop any page containing a listed word) — one
    word-boundary case-insensitive JVM regex test per list word, summed;
    row-local, the keep predicate pushes into the scan.  The list is
    drawn from the fixture vocabulary so both branches carry data."""
    from warcit_spark.functions.text import blocklist_hits_expr

    words = ["slow", "stream", "vector"]
    d = _t(spark, sf_dir, "documents")
    hits_col = blocklist_hits_expr(F.col("text"), words)
    return d.select(
        "doc_id",
        hits_col.alias("n_blocked"),
        (hits_col == 0).alias("keep"),
    ).orderBy("doc_id")


def cr1_recrawl_schedule(spark, sf_dir):
    """Adaptive re-crawl scheduling (operators/recrawl.recrawl_schedule,
    Cho & Garcia-Molina 2003): per-URL change rate from consecutive
    fetch-digest flips (lag window, event_id tie-break), linear-blend
    interval between 1h and 24h, next-due epoch.  One url-keyed shuffle
    shared by the window and the aggregate.  Fetch history is derived
    from the events fixture: page identity from user_id, digest from
    event_type (so consecutive same-type fetches read 'unchanged')."""
    from warcit_spark.operators.recrawl import recrawl_schedule

    e = _t(spark, sf_dir, "events")
    hist = e.select(
        F.concat(
            F.lit("http://site"),
            (F.col("user_id") % 25).cast("string"),
            F.lit(".test/page/"),
            F.col("user_id").cast("string"),
        ).alias("url"),
        "ts",
        F.col("event_type").alias("digest"),
        "event_id",
    )
    return recrawl_schedule(
        hist,
        base_interval_sec=86400.0,
        min_interval_sec=3600.0,
        order_cols=("event_id",),
    ).orderBy("url")


def a7_anchor_text(spark, sf_dir):
    """WAT-style anchor-text aggregation per target URL (operators/
    links.anchor_text_agg): fused two-group regexp_extract_all +
    arrays_zip extraction, the frontier's own resolve+canonicalize
    exprs, then (target,text)->target map-side-combined groupBys — total
    inlink anchors, distinct non-empty texts, modal anchor (ties
    lexicographic).  Synthesized HTML carries absolute + root-relative +
    non-crawlable (mailto) hrefs and an empty-text repeat anchor, so
    every path carries data."""
    from warcit_spark.operators.links import anchor_text_agg

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    html = F.concat(
        F.lit('<html><body><a href="http://t'),
        (F.col("doc_id") % 20).cast("string"),
        F.lit('.test/p">read '),
        F.col("lang"),
        F.lit("</a>"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit('<a href="/x'),
                (F.col("doc_id") % 5).cast("string"),
                F.lit('">more</a>'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit('<a class="z" href="http://t'),
                (F.col("doc_id") % 20).cast("string"),
                F.lit('.test/p"></a>'),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit('<a href="mailto:a@b">mail</a>'),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = d.select(
        F.concat(
            F.lit("http://h"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".test/dir/page"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return anchor_text_agg(pages).orderBy("target_url")


def t19_bpe_merges(spark, sf_dir):
    """Distributed BPE merge training (operators/bpe.py, Sennrich et al.
    2016): 4 merges over the documents corpus — corpus collapses to the
    distinct-word table in ONE map-side-combined shuffle, then per merge
    one pair-keyed groupBy + TakeOrdered(1) + broadcast 1-row winner and
    a row-local greedy-leftmost fold fusion (zero driver scalars).  The
    oracle replays each iteration: same pair counts from the
    space-joined symbol string, same (count desc, pair asc) arg-max,
    fusion as a recursive-CTE fixpoint of non-overlapping replace
    (equivalent to the greedy leftmost fold: merged tokens are atomic,
    so passes only ever consume original-symbol pairs)."""
    from warcit_spark.operators.bpe import bpe_train_merges

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    return bpe_train_merges(d, n_merges=4).orderBy("step")


def a8_host_quality(spark, sf_dir):
    """Domain-reputation aggregate (operators/host_stats.
    host_quality_shrunk): per-host doc count, raw mean quality, and the
    empirical-Bayes shrunk mean (prior weight 25 pseudo-docs toward the
    corpus mean) — the host-tier gate of CC-derived pipelines.  One
    corpus groupBy, one host-cardinality aggregation, 1-row global as a
    broadcast frame; per-doc scores summed as DECIMAL(18,6) so the whole
    thing is bit-reproducible and SQL-replayed exactly.  `source` stands
    in as the host key on the fixture."""
    from warcit_spark.functions.text import quality_score_expr
    from warcit_spark.operators.host_stats import host_quality_shrunk

    d = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("host"),
        quality_score_expr(F.col("text")).alias("quality"),
    )
    return host_quality_shrunk(d, prior_weight=25.0).orderBy("host")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": q1_pricing_summary,
        "q3_top_revenue_orders": q3_top_revenue_orders,
        "f1_include_exclude": f1_include_exclude,
        "f2_url_synthesis": f2_url_synthesis,
        "f3_mime_chain": f3_mime_chain,
        "f6_ts_normalize": f6_ts_normalize,
        "f7_json_extract": f7_json_extract,
        "crawl_canonicalize": crawl_canonicalize,
        "crawl_host_counts": crawl_host_counts,
        "j1_suffix_join": j1_suffix_join,
        "j2_broadcast_equi_join": j2_broadcast_equi_join,
        "j4_equi_join_pushdown": j4_equi_join_pushdown,
        "j5_anti_join_seen": j5_anti_join_seen,
        "j5b_semi_join": j5b_semi_join,
        "d1_revisit_derivation": d1_revisit_derivation,
        "a2_reverse_index": a2_reverse_index,
        "a3_rollup": a3_rollup,
        "a4_distinct_agg": a4_distinct_agg,
        "a5_pivot_manual": a5_pivot_manual,
        "w1_politeness_topk": w1_politeness_topk,
        "w2_sessionize": w2_sessionize,
        "w3_tumbling_window": w3_tumbling_window,
        "t1_token_count": t1_token_count,
        "t2_quality_score": t2_quality_score,
        "t3_lang_id": t3_lang_id,
        "t4_exact_dedup": t4_exact_dedup,
        "t5_ngram_jaccard": t5_ngram_jaccard,
        "x1_minhash_lsh": x1_minhash_lsh,
        "x2_simhash": x2_simhash,
        "ann1_cosine_topk": ann1_cosine_topk,
        "ann2_embedding_neardup": ann2_embedding_neardup,
        "x3_lsh_ann": x3_lsh_ann,
        "x6_ivf_ann": x6_ivf_ann,
        "x7_ivf_kmeans": x7_ivf_kmeans,
        "t7_pii_scrub": t7_pii_scrub,
        "t8_repetition": t8_repetition,
        "cc1_dup_clusters": cc1_dup_clusters,
        "cc2_minhash_clusters": cc2_minhash_clusters,
        "cc3_semantic_dedup": cc3_semantic_dedup,
        "t10_decontaminate": t10_decontaminate,
        "t11_line_dedup": t11_line_dedup,
        "t12_gopher_rules": t12_gopher_rules,
        "t13_repeated_ngrams": t13_repeated_ngrams,
        "pack1_chunk_pack": pack1_chunk_pack,
        "pack2_greedy_pack": pack2_greedy_pack,
        "t14_bpe_token_count": t14_bpe_token_count,
        "t15_exact_substring": t15_exact_substring,
        "t16_lm_ppl_buckets": t16_lm_ppl_buckets,
        "t17_html_text": t17_html_text,
        "smp2_dsir_topk": smp2_dsir_topk,
        "mix1_token_budget": mix1_token_budget,
        "g1_pagerank": g1_pagerank,
        "f8_url_spam": f8_url_spam,
        "pp1_preprocess_pipeline": pp1_preprocess_pipeline,
        "t9_tfidf_topk": t9_tfidf_topk,
        "smp1_stratified_sample": smp1_stratified_sample,
        "x4_asof_join": x4_asof_join,
        "x5_range_join": x5_range_join,
        "q5_local_supplier": q5_local_supplier,
        "set1_intersect": set1_intersect,
        "set2_except": set2_except,
        "w4_running_total": w4_running_total,
        "t6_levenshtein": t6_levenshtein,
        "a6_median": a6_median,
        "f9_surt": f9_surt,
        "g2_degree_stats": g2_degree_stats,
        "g3_hits": g3_hits,
        "t18_blocklist": t18_blocklist,
        "cr1_recrawl_schedule": cr1_recrawl_schedule,
        "a7_anchor_text": a7_anchor_text,
        "t19_bpe_merges": t19_bpe_merges,
        "a8_host_quality": a8_host_quality,
    }


# =========================================================================
# oracle SQL (DuckDB) — same aliases, same values
# =========================================================================
_EN_STOPWORDS_SQL = (
    "['the','and','of','to','a','in','is','it','that','for',"
    "'on','with','as','was','at','by','this','be','are','or']"
)

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z]+'), w -> w <> '')"
_WORDS09_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"

# PII regexes shared verbatim with the engine (functions/text.py) — simple
# character classes only, identical in Java regex and RE2
from warcit_spark.functions.text import (  # noqa: E402
    PII_EMAIL_RE as _PII_EMAIL_RE,
    PII_IPV4_RE as _PII_IPV4_RE,
    PII_PHONE_RE as _PII_PHONE_RE,
)
# NB: the single quote is doubled for embedding in a single-quoted SQL literal
_PUNCT_SQL = r"""[.,!?;:''"()\[\]{}<>-]"""


# The fixture documents' token vocabulary (TESTDATA.md corpus generator) —
# fixed across scale factors, verified at sf0.001/0.01/0.1.  The x2 oracle
# embeds xxhash64(word) literals for exactly these; an out-of-vocabulary
# token would LEFT-JOIN to a NULL hash and surface as a value mismatch
# (loud), never a silent pass.
_FIXTURE_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


def _x2_oracle_sql() -> str:
    """DuckDB twin of x2 (simhash): per-token xxhash64 values are computed
    driver-side (functions/text.py xxhash64_py reimplements Spark's
    F.xxhash64 bit-for-bit, pinned by test) and embedded as literals for
    the fixture vocabulary; tokenization, bit-voting, and the signed-64
    reinterpretation are then pure SQL."""
    from warcit_spark.functions.text import xxhash64_py

    vals = ",\n        ".join(
        f"('{w}', {xxhash64_py(w.encode()) & ((1 << 64) - 1)}::UBIGINT)"
        for w in _FIXTURE_VOCAB
    )
    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS w
          FROM documents WHERE doc_id < 200
        ),
        wh(w, h) AS (VALUES {vals}),
        th AS (
          -- vocabulary-drift guard: an out-of-vocabulary token must fail
          -- the oracle LOUDLY (error()), never silently skew the bit-vote
          -- denominator with a NULL hash
          SELECT t.doc_id,
                 CASE WHEN wh.h IS NULL
                      THEN CAST(error('x2 oracle: token outside fixture vocabulary: ' || t.w) AS UBIGINT)
                      ELSE wh.h END AS h
          FROM toks t LEFT JOIN wh ON t.w = wh.w
          WHERE t.w <> ''
        ),
        bits AS (
          SELECT doc_id, b AS bit,
                 SUM(CAST((h >> CAST(b AS UBIGINT)) & 1::UBIGINT AS INT)) AS ones,
                 COUNT(*) AS n
          FROM th, (SELECT unnest(range(64)) AS b)
          GROUP BY doc_id, b
        ),
        sh AS (
          SELECT doc_id,
                 SUM(CASE WHEN ones * 2 > n
                          THEN CAST(1::HUGEINT << CAST(bit AS INT) AS HUGEINT)
                          ELSE 0 END) AS u
          FROM bits GROUP BY doc_id
        )
        SELECT doc_id AS id,
               CAST(u - CASE WHEN u >= 9223372036854775808
                             THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS simhash
        FROM sh ORDER BY id
    """


def _x6_oracle_sql() -> str:
    """DuckDB twin of x6 (IVF ANN): the random-Voronoi centroids are
    data-independent (murmur3-derived, ivf_random_centroids), so both the
    per-row assignment argmin and the query's probe set are reproduced in
    SQL from centroid literals.  The distance score is written as the
    SAME left-associated chain Spark's fold evaluates
    (``|c|^2 - 2.0*(0.0 + v[1]*c1 + ...)``) so IEEE arithmetic — and
    therefore Voronoi boundaries and tie-breaks (lowest index) — match
    bit-for-bit."""
    from warcit_spark.operators.similarity import ivf_random_centroids

    K, DIM, NPROBE = 8, 64, 2
    cents = ivf_random_centroids(k=K, dim=DIM)
    score_cols = []
    for i, c in enumerate(cents):
        c2 = sum(x * x for x in c)
        terms = " + ".join(f"v[{d + 1}]*{c[d]!r}" for d in range(DIM))
        score_cols.append(f"{c2!r} - 2.0 * (0.0 + {terms}) AS s{i}")
    least = "least(" + ", ".join(f"s{i}" for i in range(K)) + ")"
    first_match = " ".join(f"WHEN s{i} = m THEN {i}" for i in range(K))
    qs_structs = ", ".join(
        "{" + f"'s': s{i}, 'i': {i}" + "}" for i in range(K)
    )
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        sc AS (SELECT vec_id, v, {', '.join(score_cols)} FROM b),
        a AS (SELECT vec_id, v, CASE {first_match} END AS cid
              FROM (SELECT *, {least} AS m FROM sc)),
        qs AS (SELECT unnest([{qs_structs}]) AS u FROM sc WHERE vec_id = 0),
        probe AS (SELECT u.i AS i FROM qs ORDER BY u.s ASC, u.i ASC LIMIT {NPROBE})
        SELECT vec_id,
               round(list_cosine_similarity(v, (SELECT v FROM b WHERE vec_id = 0)), 6) AS cosine
        FROM a
        WHERE cid IN (SELECT i FROM probe)
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """


def _x7_oracle_sql() -> str:
    """DuckDB twin of x7 (IVF with the k-means quantizer): replays the two
    Lloyd iterations IN SQL.

    Why this is exact: kmeans_centroids sums each dimension as
    DECIMAL(30,12) — element quantization at the cast, integer-exact
    addition — so the per-cluster sums are order-independent and identical
    in both engines; the mean is a single float division of the exact sum.
    Assignment scores are spelled as the SAME left-assoc chain Spark's
    fold evaluates (``(0.0 + c[1]*c[1] + ...) - 2.0*(0.0 + v[1]*c[1] +
    ...)``), and the argmin tie-break (lowest centroid id) is a
    lexicographic struct min.  Empty clusters keep their previous centroid
    (LEFT JOIN + coalesce), mirroring the Spark driver loop.
    """
    K, ITERS, NPROBE = 4, 2, 2
    DIM, CAP = 64, 256

    def chain(terms):  # left-assoc: (0.0 + t1 + t2 + ...)
        return "(0.0 + " + " + ".join(terms) + ")"

    def score(c, v):  # c2(c) - 2.0 * dot(v, c), Spark's fold shape
        c2 = chain([f"{c}[{d+1}]*{c}[{d+1}]" for d in range(DIM)])
        dot = chain([f"{v}[{d+1}]*{c}[{d+1}]" for d in range(DIM)])
        return f"({c2} - 2.0*{dot})"

    mean_list = ", ".join(
        f"CAST(sum(CAST(v[{d+1}] AS DECIMAL(30,12))) AS DOUBLE)/count(*)"
        for d in range(DIM)
    )
    ctes = [
        f"b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < {CAP})",
        f"c0 AS (SELECT vec_id AS cid, v AS c FROM b WHERE vec_id < {K})",
    ]
    prev = "c0"
    for it in range(1, ITERS + 1):
        ctes.append(
            f"a{it} AS (SELECT e.vec_id, e.v, "
            f"min(struct_pack(s := {score('c.c', 'e.v')}, i := c.cid)) AS m "
            f"FROM b e CROSS JOIN {prev} c GROUP BY e.vec_id, e.v)"
        )
        ctes.append(
            f"g{it} AS (SELECT (m).i AS cid, [{mean_list}] AS c "
            f"FROM a{it} GROUP BY (m).i)"
        )
        ctes.append(
            f"c{it} AS (SELECT {prev}.cid, coalesce(g{it}.c, {prev}.c) AS c "
            f"FROM {prev} LEFT JOIN g{it} USING (cid))"
        )
        prev = f"c{it}"
    ctes.append(
        f"af AS (SELECT e.vec_id, e.v, "
        f"min(struct_pack(s := {score('c.c', 'e.v')}, i := c.cid)) AS m "
        f"FROM b e CROSS JOIN {prev} c GROUP BY e.vec_id, e.v)"
    )
    ctes.append(
        f"qs AS (SELECT c.cid AS i, {score('c.c', 'q.v')} AS s "
        f"FROM {prev} c CROSS JOIN (SELECT v FROM b WHERE vec_id = 0) q)"
    )
    ctes.append(f"probe AS (SELECT i FROM qs ORDER BY s ASC, i ASC LIMIT {NPROBE})")
    return (
        "WITH " + ",\n        ".join(ctes) + "\n"
        "        SELECT vec_id,\n"
        "               round(list_cosine_similarity(v, (SELECT v FROM b WHERE vec_id = 0)), 6) AS cosine\n"
        "        FROM af\n"
        "        WHERE (m).i IN (SELECT i FROM probe)\n"
        "        ORDER BY cosine DESC, vec_id ASC\n"
        "        LIMIT 10"
    )


def _cc3_oracle_sql() -> str:
    """DuckDB twin of cc3 (SemDeDup): replays the x7 k-means (two Lloyd
    iterations, DECIMAL-exact sums — see _x7_oracle_sql for why that is
    bit-reproducible), then spells the within-cluster pair cosine as the
    SAME left-assoc folds Spark's cosine_expr evaluates
    (dot/(sqrt(n2a)*sqrt(n2b))), rounded to 6 dp before the threshold
    compare on both engines — so assignment, every pair test, and the
    greedy lowest-id-wins drop rule match bit-for-bit."""
    K, ITERS = 4, 2
    DIM, CAP, THRESH = 64, 256, 0.35

    def chain(terms):  # left-assoc: (0.0 + t1 + t2 + ...)
        return "(0.0 + " + " + ".join(terms) + ")"

    def score(c, v):  # c2(c) - 2.0 * dot(v, c), Spark's fold shape
        c2 = chain([f"{c}[{d+1}]*{c}[{d+1}]" for d in range(DIM)])
        dot = chain([f"{v}[{d+1}]*{c}[{d+1}]" for d in range(DIM)])
        return f"({c2} - 2.0*{dot})"

    def cos(a, b):  # Spark cosine_expr: dot / (sqrt(n2a) * sqrt(n2b))
        dot = chain([f"{a}[{d+1}]*{b}[{d+1}]" for d in range(DIM)])
        n2a = chain([f"{a}[{d+1}]*{a}[{d+1}]" for d in range(DIM)])
        n2b = chain([f"{b}[{d+1}]*{b}[{d+1}]" for d in range(DIM)])
        return f"({dot} / (sqrt({n2a}) * sqrt({n2b})))"

    mean_list = ", ".join(
        f"CAST(sum(CAST(v[{d+1}] AS DECIMAL(30,12))) AS DOUBLE)/count(*)"
        for d in range(DIM)
    )
    ctes = [
        f"b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < {CAP})",
        f"c0 AS (SELECT vec_id AS cid, v AS c FROM b WHERE vec_id < {K})",
    ]
    prev = "c0"
    for it in range(1, ITERS + 1):
        ctes.append(
            f"a{it} AS (SELECT e.vec_id, e.v, "
            f"min(struct_pack(s := {score('c.c', 'e.v')}, i := c.cid)) AS m "
            f"FROM b e CROSS JOIN {prev} c GROUP BY e.vec_id, e.v)"
        )
        ctes.append(
            f"g{it} AS (SELECT (m).i AS cid, [{mean_list}] AS c "
            f"FROM a{it} GROUP BY (m).i)"
        )
        ctes.append(
            f"c{it} AS (SELECT {prev}.cid, coalesce(g{it}.c, {prev}.c) AS c "
            f"FROM {prev} LEFT JOIN g{it} USING (cid))"
        )
        prev = f"c{it}"
    ctes.append(
        f"af AS (SELECT e.vec_id, e.v, "
        f"min(struct_pack(s := {score('c.c', 'e.v')}, i := c.cid)) AS m "
        f"FROM b e CROSS JOIN {prev} c GROUP BY e.vec_id, e.v)"
    )
    ctes.append(
        "drp AS (SELECT DISTINCT y.vec_id FROM af x JOIN af y "
        "ON (x.m).i = (y.m).i AND x.vec_id < y.vec_id "
        f"WHERE round({cos('x.v', 'y.v')}, 6) >= {THRESH})"
    )
    return (
        "WITH " + ",\n        ".join(ctes) + "\n"
        "        SELECT a.vec_id,\n"
        "               CAST((a.m).i AS INT) AS cluster,\n"
        "               a.vec_id NOT IN (SELECT vec_id FROM drp) AS keep\n"
        "        FROM af a\n"
        "        ORDER BY a.vec_id"
    )


def _smp1_oracle_sql() -> str:
    """DuckDB twin of smp1: md5() hex digests are identical in every
    engine, so the per-host thresholds (exact ``floor(rate * 2^128)`` hex
    literals from sampling.rate_threshold_hex) reproduce the sample
    bit-for-bit — no hash-function twin needed."""
    from warcit_spark.operators.sampling import rate_threshold_hex

    cases = " ".join(
        f"WHEN 'docs{i}.test' THEN '{rate_threshold_hex((i + 1) / 10)}'"
        for i in range(7)
    )
    return f"""
        SELECT host, count(*) AS n_sampled FROM (
          SELECT 'docs' || (doc_id % 7) || '.test' AS host,
                 'http://docs' || (doc_id % 7) || '.test/p' || doc_id AS url
          FROM documents
        ) p
        WHERE md5(url) < CASE host {cases} END
        GROUP BY host
        ORDER BY host
    """


def _x3_oracle_sql() -> str:
    """DuckDB twin of x3: reproduces the SRP buckets exactly.

    The hyperplane sign matrix is murmur3-derived but deterministic, so it
    is materialized driver-side (srp_plane_signs reimplements Spark's
    F.hash bit-for-bit) and embedded as SQL literals; bucket membership,
    multi-probe Hamming filter, scoring, and top-k are then pure SQL.
    """
    from warcit_spark.operators.similarity import srp_plane_signs

    terms = []
    for p, plane in enumerate(srp_plane_signs(n_planes=4, dim=64)):
        arr = "[" + ",".join(str(s) for s in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product(v, {arr}) >= 0 THEN {1 << p} ELSE 0 END)"
        )
    bucket = "\n               + ".join(terms)
    return f"""
        WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        bk AS (SELECT vec_id, v,
                 {bucket} AS bucket
               FROM b),
        q AS (SELECT v AS qv, bucket AS qb FROM bk WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(v, (SELECT qv FROM q)), 6) AS cosine
        FROM bk
        WHERE bit_count(xor(bucket, (SELECT qb FROM q))) <= 1
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # x1's LSH output on the fixtures has total recall vs exact n-gram
    # Jaccard at the same threshold (verified in tests), so t5's SQL is a
    # valid value oracle for it; x2's xxhash64 signatures and x3's SRP
    # buckets are reproduced exactly in SQL above (driver-side pure-Python
    # hash twins embedded as literals).
    d["x1_minhash_lsh"] = d["t5_ngram_jaccard"]
    d["x2_simhash"] = _x2_oracle_sql()
    d["x3_lsh_ann"] = _x3_oracle_sql()
    d["x6_ivf_ann"] = _x6_oracle_sql()
    d["x7_ivf_kmeans"] = _x7_oracle_sql()
    d["cc3_semantic_dedup"] = _cc3_oracle_sql()
    d["t10_decontaminate"] = f"""
        WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
        w AS (SELECT doc_id, {_WORDS09_SQL} AS ws FROM d),
        sh AS (
          SELECT doc_id,
                 unnest(list_filter(list_distinct(list_transform(
                   generate_series(1, greatest(len(ws)-2, 1)),
                   i -> array_to_string(ws[i:i+2], ' '))), s -> s <> '')) AS s
          FROM w),
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 17 = 3),
        hits AS (SELECT DISTINCT doc_id FROM sh
                 WHERE doc_id % 17 <> 3 AND s IN (SELECT s FROM bench))
        SELECT doc_id,
               doc_id IN (SELECT doc_id FROM hits) AS contaminated
        FROM d WHERE doc_id % 17 <> 3
        ORDER BY doc_id
    """
    d["t11_line_dedup"] = """
        WITH d AS (SELECT doc_id, replace(text, ' the ', chr(10)) AS text
                   FROM documents WHERE doc_id < 500),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
        l AS (SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(ls)),
                            i -> struct_pack(pos := i, line := ls[i]))) AS s
              FROM ls),
        nb AS (SELECT doc_id, (s).pos AS pos, (s).line AS line,
                      trim((s).line) AS norm
               FROM l WHERE trim((s).line) <> ''),
        dup AS (SELECT norm FROM (SELECT norm, count(DISTINCT doc_id) AS c
                                  FROM nb GROUP BY norm) WHERE c >= 2),
        kept AS (SELECT doc_id, pos, line FROM nb
                 WHERE norm NOT IN (SELECT norm FROM dup)),
        agg AS (SELECT doc_id,
                       string_agg(line, chr(10) ORDER BY pos) AS text_clean,
                       count(*) AS lines_kept
                FROM kept GROUP BY doc_id),
        tot AS (SELECT doc_id, count(*) AS n FROM nb GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(agg.text_clean, '') AS text_clean,
               CAST(coalesce(agg.lines_kept, 0) AS INT) AS lines_kept,
               CAST(coalesce(tot.n, 0) - coalesce(agg.lines_kept, 0) AS INT)
                 AS lines_removed
        FROM d LEFT JOIN agg USING (doc_id) LEFT JOIN tot USING (doc_id)
        ORDER BY d.doc_id
    """
    # Gopher quality gate — identical replaces, splits, rounds, thresholds
    # as t12_gopher_rules (functions/text.py exprs).
    d["t12_gopher_rules"] = r"""
        WITH d AS (
          SELECT doc_id,
                 replace(replace(text, ' key ', chr(10) || '- '),
                         ' scan ', '...' || chr(10)) AS text
          FROM documents),
        b AS (
          SELECT doc_id,
                 list_filter(string_split_regex(trim(text), '\s+'),
                             w -> w <> '') AS ws,
                 list_filter(string_split(text, chr(10)),
                             l -> trim(l) <> '') AS ls
          FROM d),
        c AS (
          SELECT doc_id,
                 len(ws) AS n_words,
                 CASE WHEN len(ws) > 0 THEN round(
                        CAST(list_aggregate(list_transform(ws, w -> len(w)),
                                            'sum') AS DOUBLE) / len(ws), 6)
                      ELSE 0.0 END AS mean_word_len,
                 CASE WHEN len(ws) > 0 THEN round(
                        CAST(len(list_filter(ws,
                               w -> regexp_matches(w, '[A-Za-z]')))
                             AS DOUBLE) / len(ws), 6)
                      ELSE 0.0 END AS alpha_frac,
                 len(list_filter(
                       ['the','be','to','of','and','that','have','with'],
                       s -> list_contains(ws, s))) AS stop_hits,
                 CASE WHEN len(ls) > 0 THEN round(
                        CAST(len(list_filter(ls,
                               l -> starts_with(trim(l), '- ')
                                    OR starts_with(trim(l), '* ')))
                             AS DOUBLE) / len(ls), 6)
                      ELSE 0.0 END AS bullet_frac,
                 CASE WHEN len(ls) > 0 THEN round(
                        CAST(len(list_filter(ls,
                               l -> ends_with(trim(l), '...')))
                             AS DOUBLE) / len(ls), 6)
                      ELSE 0.0 END AS ellipsis_frac
          FROM b)
        SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
               bullet_frac, ellipsis_frac,
               (n_words BETWEEN 25 AND 90
                AND mean_word_len >= 3.0 AND mean_word_len <= 4.8
                AND bullet_frac <= 0.5 AND ellipsis_frac <= 0.4
                AND alpha_frac >= 0.8 AND stop_hits >= 1) AS keep
        FROM c ORDER BY doc_id
    """
    # Repeated-n-gram fractions — same grams (space-joined, words_expr
    # tokenization), same round(.,6).  DuckDB slices are 1-based inclusive:
    # ws[i:i+1] is the bigram at i, ws[i:i+2] the trigram.
    d["t13_repeated_ngrams"] = f"""
        WITH d AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
        g AS (
          SELECT doc_id,
                 list_transform(generate_series(1, len(ws) - 1),
                                i -> array_to_string(ws[i:i+1], ' ')) AS g2,
                 list_transform(generate_series(1, len(ws) - 2),
                                i -> array_to_string(ws[i:i+2], ' ')) AS g3
          FROM d)
        SELECT doc_id,
               CASE WHEN len(g2) > 0 THEN round(
                      CAST(list_max(list_transform(list_distinct(g2),
                             x -> len(list_filter(g2, y -> y = x))))
                           AS DOUBLE) / len(g2), 6)
                    ELSE 0.0 END AS top_bigram_frac,
               CASE WHEN len(g2) > 0 THEN round(
                      CAST(len(g2) - len(list_filter(list_distinct(g2),
                             x -> len(list_filter(g2, y -> y = x)) = 1))
                           AS DOUBLE) / len(g2), 6)
                    ELSE 0.0 END AS dup_bigram_frac,
               CASE WHEN len(g3) > 0 THEN round(
                      CAST(list_max(list_transform(list_distinct(g3),
                             x -> len(list_filter(g3, y -> y = x))))
                           AS DOUBLE) / len(g3), 6)
                    ELSE 0.0 END AS top_trigram_frac
        FROM g ORDER BY doc_id
    """
    # Concatenate-then-chunk packing: same bucket split, same whitespace
    # token count (t1 convention), same running-sum/window arithmetic.
    d["pack1_chunk_pack"] = r"""
        WITH t AS (
          SELECT doc_id,
                 CAST(doc_id % 8 AS INT) AS bucket,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                      END AS INT) AS tokens
          FROM documents),
        w AS (
          SELECT doc_id, bucket, tokens,
                 CAST(coalesce(sum(tokens) OVER (
                        PARTITION BY bucket ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS start_off
          FROM t)
        SELECT doc_id, bucket, tokens, start_off,
               CAST(start_off // 256 AS BIGINT) AS bin_first,
               CAST((start_off + greatest(tokens - 1, 0)) // 256 AS BIGINT)
                 AS bin_last
        FROM w ORDER BY doc_id
    """
    # Greedy next-fit packing: the same recurrence replayed as a recursive
    # CTE stepping row_number within each bucket (bin of row i depends on
    # rows 1..i-1 — exactly what greedy_pack's per-bucket scan computes).
    d["pack2_greedy_pack"] = r"""
        WITH RECURSIVE t AS (
          SELECT doc_id,
                 CAST(doc_id % 8 AS INT) AS bucket,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                      END AS INT) AS tokens
          FROM documents),
        seq AS (
          SELECT doc_id, bucket, tokens,
                 row_number() OVER (PARTITION BY bucket ORDER BY doc_id)
                   AS rn
          FROM t),
        walk AS (
          SELECT doc_id, bucket, tokens, rn, 0 AS bin, tokens AS fill
          FROM seq WHERE rn = 1
          UNION ALL
          SELECT s.doc_id, s.bucket, s.tokens, s.rn,
                 CASE WHEN w.fill > 0 AND w.fill + s.tokens > 256
                      THEN w.bin + 1 ELSE w.bin END,
                 CASE WHEN w.fill > 0 AND w.fill + s.tokens > 256
                      THEN s.tokens ELSE w.fill + s.tokens END
          FROM walk w JOIN seq s
            ON s.bucket = w.bucket AND s.rn = w.rn + 1)
        SELECT doc_id, bucket, tokens,
               CAST(bin AS INT) AS bin,
               CAST(fill - tokens AS INT) AS "offset"
        FROM walk ORDER BY doc_id
    """
    # ExactSubstr spans: same shingles (words09 tokenization, k=4), same
    # corpus-wide count, same overlap-or-adjacent island merge.
    d["t15_exact_substring"] = """
        WITH d AS (SELECT doc_id,
                          list_filter(string_split_regex(lower(text),
                              '[^a-z0-9]+'), w -> w <> '') AS ws
                   FROM documents),
        sh AS (SELECT doc_id,
                      unnest(list_transform(generate_series(1, len(ws)-3),
                        i -> struct_pack(pos := i,
                               s := array_to_string(ws[i:i+3], ' ')))) AS a
               FROM d WHERE len(ws) >= 4),
        r AS (SELECT doc_id, (a).pos AS pos, (a).s AS s FROM sh),
        dup AS (SELECT s FROM r GROUP BY s HAVING count(*) >= 2),
        h AS (SELECT doc_id, pos FROM r WHERE s IN (SELECT s FROM dup)),
        isl AS (SELECT doc_id, pos,
                  CASE WHEN max(pos + 3) OVER w IS NULL
                            OR pos > max(pos + 3) OVER w + 1
                       THEN 1 ELSE 0 END AS ni
                FROM h
                WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING)),
        g AS (SELECT doc_id, pos,
                     sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
              FROM isl)
        SELECT doc_id,
               min(pos) AS span_start,
               max(pos) + 3 AS span_end,
               max(pos) + 3 - min(pos) + 1 AS span_words,
               count(*) AS n_anchors
        FROM g GROUP BY doc_id, isl
        ORDER BY doc_id, span_start
    """
    # BPE-ish token census: same replaces, same pattern, same rounding.
    d["t14_bpe_token_count"] = r"""
        WITH d AS (
          SELECT doc_id,
                 replace(replace(text, ' batch ', ', batch-42 '),
                         ' window ', ' window. ') AS text
          FROM documents),
        c AS (
          SELECT doc_id, text,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                 END AS n_ws_tokens,
                 len(regexp_extract_all(lower(text),
                     '[a-z]+|[0-9]|[^a-z0-9\s]')) AS n_bpe_tokens
          FROM d)
        SELECT doc_id, n_ws_tokens, n_bpe_tokens,
               CASE WHEN n_bpe_tokens > 0
                    THEN round(CAST(len(text) AS DOUBLE) / n_bpe_tokens, 6)
                    ELSE 0.0 END AS chars_per_token
        FROM c ORDER BY doc_id
    """
    # URL spam: identical synthesis, identical regex component parse
    # (no parse_url), identical signal weights and rounding.
    d["f8_url_spam"] = r"""
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 400),
        u AS (SELECT doc_id,
                 'http://'
                 || CASE WHEN doc_id % 5 = 0
                         THEN 'cdn' || (doc_id % 97) || 'x'
                         ELSE 'site' END
                 || '.test/'
                 || CASE WHEN doc_id % 9 = 0
                         THEN 'cal/2026/01/cal/2026/01/d' || doc_id
                         ELSE 'a/b' || (doc_id % 3) || '/p' || doc_id END
                 || CASE WHEN doc_id % 4 = 0
                         THEN '?f1=1&f2=2&f3=3&f4=4' ELSE '' END AS url
              FROM d),
        p AS (SELECT doc_id, url,
                 regexp_replace(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1),
                   ':[0-9]+$', '') AS host,
                 regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                 regexp_extract(url, '\?([^#]*)', 1) AS query
              FROM u),
        s AS (SELECT doc_id, url,
                 CASE WHEN len(host) > 0
                      THEN CAST(len(host) - len(regexp_replace(host,
                               '[0-9]', '', 'g')) AS DOUBLE) / len(host)
                      ELSE 0.0 END AS digit_frac,
                 list_filter(string_split(path, '/'), x -> x <> '') AS segs,
                 CASE WHEN query = '' THEN 0
                      ELSE len(string_split(query, '&')) END AS n_params
              FROM p),
        sc AS (SELECT doc_id, url,
                 round(digit_frac
                   + 0.2 * greatest(len(segs) - 4, 0)
                   + 0.25 * greatest(n_params - 2, 0)
                   + (1.0 - CASE WHEN len(segs) > 0
                                 THEN CAST(len(list_distinct(segs)) AS DOUBLE)
                                      / len(segs)
                                 ELSE 1.0 END), 6) AS spam_score
              FROM s)
        SELECT doc_id, url, spam_score, spam_score < 0.5 AS keep
        FROM sc ORDER BY doc_id
    """
    # PageRank: identical edge synthesis, identical power iteration
    # (teleport + dangling redistribution) unrolled 3x as chained CTEs.
    d["g1_pagerank"] = """
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        eraw AS (
          SELECT doc_id AS src, (doc_id * 7 + 3) % 200 AS dst FROM d
          WHERE doc_id % 11 <> 0
          UNION ALL
          SELECT doc_id, doc_id - 1 FROM d
          WHERE doc_id % 11 <> 0 AND doc_id % 5 <> 0),
        e AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
        v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS cnt FROM v),
        deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg
                FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 / n.cnt AS r FROM v CROSS JOIN n),
        dm0 AS (SELECT coalesce(sum(r), 0.0) AS dm FROM r0
                WHERE node NOT IN (SELECT src FROM deg)),
        s0 AS (SELECT e.dst AS node, sum(r0.r / deg.deg) AS s
               FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        r1 AS (SELECT v.node,
                      (1.0 - 0.85) / n.cnt + 0.85 * (coalesce(s0.s, 0.0)
                                             + dm0.dm / n.cnt) AS r
               FROM v LEFT JOIN s0 ON v.node = s0.node
               CROSS JOIN n CROSS JOIN dm0),
        dm1 AS (SELECT coalesce(sum(r), 0.0) AS dm FROM r1
                WHERE node NOT IN (SELECT src FROM deg)),
        s1 AS (SELECT e.dst AS node, sum(r1.r / deg.deg) AS s
               FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        r2 AS (SELECT v.node,
                      (1.0 - 0.85) / n.cnt + 0.85 * (coalesce(s1.s, 0.0)
                                             + dm1.dm / n.cnt) AS r
               FROM v LEFT JOIN s1 ON v.node = s1.node
               CROSS JOIN n CROSS JOIN dm1),
        dm2 AS (SELECT coalesce(sum(r), 0.0) AS dm FROM r2
                WHERE node NOT IN (SELECT src FROM deg)),
        s2 AS (SELECT e.dst AS node, sum(r2.r / deg.deg) AS s
               FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        r3 AS (SELECT v.node,
                      (1.0 - 0.85) / n.cnt + 0.85 * (coalesce(s2.s, 0.0)
                                             + dm2.dm / n.cnt) AS r
               FROM v LEFT JOIN s2 ON v.node = s2.node
               CROSS JOIN n CROSS JOIN dm2)
        SELECT node AS doc_id, round(r, 9) AS rank
        FROM r3 ORDER BY doc_id
    """
    # Mixture draw: identical whitespace token count (t1's), identical
    # sqrt-temperature weights rounded BEFORE the budget multiply
    # (quarantines libm pow ulps from the floor boundary), identical
    # md5 rank and running-sum cutoff.
    d["mix1_token_budget"] = r"""
        WITH tk AS (
          SELECT doc_id, source,
                 CAST(CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\s+'))
                 END AS BIGINT) AS n_tokens
          FROM documents),
        per_src AS (SELECT source, sum(n_tokens) AS tokens_s
                    FROM tk GROUP BY source),
        z AS (SELECT sum(pow(CAST(tokens_s AS DOUBLE), 0.5)) AS z
              FROM per_src),
        alloc AS (SELECT source,
                         CAST(floor(10000.0 *
                           round(pow(CAST(tokens_s AS DOUBLE), 0.5) / z.z, 6))
                         AS BIGINT) AS alloc_tokens
                  FROM per_src CROSS JOIN z),
        ranked AS (SELECT doc_id, source, n_tokens,
                          sum(n_tokens) OVER (
                            PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR))
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_tokens
                   FROM tk)
        SELECT r.doc_id, r.source, r.n_tokens,
               CAST(r.cum_tokens AS BIGINT) AS cum_tokens
        FROM ranked r JOIN alloc a USING (source)
        WHERE r.cum_tokens <= a.alloc_tokens
        ORDER BY r.doc_id
    """
    # DSIR: identical target/raw unigram LMs (Laplace over the shared
    # vocab), identical mean log2 ratio, identical median threshold.
    d["smp2_dsir_topk"] = f"""
        WITH d AS (SELECT doc_id, (lang = 'en') AS t, {_WORDS_SQL} AS ws
                   FROM documents),
        w AS (SELECT doc_id, t, unnest(ws) AS w FROM d),
        counts AS (SELECT w,
                          sum(CASE WHEN t THEN 1 ELSE 0 END) AS ct,
                          sum(CASE WHEN t THEN 0 ELSE 1 END) AS cr
                   FROM w GROUP BY w),
        tot AS (SELECT count(*) AS v, sum(ct) AS nt, sum(cr) AS nr
                FROM counts),
        model AS (SELECT w,
                         log2((ct + 1.0) / (nt + v))
                         - log2((cr + 1.0) / (nr + v)) AS lr
                  FROM counts CROSS JOIN tot),
        sc AS (SELECT doc_id, CAST(count(*) AS INT) AS n_words,
                      round(avg(lr), 6) AS dsir_logratio
               FROM w JOIN model USING (w) GROUP BY doc_id),
        raw AS (SELECT sc.* FROM sc
                JOIN (SELECT doc_id FROM documents WHERE lang <> 'en') r
                USING (doc_id)),
        thr AS (SELECT quantile_cont(dsir_logratio, 0.5) AS th FROM raw)
        SELECT doc_id, n_words, dsir_logratio
        FROM raw CROSS JOIN thr
        WHERE dsir_logratio >= thr.th
        ORDER BY doc_id
    """
    # WET extraction: identical html synthesis, identical pattern chain
    # (patterns written in the Java-regex/RE2 common subset), identical
    # entity decode order (&amp; last).
    d["t17_html_text"] = r"""
        WITH h AS (
          SELECT doc_id,
                 '<html><!-- id ' || doc_id || ' --><head><title>Doc '
                 || doc_id
                 || ' &amp; friends</title><style>p{color:red}</style></head>'
                 || '<body><script type="text/javascript">var x = 1 < 2;</script><p>'
                 || replace(text, '. ', '.</p> <p>')
                 || '</p><div>&copy; corp&nbsp;&quot;q&#39;s&quot; &lt;tag&gt;</div>'
                 || '</body></html>' AS html
          FROM documents),
        s AS (
          SELECT doc_id,
                 regexp_extract(html,
                   '(?is)<title\b[^>]*>(.*?)</title\s*>', 1) AS title_raw,
                 regexp_replace(regexp_replace(regexp_replace(html,
                   '(?is)<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>|<head\b[^>]*>.*?</head\s*>',
                   ' ', 'g'),
                   '(?s)<!--.*?-->', ' ', 'g'),
                   '<[^>]*>', ' ', 'g') AS body_raw
          FROM h),
        e AS (
          SELECT doc_id,
                 replace(replace(replace(replace(replace(replace(title_raw,
                   '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                   '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS t2,
                 replace(replace(replace(replace(replace(replace(body_raw,
                   '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
                   '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&') AS b2
          FROM s)
        SELECT doc_id,
               trim(regexp_replace(t2, '\s+', ' ', 'g')) AS title,
               trim(regexp_replace(b2, '\s+', ' ', 'g')) AS text,
               CAST(len(trim(regexp_replace(b2, '\s+', ' ', 'g'))) AS INT)
                 AS n_chars
        FROM e ORDER BY doc_id
    """
    # CCNet buckets: identical bigram model (Laplace smoothing, V from
    # bigram-participating chars), identical log2 mean, identical
    # round-then-tertile split (quantile_cont == Spark exact percentile:
    # both interpolate linearly at p*(n-1)).
    d["t16_lm_ppl_buckets"] = """
        WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
        bg AS (SELECT doc_id,
                      unnest(list_transform(generate_series(1, len(t)-1),
                                            i -> substring(t, i, 2))) AS bg
               FROM d WHERE len(t) >= 2),
        model AS (SELECT bg, count(*) AS c FROM bg GROUP BY bg),
        pref AS (SELECT substring(bg, 1, 1) AS p, sum(c) AS tot
                 FROM model GROUP BY p),
        voc AS (SELECT count(DISTINCT ch) AS v FROM (
                  SELECT substring(bg, 1, 1) AS ch FROM model
                  UNION SELECT substring(bg, 2, 1) FROM model)),
        sc AS (SELECT b.doc_id,
                      count(*) AS n_bigrams,
                      round(pow(2.0, -sum(log2((m.c + 1.0) / (pf.tot + voc.v)))
                                     / count(*)), 6) AS ppl
               FROM bg b
               JOIN model m USING (bg)
               JOIN pref pf ON substring(b.bg, 1, 1) = pf.p
               CROSS JOIN voc
               GROUP BY b.doc_id),
        th AS (SELECT quantile_cont(ppl, 1.0/3) AS t1,
                      quantile_cont(ppl, 2.0/3) AS t2 FROM sc)
        SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams, ppl,
               CASE WHEN ppl <= th.t1 THEN 'head'
                    WHEN ppl <= th.t2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM sc CROSS JOIN th
        ORDER BY doc_id
    """
    d["t9_tfidf_topk"] = f"""
        WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        terms AS (SELECT doc_id, unnest({_WORDS_SQL}) AS term FROM d),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
        dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term),
        n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM d),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 (tf.tf * (SELECT n FROM n)) / dfc.df AS score
          FROM tf JOIN dfc USING (term)
        ),
        ranked AS (
          SELECT doc_id, term, score,
                 row_number() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term ASC
                 ) AS rank
          FROM scored
        )
        SELECT doc_id, CAST(rank AS INTEGER) AS rank, term,
               round(score, 6) AS score
        FROM ranked WHERE rank <= 3
        ORDER BY doc_id, rank
    """
    d["smp1_stratified_sample"] = _smp1_oracle_sql()
    d["pp1_preprocess_pipeline"] = f"""
        WITH b AS (
          SELECT doc_id, text,
                 {_WORDS_SQL} AS words,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+')) END AS ntok,
                 len(text) AS nch,
                 len(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS nch_nopunct
          FROM documents),
        r AS (
          SELECT doc_id, text, ntok,
                 CASE WHEN len(words) > 0
                      THEN CAST(len(list_filter(words, w -> list_contains({_EN_STOPWORDS_SQL}, w))) AS DOUBLE) / len(words)
                      ELSE 0.0 END AS sw_ratio,
                 CASE WHEN nch > 0
                      THEN CAST(nch - nch_nopunct AS DOUBLE) / nch
                      ELSE 0.0 END AS p_ratio
          FROM b),
        gated AS (
          SELECT doc_id, text FROM r
          WHERE round(least(1.0, CAST(ntok AS DOUBLE)/100.0)
                      * least(1.0, 4.0*sw_ratio)
                      * (1.0 - p_ratio), 6) >= 0.1
            AND sw_ratio >= 0.08
            AND ntok >= 5),
        deduped AS (
          SELECT min(doc_id) AS doc_id, count(*) AS dup_count
          FROM (SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
                FROM gated)
          GROUP BY fp)
        SELECT doc_id, dup_count
        FROM deduped
        WHERE md5(CAST(doc_id AS VARCHAR)) < '80000000000000000000000000000000'
        ORDER BY doc_id
    """
    d["cc2_minhash_clusters"] = f"""
        WITH RECURSIVE
        w AS (
          SELECT doc_id, {_WORDS09_SQL} AS ws
          FROM documents WHERE doc_id < 200),
        s AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(ws)-2, 1)),
                   i -> array_to_string(ws[i:i+2], ' '))) AS shingles
          FROM w WHERE len(ws) > 0),
        inv AS (SELECT doc_id, unnest(shingles) AS sh FROM s),
        pr AS (
          SELECT doc_id_a, doc_id_b FROM (
            SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                   count(*) AS inter
            FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2) p
          JOIN (SELECT doc_id, len(shingles) AS n FROM s) sa
            ON sa.doc_id = doc_id_a
          JOIN (SELECT doc_id, len(shingles) AS n FROM s) sb
            ON sb.doc_id = doc_id_b
          WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5),
        sym AS (
          SELECT doc_id_a AS a, doc_id_b AS b FROM pr
          UNION
          SELECT doc_id_b AS a, doc_id_a AS b FROM pr),
        reach(a, b) AS (
          SELECT a, b FROM sym
          UNION
          SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a),
        lab AS (
          SELECT a AS doc_id, least(a, min(b)) AS cluster
          FROM reach GROUP BY a)
        SELECT d.doc_id,
               coalesce(lab.cluster, d.doc_id) AS cluster,
               d.doc_id = coalesce(lab.cluster, d.doc_id) AS keeper
        FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
        LEFT JOIN lab USING (doc_id)
        ORDER BY doc_id
    """
    d["cc1_dup_clusters"] = """
        WITH RECURSIVE
        d AS (SELECT doc_id FROM documents WHERE doc_id < 300),
        e AS (
          SELECT doc_id AS a, doc_id - 1 AS b FROM d WHERE doc_id % 7 <> 0
          UNION ALL
          SELECT doc_id AS a, doc_id - 21 AS b FROM d
          WHERE doc_id % 3 = 0 AND doc_id >= 21
        ),
        sym AS (SELECT a, b FROM e UNION SELECT b AS a, a AS b FROM e),
        reach(a, b) AS (
          SELECT a, b FROM sym
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
        )
        SELECT a AS doc_id, least(a, min(b)) AS cluster
        FROM reach GROUP BY a ORDER BY doc_id
    """
    # SURT replay: identical synthesized URL, identical anchored-regex
    # parse (lowered first, so the case-insensitive classes collapse),
    # identical www/port/query rules (functions/urls.surt_expr).
    d["f9_surt"] = r"""
        WITH dd AS (SELECT doc_id FROM documents WHERE doc_id < 500),
        u AS (SELECT doc_id,
                (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
                || '://'
                || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
                || 'Site' || CAST(doc_id % 50 AS VARCHAR) || '.Example.COM'
                || (CASE WHEN doc_id % 4 = 0 THEN ':80'
                         WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END)
                || (CASE WHEN doc_id % 5 = 0 THEN ''
                         ELSE '/A/B' || CAST(doc_id AS VARCHAR) END)
                || (CASE WHEN doc_id % 6 = 0 THEN '?b=2&A=1' ELSE '' END)
                || (CASE WHEN doc_id % 7 = 0 THEN '#Frag' ELSE '' END)
                AS url
              FROM dd),
        lu AS (SELECT doc_id, url,
                      split_part(lower(trim(url)), '#', 1) AS b FROM u),
        parts AS (SELECT doc_id, url,
                regexp_extract(b, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
                regexp_replace(
                  regexp_extract(b, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
                  '^.*@', '') AS auth,
                regexp_extract(
                  b, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
                regexp_extract(b, '\?(.*)', 1) AS q
              FROM lu),
        p2 AS (SELECT doc_id, url, scheme, q,
                regexp_extract(auth, ':([0-9]+)$', 1) AS port,
                regexp_replace(regexp_replace(auth, ':[0-9]+$', ''),
                               '^www[0-9]*\.', '') AS host,
                CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path
              FROM parts),
        p3 AS (SELECT doc_id, url, port, host, path, q,
                CASE scheme WHEN 'http' THEN '80' WHEN 'https' THEN '443'
                     WHEN 'ftp' THEN '21' WHEN 'ws' THEN '80'
                     WHEN 'wss' THEN '443' ELSE NULL END AS dp
               FROM p2)
        SELECT doc_id, url,
          CASE WHEN host <> '' THEN
            array_to_string(list_reverse(string_split(host, '.')), ',')
            || (CASE WHEN port <> '' AND port <> coalesce(dp, '')
                     THEN ':' || port ELSE '' END)
            || ')' || path
            || (CASE WHEN q <> '' THEN
                  '?' || array_to_string(list_sort(string_split(q, '&')), '&')
                ELSE '' END)
          ELSE NULL END AS surt
        FROM p3 ORDER BY doc_id
    """
    d["g2_degree_stats"] = """
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        eraw AS (
          SELECT doc_id AS src, (doc_id * 7 + 3) % 200 AS dst FROM d
          WHERE doc_id % 11 <> 0
          UNION ALL
          SELECT doc_id, doc_id - 1 FROM d
          WHERE doc_id % 11 <> 0 AND doc_id % 5 <> 0),
        e AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
        o AS (SELECT src AS node, count(*) AS out_deg FROM e GROUP BY src),
        i AS (SELECT dst AS node, count(*) AS in_deg FROM e GROUP BY dst),
        r AS (SELECT e.src AS node, count(*) AS recip_deg
              FROM e JOIN e e2 ON e.src = e2.dst AND e.dst = e2.src
              GROUP BY e.src),
        v AS (SELECT node FROM o UNION SELECT node FROM i)
        SELECT v.node AS doc_id,
               coalesce(o.out_deg, 0) AS out_deg,
               coalesce(i.in_deg, 0) AS in_deg,
               coalesce(r.recip_deg, 0) AS recip_deg,
               CASE WHEN coalesce(o.out_deg, 0) > 0
                    THEN round(CAST(coalesce(r.recip_deg, 0) AS DOUBLE)
                               / o.out_deg, 9)
                    ELSE 0.0 END AS recip_ratio
        FROM v LEFT JOIN o USING (node) LEFT JOIN i USING (node)
        LEFT JOIN r USING (node)
        ORDER BY doc_id
    """
    # HITS: two L1-normalized iterations unrolled, auth half-step first —
    # the exact arithmetic of operators/graph.hits.
    d["g3_hits"] = """
        WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        eraw AS (
          SELECT doc_id AS src, (doc_id * 7 + 3) % 200 AS dst FROM d
          WHERE doc_id % 11 <> 0
          UNION ALL
          SELECT doc_id, doc_id - 1 FROM d
          WHERE doc_id % 11 <> 0 AND doc_id % 5 <> 0),
        e AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
        v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        h0 AS (SELECT node, 1.0 AS h FROM v),
        a1r AS (SELECT e.dst AS node, sum(h0.h) AS s
                FROM e JOIN h0 ON e.src = h0.node GROUP BY e.dst),
        az1 AS (SELECT sum(s) AS z FROM a1r),
        a1 AS (SELECT v.node, coalesce(a1r.s, 0.0) / az1.z AS a
               FROM v LEFT JOIN a1r USING (node) CROSS JOIN az1),
        h1r AS (SELECT e.src AS node, sum(a1.a) AS s
                FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
        hz1 AS (SELECT sum(s) AS z FROM h1r),
        h1 AS (SELECT v.node, coalesce(h1r.s, 0.0) / hz1.z AS h
               FROM v LEFT JOIN h1r USING (node) CROSS JOIN hz1),
        a2r AS (SELECT e.dst AS node, sum(h1.h) AS s
                FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
        az2 AS (SELECT sum(s) AS z FROM a2r),
        a2 AS (SELECT v.node, coalesce(a2r.s, 0.0) / az2.z AS a
               FROM v LEFT JOIN a2r USING (node) CROSS JOIN az2),
        h2r AS (SELECT e.src AS node, sum(a2.a) AS s
                FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
        hz2 AS (SELECT sum(s) AS z FROM h2r),
        h2 AS (SELECT v.node, coalesce(h2r.s, 0.0) / hz2.z AS h
               FROM v LEFT JOIN h2r USING (node) CROSS JOIN hz2)
        SELECT v.node AS doc_id, round(h2.h, 9) AS hub, round(a2.a, 9) AS auth
        FROM v JOIN h2 USING (node) JOIN a2 USING (node)
        ORDER BY doc_id
    """
    d["t18_blocklist"] = r"""
        WITH b AS (
          SELECT doc_id,
                 (CAST(regexp_matches(text, '(?i)\bslow\b') AS INT)
                  + CAST(regexp_matches(text, '(?i)\bstream\b') AS INT)
                  + CAST(regexp_matches(text, '(?i)\bvector\b') AS INT))
                 AS n_blocked
          FROM documents)
        SELECT doc_id, n_blocked, n_blocked = 0 AS keep
        FROM b ORDER BY doc_id
    """
    # Recrawl: identical lag window (event_id tie-break), identical
    # linear blend on the ROUNDED rate, floor(epoch) = Spark's
    # truncating unix_timestamp for post-1970 stamps.
    d["cr1_recrawl_schedule"] = """
        WITH h AS (
          SELECT 'http://site' || CAST(user_id % 25 AS VARCHAR)
                 || '.test/page/' || CAST(user_id AS VARCHAR) AS url,
                 ts, event_type AS digest, event_id
          FROM events),
        c AS (
          SELECT url, ts,
                 CASE WHEN lag(digest) OVER w IS NOT NULL
                           AND digest <> lag(digest) OVER w
                      THEN 1 ELSE 0 END AS chg
          FROM h WINDOW w AS (PARTITION BY url ORDER BY ts, event_id)),
        p AS (SELECT url, count(*) AS n_fetches,
                     CAST(sum(chg) AS BIGINT) AS n_changes,
                     max(ts) AS last_ts
              FROM c GROUP BY url),
        q AS (SELECT url, n_fetches, n_changes, last_ts,
                round(CASE WHEN n_fetches > 1
                           THEN CAST(n_changes AS DOUBLE) / (n_fetches - 1)
                           ELSE 0.0 END, 6) AS change_rate
              FROM p),
        r AS (SELECT url, n_fetches, n_changes, change_rate, last_ts,
                round(86400.0 - (86400.0 - 3600.0) * change_rate, 6)
                  AS recrawl_interval_sec
              FROM q)
        SELECT url, n_fetches, n_changes, change_rate, recrawl_interval_sec,
               round(CAST(floor(epoch(last_ts)) AS DOUBLE)
                     + recrawl_interval_sec, 6) AS next_due_epoch
        FROM r ORDER BY url
    """
    # Anchor-text: identical synthesized HTML, identical anchor regex
    # (groups unnested in parallel = arrays_zip), resolution replayed by
    # the synthesis formula (absolute kept, other-scheme/empty NULL,
    # root-relative rebased on the page host), canonicalization is
    # identity on already-canonical targets (fast path), same
    # whitespace-collapse + modal-anchor tie-break.
    d["a7_anchor_text"] = r"""
        WITH dd AS (SELECT doc_id, lang FROM documents WHERE doc_id < 300),
        syn AS (SELECT doc_id,
          '<html><body><a href="http://t' || CAST(doc_id % 20 AS VARCHAR)
          || '.test/p">read ' || lang || '</a>'
          || (CASE WHEN doc_id % 3 = 0 THEN
                '<a href="/x' || CAST(doc_id % 5 AS VARCHAR) || '">more</a>'
              ELSE '' END)
          || (CASE WHEN doc_id % 4 = 0 THEN
                '<a class="z" href="http://t' || CAST(doc_id % 20 AS VARCHAR)
                || '.test/p"></a>'
              ELSE '' END)
          || (CASE WHEN doc_id % 5 = 0 THEN
                '<a href="mailto:a@b">mail</a>'
              ELSE '' END)
          || '</body></html>' AS html
          FROM dd),
        ex AS (SELECT doc_id,
          unnest(regexp_extract_all(html,
            '<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 1)) AS href,
          unnest(regexp_extract_all(html,
            '<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 2)) AS txt
          FROM syn),
        res AS (SELECT
          CASE WHEN regexp_matches(href, '^https?://') THEN href
               WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:')
                 THEN NULL
               WHEN href = '' THEN NULL
               WHEN href LIKE '/%' THEN
                 'http://h' || CAST(doc_id % 7 AS VARCHAR) || '.test' || href
               ELSE NULL END AS target_url,
          trim(regexp_replace(txt, '\s+', ' ', 'g')) AS anchor
          FROM ex),
        pt AS (SELECT target_url, anchor, count(*) AS c
               FROM res WHERE target_url IS NOT NULL
               GROUP BY target_url, anchor),
        top AS (SELECT target_url, anchor FROM (
                  SELECT target_url, anchor,
                         row_number() OVER (PARTITION BY target_url
                           ORDER BY c DESC, anchor ASC) AS rn
                  FROM pt WHERE anchor <> '') WHERE rn = 1),
        agg AS (SELECT target_url,
                       CAST(sum(c) AS BIGINT) AS n_anchors,
                       count(CASE WHEN anchor <> '' THEN 1 END)
                         AS n_unique_texts
                FROM pt GROUP BY target_url)
        SELECT agg.target_url, agg.n_anchors, agg.n_unique_texts,
               top.anchor AS top_anchor
        FROM agg LEFT JOIN top USING (target_url)
        ORDER BY target_url
    """
    d["t19_bpe_merges"] = _t19_oracle_sql(n_merges=4)
    # Host quality: t2's exact per-doc quality formula, summed as
    # DECIMAL(18,6) (order-independent = engine-exact), then the same
    # shrinkage arithmetic in the same operation order.
    d["a8_host_quality"] = f"""
        WITH b AS (
          SELECT doc_id, source, text,
                 {_WORDS_SQL} AS words,
                 CASE WHEN trim(text) = '' THEN 0
                      ELSE len(string_split_regex(trim(text), '\\s+')) END AS ntok,
                 len(text) AS nch,
                 len(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS nch_nopunct
          FROM documents),
        r AS (
          SELECT source,
                 CASE WHEN len(words) > 0
                      THEN CAST(len(list_filter(words, w -> list_contains({_EN_STOPWORDS_SQL}, w))) AS DOUBLE) / len(words)
                      ELSE 0.0 END AS sw_ratio,
                 CASE WHEN nch > 0
                      THEN CAST(nch - nch_nopunct AS DOUBLE) / nch
                      ELSE 0.0 END AS p_ratio,
                 ntok
          FROM b),
        q AS (
          SELECT source AS host,
                 CAST(round(least(1.0, CAST(ntok AS DOUBLE)/100.0)
                            * least(1.0, 4.0*sw_ratio)
                            * (1.0 - p_ratio), 6) AS DECIMAL(18,6)) AS quality
          FROM r),
        per AS (SELECT host, count(*) AS n_docs, sum(quality) AS sum_q
                FROM q GROUP BY host),
        g AS (SELECT sum(sum_q) AS gs, CAST(sum(n_docs) AS BIGINT) AS gn
              FROM per)
        SELECT host, n_docs,
               round(CAST(sum_q AS DOUBLE) / n_docs, 6) AS mean_quality,
               round((CAST(sum_q AS DOUBLE)
                      + 25.0 * (CAST(gs AS DOUBLE) / gn))
                     / (n_docs + 25.0), 6) AS shrunk_quality
        FROM per CROSS JOIN g
        ORDER BY host
    """
    return d


def _t19_oracle_sql(n_merges: int) -> str:
    """DuckDB twin of t19 (BPE merges), iterations unrolled
    programmatically (the g1/x7 convention).  Symbols ride as a
    space-padded string; fusion = recursive-CTE fixpoint of
    non-overlapping replace, equivalent to the engine's greedy leftmost
    fold because merged tokens are atomic (see t19's docstring)."""
    parts = [
        f"""
        WITH RECURSIVE
        vocab AS (
          SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest({_WORDS_SQL}) AS w
            FROM documents WHERE doc_id < 300) GROUP BY w),
        sym_0 AS (SELECT word, cnt,
          ' ' || array_to_string(list_append(string_split(word, ''), '</w>'),
                                 ' ') || ' ' AS s
          FROM vocab)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"sym_{i - 1}"
        rep = (
            "replace(f.s, ' ' || b.a || ' ' || b.b || ' ',"
            " ' ' || b.a || b.b || ' ')"
        )
        parts.append(
            f"""
        pr_{i} AS (
          SELECT p[1] AS a, p[2] AS b, CAST(sum(cnt) AS BIGINT) AS c
          FROM (SELECT cnt, unnest(list_zip(toks, toks[2:])) AS p
                FROM (SELECT cnt, string_split(trim(s), ' ') AS toks
                      FROM {prev}))
          WHERE p[2] IS NOT NULL GROUP BY 1, 2),
        best_{i} AS (
          SELECT a, b, c FROM pr_{i}
          ORDER BY c DESC, a ASC, b ASC LIMIT 1),
        fix_{i}(word, cnt, s) AS (
          SELECT word, cnt, s FROM {prev}
          UNION
          SELECT f.word, f.cnt, {rep}
          FROM fix_{i} f, best_{i} b WHERE {rep} <> f.s),
        sym_{i} AS (
          SELECT f.word, f.cnt, f.s FROM fix_{i} f, best_{i} b
          WHERE {rep} = f.s)"""
        )
    selects = "\n        UNION ALL ".join(
        f"SELECT {i} AS step, a AS sym_left, b AS sym_right,"
        f" c AS pair_count FROM best_{i}"
        for i in range(1, n_merges + 1)
    )
    return ",".join(parts) + f"\n        {selects}\n        ORDER BY step"


def _oracle_sql_base() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
                   round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_disc_price,
                   round(CAST(sum(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_charge,
                   round(avg(l_quantity), 6) AS avg_qty,
                   round(avg(l_extendedprice), 6) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q3_top_revenue_orders": """
            SELECT o_orderkey, o_orderdate, o_orderpriority,
                   round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "f1_include_exclude": """
            SELECT p_type, count(*) AS n_parts
            FROM part
            WHERE (lower(p_type) LIKE '%economy%')
               OR NOT (lower(p_type) LIKE '%economy%'
                       OR lower(p_type) LIKE '%promo%'
                       OR lower(p_type) LIKE '%standard%')
            GROUP BY p_type
        """,
        "f2_url_synthesis": """
            SELECT p_partkey,
                   'http://parts.test/' ||
                   replace(replace(p_brand || '/' || p_name || '.html',
                           ' ', '%20'), '#', '%23') AS url
            FROM part
        """,
        "f3_mime_chain": """
            SELECT p_partkey,
                   CASE
                     WHEN p_partkey % 10 = 0 THEN 'application/x-map'
                     WHEN p_brand = 'Brand#1' THEN 'application/x-ovr'
                     WHEN p_size % 4 = 0 THEN 'text/html'
                     WHEN p_size % 4 = 1 THEN 'text/css'
                     WHEN p_size % 4 = 2 THEN 'text/javascript'
                     ELSE 'text/html'
                   END AS mime
            FROM part
        """,
        "f6_ts_normalize": """
            WITH d AS (
              SELECT event_id,
                     CASE CAST(event_id % 4 AS INT)
                       WHEN 0 THEN strftime(ts, '%Y%m%d%H%M%S')
                       WHEN 1 THEN strftime(ts, '%Y-%m')
                       WHEN 2 THEN strftime(ts, '%Y')
                       ELSE strftime(ts, '%Y-%m-%d %H:%M')
                     END AS raw
              FROM events),
            n AS (SELECT event_id, regexp_replace(raw, '[^0-9]', '', 'g') AS digits FROM d),
            p AS (SELECT event_id,
                         substr(digits || substr('10000101000000', length(digits)+1), 1, 14) AS p14
                  FROM n)
            SELECT event_id,
                   strftime(try_strptime(p14, '%Y%m%d%H%M%S'), '%Y-%m-%dT%H:%M:%SZ') AS iso
            FROM p
        """,
        "f7_json_extract": """
            SELECT event_type,
                   CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
                   count(CASE WHEN CAST(props->>'$.k' AS INT) > 50 THEN 1 END) AS n_big
            FROM events
            GROUP BY event_type
        """,
        "crawl_canonicalize": """
            SELECT doc_id,
                   'http://docs' || (doc_id % 7) || '.test/p' || doc_id ||
                   CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2' ELSE '' END AS canonical_url
            FROM documents
        """,
        "crawl_host_counts": """
            SELECT 'docs' || (doc_id % 7) || '.test' AS host, count(*) AS n_urls
            FROM documents
            GROUP BY 1
        """,
        "j1_suffix_join": """
            SELECT s.suffix, count(*) AS n_parts
            FROM part p
            JOIN (SELECT unnest(['ECONOMY','MEDIUM','SMALL','PROMO','LARGE','STANDARD']) AS suffix) s
              ON p.p_type LIKE s.suffix || '%'
            GROUP BY s.suffix
        """,
        "j2_broadcast_equi_join": """
            SELECT c_mktsegment,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "j4_equi_join_pushdown": """
            SELECT p_brand,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
                   count(*) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_size > 25
            GROUP BY p_brand
        """,
        "j5_anti_join_seen": """
            SELECT c_custkey, c_name
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        """,
        "j5b_semi_join": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
            GROUP BY c_mktsegment
        """,
        "d1_revisit_derivation": """
            WITH res AS (
              SELECT CASE WHEN doc_id % 10 = 0
                       THEN 'http://docs.test/dir' || (doc_id // 10) || '/index.html'
                       ELSE 'http://docs.test/dir' || (doc_id // 10) || '/page' || doc_id || '.html'
                     END AS url,
                     'resource' AS record_type
              FROM documents)
            SELECT url, record_type FROM res
            UNION ALL
            SELECT regexp_replace(url, '[^/]+$', '') AS url, 'revisit' AS record_type
            FROM res WHERE lower(url) LIKE '%/index.html'
        """,
        "a2_reverse_index": """
            SELECT o_custkey,
                   string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS order_keys,
                   count(*) AS n_orders
            FROM orders
            GROUP BY o_custkey
        """,
        "a3_rollup": """
            SELECT r_name, n_name, count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name)
        """,
        "a4_distinct_agg": """
            SELECT event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events
            GROUP BY event_type
        """,
        "a5_pivot_manual": """
            SELECT l_linestatus,
                   coalesce(round(CAST(sum(CAST(CASE WHEN l_returnflag='A' THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE), 2), 0.0) AS qty_A,
                   coalesce(round(CAST(sum(CAST(CASE WHEN l_returnflag='N' THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE), 2), 0.0) AS qty_N,
                   coalesce(round(CAST(sum(CAST(CASE WHEN l_returnflag='R' THEN l_quantity END AS DECIMAL(18,2))) AS DOUBLE), 2), 0.0) AS qty_R
            FROM lineitem
            GROUP BY l_linestatus
        """,
        "w1_politeness_topk": """
            SELECT user_id, event_id, rank_in_user FROM (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id ASC) AS rank_in_user
              FROM events) t
            WHERE rank_in_user <= 3
        """,
        "w2_sessionize": """
            WITH g AS (
              SELECT user_id,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                            (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800
                          THEN 1 ELSE 0 END AS new_session
              FROM events)
            SELECT user_id,
                   CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "w3_tumbling_window": """
            SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
                   event_type,
                   count(*) AS n_events,
                   round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "t1_token_count": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END AS n_tokens
            FROM documents
        """,
        "t2_quality_score": f"""
            WITH b AS (
              SELECT doc_id, text,
                     {_WORDS_SQL} AS words,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(string_split_regex(trim(text), '\\s+')) END AS ntok,
                     len(text) AS nch,
                     len(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS nch_nopunct
              FROM documents),
            r AS (
              SELECT doc_id,
                     CASE WHEN len(words) > 0
                          THEN CAST(len(list_filter(words, w -> list_contains({_EN_STOPWORDS_SQL}, w))) AS DOUBLE) / len(words)
                          ELSE 0.0 END AS sw_ratio,
                     CASE WHEN nch > 0
                          THEN CAST(nch - nch_nopunct AS DOUBLE) / nch
                          ELSE 0.0 END AS p_ratio,
                     ntok
              FROM b)
            SELECT doc_id,
                   round(sw_ratio, 6) AS stopword_ratio,
                   round(p_ratio, 6) AS punct_ratio,
                   round(least(1.0, CAST(ntok AS DOUBLE)/100.0)
                         * least(1.0, 4.0*sw_ratio)
                         * (1.0 - p_ratio), 6) AS quality
            FROM r
        """,
        "t3_lang_id": f"""
            WITH b AS (
              SELECT lang, {_WORDS_SQL} AS words FROM documents),
            p AS (
              SELECT lang,
                     CASE WHEN len(words) > 0 AND
                               CAST(len(list_filter(words, w -> list_contains({_EN_STOPWORDS_SQL}, w))) AS DOUBLE) / len(words) >= 0.08
                          THEN 'en' ELSE 'unknown' END AS predicted
              FROM b)
            SELECT lang, predicted, count(*) AS n_docs
            FROM p GROUP BY lang, predicted
        """,
        "t4_exact_dedup": """
            SELECT min(doc_id) AS doc_id, count(*) AS dup_count
            FROM (SELECT doc_id,
                         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
                  FROM documents)
            GROUP BY fp
        """,
        "t5_ngram_jaccard": f"""
            WITH w AS (
              SELECT doc_id, {_WORDS09_SQL} AS ws
              FROM documents WHERE doc_id < 200),
            s AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       generate_series(1, greatest(len(ws)-2, 1)),
                       i -> array_to_string(ws[i:i+2], ' '))) AS shingles
              FROM w WHERE len(ws) > 0),
            inv AS (SELECT doc_id, unnest(shingles) AS sh FROM s),
            pairs AS (
              SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS inter
              FROM inv a JOIN inv b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            sz AS (SELECT doc_id, len(shingles) AS n FROM s)
            SELECT doc_id_a, doc_id_b,
                   round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
            FROM pairs
            JOIN sz sa ON sa.doc_id = doc_id_a
            JOIN sz sb ON sb.doc_id = doc_id_b
            WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
        """,
        "ann1_cosine_topk": """
            SELECT vec_id,
                   round(list_cosine_similarity(
                     CAST(embedding AS DOUBLE[]),
                     (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        "ann2_embedding_neardup": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a
            JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE a.vec_id < 200 AND b.vec_id < 200
              AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
        """,
        "x4_asof_join": """
            WITH o AS (SELECT o_custkey AS user_id, o_orderdate AS ts,
                              max(o_orderkey) AS last_orderkey
                       FROM orders GROUP BY 1, 2)
            SELECT e.event_id, e.user_id, o.last_orderkey
            FROM events e ASOF LEFT JOIN o
              ON e.user_id = o.user_id AND e.ts >= o.ts
        """,
        "x5_range_join": """
            SELECT o.o_orderpriority, count(*) AS n_pairs
            FROM (SELECT l_shipdate FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                    AND l_shipdate <  TIMESTAMP '1995-04-01') l
            JOIN (SELECT o_orderpriority, o_orderdate,
                         o_orderdate + INTERVAL 30 DAY AS o_end
                  FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                    AND o_orderdate <  TIMESTAMP '1995-04-01') o
              ON l.l_shipdate >= o.o_orderdate AND l.l_shipdate < o.o_end
            GROUP BY 1
        """,
        "q5_local_supplier": """
            SELECT r_name, n_name,
                   round(CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
            GROUP BY r_name, n_name
        """,
        "set1_intersect": """
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        """,
        "set2_except": """
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
        """,
        "w4_running_total": """
            SELECT o_custkey, o_orderkey,
                   round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                     PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS DOUBLE), 2) AS running_total
            FROM orders
        """,
        "t7_pii_scrub": f"""
            WITH s AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@example.com or 555-123-4567 from 192.168.0.'
                          || CAST(doc_id % 256 AS VARCHAR) AS synth
              FROM documents WHERE doc_id < 300
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(synth, '{_PII_EMAIL_RE}'))
                      + len(regexp_extract_all(synth, '{_PII_PHONE_RE}'))
                      + len(regexp_extract_all(synth, '{_PII_IPV4_RE}')) AS BIGINT) AS pii_spans,
                   regexp_replace(regexp_replace(regexp_replace(synth,
                       '{_PII_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_PII_PHONE_RE}', '<PHONE>', 'g'),
                       '{_PII_IPV4_RE}', '<IP>', 'g') AS scrubbed
            FROM s ORDER BY doc_id
        """,
        "t8_repetition": r"""
            SELECT doc_id,
                   CASE WHEN len(ws) > 0
                        THEN round(1.0 - CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 6)
                        ELSE 0.0 END AS rep_ratio
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                     w -> w <> '') AS ws
                  FROM documents)
            ORDER BY doc_id
        """,
        "t6_levenshtein": """
            SELECT p_partkey, p_name,
                   levenshtein(p_name, 'small widget') AS edit_dist
            FROM part
            WHERE levenshtein(p_name, 'small widget') <= 5
        """,
        "a6_median": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
                   round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
            FROM lineitem
            GROUP BY l_returnflag
        """,
        # x1_minhash_lsh, x2_simhash, x3_lsh_ann get their oracles in
        # oracle_sql(): murmur3/xxhash64-seeded signatures are reproduced
        # via driver-side pure-Python hash twins embedded as SQL literals.
    }
