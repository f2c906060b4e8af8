"""Deterministic synthetic mini-web fixture (FIXTURES.md §1-3).

The Spark analog of the reference's golden fixture ``test/www.iana.org.zip``
(22-file mini website: html/css/js/ico, extension-less pages, robots.txt,
two index.html files — /root/reference/test/test_warcit.py:27-43): a closed
link graph over several hosts with one deliberately *hot* host (~60% of
URLs) for skew testing, index pages for revisit derivation, non-HTML assets
for the MIME chain, and pre-encoded reserved characters in some paths.

The generator is itself a distributed Spark job: every column is a pure
expression of ``spark.range(n)``'s id — no RNG, no driver-side data — so
the same code builds the ~200-row pytest fixture and the >=10^6-row bench
corpus, identical bytes at any parallelism.

Layout (all arithmetic on id):
- host_idx: id%10 -> {0..5 -> host0 (hot), 6 -> host1, 7 -> host2,
  8 -> host3, 9 -> host4}; page index j is contiguous per host.
- page kind: j%20 == 0 index.html | 16 css | 17 js | 18 extension-less |
  19 reserved-char name | else article html.
- html pages carry 3-4 <a href> links: next article (wraps), a second
  deterministic article, the directory index, sometimes a cross-host index
  (j%7==0) and a dangling URL (j%13==0) to exercise fetch misses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOST_SLOTS = 10  # id%10 slots; 6 of them map to the hot host
HOT_SHARE_SLOTS = 6
N_HOSTS = 5


def host_name_expr(h: Column) -> Column:
    return F.concat(F.lit("www.host"), h.cast("string"), F.lit(".test"))


def _page_path_expr(j: Column) -> Column:
    """Path for within-host page index j — reused for link targets."""
    kind = j % 20
    d = (j / 20).cast("long")
    return (
        F.when(kind == 0, F.concat(F.lit("/dir"), d, F.lit("/index.html")))
        .when(kind == 16, F.concat(F.lit("/static/style"), j, F.lit(".css")))
        .when(kind == 17, F.concat(F.lit("/static/app"), j, F.lit(".js")))
        .when(kind == 18, F.concat(F.lit("/about"), j))
        .when(kind == 19, F.concat(F.lit("/files/doc%20"), j, F.lit("%2cv2.html")))
        .otherwise(F.concat(F.lit("/dir"), d, F.lit("/page"), j, F.lit(".html")))
    )


def extract_text_expr(html_str: Column) -> Column:
    """The engine's text-extraction spec: strip tags, collapse whitespace.

    This exact transformation is the per-row byte-identical invariant
    (BASELINE.json input_hint); the sequential oracle implements it
    independently in Python (tests/oracle.py) and tests assert equality.
    """
    no_tags = F.regexp_replace(html_str, "<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def _page_coords(n_pages: int, n_hosts: int):
    """(host_idx, within-host index j, safe link-target bound) exprs of id.

    Host 0 is the hot host (~60% of ids); the remaining 40% spread evenly
    over hosts 1..n_hosts-1.  j is contiguous per host, so every link
    target below the safe bound exists on every host.
    """
    m = F.col("id") % N_HOST_SLOTS
    cold = (F.col("id") / N_HOST_SLOTS).cast("long") * (
        N_HOST_SLOTS - HOT_SHARE_SLOTS
    ) + (m - HOT_SHARE_SLOTS)
    h = F.when(m < HOT_SHARE_SLOTS, F.lit(0)).otherwise(
        (cold % (n_hosts - 1) + 1).cast("int")
    )
    j = F.when(
        m < HOT_SHARE_SLOTS,
        (F.col("id") / N_HOST_SLOTS).cast("long") * HOT_SHARE_SLOTS + m,
    ).otherwise((cold / (n_hosts - 1)).cast("long"))
    n_cold_pages = (n_pages // N_HOST_SLOTS) * (N_HOST_SLOTS - HOT_SHARE_SLOTS)
    n_safe = max(1, n_cold_pages // max(1, n_hosts - 1) - 1)
    return h, j, n_safe


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = N_HOSTS,
    body_kb: int = 0,
    extra_links: int = 0,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) — BASELINE.json input_hint shape.

    ``body_kb``/``extra_links`` produce a Common-Crawl-WEIGHT variant
    (real CC pages run tens of KB of html with dozens of links; the
    default fixture page is ~300 B with 3-5): ``body_kb`` appends ~that
    many KiB of deterministic filler paragraphs, ``extra_links`` adds that
    many additional in-host anchors.  Defaults (0, 0) keep the corpus
    byte-identical to the parity/oracle fixture — heavier weights are for
    the throughput/scaling benchmarks where per-URL compute must resemble
    the design-point workload.
    """
    n_pages = max(40, (n_pages // N_HOST_SLOTS) * N_HOST_SLOTS)
    ids = spark.range(n_pages)
    h, j, n_safe = _page_coords(n_pages, n_hosts)

    host = host_name_expr(h)
    path = _page_path_expr(j)
    url = F.concat(F.lit("http://"), host, path)
    kind = j % 20
    d = (j / 20).cast("long")

    # link targets stay inside [0, n_safe) so every non-dangling target
    # exists on every host regardless of host size
    t1 = (j + 1) % n_safe
    t2 = (j * 3 + 7) % n_safe
    link1 = F.concat(F.lit("http://"), host, _page_path_expr(t1))
    link2 = F.concat(F.lit("http://"), host, _page_path_expr(t2))
    up = F.concat(F.lit("http://"), host, F.lit("/dir"), d, F.lit("/index.html"))
    cross = F.concat(
        F.lit("http://"),
        host_name_expr((h + 1) % n_hosts),
        F.lit("/dir0/index.html"),
    )
    dangling = F.concat(F.lit("http://"), host, F.lit("/missing"), j, F.lit(".html"))

    body_text = F.concat(
        F.lit("Deterministic corpus sentence number "),
        j,
        F.lit(" about the quick brown fox and the lazy dog in dir "),
        d,
        F.lit(" of "),
        host,
        F.lit("."),
    )
    links_html = F.concat(
        F.lit('<a href="'), link1, F.lit('">next</a> '),
        F.lit('<a href="'), link2, F.lit('">also</a> '),
        F.lit('<a href="'), up, F.lit('">up</a>'),
        F.when(j % 7 == 0, F.concat(F.lit(' <a href="'), cross, F.lit('">x</a>'))).otherwise(F.lit("")),
        F.when(j % 13 == 0, F.concat(F.lit(' <a href="'), dangling, F.lit('">gone</a>'))).otherwise(F.lit("")),
    )
    if extra_links > 0:
        # one transform over a sequence, not an N-fold concat chain (which
        # blows the whole-stage-codegen method size at N~20)
        ks = F.sequence(F.lit(0), F.lit(extra_links - 1))
        more = F.array_join(
            F.transform(
                ks,
                lambda k: F.concat(
                    F.lit('<a href="http://'),
                    host,
                    _page_path_expr((j * 5 + k.cast("long") * 11 + 3) % n_safe),
                    F.lit('">l</a>'),
                ),
            ),
            " ",
        )
        links_html = F.concat(links_html, F.lit(" "), more)
    if body_kb > 0:
        # ~64-byte deterministic sentence repeated to ~body_kb KiB; varies
        # per page (j) so columnar/dictionary compression cannot collapse it
        filler_unit = F.concat(
            F.lit(" Filler sentence "), j,
            F.lit(" with assorted tokens for page weight realism and regex work."),
        )
        body_text = F.concat(body_text, F.repeat(filler_unit, body_kb * 16))
    html_page = F.concat(
        F.lit("<html><head><title>"), host, F.lit(" page "), j,
        F.lit("</title></head><body><h1>Article "), j, F.lit("</h1><p>"),
        body_text, F.lit("</p>"), links_html, F.lit("</body></html>"),
    )
    css_body = F.concat(F.lit("body { color: #000; } /* asset "), j, F.lit(" */"))
    js_body = F.concat(F.lit("console.log('asset "), j, F.lit("');"))

    is_html = ~kind.isin(16, 17)
    html_str = (
        F.when(kind == 16, css_body).when(kind == 17, js_body).otherwise(html_page)
    )
    text = F.when(is_html, extract_text_expr(html_str)).otherwise(F.lit(""))
    lang = F.when(is_html, F.lit("en")).otherwise(F.lit(""))

    # deterministic timestamps spanning 2013-2017 (mirrors zip mtimes,
    # /root/reference/test fixture; drives WARC-Date, warcit/warcit.py:501)
    epoch = F.lit(1356998400) + (F.col("id") * 97919) % F.lit(157766400)
    warc_ts = F.to_timestamp(F.from_unixtime(epoch))

    return ids.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def generate_seed_sample(
    spark: SparkSession, n_pages: int, n_seeds: int, n_hosts: int = N_HOSTS
) -> DataFrame:
    """Large deterministic seed set for throughput benchmarking: every
    (n_pages // n_seeds)-th page URL, priority decaying with rank.  Uses
    the same id -> url arithmetic as :func:`generate_pages`, so every seed
    exists in the pages table."""
    n_pages = max(40, (n_pages // N_HOST_SLOTS) * N_HOST_SLOTS)
    n_seeds = min(n_seeds, n_pages)
    # multiplicative stride coprime with the %10 slot structure — a plain
    # arithmetic step would alias onto a single host slot (e.g. step 5 hits
    # only id%10 in {0,5} = the hot host)
    page_id = (F.col("id") * 9973) % n_pages
    ids = spark.range(n_seeds).select(page_id.alias("id"))
    h, j, _ = _page_coords(n_pages, n_hosts)
    url = F.concat(F.lit("http://"), host_name_expr(h), _page_path_expr(j))
    return ids.select(
        url.alias("url"),
        (F.lit(1.0) - (F.col("id") % 997) / 1000.0).alias("priority"),
    ).groupBy("url").agg(F.max("priority").alias("priority"))


def generate_seeds(spark: SparkSession) -> DataFrame:
    """seeds(url, priority) — includes non-canonical variants whose canonical
    forms collide (the dedup fixture, FIXTURES.md §2)."""
    rows = [
        ("http://www.host0.test/dir0/index.html", 1.0),
        ("HTTP://WWW.HOST0.TEST:80/dir0/index.html#top", 0.9),   # collides w/ above
        ("http://www.host1.test/dir0/index.html?b=2&a=1", 0.8),
        ("http://www.host1.test/dir0/index.html?a=1&b=2#x", 0.7),  # collides
        ("http://www.host2.test/dir0/index.html", 0.6),
        ("http://www.host3.test/dir0/index.html", 0.5),            # robots-denied host
        ("http://www.host4.test/dir0/index.html", 0.4),
    ]
    return spark.createDataFrame(rows, "url string, priority double")


def generate_robots(spark: SparkSession) -> DataFrame:
    """robots(host, path_prefix, allow, crawl_delay) — FIXTURES.md §3:
    one fully-denied host, one slow host (big crawl_delay), a static-deny
    on the hot host."""
    rows = [
        ("www.host0.test", "/", True, 1.0),
        ("www.host0.test", "/static/", False, 1.0),
        ("www.host1.test", "/", True, 1.0),
        ("www.host2.test", "/", True, 8.0),
        ("www.host3.test", "/", False, 1.0),
        ("www.host4.test", "/", True, 1.0),
    ]
    return spark.createDataFrame(
        rows, "host string, path_prefix string, allow boolean, crawl_delay double"
    )
