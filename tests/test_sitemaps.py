"""Sitemap seed ingestion (sources/sitemaps.py)."""

import pytest
from pyspark.sql import functions as F

from warcit_spark.sources.sitemaps import (
    is_sitemap_index_expr,
    seeds_from_sitemaps,
    sitemap_locs_expr,
)

_INDEX = (
    '<?xml version="1.0"?>\n<sitemapindex xmlns="http://www.sitemaps.org/'
    'schemas/sitemap/0.9">\n'
    "<sitemap><loc>http://h.test/maps/a.xml</loc></sitemap>\n"
    "<sitemap><loc> http://h.test/maps/b.xml </loc></sitemap>\n"
    "<sitemap><loc>http://h.test/maps/missing.xml</loc></sitemap>\n"
    "</sitemapindex>"
)
_URLSET_A = (
    "<urlset><url><loc>http://h.test/p?a=1&amp;b=2</loc></url>"
    "<url><loc>http://h.test/q</loc><lastmod>2026-01-01</lastmod></url></urlset>"
)
_URLSET_B = "<URLSET><url><LOC>http://h.test/r</LOC></url></URLSET>"


def _corpus(spark):
    return spark.createDataFrame(
        [
            ("http://h.test/sitemap.xml", _INDEX),
            ("http://h.test/maps/a.xml", _URLSET_A),
            ("http://h.test/maps/b.xml", _URLSET_B),
        ],
        "url string, xml string",
    )


def test_loc_extraction_and_entity_decode(spark):
    got = (
        spark.createDataFrame([(_URLSET_A,)], "xml string")
        .select(sitemap_locs_expr(F.col("xml")).alias("l"))
        .first()["l"]
    )
    assert got == ["http://h.test/p?a=1&b=2", "http://h.test/q"]


def test_index_detection_case_insensitive(spark):
    df = spark.createDataFrame(
        [(_INDEX,), (_URLSET_A,), (_URLSET_B,)], "xml string"
    ).select(is_sitemap_index_expr(F.col("xml")).alias("i"))
    assert [r["i"] for r in df.collect()] == [True, False, False]


def test_seeds_resolve_through_index(spark):
    roots = spark.createDataFrame(
        [("http://h.test/sitemap.xml",)], "sitemap_url string"
    )
    got = {
        (r["url"], r["sitemap_url"])
        for r in seeds_from_sitemaps(_corpus(spark), roots).collect()
    }
    # missing.xml silently absent (unfetched); whitespace-trimmed b.xml
    # resolved; case-insensitive LOC in b
    assert got == {
        ("http://h.test/p?a=1&b=2", "http://h.test/maps/a.xml"),
        ("http://h.test/q", "http://h.test/maps/a.xml"),
        ("http://h.test/r", "http://h.test/maps/b.xml"),
    }


def test_index_cycle_raises(spark):
    loop = spark.createDataFrame(
        [
            ("http://h.test/i1.xml",
             "<sitemapindex><sitemap><loc>http://h.test/i2.xml</loc></sitemap></sitemapindex>"),
            ("http://h.test/i2.xml",
             "<sitemapindex><sitemap><loc>http://h.test/i1.xml</loc></sitemap></sitemapindex>"),
        ],
        "url string, xml string",
    )
    roots = spark.createDataFrame([("http://h.test/i1.xml",)], "sitemap_url string")
    with pytest.raises(RuntimeError, match="max_depth"):
        seeds_from_sitemaps(loop, roots, max_depth=3)
