"""End-to-end warcit-workflow parity: directory -> records -> WARC file.

Mirrors the reference's own test style and count semantics
(/root/reference/test/test_warcit.py): a mini website with two index.html
files at different depths, css/js/ico assets, an extension-less page —
N files -> N resources + R revisits; excludes reduce counts; mapfile
overrides URL/date/type; warcinfo excluded from record counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from warcit_spark.plans.warcit_pipeline import files_to_warc_records, warcit_run
from warcit_spark.sinks.warc import read_warc_records

SITE_FILES = {
    "index.html": "<html><body>root <a href=\"sub/page.html\">p</a></body></html>",
    "sub/index.html": "<html><body>sub index</body></html>",
    "sub/page.html": "<html><body>a page</body></html>",
    "styles/main.css": "body { color: red }",
    "scripts/app.js": "console.log(1)",
    "favicon.ico": "\x00\x01\x02binary-ish",
    "about": "<html><body>about, extension-less</body></html>",
    "data file.txt": "plain text",
}


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    d = tmp_path_factory.mktemp("warcit_site")
    for rel, content in SITE_FILES.items():
        p = d / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
    return str(d)


PREFIX = "http://example.com/"


def test_resource_and_revisit_counts(spark, site):
    """8 files -> 8 resources + 2 revisits (two index.html) = 10 records —
    the reference's '24 = 22 + 2' semantics (test_warcit.py:43)."""
    recs = files_to_warc_records(spark, site, PREFIX)
    by_type = {r["record_type"]: r["count"] for r in recs.groupBy("record_type").count().collect()}
    assert by_type == {"resource": 8, "revisit": 2}


def test_exclude_reduces_counts(spark, site):
    """--exclude '*.js' drops the js file and its would-be records
    (test_warcit.py:47-50)."""
    recs = files_to_warc_records(spark, site, PREFIX, exclude=["*.js"])
    assert recs.where(F.col("record_type") == "resource").count() == 7
    assert recs.where(F.col("url").endswith(".js")).count() == 0


def test_no_index_files_no_revisits(spark, site):
    """--index-files '' -> no revisit records (test_warcit.py:77-86)."""
    recs = files_to_warc_records(spark, site, PREFIX, index_files=())
    assert recs.where(F.col("record_type") == "revisit").count() == 0


def test_record_fields_and_url_encoding(spark, site):
    recs = {r.url: r for r in files_to_warc_records(spark, site, PREFIX).collect()}
    # F2: space percent-encoded lowercase-hex
    assert f"{PREFIX}data%20file.txt" in recs
    css = recs[f"{PREFIX}styles/main.css"]
    assert css.content_type.startswith("text/css")
    ico = recs[f"{PREFIX}favicon.ico"]
    assert ico.content_type == "image/x-icon"  # the reference's .ico registration
    about = recs[f"{PREFIX}about"]
    assert about.content_type.startswith("text/html")  # default mime
    # revisit carries its index file's digest (A4 content-addressing)
    rev = recs[f"{PREFIX}sub/"]
    assert rev.payload_digest == recs[f"{PREFIX}sub/index.html"].payload_digest


def test_mapfile_overrides_url_date_type(spark, site):
    mapfile = spark.createDataFrame(
        [("sub/page.html", "http://mapped.test/p", "2011-02", "application/x-map")],
        ["file", "URL", "timestamp", "Content-Type"],
    )
    recs = files_to_warc_records(spark, site, PREFIX, mapfile=mapfile)
    mapped = recs.where(F.col("url") == "http://mapped.test/p").collect()
    assert len(mapped) == 1
    assert mapped[0].warc_date == "2011-02-01T00:00:00Z"  # F6 pad-down
    assert mapped[0].content_type == "application/x-map"


def test_full_run_to_warc_file(spark, site, tmp_path):
    out = str(tmp_path / "warc_out")
    manifest = warcit_run(spark, site, PREFIX, out, charset=None).collect()
    assert len(manifest) == 1
    recs = read_warc_records(manifest[0].path)
    # warcinfo first, excluded from the count (warcit.py:444 vs 424)
    assert recs[0]["headers"]["WARC-Type"] == "warcinfo"
    assert manifest[0].n_records == 10
    # each index.html resource is directly followed by its revisit
    types_by_uri = [
        (r["headers"].get("WARC-Target-URI", ""), r["headers"]["WARC-Type"])
        for r in recs[1:]
    ]
    for i, (uri, t) in enumerate(types_by_uri):
        if uri.endswith("/index.html"):
            assert types_by_uri[i + 1] == (uri.rsplit("/", 1)[0] + "/", "revisit")
    # payload round-trip byte-identical
    page = next(
        r for r in recs if r["headers"].get("WARC-Target-URI", "").endswith("sub/page.html")
    )
    assert page["payload"].decode() == SITE_FILES["sub/page.html"]
