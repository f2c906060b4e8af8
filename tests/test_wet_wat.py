"""WET/WAT sidecar derivation (operators/records.py) round-tripped
through the WARC sink."""

import json
import os

from warcit_spark.operators.records import wat_records, wet_records
from warcit_spark.sinks.warc import read_warc_records, write_warc_files

_HTML_A = (
    "<html><head><title>Page A</title></head>"
    '<body><p>alpha beta</p><a href="/x">x</a><a href="/y">y</a></body></html>'
)
_HTML_B = "<html><body><script>var a=1;</script><p>gamma</p></body></html>"


def _pages(spark):
    return spark.createDataFrame(
        [
            ("http://h.test/a", _HTML_A.encode()),
            ("http://h.test/b", _HTML_B.encode()),
        ],
        "url string, html binary",
    ).selectExpr("url", "timestamp'2026-02-03 04:05:06' as warc_ts", "html")


def test_wet_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wet")
    write_warc_files(
        wet_records(_pages(spark)).coalesce(1),
        out,
        gzip_records=False,
        warcinfo=False,
    ).collect()
    (f,) = [n for n in os.listdir(out) if n.startswith("part-")]
    recs = read_warc_records(os.path.join(out, f))
    by_url = {r["headers"]["WARC-Target-URI"]: r for r in recs}
    a = by_url["http://h.test/a"]
    assert a["headers"]["WARC-Type"] == "conversion"
    assert a["headers"]["Content-Type"] == "text/plain"
    assert a["headers"]["WARC-Date"] == "2026-02-03T04:05:06Z"
    assert a["headers"]["WARC-Refers-To-Target-URI"] == "http://h.test/a"
    assert a["payload"] == b"alpha beta x y"
    assert by_url["http://h.test/b"]["payload"] == b"gamma"


def test_wat_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wat")
    write_warc_files(
        wat_records(_pages(spark)).coalesce(1),
        out,
        gzip_records=False,
        warcinfo=False,
    ).collect()
    (f,) = [n for n in os.listdir(out) if n.startswith("part-")]
    recs = read_warc_records(os.path.join(out, f))
    by_url = {r["headers"]["WARC-Target-URI"]: r for r in recs}
    a = by_url["http://h.test/a"]
    assert a["headers"]["WARC-Type"] == "metadata"
    assert a["headers"]["Content-Type"] == "application/json"
    meta = json.loads(a["payload"])
    assert meta == {"title": "Page A", "text_chars": 14, "n_links": 2}
    b = json.loads(by_url["http://h.test/b"]["payload"])
    assert b["n_links"] == 0 and b["text_chars"] == 5
    # to_json omits nothing here; title absent -> empty string by spec
    assert b["title"] == ""
