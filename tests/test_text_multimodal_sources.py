"""Text-analysis functions, multimodal plumbing, and file/zip sources."""

from __future__ import annotations

import os
import zipfile

import pytest
from pyspark.sql import functions as F

from warcit_spark.functions.text import (
    fingerprint_expr,
    lang_id_expr,
    punct_ratio_expr,
    quality_score_expr,
    stopword_ratio_expr,
    token_count_expr,
)
from warcit_spark.operators.multimodal import (
    attach_media_meta,
    extract_media_features,
    generate_media_fixture,
)
from warcit_spark.sources.binary_files import scan_files, scan_zip, union_scans
from warcit_spark.sources.mapfile import MapfileValidationError, read_mapfile


# ----------------------------------------------------------------- text funcs
def test_token_count(spark):
    df = spark.createDataFrame(
        [("one two  three",), ("",), ("   ",), ("single",)], ["text"]
    )
    got = [r.n for r in df.select(token_count_expr(F.col("text")).alias("n")).collect()]
    assert got == [3, 0, 0, 1]


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and the dog barked at it",),
            ("zxcv qwer asdf poiu lkjh mnbv",),
        ],
        ["text"],
    )
    got = [r.l for r in df.select(lang_id_expr(F.col("text")).alias("l")).collect()]
    assert got == ["en", "unknown"]


def test_quality_and_ratios_bounded(spark):
    df = spark.createDataFrame(
        [("the quick brown fox, it jumps!",), ("!!!???...",), ("",)], ["text"]
    )
    rows = df.select(
        quality_score_expr(F.col("text")).alias("q"),
        punct_ratio_expr(F.col("text")).alias("p"),
        stopword_ratio_expr(F.col("text")).alias("s"),
    ).collect()
    for r in rows:
        assert 0.0 <= r.q <= 1.0 and 0.0 <= r.p <= 1.0 and 0.0 <= r.s <= 1.0
    assert rows[0].q > rows[1].q  # real sentence beats punctuation soup


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("a  b\tc",), ("a b c",), ("a b d",)], ["text"]
    )
    got = [r.f for r in df.select(fingerprint_expr(F.col("text")).alias("f")).collect()]
    assert got[0] == got[1] and got[0] != got[2]


# ----------------------------------------------------------------- multimodal
def test_media_meta_sniffing(spark):
    media = generate_media_fixture(spark, 10)
    out = attach_media_meta(media)
    sniffed = {r.media_id: r.sniffed_mime for r in out.collect()}
    assert sniffed[0] == "image/png"
    assert sniffed[1] == "image/jpeg"
    assert sniffed[2] == "image/gif"
    assert sniffed[3] == "audio/wav"
    assert sniffed[4] == "video/x-flv"


def test_media_decode_stub_raises_without_fake(spark):
    media = generate_media_fixture(spark, 5)
    with pytest.raises(Exception):  # NotImplementedError inside the task
        extract_media_features(media, deterministic_fake=False).collect()


def test_media_feature_plumbing_with_fake(spark):
    media = generate_media_fixture(spark, 10)
    out = extract_media_features(media, deterministic_fake=True).collect()
    assert len(out) == 10
    assert all(r.feat_dim == 8 for r in out)
    by_id = {r.media_id: list(r.feature) for r in out}
    out2 = extract_media_features(media, deterministic_fake=True).collect()
    assert {r.media_id: list(r.feature) for r in out2} == by_id  # deterministic


# -------------------------------------------------------------------- sources
@pytest.fixture(scope="module")
def site_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("site")
    (d / "sub").mkdir()
    (d / "index.html").write_text("<html>root</html>")
    (d / "sub" / "page two.html").write_text("<html>two</html>")
    (d / "style.css").write_text("body{}")
    return str(d)


def test_scan_files_binaryfile_shape(spark, site_dir):
    df = scan_files(spark, site_dir, "http://s.test/")
    rows = {r.url: r for r in df.collect()}
    assert "http://s.test/index.html" in rows
    assert "http://s.test/sub/page%20two.html" in rows  # F2 encoding applied
    r = rows["http://s.test/index.html"]
    assert bytes(r.content) == b"<html>root</html>"
    assert r.size == len(b"<html>root</html>")
    assert r.warc_ts is not None


def test_scan_files_glob_filter(spark, site_dir):
    df = scan_files(spark, site_dir, "http://s.test/", glob="*.css")
    assert [r.url for r in df.collect()] == ["http://s.test/style.css"]


def test_scan_zip_members_and_prefix(spark, site_dir, tmp_path_factory):
    zdir = tmp_path_factory.mktemp("zips")
    zpath = str(zdir / "site.zip")
    with zipfile.ZipFile(zpath, "w") as zp:
        zp.writestr("www/index.html", "<html>z</html>")
        zp.writestr("www/sub/a.css", "a{}")
        zp.writestr("other/skip.txt", "no")
        zp.writestr("www/dir/", "")  # directory entry -> skipped
    df = scan_zip(spark, zpath, "http://z.test/", inner_prefix="www/")
    rows = {r.url: bytes(r.content) for r in df.collect()}
    assert rows == {
        "http://z.test/index.html": b"<html>z</html>",
        "http://z.test/sub/a.css": b"a{}",
    }


def test_union_scans(spark, site_dir):
    a = scan_files(spark, site_dir, "http://a.test/")
    b = scan_files(spark, site_dir, "http://b.test/")
    assert union_scans([a, b]).count() == a.count() + b.count()


# -------------------------------------------------------------------- mapfile
def test_mapfile_validation(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mapfiles")
    ok = d / "ok.csv"
    ok.write_text("file,URL\na.html,http://x/a\n")
    df = read_mapfile(spark, str(ok))
    assert df.columns == ["file", "URL"] and df.count() == 1

    tsv = d / "ok.tsv"
    tsv.write_text("file\tURL\ta.html\thttp://x/a\n".replace("\ta.html", "\na.html", 1))
    # rebuild correctly: header line then row
    tsv.write_text("file\tURL\na.html\thttp://x/a\n")
    assert read_mapfile(spark, str(tsv)).count() == 1

    bad = d / "bad.csv"
    bad.write_text("file,nonsense\na.html,x\n")
    with pytest.raises(MapfileValidationError):
        read_mapfile(spark, str(bad))

    nofile = d / "nofile.csv"
    nofile.write_text("URL,timestamp\nhttp://x,2017\n")
    with pytest.raises(MapfileValidationError):
        read_mapfile(spark, str(nofile))

    only = d / "only.csv"
    only.write_text("file\na.html\n")
    with pytest.raises(MapfileValidationError):
        read_mapfile(spark, str(only))


def test_zip_path_auto_resolution(spark, tmp_path_factory):
    """S4: 'site.zip/inner/prefix' as ONE input string resolves by walking
    upward to the zip (base.py:63-79)."""
    from warcit_spark.sources.binary_files import resolve_input, scan_input

    zdir = tmp_path_factory.mktemp("autozip")
    zpath = str(zdir / "site.zip")
    with zipfile.ZipFile(zpath, "w") as zp:
        zp.writestr("www/index.html", "<html>z</html>")
        zp.writestr("other/skip.txt", "no")

    assert resolve_input(zpath) == ("zip", zpath, "")
    assert resolve_input(zpath + "/www") == ("zip", zpath, "www/")
    assert resolve_input(zpath + "/www/deeper") == ("zip", zpath, "www/deeper/")
    assert resolve_input(str(zdir)) == ("dir", str(zdir), "")
    assert resolve_input("/nonexistent/nowhere")[0] == "invalid"

    rows = {r.url for r in scan_input(spark, zpath + "/www", "http://z.test/").collect()}
    assert rows == {"http://z.test/index.html"}

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        scan_input(spark, "/nonexistent/nowhere", "http://z.test/")
