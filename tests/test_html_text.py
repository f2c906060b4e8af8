"""WET-style HTML text extraction (functions/html.py)."""

from pyspark.sql import functions as F

from warcit_spark.functions.html import html_text_expr, html_title_expr


def _one(spark, html, expr):
    return (
        spark.createDataFrame([(html,)], "html string")
        .select(expr(F.col("html")).alias("v"))
        .first()["v"]
    )


def test_strips_script_style_head_and_comments(spark):
    html = (
        "<html><head><title>T</title><meta x=1></head>"
        "<body><!-- hidden --><script>var a = '<p>not text</p>';</script>"
        "<STYLE media=all>p { color: red }</STYLE>"
        "<p>Hello <b>world</b></p></body></html>"
    )
    assert _one(spark, html, html_text_expr) == "Hello world"


def test_entities_decode_after_tag_strip(spark):
    # "&lt;p&gt;" in source text must NOT resurrect a strippable tag,
    # and "&amp;lt;" must not double-decode
    assert _one(spark, "<p>a &lt;p&gt; b &amp;lt; c&nbsp;d &#39;e&quot;</p>",
                html_text_expr) == "a <p> b &lt; c d 'e\""
    # unknown entities pass through untouched
    assert _one(spark, "<p>&copy; x</p>", html_text_expr) == "&copy; x"


def test_multiline_and_case_insensitive_blocks(spark):
    html = "a<ScRiPt type='x'>\nline1\nline2\n</sCrIpT >b"
    assert _one(spark, html, html_text_expr) == "a b"


def test_title_extraction(spark):
    assert _one(spark, "<head><title >  A &amp; B </title></head>",
                html_title_expr) == "A & B"
    assert _one(spark, "<p>no title</p>", html_title_expr) == ""
