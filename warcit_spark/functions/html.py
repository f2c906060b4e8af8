"""WET-style HTML -> visible-text extraction as pure JVM expressions.

The reference pipeline archives HTML bodies; a training-data pipeline's
first transform over them is text extraction (Common Crawl publishes
exactly this as its WET sidecars).  The full spec — drop non-content
subtrees, strip tags, decode the high-frequency entities, normalize
whitespace — compiles to a chain of ``regexp_replace``/``replace``
expressions that stays inside whole-stage codegen: zero UDFs, zero
shuffles, scales as a row-local map over any corpus width.

Every pattern is written in the common subset of Java regex (Spark) and
RE2 (DuckDB, the oracle engine): ``(?is)`` inline flags, lazy ``.*?``,
character classes — no backrefs, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Subtrees whose text content is NEVER visible text: scripts, styles,
# head metadata.  Lazy match to the matching close tag; (?is) = case
# insensitive + dot-matches-newline.  A backref form
# (<(script|style|head)...</\1>) would be shorter but RE2 has no
# backrefs — the expanded alternation keeps Spark and the oracle on the
# byte-identical pattern.
DROP_SUBTREES_PATTERN = (
    r"(?is)<script\b[^>]*>.*?</script\s*>"
    r"|<style\b[^>]*>.*?</style\s*>"
    r"|<head\b[^>]*>.*?</head\s*>"
)
COMMENT_PATTERN = r"(?s)<!--.*?-->"
TAG_PATTERN = r"<[^>]*>"

# High-frequency entities, decoded after tag stripping (so "&lt;p&gt;"
# in source text can never resurrect a tag).  Order matters: &amp; LAST,
# or "&amp;lt;" would double-decode.
ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_text_expr(html: Column) -> Column:
    """Visible text of an HTML document: drop script/style/head
    subtrees and comments, strip remaining tags to spaces, decode the
    six high-frequency entities, collapse whitespace, trim."""
    t = F.regexp_replace(html, DROP_SUBTREES_PATTERN, " ")
    t = F.regexp_replace(t, COMMENT_PATTERN, " ")
    t = F.regexp_replace(t, TAG_PATTERN, " ")
    for ent, rep in ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_title_expr(html: Column) -> Column:
    """Contents of the first <title> element (entity-decoded, trimmed);
    empty string when absent.  regexp_extract group over the lazy body
    match — row-local, codegen-friendly."""
    t = F.regexp_extract(html, r"(?is)<title\b[^>]*>(.*?)</title\s*>", 1)
    for ent, rep in ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))
