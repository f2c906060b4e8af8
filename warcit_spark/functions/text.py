"""Text-analysis column functions for training-data pipelines.

Language-ID (stopword n-gram heuristic), quality scoring, token counting,
and document fingerprinting — all pure ``pyspark.sql.functions``
expressions (JVM, codegen), each with an exact ANSI-SQL twin so the DuckDB
oracle can verify them value-for-value.  These run over the ``documents``
table (doc_id, text, lang, source, n_chars) and, at scale, over the
``text`` column of the pages corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword list — deterministic, shared with the SQL oracle.
EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "this", "be", "are", "or",
]

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}<>-]"


def words_expr(text: Column) -> Column:
    """Lowercased alphabetic word array (empty strings filtered)."""
    return F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda w: w != F.lit("")
    )


def token_count_expr(text: Column) -> Column:
    """Whitespace token count; '' -> 0."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def stopword_count_expr(text: Column) -> Column:
    return F.size(
        F.filter(words_expr(text), lambda w: w.isin(*EN_STOPWORDS))
    )


def stopword_ratio_expr(text: Column) -> Column:
    words = words_expr(text)
    n = F.size(words)
    hits = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def punct_ratio_expr(text: Column) -> Column:
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n > 0, (n - stripped).cast("double") / n).otherwise(F.lit(0.0))


def lang_id_expr(text: Column, threshold: float = 0.08) -> Column:
    """Heuristic language ID: English-stopword density >= threshold -> 'en'."""
    return F.when(stopword_ratio_expr(text) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def quality_score_expr(text: Column) -> Column:
    """[0,1] quality score: length sweet-spot x stopword presence x low punct.

    A simple, fully-SQL-expressible analog of Gopher/C4-style quality rules:
    score = min(1, n_tokens/100) * min(1, 4*stopword_ratio) * (1 - punct_ratio).
    """
    ntok = token_count_expr(text).cast("double")
    len_term = F.least(F.lit(1.0), ntok / F.lit(100.0))
    stop_term = F.least(F.lit(1.0), F.lit(4.0) * stopword_ratio_expr(text))
    punct_term = F.lit(1.0) - punct_ratio_expr(text)
    return F.round(len_term * stop_term * punct_term, 6)


def fingerprint_expr(text: Column, nchars: int = 16) -> Column:
    """Whitespace-normalized md5 prefix — a content fingerprint usable as an
    exact-dedup key across engines (md5 exists in both Spark and DuckDB)."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.substring(F.md5(F.encode(normalized, "UTF-8")), 1, nchars)
