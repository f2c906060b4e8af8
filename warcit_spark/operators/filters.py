"""F1: include/exclude wildcard filtering (warcit/warcit.py:344-349, 464-475).

Reference truth table (the correctness contract, SURVEY.md §4.3 #3):

- both given:   row passes if it matches include; otherwise it is dropped
  only when it matches exclude (include *overrides* exclude; a row matching
  neither list passes).
- include only: whitelist — must match include.
- exclude only: blacklist — must not match exclude.
- fnmatch runs on the **lowercased** filename; patterns are lowercased at
  parse time (warcit/warcit.py:229-234).

Expressed as a single boolean Catalyst expression built from
``fnmatch.translate`` -> ``rlike``, so it is pushed down to the scan
(predicate pushdown — the Spark analog of the reference applying these
rules before any mime/mapfile work, SURVEY.md §4.1).
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fnmatch_any_expr(col: Column, patterns: list[str]) -> Column:
    """True iff the lowercased column matches any lowercased pattern."""
    lowered = F.lower(col)
    out = F.lit(False)
    for p in patterns:
        out = out | lowered.rlike(fnmatch.translate(p.lower()))
    return out


def include_exclude_expr(
    col: Column,
    include: list[str] | None,
    exclude: list[str] | None,
) -> Column:
    """The full truth table as one boolean expression."""
    if include and exclude:
        inc = fnmatch_any_expr(col, include)
        exc = fnmatch_any_expr(col, exclude)
        return inc | ~exc
    if include:
        return fnmatch_any_expr(col, include)
    if exclude:
        return ~fnmatch_any_expr(col, exclude)
    return F.lit(True)


def apply_include_exclude(
    df: DataFrame,
    col: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> DataFrame:
    return df.where(include_exclude_expr(F.col(col), include, exclude))
