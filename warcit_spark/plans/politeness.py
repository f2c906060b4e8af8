"""Per-host politeness scheduling as a dataflow operator (SURVEY.md §2.9).

The reference is implicitly polite (single-threaded sequential walk,
/root/reference/warcit/base.py:36-41); a distributed frontier must make the
schedule explicit.  Semantics:

- per-host budget for the round: ``max(1, floor(host_budget / max(1,
  crawl_delay)))`` — a host's robots crawl_delay scales its budget down
  (crawl_delay is host-level, so the budget is uniform within a host —
  the condition under which two-stage ranking is exactly the single-window
  spec).
- total order within a host: ``priority DESC, url ASC`` (deterministic —
  canonical URLs are unique; this is the engine's *defined* total order
  replacing the reference's filesystem-enumeration order, SURVEY.md §7.3).
- rows ranked beyond the budget are *deferred*: they stay in the frontier
  for the next round, priority untouched.

Scale: a naive ``row_number() OVER (PARTITION BY host)`` funnels a hot
host (60% of a 10^10 frontier) through one task.  Ranking runs in two
stages over two frames:

1. :func:`politeness_prerank` — ``_pre_ok`` flag from a window over the
   *salted* host key (``host#pmod(murmur3(url), n_salt)``): the hot host
   fans out over ``n_salt`` tasks, and at most ``n_salt x budget`` rows
   per host survive.  Every true top-budget row survives (it is top-budget
   within its own slot), so stage 2 loses nothing.
2. :func:`politeness_rank` — exact ``row_number()`` over the plain host
   key on the *bounded* survivor set only.  The hot host's full backlog is
   never sorted in one task.

Deferred rows = stage-1 losers UNION stage-2 overflow — set algebra on the
two frames, no anti-join.  :func:`politeness_annotate` wraps both into one
grain-preserving frame for small-scale callers and tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from warcit_spark.functions.urls import salted_host_expr


def host_round_budget_expr(host_budget: int, crawl_delay: Column) -> Column:
    return F.greatest(
        F.lit(1),
        F.floor(F.lit(float(host_budget)) / F.greatest(F.lit(1.0), crawl_delay)),
    ).cast("int")


def politeness_prerank(
    frontier: DataFrame,
    host_budget: int,
    n_salt: int = 16,
    priority_col: str = "priority",
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    allowed_col: str | None = None,
) -> DataFrame:
    """Stage 1: add ``_pre_ok`` (survives the salted pre-ranking).

    Robots-denied rows (``allowed_col`` false) are never ``_pre_ok`` and
    never consume a slot (ordered last within each salt slot).
    """
    budget = host_round_budget_expr(host_budget, F.col(delay_col))
    order = [F.col(priority_col).desc(), F.col(url_col).asc()]
    if allowed_col is not None:
        order = [F.col(allowed_col).desc(), *order]
    w_salt = Window.partitionBy(
        salted_host_expr(F.col(host_col), F.col(url_col), n_salt)
    ).orderBy(*order)
    pre_ok = F.row_number().over(w_salt) <= budget
    if allowed_col is not None:
        pre_ok = pre_ok & F.col(allowed_col)
    return frontier.withColumn("_pre_ok", pre_ok)


def politeness_rank(
    survivors: DataFrame,
    host_budget: int,
    priority_col: str = "priority",
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay",
) -> DataFrame:
    """Stage 2: exact per-host rank + ``selected`` flag on the bounded
    survivor set (callers pass ``pre.where('_pre_ok')``)."""
    budget = host_round_budget_expr(host_budget, F.col(delay_col))
    w_host = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    ranked = survivors.withColumn("_rk", F.row_number().over(w_host))
    selected = F.col("_rk") <= budget
    return ranked.select(
        *survivors.columns,
        selected.alias("selected"),
        F.when(selected, F.col("_rk")).alias("rank_in_host"),
    )


def politeness_annotate(
    frontier: DataFrame,
    host_budget: int,
    n_salt: int = 16,
    allowed_col: str | None = None,
    **kw,
) -> DataFrame:
    """One grain-preserving frame: every row flagged selected/rank.

    Convenience wrapper (stage-1 window evaluates once per output branch);
    the crawl plan uses the two frames directly and persists stage 1.
    """
    pre = politeness_prerank(
        frontier, host_budget, n_salt, allowed_col=allowed_col, **kw
    )
    ranked = politeness_rank(pre.where(F.col("_pre_ok")), host_budget, **kw)
    losers = pre.where(~F.col("_pre_ok")).select(
        *pre.columns,
        F.lit(False).alias("selected"),
        F.lit(None).cast("int").alias("rank_in_host"),
    )
    return ranked.unionByName(losers).drop("_pre_ok")


def politeness_select(
    frontier: DataFrame,
    host_budget: int,
    n_salt: int = 16,
    **kw,
) -> DataFrame:
    """Selected rows only (rank_in_host <= budget)."""
    pre = politeness_prerank(frontier, host_budget, n_salt, **kw)
    ranked = politeness_rank(
        pre.where(F.col("_pre_ok")), host_budget,
        **{k: v for k, v in kw.items() if k != "allowed_col"},
    )
    return ranked.where(F.col("selected")).drop("selected", "_pre_ok")