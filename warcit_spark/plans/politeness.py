"""Per-host politeness scheduling as a dataflow operator (SURVEY.md §2.9).

The reference is implicitly polite (single-threaded sequential walk,
/root/reference/warcit/base.py:36-41); a distributed frontier must make the
schedule explicit.  Semantics:

- per-host budget for the round: ``max(1, floor(host_budget / max(1,
  crawl_delay)))`` — a host's robots crawl_delay scales its budget down.
- total order within a host: ``priority DESC, url ASC`` (deterministic —
  canonical URLs are unique, so no tie leaves ordering to chance; this is
  the engine's *defined* total order replacing the reference's
  filesystem-enumeration order, SURVEY.md §7.3 #1).
- rows ranked beyond the budget are *deferred*: they stay in the frontier
  for the next round with priority untouched.

Scale: a naive ``row_number() OVER (PARTITION BY host)`` funnels a hot host
(60% of a 10^10 frontier) through one task.  We rank in two stages:

1. pre-rank over a *salted* host key (``host#pmod(murmur3(url), n_salt)``)
   and keep only ``rank <= budget`` per salt slot — each slot's winner set
   is a superset-contributor of the true per-host top-budget, so nothing
   that belongs in the final selection is lost, and the stage-2 input is
   bounded by ``n_salt * budget`` rows per host instead of the full host
   backlog;
2. exact ``row_number()`` over the plain host key on that bounded set.

Both stages are plain window functions (JVM, no Python); AQE handles any
residual skew.
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


def politeness_annotate(
    frontier: DataFrame,
    host_budget: int,
    n_salt: int = 16,
    priority_col: str = "priority",
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    allowed_col: str | None = None,
) -> DataFrame:
    """Annotate EVERY row with ``selected`` and (for selected rows)
    ``rank_in_host`` — grain-preserving, so deferred rows need no extra
    anti-join (they are simply ``~selected``).

    Stage 2 ranks all rows in one window by ordering stage-1 survivors
    first: within a host every survivor sorts before every non-survivor,
    so a survivor's rank equals its rank among survivors alone, and the
    selection cutoff is exact.  Input must carry ``crawl_delay`` (host
    level; joined from robots, 1.0 default).

    ``allowed_col``: robots-denied rows ride along un-selectable (ordered
    last within host, ANDed out of ``selected``) so the whole round
    schedules off one frame with no allowed/denied split.
    """
    budget = host_round_budget_expr(host_budget, F.col(delay_col))
    order = [F.col(priority_col).desc(), F.col(url_col).asc()]
    if allowed_col is not None:
        order = [F.col(allowed_col).desc(), *order]

    w_salt = Window.partitionBy(
        salted_host_expr(F.col(host_col), F.col(url_col), n_salt)
    ).orderBy(*order)
    pre = frontier.withColumn(
        "_pre_ok", F.row_number().over(w_salt) <= budget
    )

    w_host = Window.partitionBy(host_col).orderBy(
        F.col("_pre_ok").desc(), *order
    )
    ranked = pre.withColumn("_rk", F.row_number().over(w_host))
    selected = F.col("_pre_ok") & (F.col("_rk") <= budget)
    if allowed_col is not None:
        selected = selected & F.col(allowed_col)
    return ranked.select(
        *frontier.columns,
        selected.alias("selected"),
        F.when(selected, F.col("_rk")).alias("rank_in_host"),
    )


def politeness_select(
    frontier: DataFrame,
    host_budget: int,
    n_salt: int = 16,
    **kw,
) -> DataFrame:
    """Selected rows only (rank_in_host <= budget)."""
    return politeness_annotate(frontier, host_budget, n_salt, **kw).where(
        F.col("selected")
    ).drop("selected")
