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


def politeness_select(
    frontier: DataFrame,
    host_budget: int,
    n_salt: int = 16,
    priority_col: str = "priority",
    url_col: str = "url",
    host_col: str = "host",
    delay_col: str = "crawl_delay",
) -> DataFrame:
    """Return the selected rows with ``rank_in_host`` (1-based), bounded by
    the per-host budget.  Deferred rows are ``frontier LEFT ANTI selected``
    (computed by the caller so the frontier scan is reused).

    Input must carry ``crawl_delay`` (joined from robots; 1.0 default).
    """
    budget = host_round_budget_expr(host_budget, F.col(delay_col))
    order = [F.col(priority_col).desc(), F.col(url_col).asc()]

    w_salt = Window.partitionBy(
        salted_host_expr(F.col(host_col), F.col(url_col), n_salt)
    ).orderBy(*order)
    pre = (
        frontier.withColumn("_pre_rank", F.row_number().over(w_salt))
        .where(F.col("_pre_rank") <= budget)
        .drop("_pre_rank")
    )

    w_host = Window.partitionBy(host_col).orderBy(*order)
    return (
        pre.withColumn("rank_in_host", F.row_number().over(w_host))
        .where(F.col("rank_in_host") <= budget)
    )
