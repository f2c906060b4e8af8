"""Robust readers for :class:`pyspark.sql.Observation` metrics.

The engine folds strict validations and recall accounting into the
caller's own action with observe() — zero extra jobs.  Two Spark 4.1
behaviors matter when doing that:

- ``Observation.getOrEmpty`` NPEs when NO action has run yet (it maps
  over ``row.schema`` of a null row).  Probe with
  ``getRowOrEmpty().isEmpty()`` (:func:`observation_ready`) instead.
- If the observed node appears MORE THAN ONCE in one executed plan (e.g.
  a self-join over the observed frame), Spark records an EMPTY merged
  metrics row — the metrics are simply gone, and both ``Observation.get``
  and positional reads fail.  There is no reader-side fix: plans that
  carry an observation must reference the observed subtree exactly once
  (self-UNIONS are fine — each branch computes identical metrics and
  they merge cleanly).  ``ngram_jaccard_pairs`` generates candidate
  pairs by posting-list expansion instead of an index self-join for
  exactly this reason.

:func:`observation_metrics` reads positionally so it also survives a
schema-less (but non-empty) row, and raises a clear error on the
empty-row case instead of an opaque ArrayIndexOutOfBounds.
"""

from __future__ import annotations

from pyspark.sql import Observation


def observation_ready(obs: Observation) -> bool:
    """True once the observed DataFrame's first action has completed
    (never blocks, never NPEs)."""
    return not obs._jo.getRowOrEmpty().isEmpty()


def observation_metrics(obs: Observation, *names: str) -> dict:
    """Metrics as a dict, keyed by ``names`` IN METRIC DECLARATION ORDER.

    Blocks until the observed frame's first action completes (same
    contract as ``Observation.get``), and reads positionally so a
    schema-less row still resolves.
    """
    jrow = obs._jo.getRow()
    if jrow.length() < len(names):
        raise RuntimeError(
            f"observation {obs._name!r} lost its metrics row "
            f"(got {jrow.length()} of {len(names)} fields) — the observed "
            "plan node was probably referenced more than once (self-join)"
        )
    return {n: jrow.get(i) for i, n in enumerate(names)}
