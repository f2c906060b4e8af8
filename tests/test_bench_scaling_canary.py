"""Canary-window protocol of tools/bench_scaling.py (logic only — child
runs are monkeypatched, no Spark)."""

from __future__ import annotations

import importlib.util
import os
import sys

spec = importlib.util.spec_from_file_location(
    "bench_scaling",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "bench_scaling.py"),
)
bs = importlib.util.module_from_spec(spec)
sys.modules["bench_scaling"] = bs
spec.loader.exec_module(bs)


def _scripted(canary_walls, level_walls):
    """run_canary -> next canary wall; run_level -> next per-level result."""
    canaries = iter(canary_walls)
    levels = iter(level_walls)

    def fake_canary(heap=None):
        return next(canaries)

    def fake_level(cpus, *a, **kw):
        return {"cpus": cpus, "round_sec": next(levels),
                "round_urls": [100, 100]}

    return fake_canary, fake_level


def test_contended_window_skipped_and_retried(monkeypatch):
    # windows: calm(30) -> contended(90, skipped) -> calm(31)
    fc, fl = _scripted(
        [30.0, 90.0, 31.0],
        [[10, 10], [3, 3], [12, 12], [3.2, 3.1]],  # rep0 lo/hi, rep1 lo/hi
    )
    monkeypatch.setattr(bs, "run_canary", fc)
    monkeypatch.setattr(bs, "run_level", fl)
    res = bs.measure_pair(1, 4, 1000, 500, 10, 8, rounds=2, repeats=2)
    assert res["completed_repeats"] == 2
    assert res["canary_windows_skipped"] == 1
    assert res["contended_run"] is False
    assert res["canary_sec"] == [30.0, 90.0, 31.0]
    # min-pool over the two KEPT reps only
    assert res["local1_round_sec_min"] == [10, 10]
    assert res["local4_round_sec_min"] == [3, 3]


def test_never_stabilizing_run_flagged(monkeypatch):
    # every window drifts worse than 1.5x the best: first is kept (it IS
    # the reference), the rest are skipped until attempts run out
    fc, fl = _scripted(
        [100.0, 40.0, 90.0, 95.0],
        [[10, 10], [3, 3], [10, 10], [3, 3]],
    )
    monkeypatch.setattr(bs, "run_canary", fc)
    monkeypatch.setattr(bs, "run_level", fl)
    res = bs.measure_pair(1, 4, 1000, 500, 10, 8, rounds=2, repeats=2)
    # rep0 kept at canary=100; canary=40 kept (new min); 90, 95 skipped ->
    # attempts exhausted at 2*repeats with 2 completed... adjust: repeats=3
    # to force an incomplete run
    fc, fl = _scripted(
        [100.0, 40.0, 90.0, 95.0, 99.0, 98.0],
        [[10, 10], [3, 3], [10, 10], [3, 3]],
    )
    monkeypatch.setattr(bs, "run_canary", fc)
    monkeypatch.setattr(bs, "run_level", fl)
    res = bs.measure_pair(1, 4, 1000, 500, 10, 8, rounds=2, repeats=3)
    assert res["completed_repeats"] == 2 < 3
    assert res["contended_run"] is True          # incomplete
    # AND the kept rep0 canary (100) exceeds 1.5x the best seen (40)
    assert max([100.0, 40.0]) > bs.CANARY_DRIFT * min(res["canary_sec"])


def test_all_windows_contended_returns_stub(monkeypatch):
    # first canary sets ref, then a calmer one makes EVERY later window
    # look contended; with repeats=1 the first window completes, so use
    # the pathological ordering where windows alternate under attempts cap
    fc, fl = _scripted([10.0, 100.0, 100.0, 100.0], [[5, 5], [2, 2]])
    monkeypatch.setattr(bs, "run_canary", fc)
    monkeypatch.setattr(bs, "run_level", fl)
    res = bs.measure_pair(1, 4, 1000, 500, 10, 8, rounds=2, repeats=2)
    assert res["completed_repeats"] == 1
    assert res["contended_run"] is True
