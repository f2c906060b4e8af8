"""Sinks: WARC file export, parquet state deltas (see plans/state.py)."""
