"""Timestamp normalization (reference F6, warcit/warcit.py:262-269).

The reference pipeline: strip all non-digits (warcio ``DATE_TIMESPLIT``),
pad to 14 digits *downward* (warcio ``PAD_14_DOWN = '10000101000000'``:
``'2011'`` -> ``'20110101000000'``, ``'201102'`` -> ``'20110201000000'``),
then format as ISO-8601 Z.  Re-expressed as pure Catalyst expressions —
string surgery only, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PAD_14_DOWN = "10000101000000"


def pad14_down_expr(ts: Column) -> Column:
    """Strip non-digits and pad to a 14-digit ``YYYYMMDDHHMMSS`` string."""
    digits = F.regexp_replace(ts, "[^0-9]", "")
    # append the tail of the pad constant beyond the current length
    return F.concat(digits, F.substr(F.lit(PAD_14_DOWN), F.length(digits) + 1))


def normalize_ts14_expr(ts: Column) -> Column:
    """Free-form date string -> ISO-8601 ``yyyy-MM-ddTHH:mm:ssZ``.

    Mirrors ``_set_fixed_dt`` (warcit/warcit.py:262-269).  Input longer than
    14 digits is truncated to 14 (warcio parses exactly 14).  Returns NULL
    for strings that do not form a valid timestamp (the reference would
    raise; a distributed engine surfaces bad rows instead of killing the job
    — callers assert on the null count when strictness is wanted).
    """
    t14 = F.substring(pad14_down_expr(ts), 1, 14)
    parsed = F.try_to_timestamp(t14, F.lit("yyyyMMddHHmmss"))
    return F.date_format(parsed, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def iso8601z_expr(ts: Column) -> Column:
    """Timestamp column -> ISO-8601 Z string (warcio ``datetime_to_iso_date``
    analog, used for WARC-Date from mtimes, warcit/warcit.py:501)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def ts14_expr(ts: Column) -> Column:
    """Timestamp column -> 14-digit string (warcio ``TIMESTAMP_14``)."""
    return F.date_format(ts, "yyyyMMddHHmmss")
