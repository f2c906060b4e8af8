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

    Implementation: pure string surgery + arithmetic field validation
    instead of ``try_to_timestamp`` + ``date_format`` — the digits pass
    through unchanged for every valid UTC timestamp (UTC has no DST, so the
    parse/format round trip was always the identity on the digits), and the
    DateTimeFormatter parse was the most expensive node of the expression
    (guide §1.2 per-task work).  Validity matches the parser's strict
    resolver: month 1-12, day 1-{28,29,30,31} with proleptic-Gregorian leap
    years (including year 0000), hour<=23, minute<=59, second<=59 — sweep-
    verified equal to the try_to_timestamp form over the full field domain
    (tests/test_timestamps.py).
    """
    t14 = F.substring(pad14_down_expr(ts), 1, 14)
    y = F.substring(t14, 1, 4).cast("int")
    mo = F.substring(t14, 5, 2).cast("int")
    dd = F.substring(t14, 7, 2).cast("int")
    hh = F.substring(t14, 9, 2).cast("int")
    mi = F.substring(t14, 11, 2).cast("int")
    ss = F.substring(t14, 13, 2).cast("int")
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    dmax = (
        F.when(mo.isin(1, 3, 5, 7, 8, 10, 12), 31)
        .when(mo.isin(4, 6, 9, 11), 30)
        .otherwise(F.when(leap, 29).otherwise(28))
    )
    valid = (
        mo.between(1, 12)
        & dd.between(1, dmax)
        & (hh <= 23)
        & (mi <= 59)
        & (ss <= 59)
    )
    iso = F.concat(
        F.substring(t14, 1, 4), F.lit("-"),
        F.substring(t14, 5, 2), F.lit("-"),
        F.substring(t14, 7, 2), F.lit("T"),
        F.substring(t14, 9, 2), F.lit(":"),
        F.substring(t14, 11, 2), F.lit(":"),
        F.substring(t14, 13, 2), F.lit("Z"),
    )
    return F.when(valid, iso)


def iso8601z_expr(ts: Column) -> Column:
    """Timestamp column -> ISO-8601 Z string (warcio ``datetime_to_iso_date``
    analog, used for WARC-Date from mtimes, warcit/warcit.py:501)."""
    return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")


def ts14_expr(ts: Column) -> Column:
    """Timestamp column -> 14-digit string (warcio ``TIMESTAMP_14``)."""
    return F.date_format(ts, "yyyyMMddHHmmss")
