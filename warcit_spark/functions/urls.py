"""URL synthesis, canonicalization, and hashing.

Semantics parity targets (reference, read-only at /root/reference):

- relpath -> URL synthesis: ``warcit/base.py:104-111`` (PrefixedFileInfo).
  Path separators normalized to '/', ends stripped of the char-set ``./``,
  then each char of the RFC-2396-reserved table ``#;?:@&=+$, `` replaced by
  its **lowercase** hex escape (``'%%%x' % ord(c)`` — so ``;`` -> ``%3b``).
- canonicalization (north-star superset of the above, BASELINE.json): lowercase
  scheme+host, strip fragment, strip default port (http:80 / https:443),
  sort query parameters, normalize empty path to '/'.

Everything below the pandas variant is pure ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen'd, no Python in the hot path.  The pandas UDF
variant exists as an independently-implemented cross-check used by tests
(two implementations agreeing on random inputs is the correctness argument).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's encode table: RFC 2396 reserved chars plus '#' and space,
# lowercase hex (warcit/base.py:106-108).  Order does not matter: no char's
# escape sequence contains another table char ('%' is not in the table).
RESERVED_ENCODE_TABLE: list[tuple[str, str]] = [
    (c, "%%%x" % ord(c)) for c in "#;?:@&=+$, "
]

DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def encode_relpath_expr(col: Column) -> Column:
    """Percent-encode the reference's reserved char set, lowercase hex."""
    out = col
    for ch, esc in RESERVED_ENCODE_TABLE:
        out = F.replace(out, F.lit(ch), F.lit(esc))
    return out


def synth_url_expr(url_prefix: str, relpath: Column) -> Column:
    """relpath -> URL exactly as the reference synthesizes it.

    '/'-normalize separators, strip leading/trailing chars in {'.', '/'}
    (Python ``str.strip('./')`` strips the *set*), percent-encode, prefix.
    """
    p = F.replace(relpath, F.lit("\\"), F.lit("/"))
    p = F.regexp_replace(p, r"^[./]+|[./]+$", "")
    return F.concat(F.lit(url_prefix), encode_relpath_expr(p))


def _sorted_query_expr(query: Column) -> Column:
    """Sort '&'-separated query params lexicographically (stable canonical)."""
    return F.array_join(F.array_sort(F.split(query, "&")), "&")


# Already-canonical fast path: one anchored regex proving canonicalize(u)==u
# so the full parse/rebuild chain short-circuits (most crawl-discovered
# links are already canonical).  The proof obligations, each enforced by the
# charset: lowercase http/https scheme; host is lowercase reg-name chars
# only (no userinfo '@', no port ':', no '%', no uppercase -> authority
# already canonical); a nonempty '/'-rooted path (empty path would gain a
# '/'); no '?' or '#' (no query to sort, no fragment to strip); no spaces
# or whitespace (charsets exclude them, anchors cover the ends); path chars
# restricted to RFC 3986 pchar/'/' minus '%' (all unconditionally legal to
# java.net.URI, so the slow path's validity gate would pass — '%' is
# excluded because a malformed escape flips URI to reject).  Anything not
# provably canonical falls through to the exact slow path.
# \z (not $): Java's $ also matches before a FINAL line terminator, so a
# url with a trailing '\n' would fast-path as "already canonical" with a
# non-null host while the slow path's trim+URI gate handles it differently
_FAST_CANON_RE = r"^https?://[a-z0-9._\-]+/[-a-zA-Z0-9._~!$&'()*+,;=:@/]*\z"
# host of a fast-path URL: first-match (a path may itself contain '://')
_FAST_HOST_RE = r"^https?://([^/]+)"

# scheme grammar per RFC 3986 == java.net.URI's: ALPHA *(ALPHA/DIGIT/+/-/.)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
# after 'scheme://', authority runs to the first '/', '?' or '#' (same
# delimiter set java.net.URI uses); the next group is the raw path
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"


def _canonical_parts(url: Column) -> dict[str, Column]:
    """Shared pieces of the canonical form.

    ONE ``try_parse_url`` call total (java.net.URI constructs + validates
    the whole string per call — at ~5M links/round the four-call version
    was ~65% of the link-extraction phase wall).  The AUTHORITY call is
    kept as the validity gate because URI validates the *entire* string
    (illegal chars anywhere -> null -> passthrough), which a regex cannot
    faithfully reproduce; scheme/path/query fall out of anchored regexes
    on the ~60-char URL that agree with URI's grammar whenever the gate
    passes (delimiter sets are identical, no decoding on raw parts).
    """
    u = F.trim(url)
    # fragment always goes first (cheap, and parse_url REF is never wanted)
    u = F.substring_index(u, "#", 1)
    # raw spaces are rejected by java.net.URI; pre-encode (lowercase hex,
    # matching the reference's encode table, warcit/base.py:107-108)
    u = F.replace(u, F.lit(" "), F.lit("%20"))

    auth_raw = F.try_parse_url(u, F.lit("AUTHORITY"))
    authority = F.lower(auth_raw)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    # valid <=> URI parses the whole string with an authority present AND
    # the string is scheme-qualified.  Given both, URI's PROTOCOL equals
    # the regex group (first ':' precedes any '/'), so this is the same
    # predicate as the old PROTOCOL-nonnull & AUTHORITY-nonnull gate.
    valid = auth_raw.isNotNull() & (scheme != "")

    # split host[:port] on a trailing ':<digits>' only — a first-':' split
    # mangles IPv6 bracket hosts ('[::1]:8080') and userinfo
    # ('user:pass@host'); '[::1]' ends in ']' so the port regex never
    # matches a bracketed address without a port
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    host = F.regexp_replace(authority, r":\d+$", "")
    default_port = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in DEFAULT_PORTS.items() for x in kv]
        ),
        scheme,
    )
    port_part = F.when(
        (port != "") & (port != F.coalesce(default_port, F.lit(""))),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))

    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    # raw query = everything after the first '?' (fragment already gone);
    # regexp_extract yields '' both for 'no ?' and for a trailing '?',
    # and both cases rendered '' under the old nonnull-&-nonempty test
    query = F.regexp_extract(u, r"\?(.*)", 1)
    query_part = F.when(
        query != "",
        F.concat(F.lit("?"), _sorted_query_expr(query)),
    ).otherwise(F.lit(""))

    canonical = F.concat(scheme, F.lit("://"), host, port_part, path, query_part)
    return {"u": u, "valid": valid, "host": host, "canonical": canonical}


def canonicalize_url_expr(url: Column) -> Column:
    """North-star canonical form as a pure Catalyst expression.

    lowercase scheme+host, drop fragment, drop default port, sort query
    params, empty path -> '/'.  Malformed URLs (no '://') pass through with
    only fragment-stripping and whitespace trim, so the pipeline never drops
    rows here (filtering is a separate, explicit operator).
    """
    p = _canonical_parts(url)
    return F.when(url.rlike(_FAST_CANON_RE), url).otherwise(
        F.when(p["valid"], p["canonical"]).otherwise(p["u"])
    )


def canonicalize_with_host_expr(url: Column) -> Column:
    """``struct<url:string, host:string>`` — canonical URL plus politeness
    host in ONE projection (the crawl hot path runs this per candidate
    link; a separate ``host_expr(canonical)`` re-parses the URL it just
    built).

    Valid branch: host = canonical authority minus userinfo ('@' is unique
    in a URI-validated authority) minus the trailing port — identical to
    ``lower(parse_url(HOST))`` for every URL whose host java.net.URI
    accepts; URLs URI would *reject as hosts* but accept as authorities
    (e.g. underscores: 'http://a_b.test/') keep their authority-derived
    host here instead of going NULL, which is the behavior a frontier
    wants (such links are crawlable and need a politeness key).
    Invalid branch: passthrough URL + ``host_expr`` semantics (NULL unless
    java.net.URI finds a host), so non-URLs still filter out downstream.
    """
    p = _canonical_parts(url)
    fused_host = F.substring_index(p["host"], "@", -1)
    fused_host = F.when(fused_host == "", F.lit(None)).otherwise(fused_host)
    # fast-path host: chars before the 3rd '/' minus the 'scheme://' prefix
    # — two byte scans instead of a regex Matcher per link; identical to
    # regexp_extract(_FAST_HOST_RE) for every fast-path URL (the fast regex
    # guarantees 'https?://<host>/...' with a ':'-free host, so the first
    # three '/' delimit exactly scheme and host)
    fast_host = F.substring_index(
        F.substring_index(url, "/", 3), "://", -1
    )
    return F.when(
        url.rlike(_FAST_CANON_RE),
        F.struct(
            url.alias("url"),
            fast_host.alias("host"),
        ),
    ).otherwise(
        F.when(
            p["valid"],
            F.struct(p["canonical"].alias("url"), fused_host.alias("host")),
        ).otherwise(
            F.struct(p["u"].alias("url"), host_expr(p["u"]).alias("host"))
        )
    )


def canonicalize_urls_pandas(urls: pd.Series) -> pd.Series:
    """Independent vectorized implementation (urllib-based) for cross-checks.

    Wrapped by tests in ``pandas_udf(StringType())``; the engine's hot path
    uses :func:`canonicalize_url_expr` (JVM).  Agreement between the two on
    adversarial inputs is asserted in tests/test_urls.py.
    """
    from urllib.parse import urlsplit

    def one(u: str) -> str:
        if u is None:
            return None
        u = u.strip()
        u = u.split("#", 1)[0]
        u = u.replace(" ", "%20")
        try:
            parts = urlsplit(u)
        except ValueError:
            return u
        if not parts.scheme or not parts.netloc:
            return u
        scheme = parts.scheme.lower()
        netloc = parts.netloc
        # strip only a trailing ':<digits>' default port (same rule as the
        # JVM expression: IPv6 brackets and userinfo colons never match)
        m = re.search(r":(\d+)$", netloc)
        if m and m.group(1) == DEFAULT_PORTS.get(scheme, ""):
            netloc = netloc[: m.start()]
        netloc = netloc.lower()
        path = parts.path or "/"
        query = ""
        if parts.query:
            query = "?" + "&".join(sorted(parts.query.split("&")))
        return f"{scheme}://{netloc}{path}{query}"

    return urls.map(one)


def host_expr(url: Column) -> Column:
    """Lowercased host of a URL (politeness/partitioning key)."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_hash64_expr(url: Column) -> Column:
    """64-bit dedup/prefilter hash (xxhash64).

    The exact seen-set keys on the full canonical URL string — at 10^10 URLs
    even a 64-bit hash sees birthday collisions (~3/1000 per 10^9), and a
    32-bit murmur3 is guaranteed to collide, so hashes here are *partitioning
    and prefilter* keys only, never identity (SURVEY.md §7.3 hard part #1).
    """
    return F.xxhash64(url)


def salted_host_expr(host: Column, url: Column, n_salt: int = 16) -> Column:
    """Skew-defeating partition key: ``host '#' pmod(murmur3(url), n_salt)``.

    Spark's ``hash()`` is murmur3_x86_32 — the north-star's murmur3.  A hot
    host (60% of a 10^10 frontier) fans out across ``n_salt`` partitions
    instead of melting one executor; AQE skew-join handles the residue.
    """
    return F.concat(host, F.lit("#"), F.pmod(F.hash(url), F.lit(n_salt)).cast("string"))


# ------------------------------------------------------------------ URL spam
# Regex-parsed components (NOT try_parse_url) so an oracle engine without
# Spark's parse_url can replay the byte-identical parse; patterns are in
# the Java-regex/RE2 common subset (functions/html.py stance).
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def url_spam_score_expr(url: Column) -> Column:
    """Heuristic URL spam/trap score — the frontier-side quality gate a
    web-scale crawl applies BEFORE spending a fetch (cf. the URL
    filtering stage of the public CC-derived pipelines: spammy hosts are
    digit-heavy, trap paths are deep and self-repeating, faceted-search
    explosions carry many query params).  Pure row-local JVM exprs; the
    score pushes into the frontier scan.

    score = host_digit_frac                  (0..1)
          + 0.2  * max(path_depth - 4, 0)    (deep-path penalty)
          + 0.25 * max(n_params - 2, 0)      (faceted-explosion penalty)
          + (1 - distinct_segment_ratio)     (calendar/session traps)

    rounded to 6 decimals.  Thresholding is the caller's policy (the
    fixture queries use score >= 0.5).
    """
    host = F.regexp_replace(
        F.regexp_extract(url, _HOST_RE, 1), r":[0-9]+$", ""
    )
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)

    host_len = F.length(host)
    digit_frac = F.when(
        host_len > 0,
        (host_len - F.length(F.regexp_replace(host, "[0-9]", "")))
        .cast("double")
        / host_len,
    ).otherwise(F.lit(0.0))

    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    depth = F.size(segs)
    distinct_ratio = F.when(
        depth > 0, F.size(F.array_distinct(segs)).cast("double") / depth
    ).otherwise(F.lit(1.0))

    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )

    return F.round(
        digit_frac
        + 0.2 * F.greatest(depth - 4, F.lit(0)).cast("double")
        + 0.25 * F.greatest(n_params - 2, F.lit(0)).cast("double")
        + (F.lit(1.0) - distinct_ratio),
        6,
    )


# ------------------------------------------------------------------- SURT
def surt_expr(url: Column) -> Column:
    r"""Sort-friendly URI Reordering Transform — the CDX lookup key of
    the web-archive ecosystem the reference lives in (pywb / OpenWayback
    index WARCs produced by warcit under SURT keys; cf. the IA ``surt``
    library the webrecorder stack canonicalizes with).

        http://www.Example.com:8080/A/b?b=2&a=1#f
            -> com,example:8080)/a/b?a=1&b=2

    Wayback-canon semantics: lowercase everything; drop scheme, fragment
    and userinfo; strip one leading ``www`` / ``www<digits>`` host label;
    drop the scheme's default port, keep any other; reverse the host
    labels comma-joined; empty path -> ``/``; sort query params.  A CDX
    key exists only for fetchable URLs, so anything without a
    ``scheme://host`` shape yields NULL (the caller filters, matching the
    frontier's explicit-filter convention).

    Pure row-local JVM exprs over the same anchored Java-regex/RE2
    common-subset parse as ``url_spam_score_expr`` (NOT try_parse_url),
    so an oracle engine can replay the byte-identical key; the expr
    pushes into the frontier/CDX scan.
    """
    u = F.lower(F.trim(url))
    u = F.substring_index(u, "#", 1)
    scheme = F.regexp_extract(u, _SCHEME_RE, 1)
    auth = F.substring_index(F.regexp_extract(u, _HOST_RE, 1), "@", -1)
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    host = F.regexp_replace(auth, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\d*\.", "")

    default_port = F.element_at(
        F.create_map(*[F.lit(x) for kv in DEFAULT_PORTS.items() for x in kv]),
        scheme,
    )
    port_part = F.when(
        (port != "") & (port != F.coalesce(default_port, F.lit(""))),
        F.concat(F.lit(":"), port),
    ).otherwise(F.lit(""))

    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?(.*)", 1)
    query_part = F.when(
        query != "", F.concat(F.lit("?"), _sorted_query_expr(query))
    ).otherwise(F.lit(""))

    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.when(
        host != "",
        F.concat(rev_host, port_part, F.lit(")"), path, query_part),
    ).otherwise(F.lit(None).cast("string"))


def surt_py(url: str) -> str | None:
    """Pure-Python twin of :func:`surt_expr` (independent reimplementation
    for tests/property pins — the canonicalize_urls_pandas convention).
    Mirrors the expression semantics exactly: Java-regex-compatible
    patterns on the lowered string, space-only trim."""
    u = url.strip(" ").lower()
    u = u.split("#", 1)[0]
    m = re.match(r"^([a-z][a-z0-9+.\-]*)://", u)
    scheme = m.group(1) if m else ""
    m = re.match(r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", u)
    auth = (m.group(1) if m else "").split("@")[-1]
    m = re.search(r":(\d+)$", auth)
    port = m.group(1) if m else ""
    host = re.sub(r":\d+$", "", auth)
    host = re.sub(r"^www\d*\.", "", host)
    if not host:
        return None
    dp = DEFAULT_PORTS.get(scheme, "")
    port_part = ":" + port if port and port != dp else ""
    m = re.match(r"^[a-z][a-z0-9+.\-]*://[^/?#]*([^?#]*)", u)
    path = (m.group(1) if m else "") or "/"
    m = re.search(r"\?(.*)", u)
    query = m.group(1) if m else ""
    q_part = "?" + "&".join(sorted(query.split("&"))) if query else ""
    return ",".join(reversed(host.split("."))) + port_part + ")" + path + q_part
