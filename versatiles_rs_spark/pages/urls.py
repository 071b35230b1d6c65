"""URL canonicalization + host keys for Common-Crawl-style pages.

Web-scale dedup and grouping start from a canonical URL: the same page
is crawled as ``HTTP://Example.com:80/a//b?b=2&a=1#frag`` and
``http://example.com/a/b?a=1&b=2``. The canonicalizer below applies the
standard normalizations (RFC 3986 §6 syntax-based normalization plus the
query-parameter sort crawlers add):

1. strip the fragment,
2. lowercase the scheme and host (path/query case is preserved — it is
   significant),
3. drop userinfo and the scheme's default port (``:80``/``:443``),
4. collapse duplicate path slashes, empty path -> ``/``,
5. sort query parameters, drop empty ones.

Everything is a Column expression evaluated JVM-side (zero Python; the
regex chain runs in whole-stage codegen, the query-param sort uses
higher-order array functions that Spark evaluates outside the codegen
span but still in the JVM), with the SAME rules emitted as DuckDB SQL by
the ``*_sql`` mirrors so the driver oracle verifies them cross-engine. ``host_key``
yields the reversed-domain form (``com.example.www``) crawl stores sort
by, so one host's pages are contiguous under a range partitioner —
locality for per-site operators at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (pure codegen)."""
    u = F.regexp_replace(F.trim(url), "#.*", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, "^([^/?]*)", 1)
    pathq = rest.substr(F.length(authority) + F.lit(1), F.length(rest))
    host = F.lower(F.regexp_replace(authority, "^[^@]*@", ""))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(F.regexp_replace(path, "//+", "/"))
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != F.lit(""))), "&"
    )
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )
    # non-absolute inputs (no scheme) pass through untouched rather than
    # being mangled into "://..."
    return F.when(scheme == "", F.trim(url)).otherwise(out)


def canonical_url_sql(expr: str) -> str:
    """The identical canonicalization as one DuckDB SQL expression."""
    u = f"regexp_replace(trim({expr}), '#.*', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    authority = f"regexp_extract({rest}, '^([^/?]*)', 1)"
    pathq = f"substring({rest}, length({authority}) + 1)"
    host = f"lower(regexp_replace({authority}, '^[^@]*@', ''))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    path = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE regexp_replace({path}, '//+', '/', 'g') END"
    query = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    # coalesce: DuckDB's array_to_string yields NULL (not '') on the empty
    # list a query-less URL produces; Spark's array_join yields ''
    qsorted = (
        f"coalesce(array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"x -> x != '')), '&'), '')"
    )
    out = (
        f"{scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {qsorted} = '' THEN '' ELSE '?' || {qsorted} END)"
    )
    return f"CASE WHEN {scheme} = '' THEN trim({expr}) ELSE {out} END"


def host_of(url: Column) -> Column:
    """Lowercased host of an absolute URL (port and userinfo stripped)."""
    rest = F.regexp_replace(F.trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    authority = F.regexp_extract(rest, "^([^/?#]*)", 1)
    return F.lower(
        F.regexp_replace(F.regexp_replace(authority, "^[^@]*@", ""), ":[0-9]+$", "")
    )


def host_of_sql(expr: str) -> str:
    rest = f"regexp_replace(trim({expr}), '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    authority = f"regexp_extract({rest}, '^([^/?#]*)', 1)"
    return f"lower(regexp_replace(regexp_replace({authority}, '^[^@]*@', ''), ':[0-9]+$', ''))"


def host_key(url: Column) -> Column:
    """Reversed-domain sort key: www.example.com -> com.example.www."""
    return F.array_join(F.reverse(F.split(host_of(url), r"\.")), ".")


def host_key_sql(expr: str) -> str:
    return f"array_to_string(list_reverse(string_split({host_of_sql(expr)}, '.')), '.')"


# Embedded subset of the Mozilla Public Suffix List: the multi-label
# suffixes a crawl actually meets at volume. The real PSL is a data file
# a deployment ships alongside the job (~10k entries — still a broadcast
# literal by the same construction); the ALGORITHM (longest matching
# suffix + one label) is what is implemented and tested here.
PSL_MULTI = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "github.io", "gitlab.io", "blogspot.com", "s3.amazonaws.com",
)


def registered_domain(host: Column) -> Column:
    """Registered (PSL-aware) domain of a lowercased host:
    foo.bar.co.uk -> bar.co.uk, a.b.example.com -> example.com.
    Longest multi-label suffix wins; otherwise eTLD = last label.
    Hosts without dots (localhost, IPs are out of scope) pass through."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    # last-2 and last-3 joined: candidates against the multi-label set
    last2 = F.array_join(F.slice(parts, n - 1, 2), ".")
    last3 = F.array_join(F.slice(parts, n - 2, 3), ".")
    in2 = last2.isin(*PSL_MULTI)
    in3 = last3.isin(*PSL_MULTI)
    return (
        F.when(n <= 1, host)
        .when((n >= 4) & in3, F.array_join(F.slice(parts, n - 3, 4), "."))
        .when((n >= 3) & in2, F.array_join(F.slice(parts, n - 2, 3), "."))
        .otherwise(F.array_join(F.slice(parts, F.greatest(n - 1, F.lit(1)), 2), "."))
    )


def registered_domain_sql(expr: str) -> str:
    """DuckDB twin of registered_domain over a lowercased-host expression."""
    in_set = ", ".join(f"'{s}'" for s in PSL_MULTI)
    parts = f"string_split({expr}, '.')"
    n = f"len({parts})"
    last2 = f"array_to_string({parts}[{n} - 1 : {n}], '.')"
    last3 = f"array_to_string({parts}[{n} - 2 : {n}], '.')"
    return (
        f"CASE WHEN {n} <= 1 THEN {expr} "
        f"WHEN {n} >= 4 AND {last3} IN ({in_set}) "
        f"THEN array_to_string({parts}[{n} - 3 : {n}], '.') "
        f"WHEN {n} >= 3 AND {last2} IN ({in_set}) "
        f"THEN array_to_string({parts}[{n} - 2 : {n}], '.') "
        f"ELSE array_to_string({parts}[greatest({n} - 1, 1) : {n}], '.') END"
    )
