"""URL canonicalization + host keys (pages/urls.py)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.urls import (
    canonical_url,
    canonical_url_sql,
    host_key,
    host_key_sql,
    host_of,
)

CASES = [
    ("HTTP://Example.com:80/a//b?b=2&a=1#frag", "http://example.com/a/b?a=1&b=2"),
    ("https://WWW.Site.ORG:443/", "https://www.site.org/"),
    ("https://site.org:8443/x", "https://site.org:8443/x"),  # non-default port kept
    ("http://user:pw@host.com/p", "http://host.com/p"),
    ("http://host.com", "http://host.com/"),  # empty path -> /
    ("http://host.com?q=1", "http://host.com/?q=1"),
    ("http://host.com/a?c=3&b=2&a=1", "http://host.com/a?a=1&b=2&c=3"),
    ("http://host.com/a?&b=2&", "http://host.com/a?b=2"),  # empty params dropped
    ("  http://host.com/a  ", "http://host.com/a"),  # trimmed
    ("http://HOST.com/CaseKept/Path", "http://host.com/CaseKept/Path"),  # path case kept
    ("ftp://Files.example.com:21/x", "ftp://files.example.com:21/x"),  # unknown default port kept
    ("not-a-url", "not-a-url"),  # scheme-less passes through
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(pd.DataFrame({"u": [c[0] for c in CASES]}))
    got = [r["c"] for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert got == [c[1] for c in CASES]


def test_sql_mirror_matches_spark(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c[0],) for c in CASES])
    want = [r[0] for r in con.sql(f"SELECT {canonical_url_sql('u')} FROM t").fetchall()]
    assert want == [c[1] for c in CASES]


def test_host_key_reversed(spark):
    urls = ["http://www.example.com/a", "https://a.b.co.uk:443/", "http://single/"]
    df = spark.createDataFrame(pd.DataFrame({"u": urls}))
    got = [r["k"] for r in df.select(host_key(F.col("u")).alias("k")).collect()]
    assert got == ["com.example.www", "uk.co.b.a", "single"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    want = [r[0] for r in con.sql(f"SELECT {host_key_sql('u')} FROM t").fetchall()]
    assert want == got


def test_host_of_strips_port_and_userinfo(spark):
    df = spark.createDataFrame(pd.DataFrame({"u": ["http://Bot:x@HOST.io:8080/p?q#f"]}))
    assert df.select(host_of(F.col("u")).alias("h")).collect()[0]["h"] == "host.io"


def test_canonical_is_idempotent_and_codegen(spark):
    """canonical(canonical(u)) == canonical(u); plan stays JVM-only."""
    df = spark.createDataFrame(pd.DataFrame({"u": [c[0] for c in CASES]}))
    once = df.select(canonical_url(F.col("u")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c2"), F.col("c"))
    assert twice.filter(F.col("c2") != F.col("c")).count() == 0
    # plan check on a range scan (a LocalTableScan of inline rows hides the
    # codegen span the real parquet path gets)
    rng = spark.range(10).select(
        F.concat(F.lit("HTTP://H.com:80/a?b=2&a="), F.col("id").cast("string")).alias("u")
    )
    plan = rng.select(canonical_url(F.col("u")).alias("c"))._jdf.queryExecution().executedPlan().toString()
    # the higher-order array_sort/filter lambdas keep the outer Project out
    # of the codegen span, but the whole expression is still JVM-evaluated:
    # zero Python anywhere in the plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_registered_domain_psl_branches(spark):
    """Every branch of the PSL algorithm: 2-label and 3-label public
    suffixes, deep subdomains, plain TLD, single label, host == suffix.
    Spark and DuckDB twins must agree case-for-case."""
    import duckdb

    from versatiles_rs_spark.pages.urls import registered_domain, registered_domain_sql

    cases = [
        ("www.example.co.uk", "example.co.uk"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("myblog.blogspot.com", "myblog.blogspot.com"),
        ("deep.myblog.blogspot.com", "myblog.blogspot.com"),
        ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
        ("x.bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com"),
        ("a.b.c.example.com", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("co.uk", "co.uk"),  # host == suffix: pass through (documented)
        ("user.github.io", "user.github.io"),
    ]
    df = spark.createDataFrame(pd.DataFrame({"h": [c[0] for c in cases]}))
    got = [r["d"] for r in df.select(registered_domain(F.col("h")).alias("d")).collect()]
    assert got == [c[1] for c in cases]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INTEGER, h VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(c[0] for c in cases)))
    want = [r[0] for r in con.sql(
        f"SELECT {registered_domain_sql('h')} FROM t ORDER BY i").fetchall()]
    assert got == want
