"""PII scrubbing rules (pages/pii.py)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.pii import pii_counts, scrub_pii, scrub_pii_sql

CASES = [
    ("contact bob.smith+x@mail.example.org now", "contact <EMAIL> now"),
    ("card 4111 1111 1111 1111 exp", "card <CARD> exp"),
    ("card 4111-1111-1111-111 short", "card <CARD> short"),
    ("call +1 555-123-4567 or (020) 7946 0958", "call <PHONE> or <PHONE>"),
    ("plain 555-1234 line", "plain <PHONE> line"),
    ("server at 192.168.10.1 up", "server at <IP> up"),
    ("email a@b.co and ip 10.0.0.1", "email <EMAIL> and ip <IP>"),
    ("no pii here at all", "no pii here at all"),
    ("v1.2.3 release notes", "v1.2.3 release notes"),  # version strings kept
    ("year 2024 and 12345 ok", "year 2024 and 12345 ok"),  # bare numbers kept
    ("date 2024-01-15 safe", "date 2024-01-15 safe"),  # ISO dates kept
]


def test_scrub_cases_spark(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [c[0] for c in CASES]}))
    got = [r["c"] for r in df.select(scrub_pii(F.col("x")).alias("c")).collect()]
    assert got == [c[1] for c in CASES]


def test_sql_mirror_matches(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c[0],) for c in CASES])
    got = [r[0] for r in con.sql(f"SELECT {scrub_pii_sql('x')} FROM t").fetchall()]
    assert got == [c[1] for c in CASES]


def test_pii_counts(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": ["a@b.co c@d.io and 10.0.0.1 call 555-1234"]})
    )
    counts = pii_counts(F.col("x"))
    row = df.select(*[c.alias(k) for k, c in counts.items()]).collect()[0]
    assert (row["n_email"], row["n_ip"], row["n_phone"], row["n_card"]) == (2, 1, 1, 0)


def test_scrub_stays_jvm(spark):
    rng = spark.range(5).select(F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@x.io")).alias("x"))
    plan = rng.select(scrub_pii(F.col("x")).alias("c"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.lstrip().startswith("*(")
