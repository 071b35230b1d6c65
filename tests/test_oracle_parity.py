"""Driver-style oracle parity: every queries() entry vs its DuckDB oracle.

Replicates the driver's comparison: row count, column names, and
order-insensitive value equality at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from versatiles_rs_spark.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, ddb, name):
    if name not in ORACLES:
        # rows-only contract (non-SQL-expressible op): must run and return a
        # well-formed DataFrame deterministically
        df = QUERIES[name](spark, SF_DIR)
        a = df.toPandas()
        b = QUERIES[name](spark, SF_DIR).toPandas()
        assert len(a) == len(b)
        assert list(a.columns) == list(b.columns)
        return
    got = _normalize(QUERIES[name](spark, SF_DIR).toPandas())
    want = _normalize(ddb.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]) or pd.api.types.is_float_dtype(want[c]):
            a = pd.to_numeric(got[c]).values
            b = pd.to_numeric(want[c]).values
            assert all(
                (math.isnan(x) and math.isnan(y)) or x == pytest.approx(y, abs=1e-9)
                for x, y in zip(a, b)
            ), f"{name}: float column {c} differs"
        else:
            pd.testing.assert_series_equal(
                got[c].astype(str), want[c].astype(str), check_names=False, obj=f"{name}.{c}"
            )
