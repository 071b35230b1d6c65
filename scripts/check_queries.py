"""Driver-protocol parity sweep: named queries (or --all) vs DuckDB oracles.

Usage: python scripts/check_queries.py [--all | name ...]
"""
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
from versatiles_rs_spark.queries import ORACLES, QUERIES
from versatiles_rs_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
args = [a for a in sys.argv[1:] if a != "--all"]
NAMES = sorted(n for n in QUERIES if n in ORACLES) if "--all" in sys.argv else args

# get_spark, not a bare builder: the engine session pins non-ANSI mode
# (float/int coercion differs from the ANSI default!) — parity must be
# checked under the configuration the tests and jobs actually run
spark = get_spark(app_name="check-queries", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


fails = 0
for name in NAMES:
    try:
        got = norm(QUERIES[name](spark, SF_DIR).toPandas())
        want = norm(con.sql(ORACLES[name]).df())
        ok_cols = list(got.columns) == list(want.columns)
        ok_rows = len(got) == len(want)
        ok_vals = ok_cols and ok_rows
        if ok_vals:
            for c in got.columns:
                a, b = got[c], want[c]
                # dtype-strict gate (round-5 lesson): an integer column on
                # one side vs float on the other is exactly the DuckDB
                # HUGEINT->float64 class the driver's hash rejects even
                # when every value matches — fail it here, before the
                # float-tolerance branch can mask it.
                if pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
                    ok_vals = False
                    print(f"  {name}.{c}: dtype mismatch got={a.dtype} want={b.dtype}")
                    break
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    if not all(
                        (math.isnan(x) and math.isnan(y)) or abs(x - y) < 1e-9
                        for x, y in zip(pd.to_numeric(a), pd.to_numeric(b))
                    ):
                        ok_vals = False
                        print(f"  {name}.{c}: float mismatch")
                        break
                elif not (a.astype(str).values == b.astype(str).values).all():
                    ok_vals = False
                    i = (a.astype(str).values != b.astype(str).values).argmax()
                    print(f"  {name}.{c}: row {i}: got={a.iloc[i]!r} want={b.iloc[i]!r}")
                    break
        status = "MATCH" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(f"{name}: {status} rows={len(got)}/{len(want)} cols_ok={ok_cols}")
        if not ok_cols:
            print(f"  got  {list(got.columns)}\n  want {list(want.columns)}")
        if status == "FAIL":
            fails += 1
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {type(e).__name__}: {str(e)[:500]}")
spark.stop()
sys.exit(1 if fails else 0)
