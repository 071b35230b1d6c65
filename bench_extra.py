#!/usr/bin/env python
"""Round-6 optimization harness — per-subquery timing + plan capture.

NOT part of the frozen driver contract (bench.py is the measured
surface; this file exists so optimization work can isolate each family
member per spark_optimization_guide.md §1: noop-sink timing, explain
capture, per-query seconds).

Usage:
  python bench_extra.py time  [name ...]     # per-subquery best-of-3
  python bench_extra.py plans <before|after> [name ...]  # dump explain
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from versatiles_rs_spark.session import get_spark

    return get_spark(
        app_name=f"bench-extra-local{CPUS}",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 8),
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


# Every headline family member as an individually timable unit.  Each
# entry returns a DataFrame (timed with a noop sink) or, for the
# multi-action iterative queries, a callable that runs its own actions.
def _q(name):
    import versatiles_rs_spark.queries as Q

    return getattr(Q, f"q_{name}")


SUBQUERIES = [
    # graph_frontier family
    "watershed_basins", "sssp_costs", "grid_dbscan", "skyline_docs",
    "interval_coverage",
    # geo_analytics family
    "od_flows", "tile_hotspots", "stay_points", "map_match",
    # temporal_ops family
    "asof_join", "hypertable_rollup", "hll_distinct", "cms_counts",
    "quantile_sketch",
    # standalone headliners
    "ann_topk", "zoom_stats",
]

# the six CORRECTNESS_r05 hash-red queries (oracle HUGEINT sums): the
# Spark side gets a double cast this round, so capture their plans too
RED_QUERIES = [
    "density_tiles", "areal_interp", "geohash_cells",
    "hypertable_rollup", "time_gapfill", "json_props_rollup",
]


def time_queries(names):
    spark = _session()
    out = {}
    for name in names:
        fn = _q(name)
        spark.sparkContext.setJobDescription(f"r06: {name}")
        fn(spark, SF_DIR).count()  # warm-up
        best = None
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", file=sys.stderr)
    spark.stop()
    print(json.dumps(out))


def dump_plans(tag, names):
    os.makedirs("plans/r06", exist_ok=True)
    spark = _session()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = _q(name)(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(mode)
        path = f"plans/r06/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    if cmd == "time":
        time_queries(rest or SUBQUERIES)
    elif cmd == "plans":
        tag, names = rest[0], rest[1:] or (SUBQUERIES + RED_QUERIES)
        dump_plans(tag, names)
    else:
        raise SystemExit(f"unknown command {cmd}")
