#!/usr/bin/env python
"""Interleaved A/B for sssp_costs round shapes on the bench fixture graph:
A = broadcast edges + AQE (shipped), B = static rounds (rows_hint, SMJ),
C = static rounds + broadcast hint (expected bad: broadcast re-exec).
Asserts identical results each pass."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import functions as F

    from versatiles_rs_spark.pages.links import sssp_costs
    from versatiles_rs_spark.session import get_spark

    spark = get_spark(app_name="r06-sssp-ab", master=f"local[{CPUS}]",
                      shuffle_partitions=max(2 * CPUS, 8))
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    u = (F.col("doc_id") % 500).alias("u")
    nodes = docs.select(u).distinct()
    edges = (
        nodes.select("u", F.explode(F.array((F.col("u") * 2 + 1) % 500,
                                            (F.col("u") + 7) % 500)).alias("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
        .select("src", "dst", (1 + (F.col("src") * 7 + F.col("dst") * 13) % 9).alias("wgt"))
    )
    seeds = nodes.filter(F.col("u") % 50 == 0).select(F.col("u").alias("node"))

    import json
    variants = {
        k: dict(v)
        for k, v in json.loads(
            os.environ.get(
                "R06_SSSP_VARIANTS",
                '{"A_bcast_aqe": {"stride": 8, "broadcast_edges": true},'
                ' "B_static_smj": {"stride": 8, "rows_hint": 500},'
                ' "B4_static_smj_s4": {"stride": 4, "rows_hint": 500}}',
            )
        ).items()
    }
    if os.environ.get("R06_SSSP_REVERSE"):
        variants = dict(reversed(list(variants.items())))
    res = {k: [] for k in variants}
    jobs = {}
    golden = None
    sssp_costs(edges, seeds, stride=8, broadcast_edges=True).count()  # warm-up
    for rep in range(3):
        for name, kw in variants.items():
            group = f"sssp-{name}-{rep}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            out = sorted(
                (r["node"], r["cost"])
                for r in sssp_costs(edges, seeds, **kw).collect()
            )
            res[name].append(round(time.time() - t0, 3))
            jobs[name] = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setLocalProperty("spark.jobGroup.id", None)
            if golden is None:
                golden = out
            assert out == golden, f"{name} result mismatch"
    for name in variants:
        print(f"{name:18s} times={res[name]} best={min(res[name])} jobs={jobs[name]}")
    spark.stop()


if __name__ == "__main__":
    main()
