#!/usr/bin/env python
"""Interleaved A/B of the static-round loop paths vs the default paths —
same session, alternating, so ambient drift cancels in the pairing.
Also records Spark job counts per variant (noise-free)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import functions as F

    from versatiles_rs_spark.session import get_spark

    spark = get_spark(
        app_name="r06-hint-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 8),
    )
    sc = spark.sparkContext

    from versatiles_rs_spark.operators.map_algebra import (
        dem_flow_edges,
        flow_accumulation,
        watershed_basins,
    )
    from versatiles_rs_spark.pages.links import bfs_hops
    from versatiles_rs_spark.queries.spatial import _ws_tiles

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    u = (F.col("doc_id") % 500).alias("u")
    nodes = docs.select(u).distinct()
    bfs_edges = (
        nodes.select("u", F.explode(F.array((F.col("u") * 2 + 1) % 500,
                                            (F.col("u") + 7) % 500)).alias("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
    )
    seeds = nodes.filter(F.col("u") % 50 == 0).select(F.col("u").alias("node"))

    def ws(hint):
        edges = dem_flow_edges(_ws_tiles(spark), 32, 256)
        return watershed_basins(edges, rows_hint=(256 * 256) if hint else None) \
            .groupBy("rep").agg(F.count(F.lit(1))).count()

    def bfs(hint):
        return bfs_hops(bfs_edges, seeds, max_hops=4,
                        rows_hint=500 if hint else None).count()

    def flow(hint):
        edges = dem_flow_edges(_ws_tiles(spark), 32, 256, compress=False)
        return flow_accumulation(edges, static_rounds=hint) \
            .groupBy("acc").agg(F.count(F.lit(1))).count()

    cases = [("watershed", ws), ("bfs", bfs), ("flow", flow)]
    reps = int(os.environ.get("R06_AB_REPS", "3"))
    res = {name: {False: [], True: []} for name, _ in cases}
    jobs = {name: {} for name, _ in cases}
    for name, fn in cases:
        fn(False)  # warm-up
        for rep in range(reps):
            for hint in (False, True):
                group = f"{name}-{hint}-{rep}"
                sc.setJobGroup(group, group)
                t0 = time.time()
                fn(hint)
                res[name][hint].append(round(time.time() - t0, 3))
                jobs[name][hint] = len(sc.statusTracker().getJobIdsForGroup(group))
                sc.setLocalProperty("spark.jobGroup.id", None)
    for name, _ in cases:
        off, on = res[name][False], res[name][True]
        pairs = [round(b / a, 3) for a, b in zip(off, on)]
        print(f"{name}: default={off} hinted={on} paired_ratio={pairs} "
              f"jobs {jobs[name][False]} -> {jobs[name][True]}")
    spark.stop()


if __name__ == "__main__":
    main()
