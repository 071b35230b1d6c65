#!/usr/bin/env python
"""Interleaved steps_per_round sweep for watershed_basins under the
static one-job round plan (rows_hint). Results asserted identical."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import functions as F

    from versatiles_rs_spark.operators.map_algebra import (
        dem_flow_edges,
        watershed_basins,
    )
    from versatiles_rs_spark.queries.spatial import _ws_tiles
    from versatiles_rs_spark.session import get_spark

    spark = get_spark(app_name="r06-ws-steps", master=f"local[{CPUS}]",
                      shuffle_partitions=max(2 * CPUS, 8))
    sc = spark.sparkContext
    steps_list = [int(s) for s in os.environ.get("R06_WS_STEPS", "1,2,3,4").split(",")]
    res = {s: [] for s in steps_list}
    jobs = {}
    golden = None

    def run(steps):
        edges = dem_flow_edges(_ws_tiles(spark), 32, 256)
        return sorted(
            (r["pid"], r["rep"])
            for r in watershed_basins(edges, steps_per_round=steps,
                                      rows_hint=256 * 256).collect()
        )

    run(3)  # warm-up
    for rep in range(3):
        for s in steps_list:
            group = f"ws-{s}-{rep}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            out = run(s)
            res[s].append(round(time.time() - t0, 3))
            jobs[s] = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setLocalProperty("spark.jobGroup.id", None)
            if golden is None:
                golden = out
            assert out == golden, f"steps={s} mismatch"
    for s in steps_list:
        print(f"steps={s} times={res[s]} best={min(res[s])} jobs={jobs[s]}")
    spark.stop()


if __name__ == "__main__":
    main()
