#!/usr/bin/env python
"""Round-6 session-3 experiment: do the iterative-loop rounds get cheaper
with AQE OFF + a tiny size-derived static shuffle-partition count?

The session-1 A/B (AQE off at the static 64-partition default) measured
WORSE (sssp 2.2 -> 4.6 s) because every loop exchange became a 64-task
stage over a ~500-row table.  This experiment separates the two factors:
AQE's per-query-stage job submission (~87 ms/job floor here) vs the
static task count.  Config is set via runtime SQL conf around the whole
query, which approximates the scoped per-loop form well enough to decide
whether to build it.

Usage: python scripts/r06_aqe_loop_expt.py [names...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from versatiles_rs_spark.session import get_spark

    return get_spark(
        app_name="r06-aqe-loop-expt",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 8),
    )


def run(names):
    import versatiles_rs_spark.queries as Q

    spark = _session()
    sc = spark.sparkContext
    results = {}
    base_cfgs = [
        ("aqe_on(base)", {"spark.sql.adaptive.enabled": "true",
                          "spark.sql.shuffle.partitions": str(max(2 * CPUS, 8))}),
        ("aqe_off_p2", {"spark.sql.adaptive.enabled": "false",
                        "spark.sql.shuffle.partitions": "2"}),
        ("aqe_off_p4", {"spark.sql.adaptive.enabled": "false",
                        "spark.sql.shuffle.partitions": "4"}),
        ("aqe_on_p4", {"spark.sql.adaptive.enabled": "true",
                       "spark.sql.shuffle.partitions": "4"}),
    ]
    alt_cfgs = [
        ("aqe_on(base)", {"spark.sql.adaptive.enabled": "true",
                          "spark.sql.shuffle.partitions": str(max(2 * CPUS, 8))}),
        ("aqe_off_p1", {"spark.sql.adaptive.enabled": "false",
                        "spark.sql.shuffle.partitions": "1"}),
        ("aqe_off_p8", {"spark.sql.adaptive.enabled": "false",
                        "spark.sql.shuffle.partitions": "8"}),
        ("aqe_off_p16", {"spark.sql.adaptive.enabled": "false",
                         "spark.sql.shuffle.partitions": "16"}),
    ]
    configs = alt_cfgs if os.environ.get("R06_EXPT_ALT") else base_cfgs
    for name in names:
        fn = getattr(Q, f"q_{name}")
        fn(spark, SF_DIR).count()  # warm-up under default conf
        results[name] = {}
        # interleave configs xN so ambient drift hits all configs alike
        n_reps = int(os.environ.get("R06_EXPT_REPS", "3"))
        for rep in range(n_reps):
            for label, conf in configs:
                for k, v in conf.items():
                    spark.conf.set(k, v)
                group = f"{name}-{label}-{rep}"
                sc.setJobGroup(group, group)
                t0 = time.time()
                n = fn(spark, SF_DIR).count()
                dt = time.time() - t0
                jobs = len(sc.statusTracker().getJobIdsForGroup(group))
                sc.setLocalProperty("spark.jobGroup.id", None)
                rec = results[name].setdefault(label, {"times": [], "jobs": jobs, "rows": n})
                rec["times"].append(round(dt, 3))
                rec["jobs"] = jobs
        # restore defaults
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", str(max(2 * CPUS, 8)))
    for name, by_cfg in results.items():
        print(f"== {name}")
        for label, rec in by_cfg.items():
            print(f"  {label:14s} best={min(rec['times']):.3f} all={rec['times']} jobs={rec['jobs']} rows={rec['rows']}")
    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1:] or ["sssp_costs", "watershed_basins", "grid_dbscan"])
