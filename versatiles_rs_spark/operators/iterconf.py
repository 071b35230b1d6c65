"""Scoped planner configuration for driver-synchronized iterative loops.

AQE plans every exchange subtree of an action as its own stage-job, and
on this environment each job submission costs a fixed scheduling floor
(~87 ms measured: ``spark.range(10, numPartitions=1).count()``), so an
iterative loop whose per-round tables are small pays for *jobs*, not
bytes — watershed's pointer-doubling rounds ran 23 stage-jobs under AQE
at sf0.1.  With AQE off the whole round (joins + count) is ONE static
job.  The static shuffle partition count must then come from somewhere,
and a core-count constant is exactly the local-mode tuning this round
forbids — so the caller supplies a row-count bound it knows from problem
structure (one row per raster pixel, one row per node, ...) and the
partition count is derived from data size (guide §2.2: partitions sized
by bytes), clamped to the session's parallelism ceiling.

Use this ONLY where a caller can bound the loop's table sizes a priori;
loops over tables of unknown size keep AQE (its runtime sizing is the
right default — see the sssp A/B in OPTIMIZATION_r06.md, where AQE off
measured worse because broadcast-hinted wave joins re-executed their
broadcast subtrees per action).

Session-conf caveat: ``spark.conf`` is session-global, so the scoped
toggle assumes no OTHER driver thread is submitting SQL while a loop
runs (true everywhere in this engine — queries and jobs are
single-threaded on the driver; streaming queries capture their conf at
start and never run these loops).  A caller that overlaps independent
jobs from a thread pool (guide §2.6) must not combine that with these
hints.
"""

from __future__ import annotations

from contextlib import contextmanager

# ~500k narrow rows per static partition.  Deliberately smaller than the
# guide's 100 MB-1 GB *shuffle-byte* target: these loops are join/
# distinct COMPUTE over tiny rows, so the binding constraint at the
# small end is task parallelism, not shuffle block size (flow_accum A/B
# at ~4M pairs: 1 part = 21.8 s, 8 = 8.9 s, 16 = 9.9 s — serial compute
# loses far more than task scheduling costs).  At real scale the
# parallelism cap binds long before this constant matters.
ROWS_PER_STATIC_PARTITION = 500_000


def static_loop_partitions(spark, n_rows: int) -> int:
    """Partition count for a static loop shuffle over ``n_rows`` narrow
    rows: data-size-derived with a cluster-parallelism cap, never a bare
    core-count constant."""
    cap = max(spark.sparkContext.defaultParallelism * 4, 4)
    return max(1, min(cap, (int(n_rows) // ROWS_PER_STATIC_PARTITION) + 1))


@contextmanager
def static_round_conf(spark, n_rows: int):
    """AQE off + size-derived static shuffle partitions, restored on exit
    (exception-safe).  Wrap the *loop only*: the DataFrame a loop returns
    is a materialized checkpoint, so downstream planning happens back
    under the caller's configuration."""
    conf = spark.conf
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    old_parts = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", str(static_loop_partitions(spark, n_rows)))
    try:
        yield
    finally:
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        conf.set("spark.sql.shuffle.partitions", old_parts)
