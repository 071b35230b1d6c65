"""SparkSession factory tuned for the tiling workload.

Designed for a 1000-executor cluster reading ~100 TB even though tests run on
``local[N]``: AQE on (skew-join splitting for hot urban tiles), Arrow
execution for pandas UDFs, sensible shuffle-partition and batch sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "versatiles-rs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    On a real cluster, pass ``master=None`` and let spark-submit supply it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- scale hygiene -------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce partitions INSIDE cached plans too (default
        # false): the iterative operators cache per-round label/edge
        # tables, and without this every cached subtree runs its
        # shuffles at the full static partition count (64 single-row
        # tasks per stage observed in the CC loop) at ANY scale — with
        # it, cached plans get the same runtime partition sizing as
        # uncached ones.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- Arrow / pandas-UDF path --------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- determinism / parity with the reference ----------------------
        # Classic (non-ANSI) arithmetic: silent 64-bit wrap like Rust
        # wrapping_mul, needed by splitmix64/hilbert key columns and safe for
        # the oracle queries (which avoid overflow by construction).
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
