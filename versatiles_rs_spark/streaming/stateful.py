"""Custom stateful streaming operator: running per-tile statistics with
applyInPandasWithState.

The reference has no unbounded-state operators (SURVEY.md §2.11); this is
the engine's extension for live crawl feeds: per tile key, maintain
(count, sum_value, distinct-user sketch) across micro-batches. State is an
explicit tuple per key — survives across triggers, times out after
inactivity (NoTimeout here; swap in ProcessingTimeTimeout + setTimeoutDuration for
session-expiry semantics), and emits one updated row per touched key per
batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from versatiles_rs_spark.tile_math.coords import lonlat_to_tile_cols

_OUT_SCHEMA = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("n_users_approx", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("user_bits", LongType()),  # 64-bit user presence sketch
    ]
)


def _update_tile_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, vsum, bits = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        for uid in pdf["user_id"]:
            bits |= 1 << (hash(int(uid)) % 64)
    state.update((n, float(vsum), int(bits)))
    yield pd.DataFrame(
        {
            "x": [key[0]],
            "y": [key[1]],
            "n_events": [n],
            "value_sum": [round(vsum, 6)],
            "n_users_approx": [bin(bits).count("1")],
        }
    )


def streaming_stateful_tile_stats(points_stream: DataFrame, zoom: int) -> DataFrame:
    """Running per-tile (count, value sum, approx distinct users) maintained
    in explicit group state across micro-batches."""
    x, y = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), zoom)
    keyed = points_stream.withColumn("x", x).withColumn("y", y)
    return keyed.groupBy("x", "y").applyInPandasWithState(
        _update_tile_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_hll_registers(
    events_stream: DataFrame,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 7,
) -> DataFrame:
    """Streaming maintenance of the mergeable HLL sketch
    (functions/sketches.hll_registers): the register relation updated
    per micro-batch. Because the sketch build is itself a groupBy-max,
    Structured Streaming's stateful aggregation IS the merge law —
    state per (group, bucket) is one int (the running max rho), bounded
    by sketch geometry at any stream length, and the complete-mode
    output equals the batch sketch over everything seen (pytest-pinned).
    """
    from versatiles_rs_spark.functions.sketches import _hash60

    m = 1 << p
    h = _hash60(F.col(value_col))
    w = F.shiftright(h, p)
    rho = F.when(
        w > 0, F.lit(60 - p + 1) - F.length(F.bin(w))
    ).otherwise(F.lit(60 - p + 1))
    return (
        events_stream.select(
            F.col(group_col).alias("g"), (h % F.lit(m)).alias("bucket"), rho.alias("rho")
        )
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )
