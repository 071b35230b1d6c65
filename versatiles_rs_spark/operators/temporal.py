"""Temporal join operators Spark lacks as built-ins: as-of join, interval
(range) join, and hypertable-style multi-resolution rollup.

These are the time-series counterparts of the spatial cell joins
(spatial/cells.py): each rewrites an inequality join — which Catalyst
would execute as a broadcast-nested-loop or cartesian — into an
equi-join / window plan with a bounded number of shuffles.

Scale shapes
------------
- ``asof_join``: the classic union–sort–carry plan. Both sides are
  tagged and unioned, ONE hash exchange on the join key feeds a window
  sort, and ``last(..., ignoreNulls)`` carries the most recent right-side
  row forward onto each left row. No range explosion, no per-key
  collect; cost is one shuffle of |L|+|R| rows regardless of time span.
- ``range_join``: intervals are chopped onto a fixed bucket grid
  (``F.sequence`` explode — bounded by interval_len/bucket_width rows
  per interval), events map to exactly ONE bucket, and the join becomes
  an equi-join on (key, bucket) + a residual range predicate. Because a
  point lives in exactly one bucket, each qualifying (event, interval)
  pair meets exactly once — no dedup pass. Bucket width trades explode
  factor vs candidate density exactly like cell size in the spatial
  joins.
- ``hypertable_rollup``: TimescaleDB-continuous-aggregate shape — raw
  events are read ONCE into the finest bucket (map-side partial agg +
  one exchange), and every coarser level re-aggregates the previous
  level (bounded by bucket count, not event count). Sums are over
  per-row 1e6-quantized int64 values so results are order-free exact.

Cross-engine determinism: all bucket math is integer microseconds
(``unix_micros`` / ``epoch_us``, see operators/sessions.py for the
timezone argument); value sums quantize per-row BEFORE summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

US_PER_MIN = 60 * 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: append to each left row the ``value_cols`` of
    the most recent right row with the same key and ``right_ts <=
    left_ts`` (``<`` when ``strict``). Left rows with no earlier right
    row keep NULLs.

    The right side must be unique per (key, ts); callers with duplicate
    snapshot timestamps must pre-aggregate (the query wrapper does).
    Equal timestamps: the right row sorts BEFORE the left row (``<=``
    semantics) unless ``strict``.
    """
    lt = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rt = F.unix_micros(F.col(right_ts).cast("timestamp"))
    # Tag order at equal t decides <= vs < : snaps first (0) for <=.
    snap_tag = 1 if strict else 0
    left_tag = 1 - snap_tag
    l_cols = [c for c in left.columns]
    tagged_l = left.select(
        F.col(on).alias("_k"),
        lt.alias("_t"),
        F.lit(left_tag).alias("_tag"),
        *[F.col(c) for c in l_cols if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        rt.alias("_t"),
        F.lit(snap_tag).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_tag") == left_tag).select(
        F.col("_k").alias(on),
        *[F.col(c) for c in l_cols if c != on],
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 60 * US_PER_MIN,
) -> DataFrame:
    """Interval join: (event, interval) pairs where the interval shares
    ``on`` and ``start_us <= ts < end_us`` (half-open, integer micros).

    ``intervals`` carries integer-microsecond bounds; events bucket by
    ``floor(ts_us / bucket_us)``. Intervals explode onto every bucket
    they touch; a point lies in exactly one bucket, so pairs are unique
    by construction. Returns events columns + interval columns.
    """
    # Bucket ids are bucket STARTS computed with integer modulo (never
    # float division — micros exceed exact-double range at wide spans).
    ev = events.withColumn("_ts_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
    ev = ev.withColumn("_bk", F.col("_ts_us") - F.col("_ts_us") % F.lit(bucket_us))
    last_touched = (F.col(end_col) - F.lit(1)) - (F.col(end_col) - F.lit(1)) % F.lit(
        bucket_us
    )  # end exclusive: last bucket is the one containing end-1
    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.col(start_col) - F.col(start_col) % F.lit(bucket_us),
                last_touched,
                F.lit(bucket_us),
            )
        ),
    )
    joined = ev.join(iv, on=[on, "_bk"], how="inner").filter(
        (F.col(start_col) <= F.col("_ts_us")) & (F.col("_ts_us") < F.col(end_col))
    )
    return joined.drop("_bk", "_ts_us")


def hypertable_rollup(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    levels_us: dict[str, int] | None = None,
) -> DataFrame:
    """Multi-resolution continuous aggregate: per (key, bucket) counts and
    quantized-value sum/min/max at each level, all levels computed in
    ONE aggregation pass (raw data read once).

    Output: (level, key, bucket_us, n_events, sum_qv, min_qv, max_qv)
    where qv = round(value * 1e6) as int64 (order-free exact sums) and
    bucket_us is the bucket start in epoch microseconds.

    Plan shape (round-6 optimization, guide §2.4): the previous form
    built each coarser level's plan FROM the finer level's plan, but
    Catalyst does not canonicalize the shared subtree across the union
    branches, so the physical plan scanned the raw table and ran the
    finest-level aggregation once PER level (3 scans + 3 exchanges for
    the default levels). Exploding each row into its (level, bucket)
    assignments and aggregating once gives 1 scan + 1 exchange with
    map-side partial aggregation per level bucket — the same shuffle
    bytes as the three partial-agged exchanges combined, two fewer
    scans, two fewer shuffles. Values are identical: count/sum/min/max
    over int64 qv are associative, so per-level-from-raw equals
    coarser-from-finer exactly.
    """
    if levels_us is None:
        levels_us = {
            "minute": US_PER_MIN,
            "hour": 60 * US_PER_MIN,
            "day": 24 * 60 * US_PER_MIN,
        }
    names = sorted(levels_us, key=levels_us.__getitem__)
    qv = F.round(F.col(value_col).cast("double") * 1e6).cast("bigint")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))

    level_buckets = F.array(
        *[
            F.struct(
                F.lit(name).alias("level"),
                (us - us % F.lit(levels_us[name])).alias("bucket_us"),
            )
            for name in names
        ]
    )
    return (
        events.select(
            F.col(key_col).alias("key"),
            qv.alias("qv"),
            F.explode(level_buckets).alias("_lb"),
        )
        .select(F.col("_lb.level").alias("level"), "key", F.col("_lb.bucket_us").alias("bucket_us"), "qv")
        .groupBy("level", "key", "bucket_us")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("qv").alias("sum_qv"),
            F.min("qv").alias("min_qv"),
            F.max("qv").alias("max_qv"),
        )
    )


def time_gapfill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """TimescaleDB-style ``time_bucket_gapfill`` + ``locf``: per key, a
    DENSE bucket grid from the key's first to last observed bucket, each
    bucket carrying (n_obs, qsum) of its own events, with empty buckets
    gap-filled by carrying the last observed bucket's qsum forward
    (``gap`` = 1 marks filled rows). The per-bucket aggregate is a
    1e6-quantized int64 sum (order-free exact, the hypertable_rollup
    discipline), so LOCF carries an exact integer.

    Plan: one map-side-combined agg to (key, bucket) — bounded by
    span/bucket_us per key, not event count; per-key bucket bounds from
    a second agg over THAT (bucket-count-sized) table; the dense grid is
    a ``sequence`` explode of [min_b, max_b] (never a global calendar
    join); one left join puts observations onto the grid, and one
    key-partitioned window does the carry. Every post-agg stage is
    bounded by grid size — the raw event table is touched exactly once.
    The grid join is keyed (key, bucket) while the window keys on key
    alone: at 100 TB you'd repartition by key once and let both reuse it.
    """
    k, t, v = key_col, ts_col, value_col
    # TRUE integer div (the od_flows/retention discipline): float division
    # of micros can round across a bucket boundary.
    b = F.expr(f"unix_micros(cast({t} as timestamp)) div {bucket_us}")
    qv = F.round(F.col(v).cast("double") * 1_000_000).cast("long")
    obs = (
        events.select(F.col(k), b.alias("bucket"), qv.alias("qv"))
        .groupBy(k, "bucket")
        .agg(F.count(F.lit(1)).alias("n_obs"), F.sum("qv").alias("qsum"))
    )
    spans = obs.groupBy(k).agg(
        F.min("bucket").alias("min_b"), F.max("bucket").alias("max_b")
    )
    grid = spans.select(
        k, F.explode(F.sequence("min_b", "max_b")).alias("bucket")
    )
    filled = grid.join(obs, [k, "bucket"], "left")
    w = (
        Window.partitionBy(k)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        k,
        (F.col("bucket") * bucket_us).alias("bucket_start_us"),
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.last("qsum", ignorenulls=True).over(w).alias("qsum_filled"),
        F.when(F.col("n_obs").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("gap"),
    )


def interval_coverage(
    intervals: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Interval union per key — the gaps-and-islands rollup: overlapping
    or touching [start, end) intervals merge into islands; output per
    key is (n_islands, covered_us, max_island_us). The question behind
    "total active time from overlapping sessions", "effective crawl
    coverage from retries", DVR-style dedup of spans.

    Fully relational: ONE hash exchange on the key feeds two windows —
    an island starts where start > running max(end) of all PRIOR
    intervals (sorted by start, then end; touching spans merge, the
    standard half-open rule), island ids are the running sum of starts,
    and island extent is max(end) - min(start). All integer microseconds;
    no Python, no self-join, no explode.
    """
    k, s, e = key_col, start_col, end_col
    w = Window.partitionBy(k).orderBy(s, e)
    prev_max = F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prev_max.isNull() | (F.col(s) > prev_max), F.lit(1)
    ).otherwise(F.lit(0))
    flagged = intervals.select(
        F.col(k).alias("k"), F.col(s).alias("s"), F.col(e).alias("e"),
        new_island.alias("ni"),
    )
    w2 = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.select(
        "k", "s", "e", F.sum("ni").over(w2).alias("island")
    )
    per_island = islands.groupBy("k", "island").agg(
        (F.max("e") - F.min("s")).alias("extent")
    )
    return per_island.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("extent").alias("covered_us"),
        F.max("extent").alias("max_island_us"),
    )


def trend_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    t0_us: int,
    x_unit_us: int = US_PER_MIN,
    y_quant: int = 1000,
) -> DataFrame:
    """Per-key OLS trend as EXACT integers — "is this entity's metric
    rising or falling, and how fast" across millions of keys in one
    aggregation. The least-squares slope over points (x_i, y_i) is
    num/den with num = n*Σxy − Σx*Σy and den = n*Σx² − (Σx)²; both are
    exact int64 when x = integer time units since ``t0_us`` and y is
    ``y_quant``-quantized, so the only float is the caller's final
    division (slope sign/zero is decidable without it: sign(num), since
    den >= 0). Unit choices bound the products: minutes-since-epoch-
    anchor x ~1e4-5 and 1e3-quantized y keep n*Σxy far inside int64 for
    per-key counts into the millions.

    Plan: ONE map-side-combined aggregation (n, Σx, Σy, Σxy, Σx²) per
    key — no window, no sort, no second pass.
    Output: (key, n, num_q, den_q).
    """
    k = key_col
    x = F.expr(
        f"(unix_micros(cast({ts_col} as timestamp)) - {t0_us}) div {x_unit_us}"
    )
    y = F.round(F.col(value_col).cast("double") * y_quant).cast("long")
    base = events.select(F.col(k).alias("key"), x.alias("x"), y.alias("y"))
    agg = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return agg.select(
        "key",
        "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num_q"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den_q"),
    )
