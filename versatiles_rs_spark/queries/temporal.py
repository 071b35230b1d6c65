"""Temporal-operator queries: as-of join, interval (range) join,
hypertable rollup, and the mergeable HLL distinct sketch — the custom
operators Spark lacks as built-ins, each with an integer-exact DuckDB
oracle (inequality-join / window spec forms of the same semantics).

All time math is integer microseconds (unix_micros / epoch_us; the
engine session pins UTC so naive parquet timestamps agree across
engines — see operators/sessions.py docstring); all value sums quantize
per-row to 1e6 int64 BEFORE summation so results are order-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.sketches import hll_registers
from versatiles_rs_spark.operators.temporal import (
    US_PER_MIN,
    asof_join,
    hypertable_rollup,
    range_join,
)

_QV = "CAST(round(CAST(value AS DOUBLE) * 1e6) AS BIGINT)"


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/temporal.py): every non-purchase
    event picks up the most recent earlier purchase of the same user
    (ts <= event ts). One union + one hash exchange + one window sort —
    no range explosion; oracle is the max-timestamp relational spec."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    qv = F.round(F.col("value").cast("double") * 1e6).cast("bigint")
    snaps = (
        ev.filter("event_type = 'purchase'")
        .select(
            "user_id",
            F.col("ts").alias("snap_ts"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("snap_us"),
            qv.alias("snap_qv"),
        )
        .groupBy("user_id", "snap_ts", "snap_us")
        .agg(F.max("snap_qv").alias("snap_qv"))
    )
    lefts = ev.filter("event_type <> 'purchase'").select("event_id", "user_id", "ts")
    out = asof_join(
        lefts, snaps, on="user_id", left_ts="ts", right_ts="snap_ts",
        value_cols=["snap_us", "snap_qv"],
    )
    return out.select("event_id", "user_id", "asof_snap_us", "asof_snap_qv")


O_ASOF_JOIN = f"""
WITH snaps AS (
  SELECT user_id, epoch_us(ts) AS snap_us, max({_QV}) AS snap_qv
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
), lefts AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type <> 'purchase'
), cand AS (
  SELECT l.event_id, max(s.snap_us) AS m_us
  FROM lefts l JOIN snaps s ON s.user_id = l.user_id AND s.snap_us <= l.ts_us
  GROUP BY 1
)
SELECT l.event_id, l.user_id, c.m_us AS asof_snap_us, s.snap_qv AS asof_snap_qv
FROM lefts l
LEFT JOIN cand c ON c.event_id = l.event_id
LEFT JOIN snaps s ON s.user_id = l.user_id AND s.snap_us = c.m_us
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (operators/temporal.py): every 5th purchase opens a
    per-user window of (1 + id%48) hours; pairs = events inside a window
    of their own user. Bucketed equi-join (1h grid) + residual predicate
    — never an inequality join; oracle is the direct range join."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.filter("event_type = 'purchase' AND event_id % 5 = 0").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        us.alias("start_us"),
        (us + (F.lit(1) + F.col("event_id") % 48) * F.lit(3600 * 1_000_000)).alias(
            "end_us"
        ),
    )
    pairs = range_join(
        ev.select("event_id", "user_id", "ts"), iv, on="user_id",
        bucket_us=60 * US_PER_MIN,
    )
    return pairs.select("interval_id", "event_id")


O_RANGE_JOIN = """
WITH iv AS (
  SELECT event_id AS interval_id, user_id, epoch_us(ts) AS start_us,
         epoch_us(ts) + (1 + event_id % 48) * 3600000000 AS end_us
  FROM events WHERE event_type = 'purchase' AND event_id % 5 = 0
)
SELECT i.interval_id, e.event_id
FROM events e JOIN iv i ON e.user_id = i.user_id
 AND i.start_us <= epoch_us(e.ts) AND epoch_us(e.ts) < i.end_us
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup (operators/temporal.py): minute/hour/
    day (count, sum, min, max) per event_type, coarser levels aggregated
    from finer (raw read once). Oracle recomputes each level from raw —
    equal because the aggregates are mergeable and sums are quantized
    int64."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = hypertable_rollup(ev)
    return out.select(
        "level", F.col("key").alias("event_type"), "bucket_us",
        F.col("n_events").cast("bigint").alias("n_events"),
        # oracle-side sum(BIGINT) -> HUGEINT -> pandas float64: match the
        # dtype so the driver hash agrees (CORRECTNESS_r05 hash-red fix)
        F.col("sum_qv").cast("double").alias("sum_qv"),
        "min_qv", "max_qv",
    )


O_HYPERTABLE_ROLLUP = f"""
WITH q AS (
  SELECT event_type, epoch_us(ts) AS us, {_QV} AS qv FROM events
), lv AS (
  SELECT 'minute' AS level, 60000000 AS w UNION ALL
  SELECT 'hour', 3600000000 UNION ALL
  SELECT 'day', 86400000000
)
SELECT lv.level, q.event_type, q.us - q.us % lv.w AS bucket_us,
       count(*) AS n_events, sum(q.qv) AS sum_qv,
       min(q.qv) AS min_qv, max(q.qv) AS max_qv
FROM q CROSS JOIN lv
GROUP BY 1, 2, 3
"""


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch (functions/sketches.py): the per-event_type
    distinct-user sketch AS A RELATION (bucket, max_rho) — persistable
    per crawl snapshot and merged with groupBy-max. Registers are
    integer-exact off the md5 hash bridge; the oracle recomputes them."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = hll_registers(ev, ["event_type"], "user_id", p=7)
    return sk.select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("max_rho").cast("bigint").alias("max_rho"),
    )


O_HLL_DISTINCT = """
WITH h AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
)
SELECT event_type, h % 128 AS bucket,
       CAST(max(CASE WHEN (h >> 7) > 0 THEN 54 - length(bin(h >> 7))
                     ELSE 54 END) AS BIGINT) AS max_rho
FROM h GROUP BY 1, 2
"""


def q_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (functions/sketches.py): the per-event_type
    user-frequency sketch AS A RELATION (row, bucket, cnt) — additive
    snapshot merges, bounded d*w rows per group at any corpus size.
    The oracle recomputes identical buckets off the md5 hash bridge."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from versatiles_rs_spark.functions.sketches import cms_sketch

    sk = cms_sketch(ev, ["event_type"], "user_id", d=4, w=64)
    return sk.select(
        "event_type",
        F.col("row").cast("bigint").alias("hrow"),
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )


O_CMS_COUNTS = """
WITH h AS (
  SELECT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events
), hh AS (
  SELECT event_type, h % 1073741824 AS lo, h >> 30 AS hi FROM h
), e AS (
  SELECT event_type, i AS hrow, (lo + (i + 1) * hi) % 64 AS bucket
  FROM hh CROSS JOIN generate_series(0, 3) AS s(i)
)
SELECT event_type, hrow, bucket, count(*) AS cnt
FROM e GROUP BY 1, 2, 3
"""


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-bucket quantile histogram (functions/sketches.py): the
    per-event_type value-distribution sketch as a bounded relation —
    base-2^(1/8) geometric buckets computed with bit ops only (no float
    log), additive merges. Oracle recomputes identical buckets."""
    from versatiles_rs_spark.functions.sketches import log_histogram

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    h = log_histogram(ev, ["event_type"], "value")
    return h.select(
        "event_type",
        F.col("bucket_id").cast("bigint").alias("bucket_id"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )


O_QUANTILE_SKETCH = f"""
WITH q AS (
  SELECT event_type, {_QV} AS qv FROM events
  WHERE {_QV} > 0
)
SELECT event_type,
       CASE WHEN qv < 8 THEN qv
            ELSE length(bin(qv)) * 8 + (qv >> (length(bin(qv)) - 4)) % 8
       END AS bucket_id,
       count(*) AS cnt
FROM q GROUP BY 1, 2
"""


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (operators/sessions.event_funnel): earliest
    strictly-increasing signup -> view -> purchase chain per user; k
    bounded user-keyed aggregations, nothing event-log-sized after
    stage 1. Oracle chains the same min-timestamp joins."""
    from versatiles_rs_spark.operators.sessions import event_funnel

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return event_funnel(ev, ["signup", "view", "purchase"])


O_EVENT_FUNNEL = """
WITH s1 AS (
  SELECT user_id AS u, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id AS u, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON s1.u = e.user_id
  WHERE e.event_type = 'view' AND epoch_us(e.ts) > s1.t1 GROUP BY 1
), s3 AS (
  SELECT e.user_id AS u, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 ON s2.u = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2 GROUP BY 1
)
SELECT s1.u AS user_id,
       CAST((t1 IS NOT NULL)::INT + (t2 IS NOT NULL)::INT
            + (t3 IS NOT NULL)::INT AS BIGINT) AS stage_reached,
       t1, t2, t3
FROM s1 LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u
"""


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (operators/sessions.retention_cohorts): users by
    first-seen day x active day-offset — two natural-key shuffles, the
    join moves one row per user. Integer day math (modulo, no float
    division). Oracle recomputes the matrix."""
    from versatiles_rs_spark.operators.sessions import retention_cohorts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return retention_cohorts(ev)


O_RETENTION_COHORTS = """
WITH d AS (
  SELECT user_id AS u,
         (epoch_us(ts) - epoch_us(ts) % 86400000000) // 86400000000 AS day
  FROM events
), first AS (
  SELECT u, min(day) AS cohort_day FROM d GROUP BY 1
)
SELECT f.cohort_day, d.day - f.cohort_day AS offset_days,
       count(DISTINCT d.u) AS n_users
FROM d JOIN first f ON f.u = d.u
GROUP BY 1, 2
"""


def q_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flows (operators/sessions.od_flows): consecutive
    events of a user become trips between z6 tile cells; one user-key
    window + one OD-key aggregation (bounded by 4^12, not the log).
    Oracle is the identical lag-window spec."""
    from versatiles_rs_spark.operators.sessions import od_flows
    from versatiles_rs_spark.queries._shared import _events_geo

    return od_flows(_events_geo(spark, sf_dir), zoom=6)


def _od_flows_oracle() -> str:
    from versatiles_rs_spark.queries._shared import LAT_SQL, LON_SQL, _tile_sql

    return f"""
WITH pts AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat
  FROM events
), cells AS (
  SELECT user_id, us, event_id,
         {_tile_sql("x", z="6")} AS cx, {_tile_sql("y", z="6")} AS cy
  FROM pts
), trips AS (
  SELECT user_id, lag(cx) OVER w AS ox, lag(cy) OVER w AS oy,
         cx AS dx, cy AS dy
  FROM cells
  WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
)
SELECT ox, oy, dx, dy, count(*) AS n_trips, count(DISTINCT user_id) AS n_users
FROM trips WHERE ox IS NOT NULL GROUP BY 1, 2, 3, 4
"""


O_OD_FLOWS = _od_flows_oracle()


def q_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point detection (operators/sessions.stay_points): consecutive
    events within 120k quantized units chain into spatial segments;
    segments lasting >= 12h are stays. Exact integer hop distances +
    integer-micro durations; one user-key exchange. Oracle = identical
    window spec."""
    from versatiles_rs_spark.operators.sessions import stay_points

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts",
        ((F.col("event_id") * F.lit(2654435761)) % F.lit(360_000) - F.lit(180_000)).alias("qx"),
        ((F.col("event_id") * F.lit(2246822519)) % F.lit(170_000) - F.lit(85_000)).alias("qy"),
    )
    return stay_points(ev, radius_q=120_000, min_duration_us=43_200_000_000)


O_STAY_POINTS = """
WITH p AS (
  SELECT user_id AS u, event_id AS tb, epoch_us(ts) AS us,
         (event_id * 2654435761) % 360000 - 180000 AS qx,
         (event_id * 2246822519) % 170000 - 85000 AS qy
  FROM events
), flagged AS (
  SELECT u, tb, us, qx, qy,
         CASE WHEN lag(qx) OVER w IS NULL
                   OR (qx - lag(qx) OVER w) * (qx - lag(qx) OVER w)
                      + (qy - lag(qy) OVER w) * (qy - lag(qy) OVER w)
                      > 14400000000
              THEN 1 ELSE 0 END AS new_seg
  FROM p WINDOW w AS (PARTITION BY u ORDER BY us ASC, tb ASC)
), seg AS (
  SELECT u, tb, us, qx, qy,
         sum(new_seg) OVER (PARTITION BY u ORDER BY us ASC, tb ASC
                            ROWS UNBOUNDED PRECEDING) AS seg_no
  FROM flagged
), firsts AS (
  SELECT u, seg_no, qx, qy,
         row_number() OVER (PARTITION BY u, seg_no ORDER BY us ASC, tb ASC) AS rn
  FROM seg
), agg AS (
  SELECT u, seg_no, count(*) AS n_events, min(us) AS start_us,
         max(us) - min(us) AS duration_us
  FROM seg GROUP BY 1, 2
)
SELECT a.u AS user_id, CAST(a.seg_no AS BIGINT) AS seg_no, a.n_events,
       a.start_us, a.duration_us, f.qx AS qx0, f.qy AS qy0
FROM agg a JOIN firsts f ON f.u = a.u AND f.seg_no = a.seg_no AND f.rn = 1
WHERE a.duration_us >= 43200000000
"""


def q_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled LOCF time series (operators/temporal.time_gapfill):
    per-user dense 6-hour bucket grid over the user's own observed span,
    empty buckets carrying the last observed bucket's quantized sum
    forward (gap = 1). ~Half the grid is gaps at sf0.01, so the carry
    rule is attested on real holes. Oracle = identical grid/LOCF spec
    with DuckDB's generate_series + last_value IGNORE NULLS."""
    from versatiles_rs_spark.operators.temporal import time_gapfill

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = time_gapfill(events, "user_id", "ts", "value", 21_600_000_000)
    # qsum_filled carries an oracle-side HUGEINT sum -> pandas float64
    return out.withColumn(
        "qsum_filled", F.col("qsum_filled").cast("double")
    ).orderBy("user_id", "bucket_start_us")


O_TIME_GAPFILL = f"""
WITH obs AS (
  SELECT user_id, epoch_us(ts) // 21600000000 AS bucket,
         count(*) AS n_obs, sum({_QV}) AS qsum
  FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(bucket) AS min_b, max(bucket) AS max_b FROM obs GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(min_b, max_b)) AS bucket FROM spans
), f AS (
  SELECT g.user_id, g.bucket, o.n_obs, o.qsum
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.bucket = g.bucket
)
SELECT user_id, bucket * 21600000000 AS bucket_start_us,
       coalesce(n_obs, 0) AS n_obs,
       last_value(qsum IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS qsum_filled,
       CASE WHEN n_obs IS NULL THEN 1 ELSE 0 END AS gap
FROM f ORDER BY user_id, bucket_start_us
"""


def q_hausdorff_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory Hausdorff similarity (spatial/trajsim.hausdorff_pairs):
    directed + symmetric Hausdorff d² between candidate user-trajectory
    pairs (u, u+10) over exact integer quantized coords (the stay_points
    derivation). Pair blocking is explicit and bounded; trajectories
    co-locate via one (u, v) exchange and the max-min matrix runs in
    numpy blocks. Oracle brute-forces max(min(d²)) both directions."""
    from versatiles_rs_spark.spatial.trajsim import hausdorff_pairs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").alias("user"),
        ((F.col("event_id") * F.lit(2654435761)) % F.lit(360_000) - F.lit(180_000)).alias("qx"),
        ((F.col("event_id") * F.lit(2246822519)) % F.lit(170_000) - F.lit(85_000)).alias("qy"),
    )
    users = ev.select(F.col("user").alias("u")).distinct()
    pairs = users.join(
        users.select((F.col("u") - 10).alias("u")).distinct(), "u"
    ).select("u", (F.col("u") + 10).alias("v"))
    return hausdorff_pairs(ev, pairs).orderBy("u")


O_HAUSDORFF_PAIRS = """
WITH p AS (
  SELECT user_id AS u, event_id AS pid,
         (event_id * 2654435761) % 360000 - 180000 AS qx,
         (event_id * 2246822519) % 170000 - 85000 AS qy
  FROM events
), users AS (
  SELECT DISTINCT user_id AS u FROM events
), pr AS (
  SELECT a.u AS u, b.u AS v FROM users a JOIN users b ON b.u = a.u + 10
), mins_ab AS (
  SELECT pr.u, pr.v, pa.pid,
         min((pa.qx - pb.qx) * (pa.qx - pb.qx)
             + (pa.qy - pb.qy) * (pa.qy - pb.qy)) AS mind2
  FROM pr JOIN p pa ON pa.u = pr.u JOIN p pb ON pb.u = pr.v
  GROUP BY 1, 2, 3
), hab AS (
  SELECT u, v, max(mind2) AS h_ab FROM mins_ab GROUP BY 1, 2
), mins_ba AS (
  SELECT pr.u, pr.v, pb.pid,
         min((pa.qx - pb.qx) * (pa.qx - pb.qx)
             + (pa.qy - pb.qy) * (pa.qy - pb.qy)) AS mind2
  FROM pr JOIN p pa ON pa.u = pr.u JOIN p pb ON pb.u = pr.v
  GROUP BY 1, 2, 3
), hba AS (
  SELECT u, v, max(mind2) AS h_ba FROM mins_ba GROUP BY 1, 2
)
SELECT hab.u, hab.v, hab.h_ab, hba.h_ba, greatest(hab.h_ab, hba.h_ba) AS h_sym
FROM hab JOIN hba ON hab.u = hba.u AND hab.v = hba.v
ORDER BY hab.u
"""


def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (functions/sketches.exact_percentiles):
    p50/p90/p99 of events.value per event_type by the percentile_disc
    rank rule ceil(p*n/100) over 1e6-quantized values — one key exchange
    + in-partition sort (no global sort), the exact twin the
    quantile_sketch estimates are pinned against. Oracle = the identical
    rank formula."""
    from versatiles_rs_spark.functions.sketches import exact_percentiles

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return exact_percentiles(events, "event_type", "value").orderBy("k", "p")


O_EXACT_PERCENTILES = f"""
WITH v AS (
  SELECT event_type AS k, {_QV} AS qv FROM events
), r AS (
  SELECT k, qv, row_number() OVER (PARTITION BY k ORDER BY qv) AS rn,
         count(*) OVER (PARTITION BY k) AS n
  FROM v
), ps(p) AS (VALUES (50), (90), (99))
SELECT k, CAST(p AS BIGINT) AS p, qv FROM r JOIN ps ON rn = (p * n + 99) // 100
ORDER BY k, p
"""


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union / gaps-and-islands (operators/temporal.
    interval_coverage): per-user merged coverage of the range_join
    fixture's [ts, ts + (1 + event_id % 48)h) intervals — islands start
    where start exceeds the running max(end); touching spans merge.
    One key exchange, two windows, pure integer micros. Oracle =
    identical window spec."""
    from versatiles_rs_spark.operators.temporal import interval_coverage

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        us.alias("start_us"),
        (us + (1 + F.col("event_id") % 48) * 3_600_000_000).alias("end_us"),
    )
    return interval_coverage(iv, "user_id", "start_us", "end_us").orderBy("k")


O_INTERVAL_COVERAGE = """
WITH iv AS (
  SELECT user_id AS k, epoch_us(ts) AS s,
         epoch_us(ts) + (1 + event_id % 48) * 3600000000 AS e
  FROM events
), flagged AS (
  SELECT k, s, e,
         CASE WHEN max(e) OVER (PARTITION BY k ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR s > max(e) OVER (PARTITION BY k ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS ni
  FROM iv
), islands AS (
  SELECT k, s, e,
         sum(ni) OVER (PARTITION BY k ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), per_island AS (
  SELECT k, island, max(e) - min(s) AS extent FROM islands GROUP BY 1, 2
)
SELECT k, count(*) AS n_islands, CAST(sum(extent) AS BIGINT) AS covered_us,
       max(extent) AS max_island_us
FROM per_island GROUP BY k ORDER BY k
"""


def q_trend_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend (operators/temporal.trend_stats): exact
    integer slope numerator/denominator over (minutes since 2024-01-01,
    1e3-quantized value) — one map-side-combined agg, the caller's
    division is the only float. Oracle recomputes the five sums."""
    from versatiles_rs_spark.operators.temporal import trend_stats

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    t0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
    return trend_stats(events, "user_id", "ts", "value", t0).orderBy("key")


O_TREND_STATS = """
WITH b AS (
  SELECT user_id AS key,
         (epoch_us(ts) - 1704067200000000) // 60000000 AS x,
         CAST(round(CAST(value AS DOUBLE) * 1000) AS BIGINT) AS y
  FROM events
), a AS (
  SELECT key, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM b GROUP BY key
)
SELECT key, n, CAST(n * sxy - sx * sy AS BIGINT) AS num_q,
       CAST(n * sxx - sx * sx AS BIGINT) AS den_q
FROM a ORDER BY key
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column querying: extract the integer `k` from the
    events.props JSON string with the engine's native JSON path
    evaluator (get_json_object — JVM-side, codegen; DuckDB twin =
    json_extract), bucket to deciles, and roll up counts + quantized
    value sums per (event_type, k decile). Attests cross-engine JSON
    parsing, not just arithmetic."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    qv = F.round(F.col("value").cast("double") * 1e6).cast("long")
    return (
        ev.select("event_type", (k / 10).cast("long").alias("k_decile"), qv.alias("qv"))
        .groupBy("event_type", "k_decile")
        # oracle-side sum(BIGINT) -> HUGEINT -> pandas float64
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qv").cast("double").alias("sum_qv"))
        .orderBy("event_type", "k_decile")
    )


O_JSON_PROPS_ROLLUP = f"""
SELECT event_type,
       CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_decile,
       count(*) AS n, sum({_QV}) AS sum_qv
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot / crosstab: per-user-decade event-type count matrix through
    Spark's native pivot (explicit value list — no extra distinct pass)
    vs the oracle's CASE-sum spelling; attests the relational pivot
    surface, NULL-free via fillna(0) == count FILTER."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = (
        ev.select(F.expr("user_id div 10").alias("user_decade"), "event_type")
        .groupBy("user_decade")
        .pivot("event_type", list(_EVENT_TYPES))
        .count()
        .na.fill(0, list(_EVENT_TYPES))
    )
    return out.select(
        "user_decade", *[F.col(t).alias(f"n_{t}") for t in _EVENT_TYPES]
    ).orderBy("user_decade")


def _o_event_pivot() -> str:
    cols = ",\n       ".join(
        f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
        for t in _EVENT_TYPES
    )
    return f"""
SELECT user_id // 10 AS user_decade,
       {cols}
FROM events GROUP BY 1 ORDER BY 1
"""


O_EVENT_PIVOT = _o_event_pivot()


def q_user_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each user's most frequent event
    type (ties -> lexicographically smallest, so the answer is unique) —
    one map-side-combined count agg + one rank window over the
    user-cardinality table (never the event log). Oracle = identical
    rank spec."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    return (
        counts.select("user_id", "event_type", "n", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), F.col("n").alias("mode_n"))
        .orderBy("user_id")
    )


O_USER_MODE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
), r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
  FROM c
)
SELECT user_id, event_type AS mode_type, n AS mode_n FROM r WHERE rn = 1
ORDER BY user_id
"""


def q_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: ROLLUP over (event_type, user decade) with
    an explicit grouping id (2*grouping(type) + grouping(decade)) and
    subtotal NULLs coalesced to sentinels (portable row ordering) —
    counts + quantized sums at all three levels in ONE pass (Spark
    expands grouping sets map-side; no re-reads). Oracle = DuckDB
    GROUP BY ROLLUP with the same GROUPING() id."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    qv = F.round(F.col("value").cast("double") * 1e6).cast("long")
    base = ev.select(
        "event_type", F.expr("user_id div 10").alias("user_decade"), qv.alias("qv")
    )
    out = base.rollup("event_type", "user_decade").agg(
        (F.grouping("event_type") * 2 + F.grouping("user_decade")).alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("sum_qv"),
    )
    # subtotal NULLs -> sentinels: the compare harnesses sort rows by
    # value, and cross-engine NULL ordering is not portable
    return out.select(
        F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
        F.coalesce("user_decade", F.lit(-1)).alias("user_decade"),
        "gid", "n", "sum_qv",
    ).orderBy("gid", "event_type", "user_decade")


O_EVENT_ROLLUP = f"""
WITH b AS (
  SELECT event_type, user_id // 10 AS user_decade, {_QV} AS qv FROM events
)
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(user_decade, -1) AS user_decade,
       CAST(GROUPING(event_type) * 2 + GROUPING(user_decade) AS BIGINT) AS gid,
       count(*) AS n, CAST(sum(qv) AS BIGINT) AS sum_qv
FROM b GROUP BY ROLLUP (event_type, user_decade)
ORDER BY gid, 1, 2
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: consecutive event-type
    pairs per user (the Markov-chain counts behind "what do users do
    after X") — ONE user-key lag window over integer-micro order
    (ties -> event_id, the od_flows discipline), then a map-side-combined
    agg bounded by |types|². Oracle = identical lag spec."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    lagged = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return (
        lagged.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"),
             F.count_distinct("user_id").alias("n_users"))
        .orderBy("prev_type", "next_type")
    )


O_EVENT_TRANSITIONS = """
WITH l AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, count(*) AS n_transitions,
       count(DISTINCT user_id) AS n_users
FROM l WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_user_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max surface: each user's FIRST and LAST event type +
    quantized value in one aggregation pass — min_by/max_by (Spark) vs
    arg_min/arg_max (DuckDB) over a composite integer order key
    (micros-since-2024 * 2^20 + event_id: unique, overflow-checked), so
    ties are impossible and the answer is deterministic. No window, no
    sort — one map-side-combined agg."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    t0 = 1_704_067_200_000_000
    okey = (
        (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(t0))
        * F.lit(1 << 20) + F.col("event_id")
    )
    qv = F.round(F.col("value").cast("double") * 1e6).cast("long")
    base = ev.select("user_id", okey.alias("ok"), "event_type", qv.alias("qv"))
    return (
        base.groupBy("user_id")
        .agg(
            F.min_by("event_type", "ok").alias("first_type"),
            F.min_by("qv", "ok").alias("first_qv"),
            F.max_by("event_type", "ok").alias("last_type"),
            F.max_by("qv", "ok").alias("last_qv"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


O_USER_EXTREMES = f"""
WITH b AS (
  SELECT user_id,
         (epoch_us(ts) - 1704067200000000) * 1048576 + event_id AS ok,
         event_type, {_QV} AS qv
  FROM events
)
SELECT user_id,
       arg_min(event_type, ok) AS first_type, arg_min(qv, ok) AS first_qv,
       arg_max(event_type, ok) AS last_type, arg_max(qv, ok) AS last_qv,
       count(*) AS n
FROM b GROUP BY user_id ORDER BY user_id
"""
