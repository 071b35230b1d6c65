"""Temporal operators (operators/temporal.py) + HLL sketch
(functions/sketches.py): semantics on small hand-built frames, the HLL
merge law and estimate accuracy, and plan-shape guards (the oracle
parity sweep in test_oracle_parity.py covers the sf0.01 registry
queries)."""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import functions as F

from versatiles_rs_spark.functions.sketches import (
    hll_estimate_df,
    hll_merge,
    hll_registers,
)
from versatiles_rs_spark.operators.temporal import (
    asof_join,
    hypertable_rollup,
    range_join,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _t("2024-01-01T00:00:05")),  # after snap@0 -> 100
            (2, 10, _t("2024-01-01T00:00:10")),  # ties snap@10 -> 200 (<=)
            (3, 10, _t("2024-01-01T00:00:03")),  # after snap@0 -> 100
            (4, 20, _t("2024-01-01T00:00:01")),  # before any snap -> NULL
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _t("2024-01-01T00:00:00"), 100),
            (10, _t("2024-01-01T00:00:10"), 200),
            (20, _t("2024-01-01T00:00:30"), 999),
        ],
        "user_id bigint, snap_ts timestamp, snap_qv bigint",
    )
    got = {
        r["event_id"]: r["asof_snap_qv"]
        for r in asof_join(
            left, right, "user_id", "ts", "snap_ts", ["snap_qv"]
        ).collect()
    }
    assert got == {1: 100, 2: 200, 3: 100, 4: None}

    strict = {
        r["event_id"]: r["asof_snap_qv"]
        for r in asof_join(
            left, right, "user_id", "ts", "snap_ts", ["snap_qv"], strict=True
        ).collect()
    }
    assert strict[2] == 100  # tie no longer visible under <


def test_asof_join_single_exchange(spark, sf_dir):
    """Union + window = ONE hash exchange on the key, no range blowup."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    snaps = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("snap_ts"), F.col("value").alias("snap_v")
    )
    out = asof_join(
        ev.filter("event_type <> 'purchase'").select("event_id", "user_id", "ts"),
        snaps, "user_id", "ts", "snap_ts", ["snap_v"],
    )
    plan = _plan(out)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_range_join_bucketed_equijoin(spark, sf_dir):
    """The interval join must plan as a hash/sort-merge EQUI-join on
    (key, bucket) — never a nested-loop over the inequality."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.filter("event_id % 5 = 0").select(
        F.col("event_id").alias("interval_id"), "user_id",
        us.alias("start_us"), (us + F.lit(7_200_000_000)).alias("end_us"),
    )
    out = range_join(ev.select("event_id", "user_id", "ts"), iv, on="user_id")
    plan = _plan(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # boundary semantics: half-open [start, end)
    rows = spark.createDataFrame(
        [(1, 5, _t("2024-01-01T01:00:00")), (2, 5, _t("2024-01-01T02:00:00"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    one_iv = spark.createDataFrame(
        [(7, 5, 1704070800000000, 1704074400000000)],  # [01:00, 02:00)
        "interval_id bigint, user_id bigint, start_us bigint, end_us bigint",
    )
    got = {r["event_id"] for r in range_join(rows, one_iv, on="user_id").collect()}
    assert got == {1}


def test_hypertable_rollup_mergeable(spark, sf_dir):
    """Coarse levels (built from fine) == direct aggregation from raw."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").limit(2000)
    out = hypertable_rollup(ev).cache()
    qv = F.round(F.col("value").cast("double") * 1e6).cast("bigint")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    day = 86_400_000_000
    direct = (
        ev.select(F.col("event_type").alias("key"), (us - us % day).alias("bucket_us"), qv.alias("qv"))
        .groupBy("key", "bucket_us")
        .agg(F.count("*").alias("n_events"), F.sum("qv").alias("sum_qv"),
             F.min("qv").alias("min_qv"), F.max("qv").alias("max_qv"))
    )
    got = {tuple(r) for r in out.filter("level = 'day'").drop("level").collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want
    out.unpersist()


def test_hll_merge_law_and_accuracy(spark, sf_dir):
    """Sketch(A) merge Sketch(B) == Sketch(A union B), and the estimate
    lands within the expected HLL error of the exact distinct count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.lit("all").alias("g"), F.col("doc_id")
    )
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 <> 0")  # overlap-free split; law holds for any
    merged = {
        (r["g"], r["bucket"]): r["max_rho"]
        for r in hll_merge(
            [hll_registers(a, ["g"], "doc_id"), hll_registers(b, ["g"], "doc_id")],
            ["g"],
        ).collect()
    }
    whole = {
        (r["g"], r["bucket"]): r["max_rho"]
        for r in hll_registers(docs, ["g"], "doc_id").collect()
    }
    assert merged == whole

    exact = docs.select("doc_id").distinct().count()
    est = hll_estimate_df(hll_registers(docs, ["g"], "doc_id"), ["g"])[("all",)]
    # m=128 -> standard error 1.04/sqrt(128) ~ 9.2%; allow 3 sigma
    assert abs(est - exact) / exact < 0.28, (est, exact)


def test_hll_registers_bounded_output(spark, sf_dir):
    """The sketch relation never exceeds groups * m rows and plans as one
    map-side-combined aggregate (exactly one exchange)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = hll_registers(ev, ["event_type"], "user_id", p=5)
    assert sk.count() <= sk.select("event_type").distinct().count() * 32
    plan = _plan(sk)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Python" not in plan and "MapInPandas" not in plan


def test_zonal_stats_semantics_and_plan(spark):
    """Hand-checkable 2x2-tile DEM: window crossing tile borders sums the
    right pixels; zone side broadcasts (the tile side never shuffles
    before the final bounded agg)."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.raster import png_encode
    from versatiles_rs_spark.operators.zonal import zonal_stats

    t = 4
    rows = []
    for x in (0, 1):
        for y in (0, 1):
            gx = np.arange(x * t, (x + 1) * t, dtype=np.int64)
            gy = np.arange(y * t, (y + 1) * t, dtype=np.int64)
            raw = gx[None, :] + 10 * gy[:, None]
            rgb = np.stack([(raw >> 16) & 255, (raw >> 8) & 255, raw & 255], -1)
            rows.append((x, y, png_encode(rgb.astype(np.uint8))))
    tiles = spark.createDataFrame(rows, "x bigint, y bigint, tile binary")
    zones = spark.createDataFrame(
        [(0, 3, 6, 3, 5)], "zone_id bigint, gx0 bigint, gx1 bigint, gy0 bigint, gy1 bigint"
    )  # 3x2 window straddling all four tiles at the corner
    out = zonal_stats(tiles, zones, t).collect()
    want = [gx + 10 * gy for gx in (3, 4, 5) for gy in (3, 4)]
    assert len(out) == 1
    r = out[0]
    assert (r["n_px"], r["sum_raw"], r["min_raw"], r["max_raw"]) == (
        6, sum(want), min(want), max(want),
    )

    plan = _plan(zonal_stats(tiles, zones, t))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_cms_merge_additive_and_estimate_bound(spark, sf_dir):
    """Sketch(A) + Sketch(B) == Sketch(A union B); the point estimate is
    an upper bound on the true count and exact for most probes at this
    load factor (150 users into 4x256 buckets)."""
    from versatiles_rs_spark.functions.sketches import (
        cms_estimate,
        cms_merge,
        cms_sketch,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.lit("all").alias("g"), "user_id", "event_id"
    )
    a, b = ev.filter("event_id % 2 = 0"), ev.filter("event_id % 2 <> 0")
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            [cms_sketch(a, ["g"], "user_id"), cms_sketch(b, ["g"], "user_id")], ["g"]
        ).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(ev, ["g"], "user_id").collect()
    }
    assert merged == whole

    truth = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()}
    probes = ev.select("g", "user_id").distinct()
    est = {
        r["user_id"]: r["est"]
        for r in cms_estimate(
            cms_sketch(ev, ["g"], "user_id"), probes, ["g"], "user_id"
        ).collect()
    }
    assert all(est[u] >= truth[u] for u in truth)  # CMS never undercounts
    exact = sum(1 for u in truth if est[u] == truth[u])
    assert exact / len(truth) > 0.5, exact


def test_quantile_sketch_accuracy(spark, sf_dir):
    """Estimated p50/p90/p99 within the geometric-bucket relative error
    of the exact percentiles; merges are additive."""
    from versatiles_rs_spark.functions.sketches import (
        log_histogram,
        quantile_estimate,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.lit("all").alias("g"), "value", "event_id"
    )
    hist = [
        (r["bucket_id"], r["cnt"]) for r in log_histogram(ev, ["g"], "value").collect()
    ]
    exact = ev.selectExpr(
        "percentile(value, array(0.5, 0.9, 0.99)) AS p"
    ).collect()[0]["p"]
    est = quantile_estimate(hist, [0.5, 0.9, 0.99])
    for e, x in zip(est, exact):
        assert abs(e - x) / x < 0.10, (e, x)

    a = {
        (r["bucket_id"]): r["cnt"]
        for r in log_histogram(ev.filter("event_id % 2 = 0"), ["g"], "value").collect()
    }
    b = {
        (r["bucket_id"]): r["cnt"]
        for r in log_histogram(ev.filter("event_id % 2 <> 0"), ["g"], "value").collect()
    }
    merged = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert merged == dict(hist)


def test_dem_slope_halo_and_plan(spark):
    """2x1 tile strip: border-column dx uses the right neighbor's first
    column; world-edge column excluded. One hash exchange total (halo
    strips + tiles co-grouped), never a tile-to-8-neighbors join."""
    import numpy as np

    from versatiles_rs_spark.functions.raster import png_encode
    from versatiles_rs_spark.operators.map_algebra import dem_slope_stats

    t = 4
    rows = []
    for x in (0, 1):
        gx = np.arange(x * t, (x + 1) * t, dtype=np.int64)
        gy = np.arange(0, t, dtype=np.int64)
        raw = gx[None, :] ** 2 + gy[:, None]
        rgb = np.stack([(raw >> 16) & 255, (raw >> 8) & 255, raw & 255], -1)
        rows.append((x, 0, png_encode(rgb.astype(np.uint8))))
    tiles = spark.createDataFrame(rows, "x bigint, y bigint, tile binary")
    got = {(r["x"], r["y"]): r for r in dem_slope_stats(tiles, t).collect()}
    # tile 0: dx pixels gx=0..3 (3 internal + 1 via halo), 4 rows each
    assert got[(0, 0)]["n_dx"] == 16
    assert got[(0, 0)]["sum_dx"] == 4 * sum(2 * gx + 1 for gx in range(4))
    # tile 1: world edge -> gx=4..6 only
    assert got[(1, 0)]["n_dx"] == 12
    assert got[(1, 0)]["sum_dx"] == 4 * sum(2 * gx + 1 for gx in range(4, 7))
    # dy: raw linear in gy with slope 1 -> sum == count; no vertical halo
    assert got[(0, 0)]["n_dy"] == 12 and got[(0, 0)]["sum_dy"] == 12

    plan = _plan(dem_slope_stats(tiles, t))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "SortMergeJoin" not in plan and "BroadcastNestedLoop" not in plan


def test_shard_shuffle_no_global_sort(spark, sf_dir):
    """The shuffle plan must be hash-exchange + in-partition sort, never
    a rangepartitioning (global sort); shards reasonably balanced; the
    (shard, pos) order is a true permutation of the corpus."""
    from versatiles_rs_spark.pages.sampling import shard_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = shard_shuffle(docs, n_shards=16)
    plan = _plan(out)
    assert "rangepartitioning" not in plan.lower()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1

    rows = out.collect()
    n = docs.count()
    assert len(rows) == n
    assert len({(r["shard"], r["pos"]) for r in rows}) == n  # injective
    per = {}
    for r in rows:
        per[r["shard"]] = per.get(r["shard"], 0) + 1
    assert max(per.values()) < 4 * n / 16  # hash balance (loose)


def test_streaming_hll_matches_batch(spark, sf_dir, tmp_path):
    """Feeding the events table through a file stream in two chunks
    yields (complete-mode) exactly the batch sketch — stateful agg IS
    the HLL merge law."""
    from versatiles_rs_spark.functions.sketches import hll_registers
    from versatiles_rs_spark.streaming.stateful import streaming_hll_registers

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type", "user_id")
    src = str(tmp_path / "src")
    ev.filter("user_id % 2 = 0").coalesce(1).write.parquet(src)
    ev.filter("user_id % 2 <> 0").coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_hll_registers(stream)
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["g"], r["bucket"]): r["max_rho"]
        for r in spark.sql("SELECT * FROM hll_stream").collect()
    }
    want = {
        (r["event_type"], r["bucket"]): r["max_rho"]
        for r in hll_registers(ev, ["event_type"], "user_id").collect()
    }
    assert got == want


def test_intersection_join_exactly_once(spark):
    """A pair overlapping in MANY cells is emitted exactly once (the
    reference-point rule), never deduped; non-overlap and edge-touch
    (half-open) excluded; plan has no cartesian product."""
    from versatiles_rs_spark.spatial.overlaps import intersection_join

    a = spark.createDataFrame(
        [(1, 0, 0, 1000, 1000), (2, 2000, 2000, 2100, 2100)],
        "id bigint, x0 bigint, y0 bigint, x1 bigint, y1 bigint",
    )
    b = spark.createDataFrame(
        [
            (10, 500, 500, 1500, 1500),   # overlaps a1 across many 128-cells
            (11, 1000, 0, 1100, 100),     # touches a1's edge -> NOT a pair
            (12, 5000, 5000, 5010, 5010), # disjoint
        ],
        "id bigint, x0 bigint, y0 bigint, x1 bigint, y1 bigint",
    )
    rows = intersection_join(a, b, cell=128).collect()
    assert [(r["a_id"], r["b_id"], r["area"]) for r in rows] == [(1, 10, 500 * 500)]

    plan = _plan(intersection_join(a, b, cell=128))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_distance_join_exactly_once(spark):
    """Pairs straddling cell borders found via the 3x3 probe, exactly
    once; radius boundary inclusive on d², exclusive beyond."""
    from versatiles_rs_spark.spatial.overlaps import distance_join

    pts = spark.createDataFrame(
        [(1, 99, 0), (2, 101, 0), (3, 99, 100), (4, 1000, 1000)],
        "id bigint, qx bigint, qy bigint",
    )
    rows = {(r["a_id"], r["b_id"]): r["d2"] for r in distance_join(pts, radius=100).collect()}
    # (1,2): d2=4 (cross-cell at c=100); (1,3): d2=10000 == r^2 inclusive;
    # (2,3): d2=4+10000 > r^2 excluded; 4 isolated
    assert rows == {(1, 2): 4, (1, 3): 10000}

    plan = _plan(distance_join(pts, radius=100))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_bucketed_join_is_colocated(spark, sf_dir, tmp_path):
    """Bucketed tables joined on the bucket key plan with ZERO Exchange
    (the co-located-join claim in README "Scale design"): both sides
    scan pre-bucketed files and sort-merge in place."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
        (docs.select("doc_id", "n_chars").write.bucketBy(8, "doc_id")
         .option("path", str(tmp_path / "bk_a")).saveAsTable("bk_a"))
        (docs.select("doc_id", "lang").write.bucketBy(8, "doc_id")
         .option("path", str(tmp_path / "bk_b")).saveAsTable("bk_b"))
        j = spark.table("bk_a").join(spark.table("bk_b"), "doc_id")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert j.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_density_tiles_png_roundtrip(spark):
    """The rendered density PNG decodes back to the exact (clipped) bin
    matrix; bins feed the render pre-aggregated (plan: exactly two hash
    exchanges — bin agg + per-tile grouping — and no raw-point Python)."""
    import numpy as np

    from versatiles_rs_spark.functions.raster import png_decode
    from versatiles_rs_spark.operators.density import density_bins, density_tiles

    pts = spark.createDataFrame(
        [(5, 5)] * 300 + [(5, 30000000)] * 2 + [(300000000, 150000000)],
        "qx bigint, qy bigint",
    )
    tiles = density_tiles(density_bins(pts, zoom=0, tile_px=8), tile_px=8)
    got = {(r["x"], r["y"]): r for r in tiles.collect()}
    assert set(got) == {(0, 0)}  # zoom 0: one world tile
    r = got[(0, 0)]
    assert r["n_points"] == 303 and r["max_bin"] == 300 and r["occupied_px"] == 3
    img = png_decode(bytes(r["tile"]))
    assert img.shape[:2] == (8, 8)
    assert int(img.max()) == 255  # 300 clipped to 255 in the PNG
    assert int((np.squeeze(img) > 0).sum()) == 3

    plan = _plan(density_tiles(density_bins(pts, zoom=0, tile_px=8), tile_px=8))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2


def test_time_gapfill_hand_case(spark):
    from versatiles_rs_spark.operators.temporal import time_gapfill

    # user 1: observations in buckets 0 and 3 (10us buckets) -> grid
    # 0..3 with buckets 1,2 gap-filled carrying bucket 0's qsum
    rows = [
        (1, "1970-01-01 00:00:00.000002", 1.5),
        (1, "1970-01-01 00:00:00.000008", 2.0),   # same bucket 0
        (1, "1970-01-01 00:00:00.000031", 4.0),   # bucket 3
        (2, "1970-01-01 00:00:00.000015", 7.0),   # single bucket -> no gaps
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts string, value double")
    got = {
        (r["user_id"], r["bucket_start_us"]):
            (r["n_obs"], r["qsum_filled"], r["gap"])
        for r in time_gapfill(ev, "user_id", "ts", "value", 10).collect()
    }
    assert got == {
        (1, 0): (2, 3_500_000, 0),
        (1, 10): (0, 3_500_000, 1),
        (1, 20): (0, 3_500_000, 1),
        (1, 30): (1, 4_000_000, 0),
        (2, 10): (1, 7_000_000, 0),
    }


def test_time_gapfill_carry_updates_at_next_observation(spark):
    from versatiles_rs_spark.operators.temporal import time_gapfill

    rows = [
        (1, "1970-01-01 00:00:00.000000", 1.0),
        (1, "1970-01-01 00:00:00.000020", 5.0),
        (1, "1970-01-01 00:00:00.000040", 9.0),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts string, value double")
    out = sorted(
        (r["bucket_start_us"], r["qsum_filled"], r["gap"])
        for r in time_gapfill(ev, "user_id", "ts", "value", 10).collect()
    )
    assert out == [
        (0, 1_000_000, 0), (10, 1_000_000, 1), (20, 5_000_000, 0),
        (30, 5_000_000, 1), (40, 9_000_000, 0),
    ]


def test_hausdorff_hand_case(spark):
    from versatiles_rs_spark.spatial.trajsim import hausdorff_pairs

    # A = {(0,0), (10,0)}, B = {(0,1), (100,0)}:
    # h(A->B): a=(0,0) -> min(1, 10000) = 1; a=(10,0) -> min(101, 8100)
    #   = 101 -> max = 101
    # h(B->A): b=(0,1) -> 1; b=(100,0) -> min(10000, 8100) = 8100
    pts = spark.createDataFrame(
        [(1, 0, 0), (1, 10, 0), (2, 0, 1), (2, 100, 0)],
        "user long, qx long, qy long",
    )
    pairs = spark.createDataFrame([(1, 2)], "u long, v long")
    row = hausdorff_pairs(pts, pairs).collect()[0]
    assert (row["h_ab"], row["h_ba"], row["h_sym"]) == (101, 8100, 8100)


def test_hausdorff_identical_trajectories_zero(spark):
    from versatiles_rs_spark.spatial.trajsim import hausdorff_pairs

    pts = spark.createDataFrame(
        [(1, 5, 5), (1, 7, 9), (2, 5, 5), (2, 7, 9)],
        "user long, qx long, qy long",
    )
    pairs = spark.createDataFrame([(1, 2)], "u long, v long")
    row = hausdorff_pairs(pts, pairs).collect()[0]
    assert (row["h_ab"], row["h_ba"], row["h_sym"]) == (0, 0, 0)


def test_hausdorff_empty_side_dropped(spark):
    from versatiles_rs_spark.spatial.trajsim import hausdorff_pairs

    pts = spark.createDataFrame([(1, 0, 0)], "user long, qx long, qy long")
    pairs = spark.createDataFrame([(1, 99)], "u long, v long")
    assert hausdorff_pairs(pts, pairs).count() == 0


def test_areal_interpolate_hand_case(spark):
    from versatiles_rs_spark.spatial.overlaps import areal_interpolate

    # source 1 (qv=100) covers target 10 fully (10x10 inside 20x20);
    # source 2 (qv=7) overlaps target 11 by a 5x4 corner; target 12
    # touches source 1 only edge-to-edge (half-open: no intersection)
    src = spark.createDataFrame(
        [(1, 0, 0, 20, 20, 100), (2, 100, 100, 120, 120, 7)],
        "id long, x0 long, y0 long, x1 long, y1 long, qv long",
    )
    tgt = spark.createDataFrame(
        [(10, 5, 5, 15, 15), (11, 115, 116, 300, 300), (12, 20, 0, 40, 20)],
        "id long, x0 long, y0 long, x1 long, y1 long",
    )
    got = {
        r["t_id"]: (r["n_src"], r["wsum"], r["covered_area"])
        for r in areal_interpolate(src, tgt, cell=64).collect()
    }
    assert got == {10: (1, 100 * 100, 100), 11: (1, 7 * 20, 20)}


def test_areal_interpolate_multi_source_sum(spark):
    from versatiles_rs_spark.spatial.overlaps import areal_interpolate

    # two sources each overlapping the target by 2x10 = 20 units
    src = spark.createDataFrame(
        [(1, 0, 0, 12, 10, 3), (2, 18, 0, 30, 10, 5)],
        "id long, x0 long, y0 long, x1 long, y1 long, qv long",
    )
    tgt = spark.createDataFrame(
        [(7, 10, 0, 20, 10)], "id long, x0 long, y0 long, x1 long, y1 long"
    )
    row = areal_interpolate(src, tgt, cell=16).collect()[0]
    assert (row["n_src"], row["wsum"], row["covered_area"]) == (2, 3 * 20 + 5 * 20, 40)


def test_exact_percentiles_hand_case(spark):
    from versatiles_rs_spark.functions.sketches import exact_percentiles

    # group 'a': values 1..10 -> p50 = rank ceil(5.0)=5 -> 5; p90 ->
    # rank 9; p99 -> rank ceil(9.9)=10
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 42.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    got = {
        (r["k"], r["p"]): r["qv"]
        for r in exact_percentiles(df, "k", "value").collect()
    }
    assert got == {
        ("a", 50): 5_000_000, ("a", 90): 9_000_000, ("a", 99): 10_000_000,
        ("b", 50): 42_000_000, ("b", 90): 42_000_000, ("b", 99): 42_000_000,
    }


def test_exact_percentiles_no_global_sort(spark):
    from versatiles_rs_spark.functions.sketches import exact_percentiles

    df = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, value double")
    plan = exact_percentiles(df, "k", "value")._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()


def test_interval_coverage_hand_case(spark):
    from versatiles_rs_spark.operators.temporal import interval_coverage

    iv = spark.createDataFrame(
        [
            # user 1: [0,10) + [5,20) merge; [20,30) touches -> merges;
            # [50,60) separate island
            (1, 0, 10), (1, 5, 20), (1, 20, 30), (1, 50, 60),
            # user 2: nested interval [0,100) contains [10,20)
            (2, 0, 100), (2, 10, 20),
        ],
        "user long, s long, e long",
    )
    got = {
        r["k"]: (r["n_islands"], r["covered_us"], r["max_island_us"])
        for r in interval_coverage(iv, "user", "s", "e").collect()
    }
    assert got == {1: (2, 40, 30), 2: (1, 100, 100)}


def test_interval_coverage_gap_of_one_splits(spark):
    from versatiles_rs_spark.operators.temporal import interval_coverage

    iv = spark.createDataFrame([(1, 0, 10), (1, 11, 20)], "user long, s long, e long")
    row = interval_coverage(iv, "user", "s", "e").collect()[0]
    assert (row["n_islands"], row["covered_us"]) == (2, 19)


def test_sssp_hand_case(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from versatiles_rs_spark.pages.links import sssp_costs

    # 0 -e(1)-> 1 -e(1)-> 2; direct 0 -e(5)-> 2: two-hop path wins (2 < 5)
    edges = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 5), (2, 3, 10)],
        "src long, dst long, wgt long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["cost"] for r in sssp_costs(edges, seeds).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 12}


def test_sssp_multisource_min(spark):
    from versatiles_rs_spark.pages.links import sssp_costs

    edges = spark.createDataFrame(
        [(0, 5, 9), (10, 5, 2)], "src long, dst long, wgt long"
    )
    seeds = spark.createDataFrame([(0,), (10,)], "node long")
    got = {r["node"]: r["cost"] for r in sssp_costs(edges, seeds).collect()}
    assert got == {0: 0, 10: 0, 5: 2}


def test_union_area_hand_case(spark):
    from versatiles_rs_spark.spatial.overlaps import union_area

    rects = spark.createDataFrame(
        [
            # grp 0: two 10x10 overlapping by 5x10 -> union 150; plus a
            # disjoint 2x3
            (0, 0, 0, 10, 10), (0, 5, 0, 15, 10), (0, 100, 100, 102, 103),
            # grp 1: nested -> union = outer 20x20
            (1, 0, 0, 20, 20), (1, 5, 5, 10, 10),
        ],
        "grp long, x0 long, y0 long, x1 long, y1 long",
    )
    got = {
        r["grp"]: (r["n_rects"], r["union_area"])
        for r in union_area(rects, cell=16).collect()
    }
    assert got == {0: (3, 156), 1: (2, 400)}


def test_union_area_cell_boundary_straddle(spark):
    from versatiles_rs_spark.spatial.overlaps import union_area

    # one rect spanning 4 cells exactly: area must not double-count
    rects = spark.createDataFrame(
        [(0, 10, 10, 22, 22)], "grp long, x0 long, y0 long, x1 long, y1 long"
    )
    row = union_area(rects, cell=16).collect()[0]
    assert (row["n_rects"], row["union_area"]) == (1, 144)


def test_trend_stats_hand_case(spark):
    import datetime as dt

    from versatiles_rs_spark.operators.temporal import trend_stats

    t0 = 1_704_067_200_000_000
    base = dt.datetime(2024, 1, 1)
    # user 1: y = 2x + 1 at x = 0, 1, 2 minutes -> perfect slope 2
    rows = [
        (1, base, 1.0),
        (1, base + dt.timedelta(minutes=1), 3.0),
        (1, base + dt.timedelta(minutes=2), 5.0),
        # user 2: flat
        (2, base, 7.0),
        (2, base + dt.timedelta(minutes=10), 7.0),
    ]
    df = spark.createDataFrame(rows, "user long, ts timestamp, value double")
    got = {
        r["key"]: (r["n"], r["num_q"], r["den_q"])
        for r in trend_stats(df, "user", "ts", "value", t0).collect()
    }
    # user 1: n=3 sx=3 sy=9000 sxy=(0+3000+10000)=13000 sxx=5
    # num = 3*13000 - 3*9000 = 12000; den = 3*5 - 9 = 6 -> slope 2000 (=2.0*y_quant)
    assert got[1] == (3, 12000, 6)
    assert got[1][1] / got[1][2] == 2000.0
    assert got[2] == (2, 0, 2 * 100 - 100)  # num 0: flat


def test_edit1_join_hand_case(spark):
    from versatiles_rs_spark.dedup.setjoin import edit1_join

    words = spark.createDataFrame(
        [("cat",), ("car",), ("cart",), ("dog",), ("at",), ("catt",)],
        "word string",
    )
    got = sorted((r["a"], r["b"]) for r in edit1_join(words).collect())
    # substitution cat~car, insertion car~cart / cat~cart / cat~catt,
    # deletion at~cat, substitution cart~catt
    assert got == [
        ("at", "cat"), ("car", "cart"), ("car", "cat"), ("cart", "cat"),
        ("cart", "catt"), ("cat", "catt"),
    ]


def test_edit1_join_no_distance2_leak(spark):
    from versatiles_rs_spark.dedup.setjoin import edit1_join

    # ed=2 pairs that SHARE a deletion bucket must be filtered by the
    # levenshtein verify: "xacd" and "aycd" both emit variant "acd"
    # (delete pos 1 / pos 2) but differ by two edits
    words = spark.createDataFrame([("xacd",), ("aycd",)], "word string")
    assert edit1_join(words).count() == 0
