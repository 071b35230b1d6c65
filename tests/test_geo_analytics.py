"""Geo-analytics operators: OD flows (operators/sessions.od_flows),
hotspot neighborhoods (operators/density.tile_hotspots), and
marching-squares contouring (operators/map_algebra.dem_contour_cases) —
hand-case semantics + plan-shape guards. sf0.01 cross-engine parity is
covered by the registry sweep (test_oracle_parity.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np

from versatiles_rs_spark.functions.raster import png_encode
from versatiles_rs_spark.operators.density import tile_hotspots
from versatiles_rs_spark.operators.map_algebra import MS_SEGMENTS, dem_contour_cases
from versatiles_rs_spark.operators.sessions import od_flows


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_od_flows_hand_case(spark):
    # z1 tiles: lon<0 -> x=0, lon>0 -> x=1; lat>0 -> y=0, lat<0 -> y=1
    ev = spark.createDataFrame(
        [
            # user 1: (0,0) -> (1,0) -> (1,1): two trips
            (1, 1, _t("2024-01-01T00:00:00"), -90.0, 40.0),
            (2, 1, _t("2024-01-01T00:01:00"), 90.0, 40.0),
            (3, 1, _t("2024-01-01T00:02:00"), 90.0, -40.0),
            # user 2: same first hop (0,0) -> (1,0)
            (4, 2, _t("2024-01-01T00:00:00"), -90.0, 40.0),
            (5, 2, _t("2024-01-01T00:01:00"), 90.0, 40.0),
            # user 3: single event, no trip
            (6, 3, _t("2024-01-01T00:00:00"), 0.5, 0.5),
        ],
        "event_id bigint, user_id bigint, ts timestamp, lon double, lat double",
    )
    got = {
        (r["ox"], r["oy"], r["dx"], r["dy"]): (r["n_trips"], r["n_users"])
        for r in od_flows(ev, zoom=1).collect()
    }
    assert got == {(0, 0, 1, 0): (2, 2), (1, 0, 1, 1): (1, 1)}


def test_od_flows_tiebreak_on_equal_ts(spark):
    # two same-timestamp events order by event_id: trip must be 2 -> 7
    ev = spark.createDataFrame(
        [
            (2, 1, _t("2024-01-01T00:00:00"), -90.0, 40.0),
            (7, 1, _t("2024-01-01T00:00:00"), 90.0, -40.0),
        ],
        "event_id bigint, user_id bigint, ts timestamp, lon double, lat double",
    )
    rows = od_flows(ev, zoom=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["ox"], r["oy"], r["dx"], r["dy"]) == (0, 0, 1, 1)


def test_tile_hotspots_hand_case(spark):
    # 4 occupied tiles at z2; total_points=16, total_tiles=4 -> mean 4
    counts = spark.createDataFrame(
        [(0, 0, 9), (1, 0, 3), (0, 1, 3), (3, 3, 1)],
        "x bigint, y bigint, n bigint",
    )
    got = {
        (r["x"], r["y"]): (r["own_n"], r["neigh_n"], r["n_present"], r["hot"])
        for r in tile_hotspots(counts, zoom=2, hot_mult=1).collect()
    }
    # (0,0): neighborhood = {(0,0),(1,0),(0,1)} (and (1,1) empty)
    assert got[(0, 0)] == (9, 15, 3, 1)  # mean 5 >= 4 -> hot
    assert got[(1, 0)] == (3, 15, 3, 1)
    assert got[(3, 3)] == (1, 1, 1, 0)  # isolated: mean 1 < 4
    assert set(got) == {(0, 0), (1, 0), (0, 1), (3, 3)}


def test_tile_hotspots_plan_two_exchanges_no_python(spark):
    counts = spark.createDataFrame(
        [(0, 0, 9), (1, 0, 3)], "x bigint, y bigint, n bigint"
    )
    plan = _plan(tile_hotspots(counts, zoom=2))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _tiles_from_raw(spark, raws: dict[tuple[int, int], np.ndarray]):
    rows = []
    for (x, y), raw in raws.items():
        rgb = np.stack(
            [(raw >> 16) & 255, (raw >> 8) & 255, raw & 255], axis=-1
        ).astype(np.uint8)
        rows.append((x, y, bytearray(png_encode(rgb))))
    return spark.createDataFrame(rows, "x bigint, y bigint, tile binary")


def test_dem_contours_hand_case_with_halos(spark):
    # 2x2 tiles of 2px; global raw = 10*(gx + gy) so level 25 cuts the
    # anti-diagonal. Cells exist for gx,gy in 0..2 (3x3 cells).
    t = 2

    def raw(x, y):
        gx = np.arange(x * t, (x + 1) * t, dtype=np.int64)
        gy = np.arange(y * t, (y + 1) * t, dtype=np.int64)
        return 10 * (gx[None, :] + gy[:, None])

    tiles = _tiles_from_raw(
        spark, {(x, y): raw(x, y) for x in (0, 1) for y in (0, 1)}
    )
    got = {
        (r["x"], r["y"], r["ms_case"]): r["n"]
        for r in dem_contour_cases(tiles, t, level=25).collect()
    }
    # expected cases per cell, bit 8=TL 4=TR 2=BL 1=BR, corner sums
    # f(gx,gy)=10(gx+gy) vs 25: cell(gx,gy) corners (gx+gy, +1, +1, +2)*10
    exp = {}
    for gy in range(3):
        for gx in range(3):
            b = lambda v: 1 if 10 * v >= 25 else 0
            case = (
                8 * b(gx + gy) + 4 * b(gx + 1 + gy) + 2 * b(gx + gy + 1)
                + 1 * b(gx + gy + 2)
            )
            key = (gx // t, gy // t, case)
            exp[key] = exp.get(key, 0) + 1
    assert got == exp
    # the cross-tile cells actually exercised halos: tile (0,0)'s cell
    # (1,1) needs hc+hr+hd, its cells (1,0)/(0,1) need hc/hr
    assert (0, 0, 1) in got  # cell(1,1): only BR=40 >= 25 via diagonal halo


def test_dem_contours_world_edge_excluded(spark):
    # single 2px tile, no neighbors: only cell (0,0) computable
    t = 2
    raw = np.array([[0, 10], [10, 30]], dtype=np.int64)
    tiles = _tiles_from_raw(spark, {(0, 0): raw})
    got = {
        (r["x"], r["y"], r["ms_case"]): r["n"]
        for r in dem_contour_cases(tiles, t, level=25).collect()
    }
    assert got == {(0, 0, 1): 1}  # only BR=30 >= 25; edge cells excluded


def test_dem_contours_plan_single_exchange(spark):
    t = 2
    raw = np.zeros((2, 2), dtype=np.int64)
    tiles = _tiles_from_raw(spark, {(0, 0): raw})
    plan = _plan(dem_contour_cases(tiles, t, level=25))
    assert plan.count("Exchange hashpartitioning") == 1


def test_ms_segments_lookup():
    assert len(MS_SEGMENTS) == 16
    assert MS_SEGMENTS[0] == 0 and MS_SEGMENTS[15] == 0
    assert MS_SEGMENTS[6] == 2 and MS_SEGMENTS[9] == 2  # saddles TR+BL / TL+BR
    assert sum(MS_SEGMENTS) == 16


def test_map_match_hand_case(spark):
    from versatiles_rs_spark.spatial.mapmatch import snap_to_segments

    # two horizontal segments of length 10: seg0 y=0 x[0,10]; seg1 y=8 x[0,10]
    seg = np.array([(0, 0, 0, 10, 0), (1, 0, 8, 10, 0)], dtype=np.int64)
    pts = spark.createDataFrame(
        [
            (1, 5, 3),    # above seg0 interior: dist2=9 -> S=900
            (2, -3, 0),   # left of seg0 start: clamp to a, dist2=9 -> S=900
            (3, 14, 8),   # right of seg1 end: dist2=16 -> S=1600
            (4, 5, 4),    # equidistant (dist2=16 both): tie -> seg 0
        ],
        "event_id bigint, qx bigint, qy bigint",
    )
    got = {
        r["event_id"]: (r["seg_id"], r["s_scaled"])
        for r in snap_to_segments(pts, seg, d_sq=100).collect()
    }
    assert got == {1: (0, 900), 2: (0, 900), 3: (1, 1600), 4: (0, 1600)}


def test_map_match_rejects_bad_network(spark):
    import pytest

    from versatiles_rs_spark.spatial.mapmatch import snap_to_segments

    pts = spark.createDataFrame([(1, 0, 0)], "event_id bigint, qx bigint, qy bigint")
    with pytest.raises(ValueError, match="squared length"):
        snap_to_segments(pts, np.array([(0, 0, 0, 3, 0)], dtype=np.int64), d_sq=100)
    with pytest.raises(ValueError, match="sorted"):
        snap_to_segments(
            pts,
            np.array([(1, 0, 0, 10, 0), (0, 0, 8, 10, 0)], dtype=np.int64),
            d_sq=100,
        )


def test_map_match_plan_no_shuffle(spark):
    from versatiles_rs_spark.spatial.mapmatch import snap_to_segments

    seg = np.array([(0, 0, 0, 10, 0)], dtype=np.int64)
    pts = spark.createDataFrame([(1, 5, 3)], "event_id bigint, qx bigint, qy bigint")
    plan = _plan(snap_to_segments(pts, seg, d_sq=100))
    assert "Exchange" not in plan


def test_stay_points_hand_case(spark):
    from versatiles_rs_spark.operators.sessions import stay_points

    h = 3_600_000_000  # 1h in us
    rows = [
        # user 1: 3 events within radius spanning 2h -> a stay
        (1, 1, _t("2024-01-01T00:00:00"), 0, 0),
        (2, 1, _t("2024-01-01T01:00:00"), 3, 4),     # d2=25 <= 100
        (3, 1, _t("2024-01-01T02:00:00"), 6, 8),     # hop d2=25
        # then a far jump -> new segment, single event (duration 0)
        (4, 1, _t("2024-01-01T05:00:00"), 1000, 0),
        # user 2: two near events but only 30min -> below min duration
        (5, 2, _t("2024-01-01T00:00:00"), 0, 0),
        (6, 2, _t("2024-01-01T00:30:00"), 1, 1),
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, qx bigint, qy bigint"
    )
    got = {
        (r["user_id"], r["seg_no"]): (r["n_events"], r["duration_us"], r["qx0"], r["qy0"])
        for r in stay_points(ev, radius_q=10, min_duration_us=h).collect()
    }
    assert got == {(1, 1): (3, 2 * h, 0, 0)}


def test_triangle_counts_hand_case(spark):
    from versatiles_rs_spark.pages.links import triangle_counts

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "a bigint, b bigint"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}  # triangles (1,2,3), (2,3,4)


def test_triangle_counts_no_false_triangles(spark):
    from versatiles_rs_spark.pages.links import triangle_counts

    # a 4-cycle has wedges but no triangles
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "a bigint, b bigint"
    )
    assert triangle_counts(edges).count() == 0


def _grid_tiles(spark, t, nx, ny, f):
    # global raw = f(gx, gy) over nx x ny tiles of t px
    raws = {}
    for x in range(nx):
        for y in range(ny):
            gx = np.arange(x * t, (x + 1) * t, dtype=np.int64)
            gy = np.arange(y * t, (y + 1) * t, dtype=np.int64)
            raws[(x, y)] = f(gx[None, :], gy[:, None]) + np.zeros((t, t), dtype=np.int64)
    return _tiles_from_raw(spark, raws)


def test_dem_flow_dir_hand_cases(spark):
    from versatiles_rs_spark.operators.map_algebra import dem_flow_dir

    t = 2
    # raw = gx + 4*gy: steepest descent N (drop 4/1 beats NW 5/sqrt2).
    # Only the 4 center pixels have full rings; each lives in a different
    # tile and each ring needs strips AND the corner from all 3 others.
    tiles = _grid_tiles(spark, t, 2, 2, lambda gx, gy: gx + 4 * gy)
    got = {
        (r["x"], r["y"], r["d8_code"]): r["n"]
        for r in dem_flow_dir(tiles, t).collect()
    }
    assert got == {(x, y, 7): 1 for x in (0, 1) for y in (0, 1)}

    # raw = gx + gy: N and W tie on slope key 2, NW key 4 wins -> code 6
    tiles = _grid_tiles(spark, t, 2, 2, lambda gx, gy: gx + gy)
    got = {
        (r["x"], r["y"], r["d8_code"]): r["n"]
        for r in dem_flow_dir(tiles, t).collect()
    }
    assert got == {(x, y, 6): 1 for x in (0, 1) for y in (0, 1)}

    # constant surface: every classifiable pixel is a sink (code 0)
    tiles = _grid_tiles(spark, t, 2, 2, lambda gx, gy: gx * 0 + 7)
    got = {
        (r["x"], r["y"], r["d8_code"]): r["n"]
        for r in dem_flow_dir(tiles, t).collect()
    }
    assert got == {(x, y, 0): 1 for x in (0, 1) for y in (0, 1)}


def test_dem_flow_dir_tie_breaks_lowest_code(spark):
    from versatiles_rs_spark.operators.map_algebra import dem_flow_dir

    t = 2
    # symmetric bowl rim: raw = |gx - 1.5| scaled -> E and W drops equal
    # for center pixels; lowest code (1 = E) must win
    tiles = _grid_tiles(
        spark, t, 2, 2, lambda gx, gy: np.abs(2 * gx - 3) + 0 * gy
    )
    got = {
        (r["x"], r["y"], r["d8_code"]): r["n"]
        for r in dem_flow_dir(tiles, t).collect()
    }
    # pixels gx=1 (tiles x=0): E drop = raw(1)-raw(2) = 1-1 = 0 -> not
    # positive; W drop = 1-3 < 0... center pixels gx in {1,2}: raw(1)=1,
    # raw(2)=1, raw(0)=3, raw(3)=3 -> both E and W non-positive, N/S 0:
    # sink. Use a sharper ridge instead: raw = -(2*gx-3)^2
    tiles = _grid_tiles(spark, t, 2, 2, lambda gx, gy: 100 - (2 * gx - 3) ** 2 + 0 * gy)
    got = {
        (r["x"], r["y"], r["d8_code"]): r["n"]
        for r in dem_flow_dir(tiles, t).collect()
    }
    # gx=1: raw=99, E (gx=2) = 99 (no drop), W (gx=0) = 91 -> drop 8 W
    # gx=2: raw=99, E (gx=3) = 91 -> drop 8 E; W = 99 no drop
    assert got == {
        (0, 0, 5): 1, (0, 1, 5): 1,   # gx=1 flows W
        (1, 0, 1): 1, (1, 1, 1): 1,   # gx=2 flows E
    }


def test_dem_flow_dir_world_edge_excluded(spark):
    from versatiles_rs_spark.operators.map_algebra import dem_flow_dir

    # single tile, no neighbors anywhere: no pixel has a full ring
    tiles = _grid_tiles(spark, 2, 1, 1, lambda gx, gy: gx + gy)
    assert dem_flow_dir(tiles, 2).count() == 0


def test_dem_flow_edges_hand_case(spark):
    from versatiles_rs_spark.operators.map_algebra import dem_flow_edges

    t, w = 2, 4
    # raw = gx + 4*gy over 2x2 tiles (4x4 px): every pixel drains N
    # (available-neighbor rule: the top row has no N neighbor; for it W
    # wins via drop 1, and (0,0) is the lone sink).
    tiles = _grid_tiles(spark, t, 2, 2, lambda gx, gy: gx + 4 * gy)
    got = {r["pid"]: r["rep"] for r in dem_flow_edges(tiles, t, w).collect()}
    assert len(got) == 16
    # reps are fully compressed in-tile; cross-tile pointers stay one hop
    # outside their tile. Pixel (gx=1,gy=3) pid=13 is in tile (0,1):
    # drains N to gy=2 (pid 9, same tile) -> N to gy=1 (pid 5, OUT of
    # tile) => rep 5.
    assert got[13] == 5
    # top row: (1,0) pid=1 drains W to pid 0 (same tile, a sink) => 0
    assert got[1] == 0 and got[0] == 0
    # (3,0) pid=3 in tile (1,0): W to pid 2 (same tile), W to pid 1 (out)
    assert got[3] == 1


def test_watershed_basins_two_bowls(spark):
    from versatiles_rs_spark.operators.map_algebra import (
        dem_flow_edges,
        watershed_basins,
    )

    t, w = 2, 8
    # two paraboloid bowls centered at gx=1 and gx=6 on a 8x2 strip
    # (4x1 tiles... use 4x2 tiles of 2px => 8x4 px, centers (1,1), (6,1))
    tiles = _grid_tiles(
        spark, t, 4, 2,
        lambda gx, gy: np.minimum(
            (gx - 1) ** 2 + 2 * (gy - 1) ** 2, (gx - 6) ** 2 + 2 * (gy - 1) ** 2
        ),
    )
    rows = watershed_basins(dem_flow_edges(tiles, t, w)).collect()
    agg = {}
    for r in rows:
        agg[r["rep"]] = agg.get(r["rep"], 0) + 1
    # total conserved; exactly the two centers are sinks
    assert sum(agg.values()) == 32
    assert set(agg) == {1 * w + 1, 1 * w + 6}
    # the midline gx=3/4 splits 8 columns evenly: 16 px per basin
    assert agg[1 * w + 1] == 16 and agg[1 * w + 6] == 16


def test_watershed_pixel_count_conserved(spark):
    from versatiles_rs_spark.operators.map_algebra import (
        dem_flow_edges,
        watershed_basins,
    )

    t, w = 4, 16
    tiles = _grid_tiles(
        spark, t, 4, 4, lambda gx, gy: (gx - 5) ** 2 + 2 * (gy - 9) ** 2
    )
    basins = watershed_basins(dem_flow_edges(tiles, t, w))
    rows = basins.collect()
    assert len(rows) == 256  # every pixel resolved
    assert {r["rep"] for r in rows} == {9 * w + 5}  # single global sink


def test_morans_i_hand_case(spark):
    from versatiles_rs_spark.operators.density import morans_i

    # 2x1 occupied tiles, counts 1 and 3: N=2, S=4 -> centered 2n-4 =
    # {-2, +2}; one adjacent pair each direction: num = 2 * (-2*2) = -8;
    # den = 4 + 4 = 8; W = 2  (perfect negative autocorrelation:
    # I = (N/W)(num/den) = -1)
    counts = spark.createDataFrame([(0, 0, 1), (1, 0, 3)], "x long, y long, n long")
    row = morans_i(counts, zoom=4).collect()[0]
    assert (row["n_tiles"], row["w_pairs"], row["num_q"], row["den_q"]) == (2, 2, -8, 8)


def test_morans_i_isolated_tiles_zero_pairs(spark):
    from versatiles_rs_spark.operators.density import morans_i

    counts = spark.createDataFrame([(0, 0, 5), (8, 8, 9)], "x long, y long, n long")
    row = morans_i(counts, zoom=5).collect()[0]
    assert row["w_pairs"] == 0 and row["num_q"] is None
    assert row["den_q"] == (2 * 5 - 14) ** 2 + (2 * 9 - 14) ** 2


def test_geohash_known_vectors(spark):
    from versatiles_rs_spark.tile_math.geohash import geohash_col

    # published vectors: (lat, lon) -> geohash
    rows = [
        (-5_600_000, 42_600_000, "ezs42"),
        (10_407_440, 57_649_110, "u4pru"),
        (0, 0, "s0000"),
        (-49_265_506, -25_382_708, "6gkzw"),
    ]
    df = spark.createDataFrame(
        [(qlon, qlat) for qlon, qlat, _ in rows], "qlon long, qlat long"
    )
    got = [r["gh"] for r in df.select(geohash_col("qlon", "qlat", 5).alias("gh")).collect()]
    assert got == [want for _, _, want in rows]


def test_geohash_precision_prefix_property(spark):
    from versatiles_rs_spark.tile_math.geohash import geohash_col

    # a finer geohash is prefixed by every coarser one (same point)
    df = spark.createDataFrame(
        [(13_400_000, 52_500_000), (-73_985_000, 40_748_000)], "qlon long, qlat long"
    )
    out = df.select(
        geohash_col("qlon", "qlat", 2).alias("g2"),
        geohash_col("qlon", "qlat", 4).alias("g4"),
        geohash_col("qlon", "qlat", 6).alias("g6"),
    ).collect()
    for r in out:
        assert r["g6"].startswith(r["g4"]) and r["g4"].startswith(r["g2"])


def test_skyline_hand_case(spark):
    from versatiles_rs_spark.operators.skyline import skyline

    pts = spark.createDataFrame(
        [
            (1, 10, 1),   # frontier (max d1)
            (2, 5, 5),    # frontier
            (3, 1, 10),   # frontier
            (4, 4, 4),    # dominated by 2
            (5, 5, 5),    # duplicate of 2: BOTH survive (no strict part)
            (6, 5, 3),    # dominated by 2 (same d1, lower d2)
            (7, 10, 0),   # dominated by 1
        ],
        "id long, d1 long, d2 long",
    )
    got = sorted(r["id"] for r in skyline(pts).collect())
    assert got == [1, 2, 3, 5]


def test_skyline_local_prune_is_sound(spark):
    from pyspark.sql import functions as F

    from versatiles_rs_spark.operators.skyline import skyline

    # many partitions: global frontier must still be exact
    df = (
        spark.range(2000)
        .repartition(16)
        .select(
            F.col("id"),
            ((F.col("id") * 7919) % 997).alias("d1"),
            ((F.col("id") * 104729) % 983).alias("d2"),
        )
    )
    rows = [(r["id"], r["d1"], r["d2"]) for r in skyline(df).collect()]
    all_rows = [(r["id"], r["d1"], r["d2"]) for r in df.collect()]
    brute = [
        p for p in all_rows
        if not any(
            q[1] >= p[1] and q[2] >= p[2] and (q[1] > p[1] or q[2] > p[2])
            for q in all_rows
        )
    ]
    assert sorted(rows) == sorted(brute)


def test_grid_dbscan_hand_case(spark):
    from versatiles_rs_spark.spatial.gridcluster import grid_dbscan

    rows = []
    # blob A: 6 points in cell (0,0) + 5 in adjacent cell (1,0) -> one
    # cluster of 2 cells / 11 points
    rows += [(i, 5 + i, 7) for i in range(6)]
    rows += [(100 + i, 105 + i, 7) for i in range(5)]
    # blob B: 5 points in far cell (50, 50)
    rows += [(200 + i, 5000 + i, 5000) for i in range(5)]
    # noise: 3 points alone in a cell
    rows += [(300 + i, 9000 + i, 9000) for i in range(3)]
    pts = spark.createDataFrame(rows, "id long, qx long, qy long")
    got = {
        r["cluster"]: (r["n_cells"], r["n_points"])
        for r in grid_dbscan(pts, cell=100, min_pts=5).collect()
    }
    span = 1 << 21
    assert got == {0 * span + 0: (2, 11), 50 * span + 50: (1, 5)}


def test_grid_dbscan_diagonal_adjacency_merges(spark):
    from versatiles_rs_spark.spatial.gridcluster import grid_dbscan

    rows = [(i, 90 + i, 90) for i in range(5)]          # cell (0,0)
    rows += [(10 + i, 100 + i, 100) for i in range(5)]  # cell (1,1), diagonal
    pts = spark.createDataFrame(rows, "id long, qx long, qy long")
    got = grid_dbscan(pts, cell=100, min_pts=5).collect()
    assert len(got) == 1 and got[0]["n_cells"] == 2 and got[0]["n_points"] == 10


def test_flow_accumulation_hand_chain(spark):
    from versatiles_rs_spark.operators.map_algebra import flow_accumulation

    # 3 -> 2 -> 1 -> 0 (sink), plus 4 -> 1
    edges = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 2), (4, 1)], "pid long, rep long"
    )
    got = {r["pid"]: r["acc"] for r in flow_accumulation(edges).collect()}
    assert got == {0: 5, 1: 4, 2: 2, 3: 1, 4: 1}


def test_flow_accumulation_conserves_nothing_lost(spark):
    from versatiles_rs_spark.operators.map_algebra import flow_accumulation

    # two disjoint sinks: accumulations partition per tree
    edges = spark.createDataFrame(
        [(10, 11), (11, 11), (20, 21), (21, 22), (22, 22)], "pid long, rep long"
    )
    got = {r["pid"]: r["acc"] for r in flow_accumulation(edges).collect()}
    assert got == {10: 1, 11: 2, 20: 1, 21: 2, 22: 3}


def test_dem_flow_edges_uncompressed_one_step(spark):
    from versatiles_rs_spark.operators.map_algebra import dem_flow_edges

    t, w = 2, 4
    tiles = _grid_tiles(spark, t, 2, 2, lambda gx, gy: gx + 4 * gy)
    got = {r["pid"]: r["rep"] for r in dem_flow_edges(tiles, t, w, compress=False).collect()}
    # one-step: pid 13 (gx=1,gy=3) drains N one step to pid 9, not its
    # compressed rep 5
    assert got[13] == 9 and got[9] == 5
