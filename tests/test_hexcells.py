"""Hexagonal binning (spatial/hexcells.py): nearest-center correctness."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.spatial.hexcells import hex_cell_cols

R = 50_000.0
SQRT3 = np.sqrt(3.0)


def _centers(q, r):
    """Axial (q, r) -> flat-top hex center in Mercator meters."""
    mx = R * 1.5 * q
    my = R * (SQRT3 / 2.0 * q + SQRT3 * r)
    return mx, my


def test_cube_rounding_picks_nearest_center(spark):
    rng = np.random.default_rng(4)
    lon = rng.uniform(-60, 60, 400)
    lat = rng.uniform(-55, 55, 400)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    q, r = hex_cell_cols(F.col("lon"), F.col("lat"), R)
    rows = df.select("lon", "lat", q.alias("q"), r.alias("r")).collect()
    for row in rows:
        mx = np.radians(row["lon"]) * 6378137.0
        my = np.log(np.tan(np.radians(row["lat"]) / 2 + np.pi / 4)) * 6378137.0
        cq, cr = row["q"], row["r"]
        cx, cy = _centers(cq, cr)
        d0 = np.hypot(mx - cx, my - cy)
        # the chosen cell's center must be at least as close as any cell in
        # the surrounding 2-ring (ties can occur exactly on edges)
        for dq in range(-2, 3):
            for dr in range(-2, 3):
                nx, ny = _centers(cq + dq, cr + dr)
                assert d0 <= np.hypot(mx - nx, my - ny) + 1e-6


def test_hex_cells_partition_points(spark):
    """Every point maps to exactly one cell; counts sum to the input."""
    rng = np.random.default_rng(5)
    n = 5000
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n),
        "lon": rng.uniform(-179, 179, n),
        "lat": rng.uniform(-80, 80, n),
    }))
    from versatiles_rs_spark.spatial.hexcells import hex_cell_stats

    stats = hex_cell_stats(df, 500_000.0).collect()
    assert sum(r["n"] for r in stats) == n
