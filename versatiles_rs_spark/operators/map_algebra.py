"""Raster map algebra over tile pyramids: per-pixel ops that need
NEIGHBOR tiles — the halo-exchange pattern.

Terrain derivatives (slope, hillshade, curvature) evaluate finite
differences: the last column of tile (x, y) needs the first column of
tile (x+1, y). A naive plan joins every tile to its 8 neighbors and
moves full tiles 8x. The scale-correct plan moves HALOS: each tile
emits only the 1-pixel strips its neighbors need (1/tile_px of its
bytes), one hash exchange co-locates each tile with the strips
addressed to it, and the pixel math stays executor-local. At 100 TB
the shuffled volume is tiles + 2/tile_px of tiles, not 9x tiles.

Cross-engine determinism: differences of integer 24-bit raw DEM values
are integers; sums are order-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from versatiles_rs_spark.functions.raster import png_decode

_SLOPE = StructType(
    [
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("n_dx", LongType()),
        StructField("sum_dx", LongType()),
        StructField("n_dy", LongType()),
        StructField("sum_dy", LongType()),
    ]
)


def _raw(tile: bytes) -> np.ndarray:
    rgb = png_decode(tile)
    return (
        rgb[..., 0].astype(np.int64) * 65536
        + rgb[..., 1].astype(np.int64) * 256
        + rgb[..., 2].astype(np.int64)
    )


def dem_slope_stats(tiles: DataFrame, tile_px: int) -> DataFrame:
    """Per-tile forward-difference slope sums over a DEM tile level:
    (x, y, n_dx, sum_dx, n_dy, sum_dy) where dx = raw(gx+1, gy) -
    raw(gx, gy) summed over every pixel of the tile whose +x neighbor
    exists ANYWHERE in the level (same for dy, +y). Border pixels use
    the neighbor tile's first column/row, delivered as a halo strip —
    pixels whose neighbor tile is absent (world edge) are excluded,
    exactly like the oracle's global-domain rule.

    Plan: tiles emit (kind='tile') plus two halo strips addressed to
    (x-1, y) and (x, y-1) (kind='hx'/'hy', strip bytes only); ONE hash
    exchange on (x, y) groups them; applyInPandas computes the sums.
    """
    t = tile_px
    own = tiles.select("x", "y", F.lit("tile").alias("kind"), F.col("tile").alias("payload"))

    def strip(kind: str) -> DataFrame:
        # first column (for the left neighbor's dx) / first row (for the
        # upper neighbor's dy), re-encoded as raw int64 bytes.
        @F.pandas_udf("binary")
        def cut(s: pd.Series) -> pd.Series:
            out = []
            for blob in s:
                raw = _raw(bytes(blob))
                v = raw[:, 0] if kind == "hx" else raw[0, :]
                out.append(v.astype("<i8").tobytes())
            return pd.Series(out)

        dx = 1 if kind == "hx" else 0
        dy = 1 if kind == "hy" else 0
        return tiles.select(
            (F.col("x") - F.lit(dx)).alias("x"),
            (F.col("y") - F.lit(dy)).alias("y"),
            F.lit(kind).alias("kind"),
            cut("tile").alias("payload"),
        ).filter((F.col("x") >= 0) & (F.col("y") >= 0))

    allrows = own.unionByName(strip("hx")).unionByName(strip("hy"))

    def per_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        tile_rows = pdf[pdf["kind"] == "tile"]
        if not len(tile_rows):
            return pd.DataFrame({f.name: [] for f in _SLOPE.fields}).astype("int64")
        x = int(tile_rows["x"].iloc[0])
        y = int(tile_rows["y"].iloc[0])
        raw = _raw(bytes(tile_rows["payload"].iloc[0]))
        hx = pdf[pdf["kind"] == "hx"]
        hy = pdf[pdf["kind"] == "hy"]
        # dx within the tile: columns 0..t-2; border column t-1 via halo
        dx_in = raw[:, 1:] - raw[:, :-1]
        n_dx, sum_dx = dx_in.size, int(dx_in.sum(dtype=np.int64))
        if len(hx):
            col = np.frombuffer(bytes(hx["payload"].iloc[0]), dtype="<i8")
            edge = col - raw[:, -1]
            n_dx += edge.size
            sum_dx += int(edge.sum(dtype=np.int64))
        dy_in = raw[1:, :] - raw[:-1, :]
        n_dy, sum_dy = dy_in.size, int(dy_in.sum(dtype=np.int64))
        if len(hy):
            row = np.frombuffer(bytes(hy["payload"].iloc[0]), dtype="<i8")
            edge = row - raw[-1, :]
            n_dy += edge.size
            sum_dy += int(edge.sum(dtype=np.int64))
        return pd.DataFrame(
            {"x": [x], "y": [y], "n_dx": [n_dx], "sum_dx": [sum_dx],
             "n_dy": [n_dy], "sum_dy": [sum_dy]}
        )

    return allrows.groupBy("x", "y").applyInPandas(per_tile, _SLOPE)
