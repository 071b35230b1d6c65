"""Point-density raster tiles: the vector→raster AGGREGATION direction
(zonal_stats is raster→vector; raster_mask is vector→raster masking;
this is the heatmap/density rendering a web-scale point table feeds a
map with).

Scale shape: points map to ONE global pixel each with pure integer
division (qx * grid // domain — exact, no float binning), a map-side-
combined groupBy collapses the 100 TB point table to at most
tiles x tile_px² bin rows (the only shuffle), and the per-tile PNG
render consumes pre-aggregated bins — Python never sees raw points.
Bin counts are exact integers; the PNG encodes min(count, 255)
grayscale via the engine's deterministic encoder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.raster import png_encode


def density_bins(
    points: DataFrame,
    zoom: int,
    tile_px: int = 64,
    qx_col: str = "qx",
    qy_col: str = "qy",
    x_domain: int = 360_000_000,
    y_domain: int = 170_000_000,
) -> DataFrame:
    """(x, y, px, py, n): per-pixel point counts on the zoom's global
    grid (2^zoom * tile_px pixels per axis, equirectangular over the
    integer coordinate domains). Pure integer math: gx = qx * grid //
    x_domain (qx * grid fits int64 for qx < 2^33 and grid <= 2^20)."""
    grid = (1 << zoom) * tile_px
    # TRUE int64 division (`div`), never float floor: qx*grid exceeds the
    # exact-double range already at z14 with 1e8-scale domains.
    gxe = F.expr(f"(CAST({qx_col} AS BIGINT) * {grid}) div {x_domain}")
    gye = F.expr(f"(CAST({qy_col} AS BIGINT) * {grid}) div {y_domain}")
    return (
        points.select(gxe.alias("gx"), gye.alias("gy"))
        .select(
            F.expr(f"gx div {tile_px}").alias("x"),
            F.expr(f"gy div {tile_px}").alias("y"),
            (F.col("gx") % F.lit(tile_px)).alias("px"),
            (F.col("gy") % F.lit(tile_px)).alias("py"),
        )
        .groupBy("x", "y", "px", "py")
        .agg(F.count("*").alias("n"))
    )


def density_tiles(bins: DataFrame, tile_px: int = 64) -> DataFrame:
    """Render pre-aggregated bins into grayscale PNG tiles:
    (x, y, tile, n_points, occupied_px, max_bin)."""
    t = tile_px

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        x = int(pdf["x"].iloc[0])
        y = int(pdf["y"].iloc[0])
        img = np.zeros((t, t), dtype=np.int64)
        img[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf["n"].to_numpy()
        png = png_encode(np.minimum(img, 255).astype(np.uint8))
        return pd.DataFrame(
            {
                "x": [x], "y": [y], "tile": [png],
                "n_points": [int(img.sum())],
                "occupied_px": [int((img > 0).sum())],
                "max_bin": [int(img.max())],
            }
        )

    return bins.groupBy("x", "y").applyInPandas(
        render,
        "x bigint, y bigint, tile binary, n_points bigint, occupied_px bigint, max_bin bigint",
    )


def tile_hotspots(counts: DataFrame, zoom: int, hot_mult: int = 3) -> DataFrame:
    """Getis-Ord-style hotspot detection over per-tile counts: each
    occupied tile's 3x3 neighborhood sum vs the global mean. Input:
    (x, y, n) per-tile counts at ``zoom``. Output per occupied tile:
    (x, y, own_n, neigh_n, n_present, hot) where neigh_n sums the
    neighborhood's counts (absent tiles contribute 0), n_present counts
    occupied neighborhood tiles, and hot = 1 iff the neighborhood MEAN
    over its present tiles is >= hot_mult x the global mean per occupied
    tile — compared by exact integer cross-multiplication
    (neigh_n * total_tiles >= hot_mult * n_present * total_points), so
    no float division enters the verdict.

    Scale shape: the event log collapses to per-tile counts BEFORE any
    neighbor logic (map-side-combined agg), then each count row emits 9
    addressed copies — the shuffled volume is 9x the AGGREGATED table
    (bounded by 4^zoom), never 9x the points. Global totals are a
    1-row aggregate broadcast into the comparison. Two exchanges total,
    both over tile-cardinality data; zero Python.
    """
    size = 1 << zoom
    # Pin the aggregated counts (lazy localCheckpoint): they feed both
    # the 9x neighbor explode and the broadcast totals, so the upstream
    # point aggregation would otherwise run twice. Measured 0.54->0.50 /
    # 0.81->0.62 s at sf0.1 WITH cached-plan AQE partitioning enabled
    # (session.py) — an earlier A/B without that conf read the opposite,
    # which is why this landed together with it.
    counts = counts.localCheckpoint(eager=False)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    addressed = (
        counts.select("x", "y", "n", F.explode(offsets).alias("o"))
        .select(
            (F.col("x") + F.col("o.dx")).alias("tx"),
            (F.col("y") + F.col("o.dy")).alias("ty"),
            "n",
            ((F.col("o.dx") == 0) & (F.col("o.dy") == 0)).cast("int").alias("self"),
        )
        .filter(
            (F.col("tx") >= 0) & (F.col("tx") < size)
            & (F.col("ty") >= 0) & (F.col("ty") < size)
        )
    )
    hood = (
        addressed.groupBy("tx", "ty")
        .agg(
            F.sum("n").alias("neigh_n"),
            F.count("*").alias("n_present"),
            F.max(F.col("self") * F.col("n")).alias("own_n"),
            F.sum("self").alias("has_self"),
        )
        .filter(F.col("has_self") == 1)
    )
    totals = counts.agg(
        F.sum("n").alias("total_points"), F.count("*").alias("total_tiles")
    )
    return (
        hood.crossJoin(F.broadcast(totals))
        .select(
            F.col("tx").alias("x"),
            F.col("ty").alias("y"),
            "own_n",
            "neigh_n",
            "n_present",
            (
                F.col("neigh_n") * F.col("total_tiles")
                >= F.lit(hot_mult) * F.col("n_present") * F.col("total_points")
            )
            .cast("int")
            .alias("hot"),
        )
    )


def morans_i(counts: DataFrame, zoom: int) -> DataFrame:
    """Global Moran's I spatial autocorrelation over per-tile counts —
    the single-number "is this map clustered or random?" diagnostic that
    complements tile_hotspots' local verdicts. Weights are binary
    8-neighborhood adjacency among OCCUPIED tiles.

    Exactness: with N = occupied tiles and S = Σn, the centered value
    n_i - S/N is represented as the integer N*n_i - S, so the statistic's
    pieces are exact int64 sums: num_q = Σ_{i~j} (N*n_i - S)(N*n_j - S)
    over ordered adjacent pairs, den_q = Σ_i (N*n_i - S)². Moran's I =
    (N / W) * (num_q / den_q) — the N² scale factor cancels, so the
    caller's one float division is the ONLY inexact step and happens
    outside the attested data.

    Output: one row (n_tiles, w_pairs, num_q, den_q).

    Scale shape: identical to tile_hotspots — the point log collapses to
    per-tile counts before any neighbor logic; each aggregated row emits
    8 addressed copies (never 9x the points), one equi-join on the tile
    key pairs occupied neighbors, and the totals are 1-row broadcasts.
    """
    size = 1 << zoom
    # Pin (see tile_hotspots): counts feeds totals, the addressed
    # copies, the pair join build side, and the denominator — four
    # subtree copies without it.
    counts = counts.localCheckpoint(eager=False)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if not (dx == 0 and dy == 0)
        ]
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_tiles"), F.sum("n").alias("s")
    )
    addressed = (
        counts.select("x", "y", F.col("n").alias("n_i"), F.explode(offsets).alias("o"))
        .select(
            (F.col("x") + F.col("o.dx")).alias("tx"),
            (F.col("y") + F.col("o.dy")).alias("ty"),
            "n_i",
        )
        .filter(
            (F.col("tx") >= 0) & (F.col("tx") < size)
            & (F.col("ty") >= 0) & (F.col("ty") < size)
        )
    )
    pairs = addressed.join(
        counts.select(F.col("x").alias("tx"), F.col("y").alias("ty"), F.col("n").alias("n_j")),
        ["tx", "ty"],
    )
    num = (
        pairs.crossJoin(F.broadcast(totals))
        .select(
            (
                (F.col("n_tiles") * F.col("n_i") - F.col("s"))
                * (F.col("n_tiles") * F.col("n_j") - F.col("s"))
            ).alias("term")
        )
        .agg(F.count(F.lit(1)).alias("w_pairs"), F.sum("term").alias("num_q"))
    )
    den = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            (
                (F.col("n_tiles") * F.col("n") - F.col("s"))
                * (F.col("n_tiles") * F.col("n") - F.col("s"))
            ).alias("term2"),
            "n_tiles",
        )
        .agg(F.max("n_tiles").alias("n_tiles"), F.sum("term2").alias("den_q"))
    )
    return num.crossJoin(den).select("n_tiles", "w_pairs", "num_q", "den_q")
