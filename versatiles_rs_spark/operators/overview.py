"""Pyramid overview aggregation: build zoom z-1..min from zoom z.

raster_overview semantics (operations/raster/raster_overview.rs:23-31 +
helpers/overview.rs:22-41): group 2x2 children under their parent coord,
compose a double-size canvas, downscale x2 (channel-wise average). DEM
variant averages decoded 24-bit raw values (dem_overview.rs). Vector variant
merges children's features with exact halved grid coords
(gx_parent = (gx_child + 4096*(x_child & 1)) >> 1 — floor-halving commutes
with quantization, so rollup output is byte-identical to rendering the
parent level directly).

Spark shape: one hash aggregation per level — groupBy(parent coord) over the
child level, executed with the shared grouped_tile_map physical pattern.
The per-level loop caches nothing across levels except the produced
DataFrame (each level is the next level's input), mirroring the reference's
DepthFirst traversal + parent cache without needing one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import GZIP, compress, decompress
from versatiles_rs_spark.functions.mvt import MvtFeature, decode_tile, encode_tile
from versatiles_rs_spark.functions.raster import (
    compose_quad,
    dem_average_quad,
    png_decode,
    png_encode,
    scaled_down,
)
from versatiles_rs_spark.operators.convert import TILE_SCHEMA, grouped_tile_map


def _quad_of(pdf: pd.DataFrame, size: int, channels: int) -> list[np.ndarray | None]:
    """Order the <=4 children of one parent as [tl, tr, bl, br]."""
    quads: list[np.ndarray | None] = [None, None, None, None]
    for _, row in pdf.iterrows():
        dx = int(row["x"]) & 1
        dy = int(row["y"]) & 1
        img = png_decode(decompress(bytes(row["tile"]), row["compression"]))
        quads[dy * 2 + dx] = img
    return quads


def raster_overview_step(tiles: DataFrame, size: int = 256, channels: int = 4,
                         compression: str = "none") -> DataFrame:
    """One level: children at zoom z -> parents at z-1 (PNG tiles)."""

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (pz, px, py), idx in pdf.groupby(["pz", "px", "py"], sort=False).indices.items():
            sub = pdf.iloc[idx]
            canvas = compose_quad(*_quad_of(sub, size, channels), size=size, channels=channels)
            img = scaled_down(canvas, 2)
            blob = compress(png_encode(img), compression)
            rows.append((int(pz), int(px), int(py), "png", compression, blob, int(sub["n_features"].sum())))
        return pd.DataFrame(rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"])

    keyed = tiles.withColumn("pz", F.col("z") - 1).withColumn(
        "px", F.shiftright("x", 1)
    ).withColumn("py", F.shiftright("y", 1))
    return grouped_tile_map(keyed, body, TILE_SCHEMA, key_cols=("pz", "px", "py"))


def dem_overview_step(tiles: DataFrame, size: int = 256, compression: str = "none") -> DataFrame:
    """DEM variant: average raw 24-bit elevations (dem_overview.rs)."""

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (pz, px, py), idx in pdf.groupby(["pz", "px", "py"], sort=False).indices.items():
            sub = pdf.iloc[idx]
            img = dem_average_quad(_quad_of(sub, size, 3), size)
            blob = compress(png_encode(img), compression)
            rows.append((int(pz), int(px), int(py), "png", compression, blob, int(sub["n_features"].sum())))
        return pd.DataFrame(rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"])

    keyed = tiles.withColumn("pz", F.col("z") - 1).withColumn(
        "px", F.shiftright("x", 1)
    ).withColumn("py", F.shiftright("y", 1))
    return grouped_tile_map(keyed, body, TILE_SCHEMA, key_cols=("pz", "px", "py"))


def vector_overview_step(tiles: DataFrame, compression: str = GZIP) -> DataFrame:
    """Vector variant: merge 2x2 children's features into the parent with
    exact floor-halved grid coords; per-layer concat in child order
    (from_merged_vector.rs:101 merge semantics, coords per overview)."""

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (pz, px, py), idx in pdf.groupby(["pz", "px", "py"], sort=False).indices.items():
            sub = pdf.iloc[idx]
            layers: dict[str, list[MvtFeature]] = {}
            n = 0
            for _, row in sub.iterrows():
                dx = int(row["x"]) & 1
                dy = int(row["y"]) & 1
                decoded = decode_tile(decompress(bytes(row["tile"]), row["compression"]))
                for name, layer in decoded.items():
                    ext = layer["extent"]
                    for f in layer["features"]:
                        rings = [
                            [((gx + ext * dx) >> 1, (gy + ext * dy) >> 1) for gx, gy in ring]
                            for ring in f.rings
                        ]
                        layers.setdefault(name, []).append(
                            MvtFeature(f.geom_type, rings, f.props, f.fid)
                        )
                        n += 1
            blob = compress(encode_tile(layers), compression)
            rows.append((int(pz), int(px), int(py), "mvt", compression, blob, n))
        return pd.DataFrame(rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"])

    keyed = tiles.withColumn("pz", F.col("z") - 1).withColumn(
        "px", F.shiftright("x", 1)
    ).withColumn("py", F.shiftright("y", 1))
    return grouped_tile_map(keyed, body, TILE_SCHEMA, key_cols=("pz", "px", "py"))


def build_overviews(
    base: DataFrame,
    base_zoom: int,
    min_zoom: int = 0,
    kind: str = "vector",
    checkpoint_dir: str | None = None,
    **kwargs,
) -> DataFrame:
    """Iterate z = base_zoom..min_zoom+1, each level aggregated from the
    previous; returns the union of all levels incl. the base.

    Memory contract: every level feeds BOTH the next rollup and the output
    union, so without a sink each level must stay resident. With
    ``checkpoint_dir`` set (the 100-TB path), each level is written to
    parquet as soon as it is computed and read back for the union — executor
    storage holds at most ONE level's shuffle at a time and nothing stays
    pinned. Without it (small pyramids, tests) levels persist
    MEMORY_AND_DISK and are unpersisted by Spark's LRU under pressure."""
    from pyspark import StorageLevel

    step = {"vector": vector_overview_step, "raster": raster_overview_step, "dem": dem_overview_step}[kind]
    spark = base.sparkSession
    levels = [base]
    current = base
    for i in range(base_zoom, min_zoom, -1):
        current = step(current, **kwargs)
        if checkpoint_dir is not None:
            path = f"{checkpoint_dir}/overview_z{i - 1}"
            current.write.mode("overwrite").parquet(path)
            current = spark.read.parquet(path)
        else:
            current = current.persist(StorageLevel.MEMORY_AND_DISK)
        levels.append(current)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
