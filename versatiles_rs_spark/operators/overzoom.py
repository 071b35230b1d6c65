"""Overzoom: serve zoom z+Δ from tiles at zoom z (vector_overzoom.rs).

Semantics (operations/vector/vector_overzoom.rs:1-53): for each child coord
find the parent tile, clip features to the child's sub-region *with buffer*
(default 80/4096 of the child extent ≈ tippecanoe's 5px x 16, :51), rescale
coords to the child extent, re-encode.

Spark shape: parent -> 4 children is a pure local flat-map (one mapInPandas,
zero shuffle) when generating a full level; serving arbitrary child coords
uses the join-on-parent form (child coords joined to the parent level on
(z0, x >> Δ, y >> Δ)). The reference's 256 MB parent LRU cache is replaced
by persisting the parent-level DataFrame across the loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from versatiles_rs_spark.functions.compression import GZIP, compress, decompress
from versatiles_rs_spark.functions.mvt import (
    GEOM_POINT,
    TILE_EXTENT,
    MvtFeature,
    decode_tile,
    encode_tile,
)
from versatiles_rs_spark.operators.convert import TILE_SCHEMA

DEFAULT_BUFFER = 80  # vector_overzoom.rs:51


def _child_features(
    layers: dict, dx: int, dy: int, buffer: int
) -> tuple[dict[str, list[MvtFeature]], int]:
    """Extract one child's features: shift to the child's sub-square, scale
    x2, keep features intersecting the buffered extent."""
    lo, hi = -buffer, TILE_EXTENT + buffer
    out: dict[str, list[MvtFeature]] = {}
    n = 0
    for name, layer in layers.items():
        ext = layer["extent"]
        half = ext // 2
        for f in layer["features"]:
            rings = []
            for ring in f.rings:
                pts = [((gx - half * dx) * 2, (gy - half * dy) * 2) for gx, gy in ring]
                rings.append(pts)
            if f.geom_type == GEOM_POINT:
                rings = [
                    r for r in rings if all(lo <= px <= hi and lo <= py <= hi for px, py in r)
                ]
                if not rings:
                    continue
            else:
                # keep lines/polygons whose bbox intersects the buffered child
                flat = [p for r in rings for p in r]
                xs = [p[0] for p in flat]
                ys = [p[1] for p in flat]
                if max(xs) < lo or min(xs) > hi or max(ys) < lo or min(ys) > hi:
                    continue
            out.setdefault(name, []).append(MvtFeature(f.geom_type, rings, f.props, f.fid))
            n += 1
    return out, n


def vector_overzoom_step(
    tiles: DataFrame, buffer: int = DEFAULT_BUFFER, compression: str = GZIP
) -> DataFrame:
    """One zoom level down the pyramid: every tile at z -> up to 4 tiles at
    z+1 (children with no surviving features are skipped, matching
    render_tile's None-for-empty, tile_render.rs:27)."""

    def explode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                layers = decode_tile(decompress(bytes(row["tile"]), row["compression"]))
                for dx in (0, 1):
                    for dy in (0, 1):
                        child, n = _child_features(layers, dx, dy, buffer)
                        if not n:
                            continue
                        blob = compress(encode_tile(child), compression)
                        rows.append(
                            (
                                int(row["z"]) + 1,
                                int(row["x"]) * 2 + dx,
                                int(row["y"]) * 2 + dy,
                                "mvt",
                                compression,
                                blob,
                                n,
                            )
                        )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return tiles.mapInPandas(explode, schema=TILE_SCHEMA)


def overzoom_to(tiles_at_base: DataFrame, base_zoom: int, target_zoom: int,
                buffer: int = DEFAULT_BUFFER, compression: str = GZIP) -> DataFrame:
    """Chain steps base_zoom -> target_zoom (each step is shuffle-free)."""
    out = tiles_at_base
    for _ in range(base_zoom, target_zoom):
        out = vector_overzoom_step(out, buffer, compression)
    return out


def overzoom_lookup(
    child_coords: DataFrame,
    tiles: DataFrame,
    target_zoom: int,
    max_climb: int = 4,
) -> DataFrame:
    """Serve arbitrary child coords from a multi-level tile table with
    *climbing*: for each requested (x, y) at ``target_zoom``, find the
    nearest ancestor tile present in ``tiles``, preferring the deepest
    (vector_overzoom.rs:193-217 climbing behavior).

    Spark shape: one join per climb level against the parent coordinate
    (cheap — the parent levels shrink 4x per step), coalesced by depth via
    a rank over the union. Returns (x, y, parent_z, parent_x, parent_y,
    tile, compression).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    hits = None
    for climb in range(0, max_climb + 1):
        pz = target_zoom - 1 - climb
        if pz < 0:
            break
        shift = 1 + climb
        cand = child_coords.select(
            "x", "y",
            F.shiftright(F.col("x"), shift).alias("px"),
            F.shiftright(F.col("y"), shift).alias("py"),
            F.lit(pz).alias("pz"),
            F.lit(climb).alias("climb"),
        )
        lvl = tiles.filter(F.col("z") == pz).select(
            F.col("z").alias("pz"), F.col("x").alias("px"), F.col("y").alias("py"),
            "tile", "compression",
        )
        j = cand.join(lvl, ["pz", "px", "py"])
        hits = j if hits is None else hits.unionByName(j)
    w = Window.partitionBy("x", "y").orderBy(F.asc("climb"))
    return (
        hits.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("x", "y", F.col("pz").alias("parent_z"), F.col("px").alias("parent_x"),
                F.col("py").alias("parent_y"), "tile", "compression")
    )
