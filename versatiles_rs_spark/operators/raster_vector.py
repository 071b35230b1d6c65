"""Raster <-> vector conversion of tile pyramids (north rule: "raster-vector
rasterization of tile pyramids at zoom 0-14").

- ``rasterize_vector_tiles``: MVT -> PNG per tile. Points splat a small
  square, lines draw via vectorized Bresenham-ish sampling, polygons fill by
  even-odd scanline (the same ray-cast arithmetic as spatial/pip, applied to
  the pixel grid).
- ``vectorize_raster_tiles``: mask channel -> dissolved MVT polygons via the
  edge-cancellation boundary tracing shared with operators/outline (filled
  pixels are unit squares; shared edges cancel; survivors chain into rings).

Pixel-aligned shapes roundtrip exactly: vectorize(rasterize(P)) == P and
rasterize(vectorize(M)) == M (tested). Both are zero-shuffle mapInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from versatiles_rs_spark.functions.compression import compress, decompress
from versatiles_rs_spark.functions.mvt import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    TILE_EXTENT,
    MvtFeature,
    decode_tile,
    encode_tile,
)
from versatiles_rs_spark.functions.raster import png_decode, png_encode
from versatiles_rs_spark.operators.convert import TILE_SCHEMA
from versatiles_rs_spark.operators.outline import _boundary_rings


def _fill_polygon(mask: np.ndarray, rings: list[list[tuple[int, int]]], scale: float) -> None:
    """Even-odd scanline fill of rings (grid coords / scale -> pixels)."""
    size = mask.shape[0]
    edges = []
    for ring in rings:
        pts = [(gx * scale, gy * scale) for gx, gy in ring]
        n = len(pts)
        for i in range(n):
            a, b = pts[i], pts[(i + 1) % n]
            if a[1] != b[1]:
                edges.append((a[0], a[1], b[0], b[1]))
    if not edges:
        return
    ex = np.array([[e[0], e[2]] for e in edges])
    ey = np.array([[e[1], e[3]] for e in edges])
    for row in range(size):
        py = row + 0.5
        straddle = (ey[:, 0] > py) != (ey[:, 1] > py)
        if not straddle.any():
            continue
        x0, y0, x1, y1 = ex[straddle, 0], ey[straddle, 0], ex[straddle, 1], ey[straddle, 1]
        xs = np.sort((x1 - x0) * (py - y0) / (y1 - y0) + x0)
        for i in range(0, len(xs) - 1, 2):
            a = max(0, int(np.ceil(xs[i] - 0.5)))
            b = min(size - 1, int(np.floor(xs[i + 1] - 0.5)))
            if b >= a:
                mask[row, a : b + 1] = True


def _draw_line(mask: np.ndarray, pts: list[tuple[float, float]]) -> None:
    size = mask.shape[0]
    for i in range(len(pts) - 1):
        (x0, y0), (x1, y1) = pts[i], pts[i + 1]
        steps = max(2, int(max(abs(x1 - x0), abs(y1 - y0))) * 2 + 1)
        t = np.linspace(0.0, 1.0, steps)
        xs = np.clip((x0 + (x1 - x0) * t).astype(int), 0, size - 1)
        ys = np.clip((y0 + (y1 - y0) * t).astype(int), 0, size - 1)
        mask[ys, xs] = True


def rasterize_vector_tiles(
    tiles: DataFrame,
    size: int = 256,
    color: tuple[int, int, int, int] = (0, 0, 0, 255),
    point_radius: int = 1,
) -> DataFrame:
    """MVT tiles -> PNG tiles (format 'png'); geometry painted into an RGBA
    canvas, one tile per row, zero shuffle."""
    scale = size / TILE_EXTENT

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                layers = decode_tile(decompress(bytes(r["tile"]), r["compression"]))
                mask = np.zeros((size, size), dtype=bool)
                n = 0
                for layer in layers.values():
                    for f in layer["features"]:
                        n += 1
                        if f.geom_type == GEOM_POINT:
                            for ring in f.rings:
                                for gx, gy in ring:
                                    px, py = int(gx * scale), int(gy * scale)
                                    a = max(0, px - point_radius)
                                    b = min(size - 1, px + point_radius)
                                    c = max(0, py - point_radius)
                                    d = min(size - 1, py + point_radius)
                                    mask[c : d + 1, a : b + 1] = True
                        elif f.geom_type == GEOM_LINESTRING:
                            for ring in f.rings:
                                _draw_line(mask, [(gx * scale, gy * scale) for gx, gy in ring])
                        else:
                            _fill_polygon(mask, f.rings, scale)
                img = np.zeros((size, size, 4), dtype=np.uint8)
                img[mask] = color
                blob = compress(png_encode(img), r["compression"])
                rows.append(
                    (int(r["z"]), int(r["x"]), int(r["y"]), "png", r["compression"], blob, n)
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


def vectorize_raster_tiles(
    tiles: DataFrame,
    threshold: int = 128,
    channel: int = 3,
    layer_name: str = "mask",
) -> DataFrame:
    """PNG tiles -> MVT polygon tiles: pixels with channel >= threshold form
    the mask; boundary tracing dissolves them into rings (outer + holes),
    scaled to the 4096 grid. Tiles with an empty mask are dropped."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                img = png_decode(decompress(bytes(r["tile"]), r["compression"]))
                ch = min(channel, img.shape[2] - 1)
                mask = img[:, :, ch] >= threshold
                if not mask.any():
                    continue
                ys, xs = np.nonzero(mask)
                cells = set(zip(xs.tolist(), ys.tolist()))
                rings = _boundary_rings(cells)
                scale = TILE_EXTENT / img.shape[0]
                grid_rings = [
                    [(int(round(px * scale)), int(round(py * scale))) for px, py in ring]
                    for ring in rings
                ]
                feat = MvtFeature(GEOM_POLYGON, grid_rings, {}, fid=0)
                blob = compress(encode_tile({layer_name: [feat]}), r["compression"])
                rows.append(
                    (int(r["z"]), int(r["x"]), int(r["y"]), "mvt", r["compression"], blob, 1)
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)
