"""Tile-footprint outline: dissolve the union of tile squares into polygons.

export-outline / TileOutline analog (versatiles/src/tools/dev_tools/
export_outline.rs; versatiles_geometry/src/tile_outline/mod.rs:14-70): the
union of axis-aligned tile squares dissolves by *edge cancellation* — every
tile contributes its 4 boundary edges, edges shared by two tiles cancel, the
survivors chain into closed rings (outer shells counter-clockwise, holes
clockwise by construction of the traversal).

Spark shape: the distinct-coords aggregation runs distributed (a groupBy);
ring chaining runs on the (small) per-zoom boundary edge set — the same
split the reference makes (stream the tiles, assemble the outline in one
place).
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame

from versatiles_rs_spark.tile_math.coords import coord_to_geo_np


def _boundary_rings(coords: set[tuple[int, int]]) -> list[list[tuple[int, int]]]:
    """Edge-cancellation dissolve on integer tile squares -> closed rings in
    tile-grid vertex coordinates."""
    # directed edges of each unit square, oriented CCW in (x, y-down) grid:
    # we orient so that interior is to the LEFT; shared edges appear twice
    # with opposite directions and cancel.
    edges: set[tuple[tuple[int, int], tuple[int, int]]] = set()

    def add(a, b):
        if (b, a) in edges:
            edges.remove((b, a))
        else:
            edges.add((a, b))

    for (x, y) in coords:
        add((x, y), (x + 1, y))          # top, left->right
        add((x + 1, y), (x + 1, y + 1))  # right, down
        add((x + 1, y + 1), (x, y + 1))  # bottom, right->left
        add((x, y + 1), (x, y))          # left, up

    nxt: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for a, b in edges:
        nxt.setdefault(a, []).append(b)
    for v in nxt.values():
        v.sort()

    rings = []
    while nxt:
        start = min(nxt)
        ring = [start]
        cur = start
        prev_dir = None
        while True:
            outs = nxt[cur]
            # prefer continuing straight / deterministic choice
            nxt_pt = outs.pop(0)
            if not outs:
                del nxt[cur]
            ring.append(nxt_pt)
            prev_dir = (nxt_pt[0] - cur[0], nxt_pt[1] - cur[1])
            cur = nxt_pt
            if cur == start:
                break
        # collapse collinear runs
        out = []
        for p in ring[:-1]:
            if len(out) >= 2:
                a, b = out[-2], out[-1]
                if (b[0] - a[0]) * (p[1] - b[1]) == (b[1] - a[1]) * (p[0] - b[0]):
                    out[-1] = p
                    continue
            out.append(p)
        # check last collinear wrap
        if len(out) >= 3:
            a, b, c = out[-2], out[-1], out[0]
            if (b[0] - a[0]) * (c[1] - b[1]) == (b[1] - a[1]) * (c[0] - b[0]):
                out.pop()
        out.append(out[0])
        rings.append(out)
    return rings


def tile_outline_geojson(tiles: DataFrame, zoom: int) -> str:
    """Dissolved outline of all tiles at one zoom as GeoJSON MultiPolygon."""
    coords = {
        (int(r["x"]), int(r["y"]))
        for r in tiles.filter(f"z = {zoom}").select("x", "y").distinct().collect()
    }
    if not coords:
        return json.dumps({"type": "MultiPolygon", "coordinates": []})
    rings = _boundary_rings(coords)
    polys = []
    for ring in rings:
        xs = np.array([p[0] for p in ring], dtype=np.float64)
        ys = np.array([p[1] for p in ring], dtype=np.float64)
        lon, lat = coord_to_geo_np(zoom, xs, ys)
        polys.append([[ [round(float(a), 9), round(float(b), 9)] for a, b in zip(lon, lat)]])
    return json.dumps({"type": "MultiPolygon", "coordinates": polys})


def count_tiles(tiles: DataFrame, zoom: int | None = None) -> int:
    """count-tiles dev tool."""
    df = tiles if zoom is None else tiles.filter(f"z = {zoom}")
    return df.count()


def measure_tile_sizes(tiles: DataFrame, zoom: int) -> bytes:
    """Heatmap PNG: brightness = 10*log2(size) per tile of one level
    (dev_tools/measure_tile_sizes.rs)."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark.functions.raster import png_encode

    rows = (
        tiles.filter(f"z = {zoom}")
        .select("x", "y", F.length("tile").alias("size"))
        .collect()
    )
    n = 1 << zoom
    img = np.zeros((n, n, 1), dtype=np.uint8)
    for r in rows:
        img[int(r["y"]), int(r["x"]), 0] = min(255, int(10 * np.log2(max(r["size"], 1))))
    return png_encode(img)
