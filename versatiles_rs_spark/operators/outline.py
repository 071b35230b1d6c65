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


def _surviving_edges(tiles: DataFrame, zoom: int) -> list[tuple[tuple[int, int], tuple[int, int]]]:
    """DISTRIBUTED edge cancellation: each tile emits its 4 directed boundary
    edges; an edge shared by two tiles appears exactly twice (opposite
    directions, same undirected key) and cancels in a groupBy — only the
    boundary survivors (count == 1) ever reach the driver. At z14 worldwide
    that is the coastline-sized ring set, not the 2.7e8-tile interior."""
    from pyspark.sql import functions as F

    xy = tiles.filter(f"z = {zoom}").select("x", "y").distinct()
    # 4 directed edges per tile, interior to the LEFT (same orientation as
    # _boundary_rings.add); canonical undirected key = lexicographic (lo, hi)
    edges = xy.select(
        F.explode(
            F.expr(
                "array("
                "struct(x as ax, y as ay, x + 1 as bx, y as by),"            # top
                "struct(x + 1 as ax, y as ay, x + 1 as bx, y + 1 as by),"    # right
                "struct(x + 1 as ax, y + 1 as ay, x as bx, y + 1 as by),"    # bottom
                "struct(x as ax, y + 1 as ay, x as bx, y as by))"            # left
            )
        ).alias("e")
    ).select("e.*")
    canon = edges.select(
        "ax", "ay", "bx", "by",
        F.least(
            F.struct("ax", "ay"), F.struct(F.col("bx").alias("ax"), F.col("by").alias("ay"))
        ).alias("lo"),
        F.greatest(
            F.struct("ax", "ay"), F.struct(F.col("bx").alias("ax"), F.col("by").alias("ay"))
        ).alias("hi"),
    )
    survivors = (
        canon.groupBy("lo", "hi")
        .agg(F.count("*").alias("n"), F.first("ax").alias("ax"), F.first("ay").alias("ay"),
             F.first("bx").alias("bx"), F.first("by").alias("by"))
        .filter("n = 1")
        .select("ax", "ay", "bx", "by")
        .collect()
    )
    return [((int(r["ax"]), int(r["ay"])), (int(r["bx"]), int(r["by"]))) for r in survivors]


def _chain_rings(
    edges: list[tuple[tuple[int, int], tuple[int, int]]],
) -> list[list[tuple[int, int]]]:
    """Chain surviving directed edges into closed rings + collapse collinear
    runs (same traversal as _boundary_rings, minus the cancellation)."""
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
        while True:
            outs = nxt[cur]
            nxt_pt = outs.pop(0)
            if not outs:
                del nxt[cur]
            ring.append(nxt_pt)
            cur = nxt_pt
            if cur == start:
                break
        out: list[tuple[int, int]] = []
        for p in ring[:-1]:
            if len(out) >= 2:
                a, b = out[-2], out[-1]
                if (b[0] - a[0]) * (p[1] - b[1]) == (b[1] - a[1]) * (p[0] - b[0]):
                    out[-1] = p
                    continue
            out.append(p)
        if len(out) >= 3:
            a, b, c = out[-2], out[-1], out[0]
            if (b[0] - a[0]) * (c[1] - b[1]) == (b[1] - a[1]) * (c[0] - b[0]):
                out.pop()
        out.append(out[0])
        rings.append(out)
    return rings


def tile_outline_geojson(tiles: DataFrame, zoom: int) -> str:
    """Dissolved outline of all tiles at one zoom as GeoJSON MultiPolygon.

    Cancellation is distributed (groupBy over directed edges); only the
    surviving boundary edges are collected and chained on the driver."""
    survivors = _surviving_edges(tiles, zoom)
    if not survivors:
        return json.dumps({"type": "MultiPolygon", "coordinates": []})
    rings = _chain_rings(survivors)
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


def measure_tile_sizes(tiles: DataFrame, zoom: int, max_side: int = 2048) -> bytes:
    """Heatmap PNG: brightness = 10*log2(size) per tile of one level
    (dev_tools/measure_tile_sizes.rs).

    Bounded driver footprint: when 2^zoom exceeds ``max_side``, tiles are
    aggregated JVM-side into a (max_side x max_side) grid (max size per
    cell) BEFORE collect — the driver never holds per-tile rows or a
    2^z x 2^z allocation (268 megapixels at z14)."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark.functions.raster import png_encode

    n = 1 << zoom
    scale = max(1, (n + max_side - 1) // max_side)
    side = (n + scale - 1) // scale
    rows = (
        tiles.filter(f"z = {zoom}")
        .select(
            (F.col("x") / scale).cast("int").alias("gx"),
            (F.col("y") / scale).cast("int").alias("gy"),
            F.length("tile").alias("size"),
        )
        .groupBy("gx", "gy")
        .agg(F.max("size").alias("size"))
        .collect()
    )
    img = np.zeros((side, side, 1), dtype=np.uint8)
    for r in rows:
        img[int(r["gy"]), int(r["gx"]), 0] = min(255, int(10 * np.log2(max(r["size"], 1))))
    return png_encode(img)
