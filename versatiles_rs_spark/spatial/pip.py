"""Broadcast ray-casting point-in-polygon join — the north-star primitive.

Re-expresses raster_mask's spatial machinery
(versatiles_pipeline/src/operations/raster/raster_mask/mask_geometry.rs):

- ``classify_tiles``  : FullyInside / FullyOutside / Partial tile-vs-polygon
  classification (mask_geometry.rs:237 ``classify_tile``) — the coarse-to-fine
  pruning stage, so the exact per-point test only runs on Partial tiles.
- ``pip_contains_np`` : vectorized even-odd ray cast, exact semantics of
  ``ray_crosses`` (mask_geometry.rs:85): a ray to +x crosses edge (p1, p2)
  iff ``(y1 > py) != (y2 > py)`` and ``px < (x2-x1)*(py-y1)/(y2-y1) + x1``.
- ``pip_join``        : DataFrame join point-rows x polygon-set. The polygon
  set is broadcast (like the reference's one-time R-tree build,
  mask_geometry.rs:164); the probe side is a zero-shuffle mapInArrow with a
  per-batch bbox prefilter standing in for the R-tree — candidate pruning is
  O(1) numpy compares per polygon instead of tree descent, which wins for
  broadcastable polygon counts. No pandas frame is materialized on either
  side of the Arrow boundary, and ``payload_cols`` trims the return stream.

Scale: no shuffle at all — each task streams its point partition against the
broadcast edge arrays; 10^12 points parallelize embarrassingly. For polygon
sets too big to broadcast, the planner should fall back to the cell-cover
equi-join (spatial/cells.py) — same two-stage shape as the reference.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FULLY_OUTSIDE = 0
PARTIAL = 1
FULLY_INSIDE = 2


@dataclass
class Polygon:
    """A polygon feature: outer ring(s); holes via even-odd rule."""

    feature_id: int
    name: str
    kind: str
    rings: list[list[tuple[float, float]]]

    def edges(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        x1, y1, x2, y2 = [], [], [], []
        for ring in self.rings:
            n = len(ring)
            for i in range(n):
                a = ring[i]
                b = ring[(i + 1) % n]
                if a == b:
                    continue  # skip zero-length edges
                x1.append(a[0]); y1.append(a[1]); x2.append(b[0]); y2.append(b[1])
        return (np.array(x1), np.array(y1), np.array(x2), np.array(y2))

    def bbox(self) -> tuple[float, float, float, float]:
        xs = [p[0] for r in self.rings for p in r]
        ys = [p[1] for r in self.rings for p in r]
        return min(xs), min(ys), max(xs), max(ys)


_PT_BLOCK = 2048
_EDGE_BLOCK = 128


def pip_contains_np(px: np.ndarray, py: np.ndarray, edges) -> np.ndarray:
    """Even-odd ray cast of N points against E edges; bool mask.

    Exact ``ray_crosses`` arithmetic (mask_geometry.rs:85): note the strict
    ``>`` on both y-comparisons (half-open rule — a vertex counts for the
    edge whose y1 is at/below the ray) and the strict ``<`` on x.

    Blocked over both axes so the (pts x edges) float64 intermediates stay
    cache-resident — the naive full matrix saturates memory bandwidth and
    anti-scales past ~8 concurrent workers. Crossing counts are integers, so
    blocking does not change any result bit.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x1, y1, x2, y2 = (np.asarray(a, dtype=np.float64) for a in edges)
    n, e = len(px), len(x1)
    crossings = np.zeros(n, dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        for p0 in range(0, n, _PT_BLOCK):
            p1 = min(p0 + _PT_BLOCK, n)
            bpx = px[p0:p1, None]
            bpy = py[p0:p1, None]
            acc = np.zeros(p1 - p0, dtype=np.int64)
            for e0 in range(0, e, _EDGE_BLOCK):
                e1 = min(e0 + _EDGE_BLOCK, e)
                ey1 = y1[None, e0:e1]
                ey2 = y2[None, e0:e1]
                straddles = (ey1 > bpy) != (ey2 > bpy)
                x_at_y = (x2 - x1)[None, e0:e1] * (bpy - ey1) / (ey2 - ey1) + x1[None, e0:e1]
                acc += (straddles & (bpx < x_at_y)).sum(axis=1)
            crossings[p0:p1] = acc
    return (crossings % 2).astype(bool)


def _segments_intersect_rect(
    edges, w: np.ndarray, s: np.ndarray, e: np.ndarray, n: np.ndarray
) -> np.ndarray:
    """(T tiles) x (E edges) Liang-Barsky clip acceptance -> per-tile bool:
    does ANY polygon edge touch the tile rect (including edges fully inside
    it)? Mirrors the reference's use of Liang-Barsky for line clipping
    (feature_import/tile_render.rs:210)."""
    x1, y1, x2, y2 = edges
    dx = (x2 - x1)[None, :]
    dy = (y2 - y1)[None, :]
    x1b = x1[None, :]
    y1b = y1[None, :]
    t0 = np.zeros((len(w), len(x1)))
    t1 = np.ones((len(w), len(x1)))
    reject = np.zeros((len(w), len(x1)), dtype=bool)
    for p, q in (
        (-dx, x1b - w[:, None]),
        (dx, e[:, None] - x1b),
        (-dy, y1b - s[:, None]),
        (dy, n[:, None] - y1b),
    ):
        p = np.broadcast_to(p, t0.shape)
        q = np.broadcast_to(q, t0.shape)
        par = p == 0
        reject |= par & (q < 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(par, 0.0, q / np.where(par, 1.0, p))
        t0 = np.where(~par & (p < 0), np.maximum(t0, t), t0)
        t1 = np.where(~par & (p > 0), np.minimum(t1, t), t1)
    return (~reject & (t0 <= t1)).any(axis=1)


def classify_tiles(z: int, x: np.ndarray, y: np.ndarray, poly: Polygon) -> np.ndarray:
    """Classify tiles against one polygon (mask_geometry.rs:237).

    Sound for arbitrary (incl. concave) polygons: if no polygon edge touches
    the tile rect, the tile is uniformly inside or outside, decided by one
    corner's PIP; otherwise PARTIAL."""
    from versatiles_rs_spark.tile_math.coords import tile_geo_bbox_np

    x = np.atleast_1d(np.asarray(x))
    y = np.atleast_1d(np.asarray(y))
    w, s, e, n = tile_geo_bbox_np(z, x, y)
    bx0, by0, bx1, by1 = poly.bbox()
    out = np.full(len(x), PARTIAL, dtype=np.int8)
    disjoint = (e < bx0) | (w > bx1) | (n < by0) | (s > by1)
    out[disjoint] = FULLY_OUTSIDE

    edges = poly.edges()
    todo = ~disjoint
    if todo.any():
        cw, cs, ce, cn = w[todo], s[todo], e[todo], n[todo]
        touched = _segments_intersect_rect(edges, cw, cs, ce, cn)
        # untouched tiles are uniform: sample the center point
        center_in = pip_contains_np((cw + ce) / 2.0, (cs + cn) / 2.0, edges)
        sub = np.full(todo.sum(), PARTIAL, dtype=np.int8)
        sub[~touched & center_in] = FULLY_INSIDE
        sub[~touched & ~center_in] = FULLY_OUTSIDE
        out[todo] = sub
    return out


_PIP_EXTRA = [
    StructField("feature_id", IntegerType()),
    StructField("poly_name", StringType()),
]


def pip_join(
    points: DataFrame,
    polygons: list[Polygon],
    lon_col: str = "lon",
    lat_col: str = "lat",
    how: str = "inner",
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Join point rows to the polygons containing them (even-odd rule).

    ``how='inner'`` drops points in no polygon; ``'left'`` keeps them with
    NULL feature_id. A point inside k polygons yields k rows (matching the
    SQL cross-join-filter oracle).

    ``payload_cols`` names the input columns carried through the probe and
    returned alongside (feature_id, poly_name). Default: every input column.
    Pass the minimal set (e.g. ``["doc_id"]``) to shrink BOTH Arrow streams —
    lon/lat are consumed inside the probe and need not ride the return path.

    The probe is a ``mapInArrow`` stage: lon/lat come out of the RecordBatch
    as zero-copy numpy views, hit rows are gathered with one C++-side
    ``Table.take`` per batch, and no pandas frame is ever materialized —
    JVM<->Python transfer is the measured bottleneck at bench scale, so the
    hot path stays entirely in Arrow.
    """
    import pyarrow as pa
    from pyspark.sql import functions as F

    spark = points.sparkSession
    if payload_cols is not None:
        keep = list(dict.fromkeys(list(payload_cols) + [lon_col, lat_col]))
        points = points.select(*keep)
        out_names = list(payload_cols)
    else:
        out_names = [f.name for f in points.schema.fields]
    if how == "inner" and polygons:
        # JVM-side bbox prefilter: a point outside every polygon's bbox can
        # never match an inner join, so drop it INSIDE codegen before the
        # Arrow boundary — the JVM->Python transfer is the measured
        # bottleneck and this shrinks it by the non-candidate fraction.
        # The exact per-polygon bbox test still runs in the probe.
        cond = None
        for p in polygons:
            bx0, by0, bx1, by1 = p.bbox()
            c = (
                (F.col(lon_col) >= bx0) & (F.col(lon_col) <= bx1)
                & (F.col(lat_col) >= by0) & (F.col(lat_col) <= by1)
            )
            cond = c if cond is None else (cond | c)
        points = points.filter(cond)
    # scale hygiene: a zero-shuffle map pipeline inherits the source's
    # partitioning; a single fat parquet file would serialize the whole probe
    # onto one task. Spread (on the already-projected slim columns) to at
    # least the cluster's parallelism. On a many-partition production table
    # this guard never fires and the plan stays exchange-free.
    #
    # Why an exchange and not spark.sql.files.maxPartitionBytes on the read
    # (the obvious alternative): parquet scan splits only parallelize down
    # to ROW-GROUP granularity — the test tables are single-row-group files
    # (events sf0.1 = 1 row group / 100k rows, measured), so byte-range
    # splits below that produce empty partitions, not parallelism. A
    # RoundRobin exchange of the bbox-surviving slim rows is the only lever
    # for such inputs, and it is bounded by the post-prefilter volume. At
    # production scale (many files x many row groups) the condition is
    # false and no exchange exists.
    target = spark.sparkContext.defaultParallelism
    if points.rdd.getNumPartitions() < target:
        points = points.repartition(target)
    payload = [
        (p.feature_id, p.name, p.edges(), p.bbox())
        for p in polygons
    ]
    bc = spark.sparkContext.broadcast(payload)

    base_fields = [f for f in points.schema.fields if f.name in out_names]
    out_schema = StructType(base_fields + _PIP_EXTRA)

    def probe(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        polys = bc.value
        for batch in it:
            tbl = pa.Table.from_batches([batch])
            lon_i = batch.schema.get_field_index(lon_col)
            lat_i = batch.schema.get_field_index(lat_col)
            px = batch.column(lon_i).to_numpy(zero_copy_only=False).astype(np.float64)
            py = batch.column(lat_i).to_numpy(zero_copy_only=False).astype(np.float64)
            n = len(px)
            idx_parts: list[np.ndarray] = []
            fid_parts: list[np.ndarray] = []
            name_parts: list[np.ndarray] = []
            matched = np.zeros(n, dtype=bool)
            for fid, name, edges, (bx0, by0, bx1, by1) in polys:
                cand = (px >= bx0) & (px <= bx1) & (py >= by0) & (py <= by1)
                if not cand.any():
                    continue
                inside = np.zeros(n, dtype=bool)
                inside[cand] = pip_contains_np(px[cand], py[cand], edges)
                hit_idx = np.nonzero(inside)[0]
                if len(hit_idx):
                    idx_parts.append(hit_idx)
                    fid_parts.append(np.full(len(hit_idx), fid, dtype=np.int32))
                    name_parts.append(np.full(len(hit_idx), name, dtype=object))
                    matched |= inside
            if how == "left":
                miss_idx = np.nonzero(~matched)[0]
                if len(miss_idx):
                    idx_parts.append(miss_idx)
                    fid_parts.append(np.full(len(miss_idx), -1, dtype=np.int32))
                    name_parts.append(np.full(len(miss_idx), None, dtype=object))
            if not idx_parts:
                continue
            idx = np.concatenate(idx_parts)
            fids = np.concatenate(fid_parts)
            names = np.concatenate(name_parts)
            taken = tbl.select(out_names).take(pa.array(idx))
            fid_arr = pa.array(fids, type=pa.int32())
            if how == "left":
                fid_arr = pa.array(
                    [None if f == -1 else int(f) for f in fids], type=pa.int32()
                )
            cols = list(taken.columns) + [fid_arr, pa.array(names, type=pa.string())]
            out = pa.Table.from_arrays(cols, names=out_names + ["feature_id", "poly_name"])
            yield from out.combine_chunks().to_batches()

    return points.mapInArrow(probe, schema=out_schema)
