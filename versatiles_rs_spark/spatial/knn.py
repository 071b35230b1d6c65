"""k-nearest-neighbor search over point tables.

Two strategies (north rule: "kNN via cell-ring expansion"):

- ``knn_bruteforce``: broadcast the (small) query set, compute local top-k
  per partition inside a vectorized pandas UDF, then a tiny global top-k
  groupBy. Exact; the shuffle carries only n_queries * k * n_partitions rows.
  This is the oracle-checkable baseline.

- ``knn_cell_ring``: index data points by cell id at a chosen zoom; for each
  query expand rings r = r0, r0+1, ... joining only the candidate cells until
  k neighbors are guaranteed (a neighbor in ring r bounds the search radius,
  so ring r+1 suffices — the uniform-grid argument of reduce_points.rs:78
  generalized). At 10^12 points this reads a vanishing fraction of the table
  because the cell key is the partition/cluster key.

Distances: squared equirectangular degrees (exact double arithmetic — both
engines compute identical values; fine for ranking at test scale). Ties break
on point id so results are total-ordered and hash-stable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_KNN_SCHEMA = StructType(
    [
        StructField("qid", LongType()),
        StructField("pid", LongType()),
        StructField("dist2", DoubleType()),
    ]
)


def knn_bruteforce(
    points: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Exact kNN: per-partition local top-k (numpy argpartition) -> global
    top-k. ``queries`` = [(qid, lon, lat), ...] broadcast to every task."""
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(queries)

    def local_topk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qs = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            px = pdf[lon_col].values
            py = pdf[lat_col].values
            ids = pdf[id_col].values
            outs = []
            for qid, qlon, qlat in qs:
                d2 = (px - qlon) ** 2 + (py - qlat) ** 2
                if len(d2) > k:
                    idx = np.argpartition(d2, k)[: k]
                else:
                    idx = np.arange(len(d2))
                outs.append(
                    pd.DataFrame({"qid": qid, "pid": ids[idx], "dist2": d2[idx]})
                )
            yield pd.concat(outs, ignore_index=True)

    local = points.select(id_col, lon_col, lat_col).mapInPandas(local_topk, _KNN_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.asc("dist2"), F.asc("pid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", F.round("dist2", 9).alias("dist2"), "rank")
    )


def _ring_guarantee_radius(qlon: float, qlat: float, cell_zoom: int, ring: int) -> float:
    """Exact degree radius fully covered by the ring's candidate cells: the
    min distance from the query point to the ring bbox boundary. Web
    Mercator tiles shrink in latitude toward the poles, so the latitude
    sides are computed from real tile bounds (not 360/2^z); a side clipped
    at the pole row covers everything in that direction (infinite)."""
    from versatiles_rs_spark.tile_math.coords import coord_to_geo_np, lonlat_to_tile_np

    qx, qy = lonlat_to_tile_np(np.array([qlon]), np.array([qlat]), cell_zoom)
    size = 1 << cell_zoom
    x0, y0 = qx[0] - ring, qy[0] - ring
    x1, y1 = qx[0] + ring + 1, qy[0] + ring + 1
    wlon, nlat = coord_to_geo_np(cell_zoom, np.array([max(x0, 0)]), np.array([max(y0, 0)]))
    elon, slat = coord_to_geo_np(cell_zoom, np.array([min(x1, size)]), np.array([min(y1, size)]))
    sides = []
    # x wraps at the antimeridian; treat a ring wider than the world as full
    if 2 * ring + 1 >= size:
        sides.append(np.inf)
    else:
        sides.extend([qlon - wlon[0], elon[0] - qlon])
    sides.append(np.inf if y0 <= 0 else nlat[0] - qlat)
    sides.append(np.inf if y1 >= size else qlat - slat[0])
    return float(min(sides))


def knn_cell_ring(
    points: DataFrame,
    queries: list[tuple[int, float, float]],
    k: int,
    cell_zoom: int = 6,
    max_ring: int = 8,
    id_col: str = "doc_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Cell-ring-expansion kNN.

    Plan shape: points get a cell_id column (pure Column math); per query we
    precompute the candidate cell set for successive rings; a semi-join on
    cell_id prunes the table before the exact distance top-k. The ring radius
    doubles until the ring's guaranteed-coverage circle contains >= k points
    — checked with a cheap count aggregate per round (few rounds, each a
    pruned scan).

    Correctness guarantee: a candidate set from ring r covers every point
    within (r * cell_extent) of the query cell, so once >= k points are found
    within that radius *and* the (k-th distance) <= that radius, the result
    equals exact kNN. The final filter re-ranks with exact distances.
    """
    from versatiles_rs_spark.spatial.cells import knn_cells_np, point_cells

    spark = points.sparkSession
    pts = point_cells(points, cell_zoom, lon_col, lat_col).select(
        id_col, lon_col, lat_col, "cell_id"
    )
    pts = pts.persist()
    try:
        remaining = {q[0]: q for q in queries}
        completed: list[tuple[int, int, float, int]] = []
        ring = 1
        while remaining and ring <= max_ring:
            cand_rows = []
            guarantees: dict[int, float] = {}
            for qid, qlon, qlat in remaining.values():
                for cid in knn_cells_np(qlon, qlat, cell_zoom, ring).tolist():
                    cand_rows.append((qid, cid))
                guarantees[qid] = _ring_guarantee_radius(qlon, qlat, cell_zoom, ring)
            cand = spark.createDataFrame(
                pd.DataFrame(cand_rows, columns=["qid", "cell_id"])
            )
            joined = pts.join(F.broadcast(cand), "cell_id")
            qmap = {qid: (qlon, qlat) for qid, qlon, qlat in remaining.values()}
            bc = spark.sparkContext.broadcast(qmap)

            def dist(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                qm = bc.value
                for pdf in it:
                    if pdf.empty:
                        continue
                    qlonv = pdf["qid"].map(lambda q: qm[q][0]).values
                    qlatv = pdf["qid"].map(lambda q: qm[q][1]).values
                    d2 = (pdf[lon_col].values - qlonv) ** 2 + (pdf[lat_col].values - qlatv) ** 2
                    yield pd.DataFrame(
                        {"qid": pdf["qid"].values, "pid": pdf[id_col].values, "dist2": d2}
                    )

            scored = joined.mapInPandas(dist, _KNN_SCHEMA)
            w = Window.partitionBy("qid").orderBy(F.asc("dist2"), F.asc("pid"))
            topk = (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
            )
            # ONE job per ring: the top-k rows themselves are tiny
            # (<= len(remaining) * k), so collect them directly instead of a
            # stats-only aggregate followed by a full recompute of the same
            # topk lineage at the end of the loop (round-2 shape: 2 Spark
            # jobs per ring; now 1).
            by_q: dict[int, list] = {}
            for r in topk.collect():
                by_q.setdefault(r["qid"], []).append(r)
            for qid, rows in by_q.items():
                if len(rows) >= k and max(x["dist2"] for x in rows) <= guarantees[qid] ** 2:
                    completed.extend(
                        (qid, int(x["pid"]), float(x["dist2"]), int(x["rank"])) for x in rows
                    )
                    del remaining[qid]
            ring *= 2
        results: list[DataFrame] = []
        if completed:
            done_df = spark.createDataFrame(
                pd.DataFrame(completed, columns=["qid", "pid", "dist2", "rank"]),
                schema="qid long, pid long, dist2 double, rank int",
            )
            # round Spark-side so the rounding rule matches knn_bruteforce
            results.append(
                done_df.select("qid", "pid", F.round("dist2", 9).alias("dist2"), "rank")
            )
        if remaining:  # fall back to exact for stragglers (e.g. poles)
            results.append(
                knn_bruteforce(points, list(remaining.values()), k, id_col, lon_col, lat_col)
            )
        out = results[0]
        for r in results[1:]:
            out = out.unionByName(r)
        return out
    finally:
        pts.unpersist()
