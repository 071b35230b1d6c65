"""Grid DBSCAN — density-based spatial clustering at corpus scale.

The GriT/grid simplification of DBSCAN (Gunawan 2013 et al.): snap
points to a cell grid, a cell with >= min_pts points is DENSE, and
clusters are the connected components of 8-adjacent dense cells (label
= the minimum cell key, the dedup_clusters canonical-representative
rule). Points in dense cells inherit their component; everything else
is noise. With cell = eps/2-ish this is the standard scalable DBSCAN
surrogate: the expensive neighborhood query becomes ONE map-side-
combined count aggregation, and all further work (adjacency join, CC
iterations) runs on the DENSE-CELL table — bounded by occupied cells,
never by points.

Plan: points -> cell counts (1 exchange) -> dense filter -> 8-neighbor
addressed-copy equi-join (the tile_hotspots trick, on the aggregated
table) -> connected_components (dedup/clusters.py: min-label
propagation with localCheckpoint cadence) -> one join back to dense
cells for per-cluster stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from versatiles_rs_spark.dedup.clusters import connected_components

#: cell key packing: key = cx * 2^21 + cy (callers keep coords in
#: [0, 2^21 * cell) — the fixture domain is far inside).
_KEY_SPAN = 1 << 21


def grid_dbscan(
    points: DataFrame,
    cell: int,
    min_pts: int,
    qx_col: str = "qx",
    qy_col: str = "qy",
) -> DataFrame:
    """Per-cluster stats (cluster, n_cells, n_points) over the dense-cell
    components; ``cluster`` is the minimum packed cell key. Non-negative
    integer coords expected."""
    cx = F.expr(f"{qx_col} div {cell}")
    cy = F.expr(f"{qy_col} div {cell}")
    counts = (
        points.select(cx.alias("cx"), cy.alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dense = counts.filter(F.col("n") >= min_pts).select(
        "cx", "cy", "n", (F.col("cx") * _KEY_SPAN + F.col("cy")).alias("key")
    )
    # Pin the dense-cell table: it feeds BOTH sides of the adjacency
    # join and the final per-cluster stats join — without this the
    # point-table aggregation upstream runs three times (guide §5:
    # reused and expensive to recompute). Lazy: materialized by the
    # first action that touches it.
    dense = dense.localCheckpoint(eager=False)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    addressed = dense.select(
        F.col("key").alias("a"), F.explode(offsets).alias("o"), "cx", "cy"
    ).select(
        "a",
        ((F.col("cx") + F.col("o.dx")) * _KEY_SPAN + F.col("cy") + F.col("o.dy")).alias("nkey"),
    )
    edges = addressed.join(
        dense.select(F.col("key").alias("nkey"), F.col("key").alias("b")), "nkey"
    ).select("a", "b")  # includes self-edges via the (0,0) offset
    # symmetric=True: the offset grid is mirror-closed (if b is a's
    # neighbor then a is b's), so both directions are already present
    # and unique — CC skips its symmetrize union + distinct exchange.
    comp = connected_components(edges, "a", "b", symmetric=True)
    return (
        dense.join(comp, dense["key"] == comp["node"])
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_cells"), F.sum("n").alias("n_points"))
    )
