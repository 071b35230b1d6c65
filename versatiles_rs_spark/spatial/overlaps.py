"""Polygon-polygon (bbox) intersection join — the spatial join type the
engine's PIP / cell-cover / kNN family didn't cover.

The scale problem: two rectangles can share MANY grid cells, so a naive
cell-keyed equi-join emits each intersecting pair once per shared cell
and needs a corpus-wide dedup shuffle. The classic fix (the
"reference point" technique of the partition-based spatial-merge join
literature — each pair has exactly one canonical point, the top-left
corner of its intersection, which lies in exactly one cell) makes the
join emit-exactly-once with ZERO extra shuffles: verify the overlap AND
that the current cell contains the reference point.

Plan: explode each layer onto the cells its half-open box touches
(bounded by area/cell² rows per box), ONE equi-join on (cx, cy), and a
codegen residual predicate. No cartesian product, no dedup stage; skew
(a dense urban cell) is bounded by cell size exactly like the other
cell joins and splits further under AQE.

All coordinates are integers (quantized degrees / pixels), so overlap
tests, reference points, and intersection areas are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cover(df: DataFrame, cell: int, prefix: str) -> DataFrame:
    c = F.lit(cell)
    first = lambda col: F.col(col) - F.col(col) % c  # noqa: E731
    last = lambda col: (F.col(col) - 1) - (F.col(col) - 1) % c  # noqa: E731
    return df.select(
        *[F.col(x).alias(f"{prefix}{x}") for x in df.columns],
        F.explode(F.sequence(first("x0"), last("x1"), c)).alias("cx"),
    ).withColumn("cy", F.explode(F.sequence(first(f"{prefix}y0"), last(f"{prefix}y1"), c)))


def intersection_join(
    a: DataFrame, b: DataFrame, cell: int = 128
) -> DataFrame:
    """(a_id, b_id, area) for every intersecting pair of half-open
    integer boxes. Inputs: (id, x0, y0, x1, y1) with x0 < x1, y0 < y1.
    Each pair appears EXACTLY once (reference-point rule)."""
    ca = _cover(a.select("id", "x0", "y0", "x1", "y1"), cell, "a_")
    cb = _cover(b.select("id", "x0", "y0", "x1", "y1"), cell, "b_")
    j = ca.join(cb, on=["cx", "cy"], how="inner")
    rx = F.greatest("a_x0", "b_x0")
    ry = F.greatest("a_y0", "b_y0")
    overlap = (
        (F.col("a_x0") < F.col("b_x1"))
        & (F.col("b_x0") < F.col("a_x1"))
        & (F.col("a_y0") < F.col("b_y1"))
        & (F.col("b_y0") < F.col("a_y1"))
    )
    canonical = (rx - rx % F.lit(cell) == F.col("cx")) & (
        ry - ry % F.lit(cell) == F.col("cy")
    )
    area = (F.least("a_x1", "b_x1") - rx) * (F.least("a_y1", "b_y1") - ry)
    return j.filter(overlap & canonical).select(
        "a_id", "b_id", area.cast("bigint").alias("area")
    )


def distance_join(
    points: DataFrame, radius: int, cell: int | None = None
) -> DataFrame:
    """Self distance join: unordered pairs (a_id < b_id) of points within
    ``radius`` (integer units, exact d² compare). Each point lives in ONE
    grid cell (cell >= radius), the left side explodes its 3x3 neighbor
    cells, and the equi-join against the right side's single cell emits
    each candidate pair exactly once — no dedup stage, no cartesian.
    Input: (id, qx, qy) integer coordinates.
    """
    c = cell or radius
    assert c >= radius, "cell must be >= radius for the 3x3 guarantee"
    cl = lambda col: F.col(col) - F.pmod(F.col(col), F.lit(c))  # noqa: E731
    left = (
        points.select(
            F.col("id").alias("a_id"), F.col("qx").alias("ax"), F.col("qy").alias("ay")
        )
        .withColumn("cx", F.explode(F.sequence(cl("ax") - F.lit(c), cl("ax") + F.lit(c), F.lit(c))))
        .withColumn("cy", F.explode(F.sequence(cl("ay") - F.lit(c), cl("ay") + F.lit(c), F.lit(c))))
    )
    right = points.select(
        F.col("id").alias("b_id"),
        F.col("qx").alias("bx"),
        F.col("qy").alias("by"),
        cl("qx").alias("cx"),
        cl("qy").alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        left.join(right, on=["cx", "cy"], how="inner")
        .filter((F.col("a_id") < F.col("b_id")) & (d2 <= F.lit(radius * radius)))
        .select("a_id", "b_id", d2.alias("d2"))
    )


def areal_interpolate(src: DataFrame, tgt: DataFrame, cell: int = 128) -> DataFrame:
    """Areal interpolation (area-weighted transfer of a statistic from
    one zone system onto another — census tracts onto grid cells, admin
    units onto catchments): for each target zone, the sum over
    intersecting source zones of qv_src * area(src ∩ tgt), plus the
    covered area and contributing-source count. The caller divides by
    the source area to finish the classic uniform-density estimate
    (sources with a COMMON area keep that division exact — the
    map_match shared-D trick); this operator returns the exact integer
    numerators so the oracle attests every product.

    Inputs: ``src`` (id, x0, y0, x1, y1, qv int64), ``tgt`` (id, x0, y0,
    x1, y1), half-open integer boxes. Output: (t_id, n_src, wsum,
    covered_area), targets with no intersecting source absent.

    Plan: the PBSM reference-point grid join of ``intersection_join``
    (each pair emitted exactly once, zero dedup) followed by ONE
    map-side-combined agg on the target key — never zones x zones.
    """
    ca = _cover(src.select("id", "x0", "y0", "x1", "y1", "qv"), cell, "a_")
    cb = _cover(tgt.select("id", "x0", "y0", "x1", "y1"), cell, "b_")
    j = ca.join(cb, on=["cx", "cy"], how="inner")
    rx = F.greatest("a_x0", "b_x0")
    ry = F.greatest("a_y0", "b_y0")
    overlap = (
        (F.col("a_x0") < F.col("b_x1"))
        & (F.col("b_x0") < F.col("a_x1"))
        & (F.col("a_y0") < F.col("b_y1"))
        & (F.col("b_y0") < F.col("a_y1"))
    )
    canonical = (rx - rx % F.lit(cell) == F.col("cx")) & (
        ry - ry % F.lit(cell) == F.col("cy")
    )
    area = (F.least("a_x1", "b_x1") - rx) * (F.least("a_y1", "b_y1") - ry)
    return (
        j.filter(overlap & canonical)
        .select(
            F.col("b_id").alias("t_id"),
            area.cast("bigint").alias("area"),
            (F.col("a_qv") * area.cast("bigint")).alias("wpart"),
        )
        .groupBy("t_id")
        .agg(
            F.count(F.lit(1)).alias("n_src"),
            F.sum("wpart").alias("wsum"),
            F.sum("area").alias("covered_area"),
        )
    )


def union_area(rects: DataFrame, cell: int = 128) -> DataFrame:
    """EXACT union area per group over half-open integer rectangles —
    "how much ground do these zones actually cover" with overlaps
    counted once (the question intersection_join/areal_interpolate
    cannot answer, because union is not pairwise).

    Plan: each rect explodes onto the grid cells it touches (the PBSM
    cover of ``intersection_join``), clips to the cell, and ONE hash
    exchange on (grp, cell) feeds an executor-local exact paint: a
    cell² boolean bitmap (16 KiB at cell=128) marks covered integer
    pixels, whose popcount is the cell's exact union contribution —
    overlap resolution never leaves the executor and per-task memory is
    O(cell²) regardless of rect count. One bounded agg sums cells per
    group. The oracle computes the same areas with the classic slab
    sweep (distinct-x slabs x y-interval gaps-and-islands), so MATCH
    attests the cover explode, clipping, painting, and the sum.

    Input: (grp, x0, y0, x1, y1), x0 < x1, y0 < y1, non-negative
    coords. Output: (grp, n_rects, union_area).
    """
    import numpy as np
    import pandas as pd

    c = F.lit(cell)
    first = lambda col: F.col(col) - F.col(col) % c  # noqa: E731
    last = lambda col: (F.col(col) - 1) - (F.col(col) - 1) % c  # noqa: E731
    covered = (
        rects.select(
            "grp", "x0", "y0", "x1", "y1",
            F.explode(F.sequence(first("x0"), last("x1"), c)).alias("cx"),
        )
        .withColumn("cy", F.explode(F.sequence(first("y0"), last("y1"), c)))
        .select(
            "grp", "cx", "cy",
            (F.greatest("x0", F.col("cx")) - F.col("cx")).alias("px0"),
            (F.greatest("y0", F.col("cy")) - F.col("cy")).alias("py0"),
            (F.least("x1", F.col("cx") + c) - F.col("cx")).alias("px1"),
            (F.least("y1", F.col("cy") + c) - F.col("cy")).alias("py1"),
        )
    )

    def paint(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = np.zeros((cell, cell), dtype=bool)
        for r in pdf.itertuples(index=False):
            grid[r.py0:r.py1, r.px0:r.px1] = True
        return pd.DataFrame(
            {"grp": [pdf["grp"].iloc[0]], "covered": [int(grid.sum())]}
        )

    per_cell = covered.groupBy("grp", "cx", "cy").applyInPandas(
        paint, "grp bigint, covered bigint"
    )
    areas = per_cell.groupBy("grp").agg(F.sum("covered").alias("union_area"))
    nr = rects.groupBy("grp").agg(F.count(F.lit(1)).alias("n_rects"))
    return nr.join(areas, "grp").select("grp", "n_rects", "union_area")
