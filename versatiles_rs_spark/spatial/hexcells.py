"""Hexagonal cell binning (H3-style) as a third cell-key family.

True H3 ids need the icosahedral base-cell tables; what pipelines
actually rely on hexagons for — equal-ish-area binning where every
neighbor shares a full edge (no corner-contact ambiguity like squares) —
is delivered by flat-top hexagonal binning on the Web Mercator plane:
axial coordinates + cube rounding, the standard public hex-grid
construction. Pure Column math (no UDF, fully codegen), deterministic
across engines (explicit floor(x+0.5) rounding, the same Mercator
formulas the min_distance oracle already proves cross-engine-exact).

The (q, r) axial pair is the cell key: use it like the quadkey/S2 keys
for groupBy rollups, cell-cover joins and partition pruning. Cell size
is the hex circumradius in Mercator meters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_R_EARTH = 6378137.0
_SQRT3 = 1.7320508075688772


def mercator_cols(lon_col: Column, lat_col: Column) -> tuple[Column, Column]:
    mx = F.radians(lon_col) * F.lit(_R_EARTH)
    my = F.log(F.tan(F.radians(lat_col) / 2 + F.lit(3.141592653589793) / 4)) * F.lit(_R_EARTH)
    return mx, my


def hex_cell_cols(lon_col: Column, lat_col: Column, radius_m: float) -> tuple[Column, Column]:
    """(q, r) axial hex coordinates at circumradius ``radius_m`` (flat-top
    orientation). Cube rounding with explicit half-up floors so Spark and
    any SQL engine agree bit-for-bit."""
    mx, my = mercator_cols(lon_col, lat_col)
    q = (F.lit(2.0 / 3.0) * mx) / F.lit(radius_m)
    r = (F.lit(-1.0 / 3.0) * mx + F.lit(_SQRT3 / 3.0) * my) / F.lit(radius_m)
    x, z = q, r
    y = -x - z
    rx = F.floor(x + F.lit(0.5))
    ry = F.floor(y + F.lit(0.5))
    rz = F.floor(z + F.lit(0.5))
    dx = F.abs(rx - x)
    dy = F.abs(ry - y)
    dz = F.abs(rz - z)
    # cube-rounding repair, spelled out so the SQL oracle mirrors it 1:1:
    # if dx largest: rx' = -ry-rz; elif dy largest: ry' = -rx-rz (rz keeps);
    # else: rz' = -rx-ry.
    fixed_rx = F.when((dx > dy) & (dx > dz), -ry - rz).otherwise(rx)
    fixed_rz = F.when((dx > dy) & (dx > dz), rz).when(dy > dz, rz).otherwise(-rx - ry)
    return fixed_rx.cast("bigint"), fixed_rz.cast("bigint")


def hex_cell_stats(points: DataFrame, radius_m: float,
                   lon_col: str = "lon", lat_col: str = "lat",
                   id_col: str = "doc_id") -> DataFrame:
    q, r = hex_cell_cols(F.col(lon_col), F.col(lat_col), radius_m)
    return (
        points.withColumn("hq", q).withColumn("hr", r)
        .groupBy("hq", "hr")
        .agg(F.count("*").alias("n"), F.min(id_col).alias("min_id"))
    )
