"""Deterministic polygon fixtures (borders.geojson analog — FIXTURES.md §4).

Exact-decimal vertices so Spark and the DuckDB oracle compute bit-identical
ray-cast arithmetic. Includes convex, concave, and near-degenerate shapes
(the x=5.999 -> 6.001 edge stressing PIP numerics, per FIXTURES.md).
"""

from __future__ import annotations

from versatiles_rs_spark.spatial.pip import Polygon

# (feature_id, name, kind, outer ring as [(lon, lat), ...] — closed not required)
_RAW: list[tuple[int, str, str, list[tuple[float, float]]]] = [
    (1, "eurasia_box", "box", [(-10.0, 35.0), (60.0, 35.0), (60.0, 70.0), (-10.0, 70.0)]),
    (2, "america_box", "box", [(-130.0, -55.0), (-30.0, -55.0), (-30.0, 50.0), (-130.0, 50.0)]),
    (3, "africa_tri", "triangle", [(-20.0, -35.0), (50.0, -35.0), (15.0, 35.0)]),
    (4, "pacific_pent", "pentagon", [(150.0, -30.0), (179.0, -10.0), (170.0, 20.0), (155.0, 25.0), (145.0, 0.0)]),
    (
        5,
        "concave_arrow",
        "concave",
        [(60.0, -60.0), (120.0, -60.0), (120.0, -10.0), (90.0, -40.0), (60.0, -10.0)],
    ),
    (
        6,
        "sliver",
        "degenerate",
        [(5.999, -80.0), (6.001, -80.0), (6.001, 80.0), (5.999, 80.0)],
    ),
    (7, "aus_box", "box", [(110.0, -45.0), (155.0, -45.0), (155.0, -10.0), (110.0, -10.0)]),
    (
        8,
        "star",
        "concave",
        [(-170.0, 60.0), (-160.0, 75.0), (-150.0, 60.0), (-155.0, 72.0), (-165.0, 72.0)],
    ),
]


def sample_polygons() -> list[Polygon]:
    return [Polygon(fid, name, kind, [ring]) for fid, name, kind, ring in _RAW]


def polygon_edges_sql_values() -> str:
    """The same polygons as a SQL VALUES edge table
    ``(feature_id, x1, y1, x2, y2)`` for the DuckDB ray-cast oracle."""
    rows = []
    for fid, _, _, ring in _RAW:
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            rows.append(f"({fid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return ",\n    ".join(rows)
