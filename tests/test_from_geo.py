"""from_geo cascade: GeoJSON lines/polygons -> clipped, simplified MVT tiles.

Clipping tests mirror tile_render.rs:381-408 (point kept/dropped, line
split) and the polygon winding/degeneracy rules.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import decompress
from versatiles_rs_spark.functions.geometry import (
    clip_line_lb,
    clip_polygon_sh,
    quantize_ring,
    ring_area2,
    simplify_dp,
)
from versatiles_rs_spark.functions.mvt import (
    GEOM_LINESTRING,
    GEOM_POLYGON,
    decode_tile,
    validate_tile,
)
from versatiles_rs_spark.operators.from_geo import from_geo


# ---------------------------------------------------------------------------
# pure geometry
# ---------------------------------------------------------------------------

def test_simplify_dp_keeps_shape():
    line = [(0.0, 0.0), (1.0, 0.001), (2.0, 0.0), (3.0, 5.0)]
    out = simplify_dp(line, 0.01)
    assert out == [(0.0, 0.0), (2.0, 0.0), (3.0, 5.0)] or out == [(0.0, 0.0), (3.0, 5.0)]
    assert simplify_dp(line, 100.0) == [(0.0, 0.0), (3.0, 5.0)]
    assert simplify_dp(line, 0.0) == line


def test_clip_polygon_inside_outside():
    sq = [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)]
    # fully inside box: unchanged
    assert clip_polygon_sh(sq, 0, 0, 10, 10) == sq
    # fully outside: empty
    assert clip_polygon_sh(sq, 20, 20, 30, 30) == []
    # straddling: clipped to box edge
    out = clip_polygon_sh(sq, 5, 0, 10, 10)
    xs = [p[0] for p in out]
    assert min(xs) == 5.0 and max(xs) == 8.0


def test_clip_line_split():
    # line exits and re-enters the box -> two parts (tile_render.rs line split)
    line = [(-5.0, 5.0), (5.0, 5.0), (5.0, 15.0), (8.0, 15.0), (8.0, 5.0), (15.0, 5.0)]
    parts = clip_line_lb(line, 0, 0, 10, 10)
    assert len(parts) == 2
    assert parts[0][0] == (0.0, 5.0)
    assert parts[1][-1] == (10.0, 5.0)


def test_quantize_degenerate_drops():
    # a tiny ring collapses to <3 distinct grid points -> None
    tiny = [(0.50001, 0.50001), (0.50002, 0.50001), (0.50002, 0.50002)]
    assert quantize_ring(tiny, 4096, is_ring=True) is None
    # a real ring survives
    ring = [(0.1, 0.1), (0.9, 0.1), (0.9, 0.9), (0.1, 0.9)]
    q = quantize_ring(ring, 4096, is_ring=True)
    assert q is not None and len(q) == 4
    assert ring_area2(q) != 0
    # line needs >= 2 distinct
    assert quantize_ring([(0.5, 0.5), (0.500001, 0.5)], 4096, is_ring=False) is None


# ---------------------------------------------------------------------------
# end-to-end from_geo
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def geojson_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("geo") / "features.geojsonl"
    feats = [
        {"type": "Feature", "id": 1, "properties": {"name": "box"},
         "geometry": {"type": "Polygon", "coordinates": [
             [[-20.0, -20.0], [20.0, -20.0], [20.0, 20.0], [-20.0, 20.0], [-20.0, -20.0]]]}},
        {"type": "Feature", "id": 2, "properties": {"name": "line"},
         "geometry": {"type": "LineString", "coordinates": [
             [-150.0, 0.0], [-100.0, 30.0], [-50.0, 0.0]]}},
        {"type": "Feature", "id": 3, "properties": {"name": "pt"},
         "geometry": {"type": "Point", "coordinates": [100.0, -40.0]}},
        {"type": "Feature", "id": 4, "properties": {"name": "multi"},
         "geometry": {"type": "MultiPoint", "coordinates": [[60.0, 60.0], [61.0, 60.0]]}},
    ]
    p.write_text("\n".join(json.dumps(f) for f in feats))
    return str(p)


@pytest.fixture(scope="module")
def geo_tiles(spark, geojson_path):
    return from_geo(spark, geojson_path, 0, 5, layer_name="test").cache()


def test_from_geo_all_valid(geo_tiles):
    from versatiles_rs_spark.operators.probe import validate_tiles

    assert geo_tiles.count() > 0
    assert validate_tiles(geo_tiles).filter("n_issues > 0").count() == 0


def test_from_geo_z0_contains_everything(geo_tiles):
    row = geo_tiles.filter("z = 0").collect()
    assert len(row) == 1
    layers = decode_tile(decompress(bytes(row[0]["tile"]), row[0]["compression"]))
    feats = layers["test"]["features"]
    # 1 polygon + 1 line + 1 point + 2 multipoint parts
    assert len(feats) == 5
    by_type = {}
    for f in feats:
        by_type.setdefault(f.geom_type, 0)
        by_type[f.geom_type] += 1
    assert by_type[GEOM_POLYGON] == 1
    assert by_type[GEOM_LINESTRING] == 1


def test_from_geo_polygon_clipped_per_tile(geo_tiles):
    # at z2 the box (-20..20) straddles the 4 center tiles
    rows = geo_tiles.filter("z = 2").collect()
    center = [r for r in rows if (r["x"], r["y"]) in {(1, 1), (2, 1), (1, 2), (2, 2)}]
    assert len(center) == 4
    for r in center:
        layers = decode_tile(decompress(bytes(r["tile"]), r["compression"]))
        polys = [f for f in layers["test"]["features"] if f.geom_type == GEOM_POLYGON]
        assert len(polys) == 1
        for ring in polys[0].rings:
            # clipped ring stays within buffered tile grid
            for gx, gy in ring:
                assert -100 <= gx <= 4196 and -100 <= gy <= 4196


def test_from_geo_line_present_only_near_path(geo_tiles):
    rows = geo_tiles.filter("z = 3").collect()
    line_tiles = set()
    for r in rows:
        layers = decode_tile(decompress(bytes(r["tile"]), r["compression"]))
        if any(f.geom_type == GEOM_LINESTRING for f in layers["test"]["features"]):
            line_tiles.add((r["x"], r["y"]))
    # line spans lon -150..-50, lat 0..30 -> x in [0, 2], y in [2, 4) at z3
    assert line_tiles
    for x, y in line_tiles:
        assert 0 <= x <= 3 and 2 <= y <= 4


def test_from_geo_deterministic(spark, geojson_path):
    a = from_geo(spark, geojson_path, 0, 3).select("z", "x", "y", "tile")
    b = from_geo(spark, geojson_path, 0, 3).select("z", "x", "y", "tile")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_polygon_winding_matches_reference(spark, tmp_path):
    """MVT 2.1 §4.3.3.3 / reference normalize_polygon_winding
    (vector_tile/feature.rs:65): decoded exterior rings have POSITIVE
    shoelace area in y-down tile coords; holes NEGATIVE."""
    p = tmp_path / "donut.geojsonl"
    feat = {"type": "Feature", "id": 1, "properties": {},
            "geometry": {"type": "Polygon", "coordinates": [
                [[-40.0, -40.0], [40.0, -40.0], [40.0, 40.0], [-40.0, 40.0], [-40.0, -40.0]],
                [[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0], [-10.0, 10.0], [-10.0, -10.0]],
            ]}}
    p.write_text(json.dumps(feat))
    tiles = from_geo(spark, str(p), 0, 0, layer_name="t").collect()
    assert len(tiles) == 1
    layers = decode_tile(decompress(bytes(tiles[0]["tile"]), tiles[0]["compression"]))
    polys = [f for f in layers["t"]["features"] if f.geom_type == GEOM_POLYGON]
    assert len(polys) == 1
    rings = polys[0].rings
    assert len(rings) == 2
    assert ring_area2(rings[0]) > 0, "exterior ring must have positive area2"
    assert ring_area2(rings[1]) < 0, "hole ring must have negative area2"
