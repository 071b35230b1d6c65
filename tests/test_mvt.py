"""MVT codec: roundtrip, determinism, validity."""

from __future__ import annotations

from versatiles_rs_spark.functions.mvt import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    MvtFeature,
    decode_geometry,
    decode_tile,
    encode_geometry,
    encode_tile,
    validate_tile,
    zigzag,
    unzigzag,
)


def test_zigzag():
    for v in (0, 1, -1, 2, -2, 4095, -4096, 1 << 40, -(1 << 40)):
        assert unzigzag(zigzag(v)) == v


def test_geometry_roundtrip_point():
    cmds = encode_geometry(GEOM_POINT, [[(100, 200)]])
    assert cmds == [(1 & 0x7) | (1 << 3), zigzag(100), zigzag(200)]
    _, rings = decode_geometry(cmds)
    assert rings == [[(100, 200)]]


def test_geometry_roundtrip_linestring():
    pts = [(0, 0), (10, 5), (20, 30)]
    cmds = encode_geometry(GEOM_LINESTRING, [pts])
    _, rings = decode_geometry(cmds)
    assert rings == [pts]


def test_geometry_roundtrip_polygon():
    ring = [(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)]
    cmds = encode_geometry(GEOM_POLYGON, [ring])
    _, rings = decode_geometry(cmds)
    assert rings == [ring]


def test_tile_roundtrip_and_validity():
    feats = [
        MvtFeature(GEOM_POINT, [[(1, 2)]], {"name": "a", "pop": 10}, fid=1),
        MvtFeature(GEOM_POINT, [[(3, 4)]], {"name": "b", "pop": 10}, fid=2),
    ]
    blob = encode_tile({"places": feats})
    assert validate_tile(blob) == []
    out = decode_tile(blob)
    assert list(out) == ["places"]
    layer = out["places"]
    assert layer["extent"] == 4096 and layer["version"] == 2
    got = layer["features"]
    assert [f.fid for f in got] == [1, 2]
    assert got[0].props == {"name": "a", "pop": 10}
    assert got[0].rings == [[(1, 2)]]
    # dictionary encoding dedups the shared value 10
    # (2 keys + 3 distinct values: "a", "b", 10)


def test_encoding_deterministic_under_reordering():
    f1 = MvtFeature(GEOM_POINT, [[(1, 2)]], {"b": 2, "a": 1}, fid=7)
    f2 = MvtFeature(GEOM_POINT, [[(9, 9)]], {"a": 1}, fid=3)
    blob_ab = encode_tile({"x": [f1, f2], "y": [f2]})
    blob_ba = encode_tile({"y": [f2], "x": [f2, f1]})
    assert blob_ab == blob_ba


def test_validator_flags_duplicate_layers():
    f = MvtFeature(GEOM_POINT, [[(0, 0)]], {}, fid=1)
    one = encode_tile({"l": [f]})
    assert validate_tile(one + one) == ["duplicate layer name 'l'"]
