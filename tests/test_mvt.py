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
    assert validate_tile(one + one) == ["l: DuplicateLayerName"]


# ---------------------------------------------------------------------------
# validator parity with validator.rs:62-118 — one synthetic bad tile per
# issue class, plus clean-tile silence
# ---------------------------------------------------------------------------

from versatiles_rs_spark.functions.mvt import (  # noqa: E402
    CMD_CLOSE_PATH,
    CMD_LINE_TO,
    CMD_MOVE_TO,
    _len_field,
    _varint,
    _varint_field,
    zigzag,
)


def _raw_feature(gtype, cmds):
    body = b""
    if gtype is not None:
        body += _varint_field(3, gtype)
    geom = b"".join(_varint(c) for c in cmds)
    if geom:
        body += _len_field(4, geom)
    return body


def _raw_layer(name, feats, version=2, extent=4096):
    body = b""
    if name is not None:
        body += _len_field(1, name.encode())
    for f in feats:
        body += _len_field(2, f)
    if extent is not None:
        body += _varint_field(5, extent)
    if version is not None:
        body += _varint_field(15, version)
    return body


def _tile(layers):
    return b"".join(_len_field(3, lay) for lay in layers)


def _cmd(cid, count):
    return (count << 3) | cid


def _square_cmds(size=10):
    return [
        _cmd(CMD_MOVE_TO, 1), zigzag(0), zigzag(0),
        _cmd(CMD_LINE_TO, 3), zigzag(size), zigzag(0), zigzag(0), zigzag(size),
        zigzag(-size), zigzag(0),
        _cmd(CMD_CLOSE_PATH, 1),
    ]


def test_validator_layer_level_issues():
    sq = _raw_feature(3, _square_cmds())
    # missing version
    t = _tile([_raw_layer("a", [sq], version=None)])
    assert any("MissingVersion" in i for i in validate_tile(t))
    # missing extent
    t = _tile([_raw_layer("a", [sq], extent=None)])
    assert any("MissingExtent" in i for i in validate_tile(t))
    # duplicate layer names
    t = _tile([_raw_layer("a", [sq]), _raw_layer("a", [sq])])
    assert any("DuplicateLayerName" in i for i in validate_tile(t))


def test_validator_unknown_geometry_type():
    # type 0 with non-empty geometry -> flagged; (0, empty) is silent
    bad = _raw_feature(0, _square_cmds())
    assert any("UnknownGeometryType" in i for i in validate_tile(_tile([_raw_layer("a", [bad])])))
    silent = _raw_feature(0, [])
    assert validate_tile(_tile([_raw_layer("a", [silent])])) == []


def test_validator_malformed_command_stream():
    cases = [
        [_cmd(CMD_MOVE_TO, 0)],                             # zero-count MoveTo
        [_cmd(CMD_MOVE_TO, 2), zigzag(1), zigzag(1)],        # truncated params
        [_cmd(CMD_CLOSE_PATH, 2)],                           # ClosePath count != 1
        [_cmd(CMD_LINE_TO, 1), zigzag(1), zigzag(1)],        # LineTo before MoveTo
        [_cmd(6, 1)],                                        # unknown command id
    ]
    for cmds in cases:
        t = _tile([_raw_layer("a", [_raw_feature(2, cmds)])])
        issues = validate_tile(t)
        assert any("MalformedCommandStream" in i for i in issues), cmds


def test_validator_empty_geometry_for_type():
    t = _tile([_raw_layer("a", [_raw_feature(3, [])])])
    assert any("EmptyGeometryForType" in i for i in validate_tile(t))


def test_validator_orphan_inner_ring():
    # a CCW-negative ring (hole winding) with NO preceding outer
    cmds = [
        _cmd(CMD_MOVE_TO, 1), zigzag(0), zigzag(0),
        _cmd(CMD_LINE_TO, 3), zigzag(0), zigzag(10), zigzag(10), zigzag(0),
        zigzag(0), zigzag(-10),
        _cmd(CMD_CLOSE_PATH, 1),
    ]
    t = _tile([_raw_layer("a", [_raw_feature(3, cmds)])])
    issues = validate_tile(t)
    assert any("OrphanInnerRing" in i for i in issues), issues
    # the same ring AFTER a valid outer is a legitimate hole -> silent
    t2 = _tile([_raw_layer("a", [_raw_feature(3, _square_cmds(20) + cmds)])])
    assert validate_tile(t2) == []


def test_validator_degenerate_rings():
    # TooFewVertices: 2-point "ring"
    two = [_cmd(CMD_MOVE_TO, 1), zigzag(0), zigzag(0),
           _cmd(CMD_LINE_TO, 1), zigzag(5), zigzag(0), _cmd(CMD_CLOSE_PATH, 1)]
    issues = validate_tile(_tile([_raw_layer("a", [_raw_feature(3, two)])]))
    assert any("DegenerateRing(TooFewVertices)" in i for i in issues)
    # Collinear: 3 collinear points
    col = [_cmd(CMD_MOVE_TO, 1), zigzag(0), zigzag(0),
           _cmd(CMD_LINE_TO, 2), zigzag(5), zigzag(0), zigzag(5), zigzag(0),
           _cmd(CMD_CLOSE_PATH, 1)]
    issues = validate_tile(_tile([_raw_layer("a", [_raw_feature(3, col)])]))
    assert any("DegenerateRing(Collinear)" in i for i in issues)
    # line with one point -> TooFewVertices
    pt = [_cmd(CMD_MOVE_TO, 1), zigzag(3), zigzag(3)]
    issues = validate_tile(_tile([_raw_layer("a", [_raw_feature(2, pt)])]))
    assert any("DegenerateRing(TooFewVertices)" in i for i in issues)


def test_validator_clean_tiles_silent(spark):
    """Every tile our encoder produces passes the deep validator."""
    from versatiles_rs_spark.operators.from_geo import from_geo

    tiles = from_geo(spark, "/root/reference/testdata/places.geojsonl", 0, 5, layer_name="t")
    from versatiles_rs_spark.functions.compression import decompress as dec

    for r in tiles.collect():
        assert validate_tile(dec(bytes(r["tile"]), r["compression"])) == []
