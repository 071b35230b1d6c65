"""Shapefile edge cases: deleted dBase records keep attribute alignment;
multi-exterior-ring Polygon records split into separate polygons by winding
(shapefile spec: outer rings CW, holes CCW)."""

from __future__ import annotations

import struct

from versatiles_rs_spark.sources.shapefile import (
    _read_dbf,
    _split_polygon_parts,
    read_shapefile_features,
    read_shapefile_records,
)


def _write_shp(path, records):
    """records: [(shape_type, rings)] with rings = [[(x, y), ...], ...]."""
    body = b""
    for recno, (stype, rings) in enumerate(records, start=1):
        if stype == 1:
            (x, y), = rings[0]
            content = struct.pack("<i", 1) + struct.pack("<dd", x, y)
        else:
            pts = [p for ring in rings for p in ring]
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            parts, acc = [], 0
            for ring in rings:
                parts.append(acc)
                acc += len(ring)
            content = struct.pack("<i", stype)
            content += struct.pack("<dddd", min(xs), min(ys), max(xs), max(ys))
            content += struct.pack("<ii", len(rings), len(pts))
            content += struct.pack(f"<{len(rings)}i", *parts)
            for x, y in pts:
                content += struct.pack("<dd", x, y)
        body += struct.pack(">ii", recno, len(content) // 2) + content
    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<ii", 1000, 5) + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    path.write_bytes(header + body)


def _write_dbf(path, rows, deleted=()):
    """rows: [{'NAME': str}], deleted: indices (0-based) flagged '*'."""
    flen = 16
    field = b"NAME" + b"\x00" * 7 + b"C" + b"\x00" * 4 + bytes([flen]) + b"\x00" * 15
    header_size = 32 + 32 + 1
    record_size = 1 + flen
    header = bytes([3, 26, 8, 16]) + struct.pack("<I", len(rows))
    header += struct.pack("<HH", header_size, record_size) + b"\x00" * 20
    buf = header + field + b"\x0d"
    for i, row in enumerate(rows):
        flag = b"*" if i in deleted else b" "
        buf += flag + row["NAME"].encode("ascii").ljust(flen)
    path.write_bytes(buf + b"\x1a")


CW = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]        # outer (CW y-up)
CCW_HOLE = [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)]      # hole (CCW)
CW2 = [(20.0, 0.0), (20.0, 10.0), (30.0, 10.0), (30.0, 0.0)]     # 2nd outer


def test_split_polygon_parts_by_winding():
    polys = _split_polygon_parts([CW, CCW_HOLE, CW2])
    assert len(polys) == 2
    assert polys[0] == [CW, CCW_HOLE]
    assert polys[1] == [CW2]
    # leading CCW ring still starts a polygon (nothing silently dropped)
    polys = _split_polygon_parts([CCW_HOLE, CW2])
    assert len(polys) == 2


def test_multipolygon_record_splits(tmp_path):
    shp = tmp_path / "multi.shp"
    _write_shp(shp, [(5, [CW, CCW_HOLE, CW2])])
    recs = read_shapefile_records(str(shp))
    assert [gt for _, gt, _ in recs] == ["Polygon", "Polygon"]
    assert len(recs[0][2]) == 2  # outer + hole
    assert len(recs[1][2]) == 1  # second exterior alone


def test_deleted_dbf_record_keeps_alignment(tmp_path, spark):
    shp = tmp_path / "pts.shp"
    dbf = tmp_path / "pts.dbf"
    _write_shp(shp, [(1, [[(1.0, 1.0)]]), (1, [[(2.0, 2.0)]]), (1, [[(3.0, 3.0)]])])
    _write_dbf(dbf, [{"NAME": "a"}, {"NAME": "b"}, {"NAME": "c"}], deleted=(1,))
    attrs = _read_dbf(str(dbf))
    assert len(attrs) == 3 and attrs[1] is None
    feats = {r["feature_id"]: r["props"] for r in
             read_shapefile_features(spark, str(shp)).collect()}
    assert feats[1]["NAME"] == "a"
    assert feats[2] == {}          # deleted record -> no attrs, not b's
    assert feats[3]["NAME"] == "c"  # alignment preserved after deletion
