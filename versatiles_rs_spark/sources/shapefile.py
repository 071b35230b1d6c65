"""Dependency-free ESRI Shapefile (+dBase) reader.

feature_source/shapefile.rs analog: parses .shp geometry records (Point,
PolyLine, Polygon — shape types 1/3/5) and the sidecar .dbf attribute table
into the same normalized feature rows as read_geojson_features, so shapefile
sources flow into the identical from_geo tiling cascade.

Scale note: a shapefile is a single sequential file — the reference also
reads it on one node. Parsing happens once on the driver (shapefiles cap at
2 GB by format); the resulting feature DataFrame is distributed from there.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5


def _read_dbf(path: str) -> list[dict]:
    """Minimal dBase III attribute reader."""
    with open(path, "rb") as f:
        buf = f.read()
    n_records = struct.unpack_from("<I", buf, 4)[0]
    header_size = struct.unpack_from("<H", buf, 8)[0]
    record_size = struct.unpack_from("<H", buf, 10)[0]
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[off + 11])
        flen = buf[off + 16]
        fields.append((name, ftype, flen))
        off += 32
    out = []
    pos = header_size
    for _ in range(n_records):
        rec = buf[pos : pos + record_size]
        pos += record_size
        if rec[:1] == b"*":  # deleted — keep a placeholder so positional
            out.append(None)  # recno -> attrs alignment is preserved
            continue
        row = {}
        roff = 1
        for name, ftype, flen in fields:
            raw = rec[roff : roff + flen].decode("latin-1").strip()
            roff += flen
            if ftype == "N" and raw:
                row[name] = float(raw) if "." in raw else int(raw)
            else:
                row[name] = raw
        out.append(row)
    return out


def _ring_area_yup(ring: list[list[float]]) -> float:
    """Signed shoelace area in geographic (y-up) coords: CCW positive."""
    s = 0.0
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i][0], ring[i][1]
        x1, y1 = ring[(i + 1) % n][0], ring[(i + 1) % n][1]
        s += x0 * y1 - x1 * y0
    return 0.5 * s


def _split_polygon_parts(rings: list[list[list[float]]]) -> list[list[list[list[float]]]]:
    """Group shapefile polygon parts into polygons: each CW (outer) ring
    starts a new polygon; subsequent CCW rings are its holes. A leading CCW
    ring (degenerate writer) still starts a polygon so nothing is dropped."""
    polys: list[list[list[list[float]]]] = []
    for ring in rings:
        if len(ring) < 3:
            continue
        is_outer = _ring_area_yup(ring) < 0  # CW in y-up = outer per spec
        if is_outer or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    return polys


def read_shapefile_records(shp_path: str) -> list[tuple[int, str, list[list[list[float]]]]]:
    """Parse .shp -> [(record_no, geom_type, coords)] with GeoJSON-style
    nesting (rings/parts -> points -> [x, y])."""
    with open(shp_path, "rb") as f:
        buf = f.read()
    assert struct.unpack_from(">i", buf, 0)[0] == 9994, "not a shapefile"
    out = []
    pos = 100  # header size
    while pos < len(buf):
        recno, content_len = struct.unpack_from(">ii", buf, pos)
        pos += 8
        shape_type = struct.unpack_from("<i", buf, pos)[0]
        body = buf[pos : pos + content_len * 2]
        pos += content_len * 2
        if shape_type == SHAPE_NULL:
            continue
        if shape_type == SHAPE_POINT:
            x, y = struct.unpack_from("<dd", body, 4)
            out.append((recno, "Point", [[[x, y]]]))
        elif shape_type in (SHAPE_POLYLINE, SHAPE_POLYGON):
            num_parts, num_points = struct.unpack_from("<ii", body, 36)
            parts = list(struct.unpack_from(f"<{num_parts}i", body, 44))
            pts_off = 44 + 4 * num_parts
            pts = [
                list(struct.unpack_from("<dd", body, pts_off + 16 * i))
                for i in range(num_points)
            ]
            bounds = parts + [num_points]
            rings = [pts[bounds[i] : bounds[i + 1]] for i in range(num_parts)]
            if shape_type == SHAPE_POLYLINE:
                for ring in rings:
                    out.append((recno, "LineString", [ring]))
            else:
                # A Polygon record's parts may hold several exterior rings
                # (multipolygon). Shapefile spec: outer rings are CW
                # (negative shoelace area in y-up coords), holes CCW.
                # Split parts into one Polygon row per outer ring, each
                # grouped with its subsequent hole rings.
                for poly in _split_polygon_parts(rings):
                    out.append((recno, "Polygon", poly))
        else:
            raise ValueError(f"unsupported shape type {shape_type}")
    return out


def read_shapefile_features(spark: SparkSession, shp_path: str) -> DataFrame:
    """.shp + .dbf -> the normalized feature rows of from_geo (same schema
    as read_geojson_features), ready for the tiling cascade."""
    import pandas as pd

    from versatiles_rs_spark.operators.from_geo import FEATURE_ROW_SCHEMA

    recs = read_shapefile_records(shp_path)
    dbf_path = shp_path.rsplit(".", 1)[0] + ".dbf"
    try:
        attrs = _read_dbf(dbf_path)
    except FileNotFoundError:
        attrs = []
    rows = []
    for recno, gt, coords in recs:
        rec_attrs = attrs[recno - 1] if recno - 1 < len(attrs) else None
        props = {k: str(v) for k, v in (rec_attrs or {}).items()}
        rows.append((recno, gt, coords, props))
    pdf = pd.DataFrame(rows, columns=["feature_id", "geom_type", "coords", "props"])
    return spark.createDataFrame(pdf, schema=FEATURE_ROW_SCHEMA)


def from_shapefile(
    spark: SparkSession,
    shp_path: str,
    min_zoom: int = 0,
    max_zoom: int = 8,
    layer_name: str = "features",
    simplify_px: float = 1.0,
) -> DataFrame:
    """Shapefile -> MVT tile pyramid via the from_geo cascade."""
    from versatiles_rs_spark.operators.from_geo import candidate_tiles, render_geo_tiles

    feats = read_shapefile_features(spark, shp_path)
    cands = candidate_tiles(feats, min_zoom, max_zoom, simplify_px)
    return render_geo_tiles(cands, layer_name)
