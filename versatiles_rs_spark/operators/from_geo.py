"""from_geo: GeoJSON(-lines) features -> MVT tile pyramid with the full
per-zoom cascade (SURVEY.md §2.6; read/from_geo.rs:41 +
feature_import/mod.rs:95-140).

Cascade, re-expressed Spark-first:

1. parse GeoJSON lines (``spark.read.json`` on NDJSON / a features
   DataFrame), flatten Multi* geometries (explode);
2. per zoom z = maxz..minz: simplify with that zoom's tolerance
   (Douglas-Peucker, chained monotonic tolerances like
   arc_graph/simplify.rs:17-27), drop features below min length/area;
3. ``covering_tiles`` flat-map: each feature -> its candidate tiles at z
   (bbox cover — the inverted direction of the reference's R-tree probe,
   SURVEY.md §2.6);
4. groupBy(z,x,y) -> clip (Sutherland-Hodgman rings / Liang-Barsky lines)
   to the buffered tile square, quantize to the 4096 grid, drop invisible,
   encode MVT (tile_render.rs:27-64).

Geometry rows use GeoJSON-style nesting: ``coords`` =
array<array<array<double>>> (rings/parts -> points -> [lon, lat]).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from versatiles_rs_spark.functions.compression import GZIP, compress
from versatiles_rs_spark.functions.geometry import (
    clip_line_lb,
    clip_polygon_sh,
    quantize_ring,
    ring_area2,
    simplify_dp,
)
from versatiles_rs_spark.functions.mvt import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    TILE_EXTENT,
    MvtFeature,
    encode_tile,
)
from versatiles_rs_spark.operators.convert import TILE_SCHEMA, grouped_tile_map

FEATURE_ROW_SCHEMA = StructType(
    [
        StructField("feature_id", LongType()),
        StructField("geom_type", StringType()),  # Point/LineString/Polygon
        StructField("coords", ArrayType(ArrayType(ArrayType(DoubleType())))),
        StructField("props", MapType(StringType(), StringType())),
    ]
)

BUFFER_FRAC = 80.0 / TILE_EXTENT  # tippecanoe-ish buffer (vector_overzoom.rs:51)


def read_geojson_features(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON (one GeoJSON Feature per line) -> normalized feature rows.
    Multi* geometries flatten to one row per part (project_and_flatten,
    feature_import/mod.rs:54-58)."""
    raw = spark.read.text(path)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for line in pdf["value"]:
                if not line.strip():
                    continue
                f = json.loads(line)
                g = f.get("geometry") or {}
                props = {k: str(v) for k, v in (f.get("properties") or {}).items()}
                fid = int(f.get("id", -1))
                t = g.get("type")
                c = g.get("coordinates")
                if t == "Point":
                    rows.append((fid, "Point", [[c]], props))
                elif t == "MultiPoint":
                    rows.extend((fid, "Point", [[p]], props) for p in c)
                elif t == "LineString":
                    rows.append((fid, "LineString", [c], props))
                elif t == "MultiLineString":
                    rows.extend((fid, "LineString", [part], props) for part in c)
                elif t == "Polygon":
                    rows.append((fid, "Polygon", c, props))
                elif t == "MultiPolygon":
                    rows.extend((fid, "Polygon", poly, props) for poly in c)
            yield pd.DataFrame(rows, columns=["feature_id", "geom_type", "coords", "props"])

    return raw.mapInPandas(parse, FEATURE_ROW_SCHEMA)


# Candidate rows carry geometry as a FLAT float64 buffer + per-ring point
# counts instead of array<array<array<double>>> (round-6): the nested list
# form paid a deep Arrow<->pandas conversion on BOTH sides of the render
# shuffle (build python lists -> Arrow lists -> python lists), while one
# binary cell moves as a single buffer and decodes with np.frombuffer.
# float64 -> bytes -> float64 round-trips bit-exactly, so rendered tiles
# are byte-identical. Internal interchange between candidate_tiles and
# render_geo_tiles only (all callers use the pair).
_CAND_SCHEMA = StructType(
    [
        StructField("z", IntegerType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("feature_id", LongType()),
        StructField("geom_type", StringType()),
        StructField("coords", BinaryType()),
        StructField("ring_lens", ArrayType(IntegerType())),
        StructField("props", MapType(StringType(), StringType())),
    ]
)


def _frac_coords(coords, z: int):
    """lon/lat rings -> fractional tile coordinates at zoom z."""
    zoom = float(2**z)
    out = []
    for ring in coords:
        arr = np.asarray([p[:2] for p in ring], dtype=np.float64)
        xf = zoom * (arr[:, 0] / 360.0 + 0.5)
        with np.errstate(divide="ignore"):
            yf = zoom * (0.5 - 0.5 * np.log(np.tan(arr[:, 1] * np.pi / 360.0 + np.pi / 4.0)) / np.pi)
        out.append(list(zip(xf.tolist(), yf.tolist())))
    return out


def candidate_tiles(features: DataFrame, min_zoom: int, max_zoom: int,
                    simplify_px: float = 1.0) -> DataFrame:
    """Explode each feature to (z, x, y, simplified geometry in fractional
    tile coords). Simplification tolerance = simplify_px/4096 of a tile at
    each zoom, applied cumulatively from max_zoom down (monotonic chain)."""

    def explode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                gt = r.geom_type
                # simplify once at max zoom then chain downward
                frac_max = _frac_coords(r.coords, max_zoom)
                prev = frac_max
                for z in range(max_zoom, min_zoom - 1, -1):
                    scale = 2.0 ** (z - max_zoom)
                    cur = [[(x * scale, y * scale) for x, y in ring] for ring in prev]
                    if gt != "Point":
                        tol = simplify_px / TILE_EXTENT
                        cur = [simplify_dp(ring, tol) for ring in cur]
                        # feed simplified output of this zoom into the next
                        # (coarser) zoom: divide back for the chain
                        prev = [[(x / scale, y / scale) for x, y in ring] for ring in cur]
                    xs = [p[0] for ring in cur for p in ring]
                    ys = [p[1] for ring in cur for p in ring]
                    size = 1 << z
                    x0 = max(0, int(np.floor(min(xs) - BUFFER_FRAC)))
                    x1 = min(size - 1, int(np.floor(max(xs) + BUFFER_FRAC)))
                    y0 = max(0, int(np.floor(min(ys) - BUFFER_FRAC)))
                    y1 = min(size - 1, int(np.floor(max(ys) + BUFFER_FRAC)))
                    # serialize ONCE per (feature, zoom) — identical for
                    # every covered tile (rebuilding per (tx, ty) was
                    # pure waste for multi-tile features): flat float64
                    # buffer + per-ring point counts (see _CAND_SCHEMA)
                    ser = np.asarray(
                        [p for ring in cur for p in ring], dtype=np.float64
                    ).tobytes()
                    lens = [len(ring) for ring in cur]
                    fid = int(r.feature_id)
                    props = dict(r.props)
                    for tx in range(x0, x1 + 1):
                        for ty in range(y0, y1 + 1):
                            rows.append((z, tx, ty, fid, gt, ser, lens, props))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["z", "x", "y", "feature_id", "geom_type",
                             "coords", "ring_lens", "props"],
                )

    return features.mapInPandas(explode, _CAND_SCHEMA)


def render_geo_tiles(cands: DataFrame, layer_name: str = "features",
                     compression: str = GZIP) -> DataFrame:
    """groupBy(z,x,y): clip to buffered tile, quantize, drop invisible,
    encode (tile_render.rs render_tile)."""

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        # One stable batch-wide sort + contiguous-run iteration over plain
        # arrays: per-group pdf.iloc/sort_values dominated the profile
        # (~1.8 ms/group of pandas overhead vs ~1.5 features/group of real
        # work) — same feature order, byte-identical tiles.
        cols = ["z", "x", "y", "format", "compression", "tile", "n_features"]
        n = len(pdf)
        if n == 0:
            return pd.DataFrame([], columns=cols)
        pdf = pdf.sort_values(["z", "x", "y", "feature_id"], kind="stable")
        zs = pdf["z"].to_numpy()
        xs = pdf["x"].to_numpy()
        ys = pdf["y"].to_numpy()
        fids = pdf["feature_id"].to_numpy()
        gts = pdf["geom_type"].to_numpy(dtype=object)
        coords_l = pdf["coords"].to_numpy(dtype=object)
        lens_l = pdf["ring_lens"].to_numpy(dtype=object)
        props_l = pdf["props"].to_numpy(dtype=object)
        boundary = (np.diff(zs) != 0) | (np.diff(xs) != 0) | (np.diff(ys) != 0)
        starts = np.concatenate(([0], np.flatnonzero(boundary) + 1, [n]))
        rows = []
        lo, hi = -BUFFER_FRAC, 1.0 + BUFFER_FRAC
        for si in range(len(starts) - 1):
            i, j = int(starts[si]), int(starts[si + 1])
            z, x, y = int(zs[i]), int(xs[i]), int(ys[i])
            feats = []
            for t in range(i, j):
                gt = gts[t]
                # decode the flat buffer and shift to tile-local [0,1]
                # space in one vectorized pass (float64 subtraction is
                # IEEE-identical to the per-point Python form)
                arr = np.frombuffer(coords_l[t], dtype=np.float64).reshape(-1, 2)
                shifted = (arr - np.array([float(x), float(y)])).tolist()
                local = []
                off = 0
                for ln in lens_l[t]:
                    local.append([tuple(p) for p in shifted[off:off + ln]])
                    off += ln
                if gt == "Point":
                    (px, py), = local[0]
                    if not (0 <= px < 1 and 0 <= py < 1):
                        continue
                    gx = min(TILE_EXTENT - 1, int(px * TILE_EXTENT))
                    gy = min(TILE_EXTENT - 1, int(py * TILE_EXTENT))
                    feats.append(MvtFeature(GEOM_POINT, [[(gx, gy)]], dict(props_l[t]), int(fids[t])))
                elif gt == "LineString":
                    out_rings = []
                    for ring in local:
                        for part in clip_line_lb(ring, lo, lo, hi, hi):
                            q = quantize_ring(part, TILE_EXTENT, is_ring=False)
                            if q:
                                out_rings.append(q)
                    if out_rings:
                        feats.append(MvtFeature(GEOM_LINESTRING, out_rings, dict(props_l[t]), int(fids[t])))
                else:  # Polygon: first ring outer, rest holes (even-odd)
                    out_rings = []
                    for k, ring in enumerate(local):
                        clipped = clip_polygon_sh(ring, lo, lo, hi, hi)
                        if len(clipped) < 3:
                            continue
                        q = quantize_ring(clipped, TILE_EXTENT, is_ring=True)
                        if not q:
                            continue
                        # MVT 2.1 §4.3.3.3 winding in tile coords (y down):
                        # exterior rings have POSITIVE shoelace area (visually
                        # clockwise), interior rings (holes) NEGATIVE — matches
                        # the reference normalize_polygon_winding
                        # (vector_tile/feature.rs:65).
                        a2 = ring_area2(q)
                        want_outer = k == 0
                        if (a2 > 0) != want_outer:
                            q = q[::-1]
                        q = q + [q[0]]
                        out_rings.append(q)
                    if out_rings:
                        feats.append(MvtFeature(GEOM_POLYGON, out_rings, dict(props_l[t]), int(fids[t])))
            if not feats:
                continue
            blob = compress(encode_tile({layer_name: feats}), compression)
            rows.append((z, x, y, "mvt", compression, blob, len(feats)))
        return pd.DataFrame(rows, columns=cols)

    return grouped_tile_map(cands, body, TILE_SCHEMA)


def from_geo(
    spark: SparkSession,
    path: str,
    min_zoom: int = 0,
    max_zoom: int = 8,
    layer_name: str = "features",
    simplify_px: float = 1.0,
    compression: str = GZIP,
) -> DataFrame:
    """GeoJSON NDJSON file -> MVT tile pyramid (read/from_geo.rs:41)."""
    feats = read_geojson_features(spark, path)
    cands = candidate_tiles(feats, min_zoom, max_zoom, simplify_px)
    return render_geo_tiles(cands, layer_name, compression)
