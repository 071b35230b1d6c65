"""Parity tests on the reference's OWN testdata fixtures (read-only inputs
at /root/reference/testdata — data, not code): quakes.csv, cities.csv,
places.geojsonl, borders.geojson, and the berlin.vpl pipeline semantics."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import decompress
from versatiles_rs_spark.functions.mvt import GEOM_LINESTRING, GEOM_POINT, decode_tile
from versatiles_rs_spark.operators.from_geo import from_geo
from versatiles_rs_spark.operators.vector_transforms import vector_update_properties
from versatiles_rs_spark.sources import from_csv
from versatiles_rs_spark.spatial.geojson_io import load_polygons_geojson
from versatiles_rs_spark.spatial.pip import pip_contains_np
from versatiles_rs_spark.tile_math import lonlat_to_tile_np

TD = "/root/reference/testdata"

pytestmark = pytest.mark.skipif(not os.path.isdir(TD), reason="reference testdata absent")


def test_quakes_csv_tile_assignment(spark):
    """quakes.csv (Berlin/Hamburg/Munich quakes) -> exact slippy tiles."""
    tiles = from_csv(
        spark, f"{TD}/quakes.csv", id_col="event_id", min_zoom=10, max_zoom=10,
        layer_name="quakes", props_cols=["magnitude"],
    ).cache()
    coords = {(r["x"], r["y"]) for r in tiles.collect()}
    # Berlin 13.4050, 52.5200 @ z10 -> (550, 335) (tile_coord.rs doctest city)
    assert (550, 335) in coords
    for lon, lat in ((13.4050, 52.5200), (9.9937, 53.5511), (11.5761, 48.1372)):
        x, y = lonlat_to_tile_np(np.array([lon]), np.array([lat]), 10)
        assert (x[0], y[0]) in coords
    assert tiles.agg(F.sum("n_features")).collect()[0][0] == 3


def test_places_geojsonl_cascade(spark):
    """places.geojsonl: point + linestring (+ more) through the from_geo
    cascade; Berlin point lands in its exact z10 tile."""
    tiles = from_geo(spark, f"{TD}/places.geojsonl", 0, 10, layer_name="places").cache()
    z0 = tiles.filter("z = 0").collect()
    assert len(z0) == 1
    layers = decode_tile(decompress(bytes(z0[0]["tile"]), z0[0]["compression"]))
    types = {f.geom_type for f in layers["places"]["features"]}
    assert GEOM_POINT in types and GEOM_LINESTRING in types
    berlin = tiles.filter("z = 10 and x = 550 and y = 335")
    assert berlin.count() == 1
    blayers = decode_tile(
        decompress(bytes(berlin.first()["tile"]), berlin.first()["compression"])
    )
    names = {f.props.get("name") for f in blayers["places"]["features"]}
    assert "Berlin" in names


def test_borders_geojson_pip_degenerate_edges():
    """borders.geojson's shared wiggly border (x=5.999 -> 6.001) stresses
    PIP numerics: every probe point near the border belongs to exactly one
    of the two admin polygons (half-open rule, no double-count, no gap)."""
    polys = load_polygons_geojson(f"{TD}/borders.geojson")
    assert len(polys) >= 2
    west = next(p for p in polys if p.name == "west")
    east = next(p for p in polys if p.name == "east")
    rng = np.random.default_rng(3)
    px = rng.uniform(5.9, 6.1, 20000)
    py = rng.uniform(2.05, 2.95, 20000)
    in_w = pip_contains_np(px, py, west.edges())
    in_e = pip_contains_np(px, py, east.edges())
    both = (in_w & in_e).sum()
    neither = (~in_w & ~in_e).sum()
    assert both == 0, f"{both} points counted in both polygons"
    assert neither == 0, f"{neither} points in the gap"


def test_berlin_vpl_semantics_update_properties(spark):
    """berlin.vpl: vector_update_properties joining cities.csv on the
    feature's `name` property (data_source_path/id_field semantics)."""
    tiles = from_geo(spark, f"{TD}/places.geojsonl", 0, 2, layer_name="place_labels")
    cities = spark.read.option("header", "true").option("inferSchema", "true").csv(
        f"{TD}/cities.csv"
    )
    out = vector_update_properties(
        tiles, cities, id_prop="name", dim_id_col="city_name"
    )
    z0 = out.filter("z = 0").first()
    layers = decode_tile(decompress(bytes(z0["tile"]), z0["compression"]))
    feats = layers["place_labels"]["features"]
    by_name = {f.props.get("name"): f.props for f in feats}
    assert by_name["Berlin"]["city_population"] == 3755251
    assert by_name["Berlin"]["city_id"] == 1
    # non-city features (the rail line) keep their props, gain nothing
    rail = [p for n, p in by_name.items() if p.get("kind") == "rail"]
    assert rail and "city_population" not in rail[0]


def test_admin_shapefile(spark):
    """admin.shp/.dbf through the dependency-free shapefile reader and the
    tiling cascade."""
    from versatiles_rs_spark.sources.shapefile import (
        from_shapefile,
        read_shapefile_features,
        read_shapefile_records,
    )

    recs = read_shapefile_records(f"{TD}/admin.shp")
    assert len(recs) >= 1
    feats = read_shapefile_features(spark, f"{TD}/admin.shp")
    rows = feats.collect()
    assert all(r["geom_type"] in ("Point", "LineString", "Polygon") for r in rows)
    # attributes joined from .dbf
    assert any(r["props"] for r in rows)
    tiles = from_shapefile(spark, f"{TD}/admin.shp", 0, 4, layer_name="admin")
    assert tiles.count() > 0
    from versatiles_rs_spark.operators.probe import validate_tiles

    assert validate_tiles(tiles).filter("n_issues > 0").count() == 0


# ---------------------------------------------------------------------------
# shortbread-tile.pbf: the reference's only real-world vector tile
# (versatiles_geometry/src/vector_tile/tile.rs:100 uses the same fixture).
# Decoding it validates the MVT reader against a THIRD-PARTY encoder —
# previously all decode testing was against self-produced tiles.
# ---------------------------------------------------------------------------

SHORTBREAD = "/root/reference/testdata/shortbread-tile.pbf"


def _tlv_walk(buf: bytes):
    """Independent minimal protobuf TLV walker (no shared code with
    functions/mvt.py): yields (field_no, wire_type, value_or_payload)."""
    i = 0
    while i < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield fno, wt, v
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            yield fno, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, buf[i : i + 4]
            i += 4
        elif wt == 1:
            yield fno, wt, buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unexpected wire type {wt}")


def _tlv_layer_stats(blob: bytes) -> dict[str, dict]:
    """Layer name -> {extent, n_features, geom_counts, n_cmd_ints} computed
    purely from the TLV structure (MVT spec fields: layer=3; in layer:
    name=1, feature=2, extent=5; in feature: type=3, geometry=4)."""
    out = {}
    for fno, wt, payload in _tlv_walk(blob):
        assert fno == 3 and wt == 2, "top level must be repeated layer field"
        name, extent, nfeat = None, 4096, 0
        gcounts = {1: 0, 2: 0, 3: 0}
        for lf, lw, lv in _tlv_walk(payload):
            if lf == 1:
                name = lv.decode("utf-8")
            elif lf == 2:
                nfeat += 1
                for ff, fw, fv in _tlv_walk(lv):
                    if ff == 3:
                        gcounts[fv] += 1
            elif lf == 5:
                extent = lv
        out[name] = {"extent": extent, "n_features": nfeat, "geom_counts": gcounts}
    return out


@pytest.fixture(scope="module")
def shortbread_blob():
    with open(SHORTBREAD, "rb") as f:
        return f.read()


def test_shortbread_decode_matches_independent_tlv_walk(shortbread_blob):
    tile = decode_tile(shortbread_blob)
    independent = _tlv_layer_stats(shortbread_blob)
    assert set(tile) == set(independent)
    assert len(tile) == 13
    for name, exp in independent.items():
        layer = tile[name]
        assert layer["extent"] == exp["extent"], name
        assert len(layer["features"]) == exp["n_features"], name
        got_counts = {g: sum(1 for f in layer["features"] if f.geom_type == g) for g in (1, 2, 3)}
        assert got_counts == exp["geom_counts"], name
    # shortbread@1.0 schema layers (tile_schema.rs:31) present in fixture
    for expected_layer in ("streets", "buildings", "water_polygons", "place_labels", "land"):
        assert expected_layer in tile


def test_shortbread_validates_clean(shortbread_blob):
    from versatiles_rs_spark.functions.mvt import validate_tile

    assert validate_tile(shortbread_blob) == []


def test_shortbread_reencode_roundtrip_semantic_equality(shortbread_blob):
    """decode -> encode -> decode must preserve every feature exactly
    (geom type, ring coordinates, properties, feature id) — the reference's
    from_to_blob test on the same fixture (tile.rs:112-118)."""
    from versatiles_rs_spark.functions.mvt import encode_tile

    tile1 = decode_tile(shortbread_blob)
    blob2 = encode_tile({name: layer["features"] for name, layer in tile1.items()})
    tile2 = decode_tile(blob2)
    assert set(tile1) == set(tile2)

    def canon(features):
        # the encoder deterministically re-orders features (encode_layer
        # sorts by fid/geom/rings), so compare as canonical multisets
        return sorted(
            (f.geom_type, f.rings, sorted((k, repr(v)) for k, v in f.props.items()), f.fid)
            for f in features
        )

    for name in tile1:
        assert canon(tile1[name]["features"]) == canon(tile2[name]["features"]), name


def test_shortbread_layers_query_matches_oracle(spark):
    import duckdb

    from versatiles_rs_spark.queries import O_SHORTBREAD_LAYERS, q_shortbread_layers

    got = (
        q_shortbread_layers(spark, "unused")
        .toPandas()
        .sort_values("layer")
        .reset_index(drop=True)
    )
    want = duckdb.sql(O_SHORTBREAD_LAYERS).df().sort_values("layer").reset_index(drop=True)
    assert got.columns.tolist() == want.columns.tolist()
    for c in got.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_shortbread_through_vector_transforms(spark, shortbread_blob):
    """Transforms over REAL third-party MVT data: explode the shortbread
    tile, filter to two layers, reassemble — the output must decode, stay
    validator-clean, and carry exactly the expected feature counts."""
    import pandas as pd

    from versatiles_rs_spark.functions.mvt import validate_tile
    from versatiles_rs_spark.operators.vector_transforms import (
        explode_features,
        reassemble_tiles,
        vector_filter_layers,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            [(14, 8800, 5370, "mvt", "none", shortbread_blob, 0)],
            columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
        )
    )
    kept = vector_filter_layers(df, ["streets", "buildings"], invert=True)  # keep-only
    out = kept.collect()
    assert len(out) == 1
    blob = bytes(out[0]["tile"])
    from versatiles_rs_spark.functions.compression import decompress

    raw = decompress(blob, out[0]["compression"])
    assert validate_tile(raw) == []
    tile = decode_tile(raw)
    assert set(tile) == {"streets", "buildings"}
    assert len(tile["streets"]["features"]) == 4224
    assert len(tile["buildings"]["features"]) == 2328

    # explode -> reassemble keeps per-layer feature counts on real data
    feats = explode_features(df)
    counts = {r["layer"]: r["n"] for r in feats.groupBy("layer").count().withColumnRenamed("count", "n").collect()}
    assert counts["addresses"] == 2609 and counts["land"] == 871
    back = reassemble_tiles(feats, compression="none").collect()
    assert len(back) == 1
    assert validate_tile(bytes(back[0]["tile"])) == []
