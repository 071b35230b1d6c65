"""VPL-equivalent planner: parse, build-time validation, execution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.plans import build_pipeline, parse_vpl
from versatiles_rs_spark.plans.vpl import VplError


def test_parse_basic():
    nodes = parse_vpl(
        'from_csv filename="a.csv" level_max=8 | filter level_min=2  # tail comment'
    )
    assert [n.name for n in nodes] == ["from_csv", "filter"]
    assert nodes[0].props == {"filename": "a.csv", "level_max": 8}
    assert nodes[1].props == {"level_min": 2}


def test_parse_arrays_and_types():
    (n,) = parse_vpl("from_color color=[1,2,3,255] level_max=2")
    assert n.props["color"] == [1, 2, 3, 255]
    (n2,) = parse_vpl("op rate=0.5 flag=true name=x")
    assert n2.props == {"rate": 0.5, "flag": True, "name": "x"}


def test_parse_nested_children():
    (n,) = parse_vpl(
        "from_stacked [ from_color color=[0,0,0,255] level_max=1, from_debug level_max=1 ]"
    )
    assert n.name == "from_stacked"
    assert len(n.children) == 2
    assert n.children[0][0].name == "from_color"
    assert n.children[1][0].name == "from_debug"


def test_build_time_validation(spark):
    with pytest.raises(VplError, match="unknown read op"):
        build_pipeline(spark, "nonsense_op a=1")
    with pytest.raises(VplError, match="must start with a read op"):
        build_pipeline(spark, "filter level_min=1")
    with pytest.raises(VplError, match="missing required argument"):
        build_pipeline(spark, "from_container")
    with pytest.raises(VplError, match="cannot appear mid-pipeline"):
        build_pipeline(spark, "from_debug | from_debug")


def test_execute_color_filter(spark):
    df = build_pipeline(spark, "from_color color=[7,8,9,255] level_max=3 | filter level_min=2")
    zs = {r["z"] for r in df.select("z").distinct().collect()}
    assert zs == {2, 3}


def test_execute_stacked_pipeline(spark):
    df = build_pipeline(
        spark,
        "from_stacked [ from_debug level_max=1, from_color color=[1,1,1,255] level_max=2 ]",
    )
    # stacked: debug wins z0-1, color fills z2
    assert df.filter("z <= 1").filter("format = 'mvt'").count() == 5
    assert df.filter("z = 2").filter("format = 'png'").count() == 16


def test_execute_csv_pipeline(spark, tmp_path):
    csv = tmp_path / "pts.csv"
    csv.write_text("event_id,longitude,latitude\n1,0.0,0.0\n2,100.0,45.0\n")
    df = build_pipeline(
        spark,
        f'from_csv filename="{csv}" id=event_id level_max=4 layer=pts | filter level_min=4 bbox=[-10,-10,10,10]',
    )
    rows = df.collect()
    assert all(r["z"] == 4 for r in rows)
    # only the (0,0) point's tile intersects the bbox
    assert df.agg(F.sum("n_features")).collect()[0][0] == 1


def test_execute_overview_pipeline(spark, tmp_path):
    csv = tmp_path / "pts2.csv"
    csv.write_text("event_id,longitude,latitude\n1,10.0,10.0\n2,-100.0,-40.0\n")
    df = build_pipeline(
        spark,
        f'from_csv filename="{csv}" id=event_id level_min=3 level_max=3 | vector_overview level_base=3',
    )
    stats = {r["z"]: r["n"] for r in df.groupBy("z").agg(F.sum("n_features").alias("n")).collect()}
    assert stats == {0: 2, 1: 2, 2: 2, 3: 2}


def test_vpl_shapefile_and_raster_mask(spark):
    import os

    td = "/root/reference/testdata"
    if not os.path.isdir(td):
        pytest.skip("reference testdata absent")
    df = build_pipeline(spark, f'from_shapefile filename="{td}/admin.shp" level_max=3 layer=admin')
    assert df.count() > 0
    # raster_mask over a color pyramid, masked to the borders fixture
    masked = build_pipeline(
        spark,
        f'from_color color=[40,40,40,255] level_min=5 level_max=5 | '
        f'raster_mask filename="{td}/borders.geojson" feature=west',
    )
    n_all = 4**5
    n_masked = masked.count()
    assert 0 < n_masked < n_all  # outside tiles dropped
    with pytest.raises(VplError, match="no usable polygon"):
        build_pipeline(
            spark,
            f'from_color color=[0,0,0,255] level_max=1 | '
            f'raster_mask filename="{td}/borders.geojson" feature=nonexistent',
        )


def test_vpl_berlin_equivalent_pipeline(spark, tmp_path):
    """berlin.vpl analog (reference testdata/berlin.vpl): container read |
    vector_update_properties from cities.csv | CEL feature filter |
    zoom filter | meta_update — end-to-end through build_pipeline, using a
    real .mbtiles container built from the reference's places fixture."""
    from versatiles_rs_spark.functions.compression import decompress
    from versatiles_rs_spark.functions.mvt import decode_tile
    from versatiles_rs_spark.operators.from_geo import from_geo
    from versatiles_rs_spark.plans.vpl import build_pipeline
    from versatiles_rs_spark.sources.mbtiles import write_mbtiles

    tiles = from_geo(
        spark, "/root/reference/testdata/places.geojsonl", 0, 6, layer_name="place_labels"
    )
    mb = str(tmp_path / "places.mbtiles")
    write_mbtiles(tiles, mb)
    meta: dict = {}
    vpl = f"""
    from_mbtiles filename="{mb}" |
    vector_update_properties
       data_source_path="/root/reference/testdata/cities.csv"
       layer_name="place_labels"
       id_field_tiles="name"
       id_field_data="city_name" |
    vector_filter_features layer=["place_labels"] expr="has(props.city_population) || kind != 'capital'" |
    filter level_max=5 |
    meta_update name="berlin-equiv" attribution="test"
    """
    out = build_pipeline(spark, vpl, meta=meta)
    rows = out.collect()
    assert rows and all(r["z"] <= 5 for r in rows)
    assert meta == {"name": "berlin-equiv", "attribution": "test"}
    # Berlin (in cities.csv) gained city_population; its row survives the CEL
    found_berlin = False
    for r in rows:
        layers = decode_tile(decompress(bytes(r["tile"]), r["compression"]))
        for f in layers.get("place_labels", {"features": []})["features"]:
            if f.props.get("name") == "Berlin":
                found_berlin = True
                assert int(f.props["city_population"]) == 3755251
            assert not (f.props.get("kind") == "capital"
                        and "city_population" not in f.props)
    assert found_berlin


def test_vpl_new_registry_ops_validate_at_build(spark):
    """Newly registered ops fail fast on bad args / malformed CEL."""
    import pytest

    from versatiles_rs_spark.plans.vpl import VplError, build_pipeline

    with pytest.raises(VplError, match="CEL"):
        build_pipeline(spark, 'from_debug | vector_filter_features expr="population >="')
    with pytest.raises(VplError, match="missing required argument"):
        build_pipeline(spark, "from_debug | vector_update_properties id_field_tiles=\"x\"")
    with pytest.raises(VplError, match="missing required argument"):
        build_pipeline(spark, "from_mbtiles")


def test_from_tilejson_local(spark, tmp_path):
    """Local-filesystem from_tilejson: TileJSON 'tiles' template resolved
    against the filesystem (the reference fetches the same template over
    HTTP, from_tilejson.rs:31-38)."""
    import json

    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.plans.vpl import build_pipeline
    from versatiles_rs_spark.queries import _docs_geo
    from versatiles_rs_spark.sources.readers import write_directory

    tiles = convert_pages_to_tiles(_docs_geo(spark, "/root/testdata/sf0.001"), 0, 3, keep_ratio=1.0)
    root = tmp_path / "tiles"
    write_directory(tiles, str(root))  # convert emits format="mvt" -> z/x/y.mvt files
    tj = tmp_path / "source.json"
    tj.write_text(json.dumps({
        "tilejson": "3.0.0",
        "tiles": [f"{root}/{{z}}/{{x}}/{{y}}.mvt"],
        "minzoom": 0, "maxzoom": 3,
    }))
    out = build_pipeline(spark, f'from_tilejson url="{tj}" | filter level_max=2')
    rows = out.collect()
    want = tiles.filter("z <= 2").count()
    assert len(rows) == want
    assert all(r["format"] == "mvt" for r in rows)
    # http templates now build the distributed HTTP fetch plan (round 3:
    # _from_tilejson_http; full loopback-server behavior is covered by
    # tests/test_tilejson_http.py) — building must not raise, and the
    # enumerated pyramid has the declared size before any fetch runs
    tj2 = tmp_path / "http.json"
    tj2.write_text(json.dumps({
        "tiles": ["https://x.invalid/{z}/{x}/{y}.png"],
        "minzoom": 0, "maxzoom": 1, "bounds": [-180, -85, 180, 85],
    }))
    df = build_pipeline(spark, f'from_tilejson url="{tj2}"')
    assert [f.name for f in df.schema.fields][:3] == ["z", "x", "y"]


def test_vpl_dem_tile_resize_pipeline(spark):
    """Registry parity with operations/mod.rs:16: dem_tile_resize builds and
    runs through VPL; tile_size is required at build time
    (dem_tile_resize.rs:34)."""
    with pytest.raises(VplError):
        build_pipeline(spark, "from_color color=[1,2,3,255] level_max=2 | dem_tile_resize")
    df = build_pipeline(
        spark, "from_color color=[1,2,3,255] level_max=2 | dem_tile_resize tile_size=512"
    )
    rows = df.collect()
    # from_color levels 1..2 merge to 512px parents at levels 0..1
    assert {r["z"] for r in rows} == {0, 1}
    from versatiles_rs_spark.functions.raster import png_decode

    assert png_decode(bytes(rows[0]["tile"])).shape[:2] == (512, 512)
