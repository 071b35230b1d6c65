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
