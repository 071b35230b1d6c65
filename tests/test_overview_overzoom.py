"""Pyramid rollup + overzoom invariants.

Golden check (convert_integrity analog): vector rollup z->z-1 is
byte-identical to rendering the parent level directly (floor-halving
commutes with quantization).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import decompress
from versatiles_rs_spark.functions.mvt import decode_tile
from versatiles_rs_spark.functions.raster import dem_decode, dem_encode, png_decode, png_encode
from versatiles_rs_spark.operators.convert import assign_tiles, render_point_tiles
from versatiles_rs_spark.operators.overview import (
    build_overviews,
    dem_overview_step,
    raster_overview_step,
    vector_overview_step,
)
from versatiles_rs_spark.operators.overzoom import overzoom_to, vector_overzoom_step
from versatiles_rs_spark.queries import _docs_geo

BASEZ = 5


@pytest.fixture(scope="module")
def base_tiles(spark, sf_dir):
    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    assigned = assign_tiles(geo, BASEZ, BASEZ)
    return render_point_tiles(assigned).cache()


def _blob_map(df):
    return {
        (r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in df.collect()
    }


def test_vector_rollup_matches_direct_render(spark, sf_dir, base_tiles):
    rolled = vector_overview_step(base_tiles)
    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    direct = render_point_tiles(assign_tiles(geo, BASEZ - 1, BASEZ - 1))
    a, b = _blob_map(rolled), _blob_map(direct)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], f"tile {k} differs between rollup and direct render"


def test_full_pyramid_feature_conservation(spark, base_tiles):
    pyramid = build_overviews(base_tiles, BASEZ, 0, kind="vector")
    stats = pyramid.groupBy("z").agg(F.sum("n_features").alias("nf")).toPandas()
    nfs = stats.sort_values("z")["nf"].unique()
    assert len(nfs) == 1  # every level carries every point


def test_raster_overview_average(spark):
    # two children with constant values 40 and 80 -> parent halves average
    size = 8
    rows = []
    for (x, v) in ((0, 40), (1, 80)):
        img = np.full((size, size, 4), v, np.uint8)
        rows.append((1, x, 0, "png", "none", png_encode(img), 1))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"])
    )
    out = raster_overview_step(df, size=size, channels=4).collect()
    assert len(out) == 1
    img = png_decode(bytes(out[0]["tile"]))
    assert img.shape == (size, size, 4)
    # top-left quadrant from child (0,0): average of 40s and zeros... children
    # occupy top half (y=0); bottom half is transparent zeros
    assert img[0, 0, 0] == 40
    assert img[0, size - 1, 0] == 80
    assert img[size - 1, 0, 0] == 0


def test_dem_overview_raw_average(spark):
    size = 4
    rows = []
    for (x, y, elev) in ((0, 0, 100.0), (1, 0, 200.0), (0, 1, 300.0), (1, 1, 400.0)):
        img = dem_encode(np.full((size, size), elev), "terrarium")
        rows.append((3, x, y, "png", "none", png_encode(img), 1))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"])
    )
    out = dem_overview_step(df, size=size).collect()
    assert len(out) == 1
    back = dem_decode(png_decode(bytes(out[0]["tile"])), "terrarium")
    # each quadrant keeps its child's elevation (constant tiles)
    assert abs(back[0, 0] - 100.0) < 0.5
    assert abs(back[0, size - 1] - 200.0) < 0.5
    assert abs(back[size - 1, 0] - 300.0) < 0.5
    assert abs(back[size - 1, size - 1] - 400.0) < 0.5


def test_overzoom_partitions_points_with_zero_buffer(spark, base_tiles):
    kids = vector_overzoom_step(base_tiles, buffer=0)
    n_parent = base_tiles.agg(F.sum("n_features")).collect()[0][0]
    n_kids = kids.agg(F.sum("n_features")).collect()[0][0]
    assert n_kids == n_parent  # exact partition, no loss, no dup
    # child coords derive from parents
    pk = {(r["x"], r["y"]) for r in base_tiles.select("x", "y").collect()}
    for r in kids.select("z", "x", "y").collect():
        assert r["z"] == BASEZ + 1
        assert (r["x"] // 2, r["y"] // 2) in pk


def test_overzoom_buffer_duplicates_edge_points(spark, base_tiles):
    strict = vector_overzoom_step(base_tiles, buffer=0)
    buffered = vector_overzoom_step(base_tiles, buffer=80)
    ns = strict.agg(F.sum("n_features")).collect()[0][0]
    nb = buffered.agg(F.sum("n_features")).collect()[0][0]
    assert nb >= ns  # buffer can only add edge duplicates


def test_overzoom_two_levels_valid(spark, base_tiles):
    from versatiles_rs_spark.operators.probe import validate_tiles

    z2 = overzoom_to(base_tiles, BASEZ, BASEZ + 2, buffer=0)
    assert z2.filter(F.col("z") != BASEZ + 2).count() == 0
    assert validate_tiles(z2).filter("n_issues > 0").count() == 0
    # grid coords stay in range after x2 scaling
    row = z2.first()
    layers = decode_tile(decompress(bytes(row["tile"]), row["compression"]))
    for layer in layers.values():
        for f in layer["features"]:
            for ring in f.rings:
                for gx, gy in ring:
                    assert 0 <= gx <= 4096 and 0 <= gy <= 4096


def test_build_overviews_checkpoint_dir_identical(spark, tmp_path):
    """The disk-spill path (checkpoint_dir) produces byte-identical levels
    to the in-memory persist path — only the storage strategy differs."""
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.operators.overview import build_overviews
    from versatiles_rs_spark.queries import _docs_geo

    base_z = 4
    base = convert_pages_to_tiles(
        _docs_geo(spark, "/root/testdata/sf0.001"), base_z, base_z, keep_ratio=1.0
    )
    mem = build_overviews(base, base_z, 0, kind="vector")
    disk = build_overviews(base, base_z, 0, kind="vector", checkpoint_dir=str(tmp_path))
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in mem.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in disk.collect()}
    assert a == b
