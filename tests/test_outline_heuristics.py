"""Tile outline dissolve, auto_max_zoom, CEL translation."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.heuristics import (
    auto_max_zoom,
    auto_max_zoom_from_size,
    cel_to_spark_expr,
    filter_features_cel,
)
from versatiles_rs_spark.operators.outline import (
    _boundary_rings,
    count_tiles,
    measure_tile_sizes,
    tile_outline_geojson,
)


def test_boundary_rings_single_square():
    rings = _boundary_rings({(0, 0)})
    assert len(rings) == 1
    assert len(rings[0]) == 5  # 4 corners + closure


def test_boundary_rings_merge_adjacent():
    # 2x1 block dissolves into one rectangle (no inner edge)
    rings = _boundary_rings({(0, 0), (1, 0)})
    assert len(rings) == 1
    xs = [p[0] for p in rings[0]]
    assert max(xs) == 2 and min(xs) == 0
    assert len(rings[0]) == 5


def test_boundary_rings_hole():
    # 3x3 block minus center -> outer ring + hole ring
    coords = {(x, y) for x in range(3) for y in range(3)} - {(1, 1)}
    rings = _boundary_rings(coords)
    assert len(rings) == 2
    sizes = sorted(len(r) for r in rings)
    assert sizes == [5, 5]  # both rectangles


def test_boundary_rings_disjoint():
    rings = _boundary_rings({(0, 0), (5, 5)})
    assert len(rings) == 2


def test_tile_outline_geojson(spark):
    pdf = pd.DataFrame(
        {"z": [2, 2, 2], "x": [0, 1, 3], "y": [0, 0, 3], "tile": [b"a", b"b", b"c"]}
    )
    df = spark.createDataFrame(pdf)
    gj = json.loads(tile_outline_geojson(df, 2))
    assert gj["type"] == "MultiPolygon"
    assert len(gj["coordinates"]) == 2  # merged pair + lone tile
    assert count_tiles(df, 2) == 3


def test_measure_tile_sizes(spark):
    pdf = pd.DataFrame({"z": [1, 1], "x": [0, 1], "y": [0, 1], "tile": [b"x" * 16, b"y" * 1024]})
    df = spark.createDataFrame(pdf)
    from versatiles_rs_spark.functions.raster import png_decode

    img = png_decode(measure_tile_sizes(df, 1))
    assert img.shape == (2, 2, 1)
    assert img[0, 0, 0] == 40  # 10*log2(16)
    assert img[1, 1, 0] == 100  # 10*log2(1024)
    assert img[0, 1, 0] == 0


def test_auto_max_zoom():
    assert auto_max_zoom_from_size(None) == 14
    # huge features -> low zoom; tiny -> clamped at 14
    assert auto_max_zoom_from_size(10_000_000.0) <= 3
    assert auto_max_zoom_from_size(0.5) == 14
    big = auto_max_zoom_from_size(100_000.0)
    small = auto_max_zoom_from_size(1_000.0)
    assert big < small


def test_auto_max_zoom_dataframe(spark):
    df = spark.createDataFrame(pd.DataFrame({"size_m": [1000.0, 2000.0, 3000.0]}))
    z = auto_max_zoom(df, "size_m")
    assert z == auto_max_zoom_from_size(2000.0)
    assert auto_max_zoom(df, None) == 14


def test_cel_translation():
    assert cel_to_spark_expr("props['name'] == 'Berlin'") == "props['name'] = 'Berlin'"
    got = cel_to_spark_expr("props['a'] == 'x' && props['b'] != 'y' || !(props['c'] == 'z')")
    assert " AND " in got and " OR " in got and "NOT (" in got
    assert cel_to_spark_expr("matches(props['name'], '^Ber.*')") == "props['name'] RLIKE '^Ber.*'"
    assert cel_to_spark_expr("has(props['kind'])") == "props['kind'] IS NOT NULL"


def test_filter_features_cel_end_to_end(spark, sf_dir):
    from versatiles_rs_spark.operators.convert import assign_tiles, render_point_tiles
    from versatiles_rs_spark.operators.vector_transforms import explode_features
    from versatiles_rs_spark.queries import _docs_geo

    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    tiles = render_point_tiles(assign_tiles(geo, 3, 3))
    feats = explode_features(tiles)
    en = filter_features_cel(feats, "props['lang'] == 'en' || props['lang'] == 'de'")
    want = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("lang in ('en','de')")
        .count()
    )
    assert en.count() == want
    with pytest.raises(Exception):
        filter_features_cel(feats, "props[[[").count()


def test_distributed_outline_matches_local_cancellation(spark):
    """The groupBy edge-cancellation path emits byte-identical GeoJSON to the
    all-local _boundary_rings dissolve on the same tile set (incl. a hole)."""
    import json

    import pandas as pd

    from versatiles_rs_spark.operators.outline import (
        _boundary_rings,
        _chain_rings,
        _surviving_edges,
        tile_outline_geojson,
    )

    # 5x5 block with a hole at (2,2), plus a detached 2x1 island
    coords = {(x, y) for x in range(5) for y in range(5)} - {(2, 2)}
    coords |= {(8, 1), (9, 1)}
    pdf = pd.DataFrame(
        [(4, x, y, "mvt", "none", b"", 0) for x, y in sorted(coords)],
        columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
    )
    df = spark.createDataFrame(pdf)
    survivors = _surviving_edges(df, 4)
    assert sorted(_chain_rings(survivors)) == sorted(_boundary_rings(coords))
    gj = json.loads(tile_outline_geojson(df, 4))
    assert gj["type"] == "MultiPolygon"
    assert len(gj["coordinates"]) == 3  # shell, hole ring, island


def test_measure_tile_sizes_bounded(spark):
    import pandas as pd

    from versatiles_rs_spark.functions.raster import png_decode
    from versatiles_rs_spark.operators.outline import measure_tile_sizes

    pdf = pd.DataFrame(
        [(6, x, y, "png", "none", bytes(100 * (x + 1)), 0) for x in range(8) for y in range(8)],
        columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
    )
    df = spark.createDataFrame(pdf)
    # max_side smaller than 2^z -> downsampled grid, never a 64x64 image
    blob = measure_tile_sizes(df, 6, max_side=16)
    img = png_decode(blob)
    assert img.shape[0] == 16 and img.shape[1] == 16
    assert img.max() > 0
