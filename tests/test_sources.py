"""Read operators + TileJSON metadata."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.mvt import decode_tile
from versatiles_rs_spark.functions.raster import png_decode
from versatiles_rs_spark.sources import (
    TileJson,
    from_color,
    from_csv,
    from_debug,
    from_directory,
    from_tile,
    read_tile_table,
)
from versatiles_rs_spark.sources.readers import write_directory


def test_from_color(spark):
    tiles = from_color(spark, (10, 20, 30, 255), 0, 2)
    assert tiles.count() == 1 + 4 + 16
    row = tiles.first()
    img = png_decode(bytes(row["tile"]))
    assert tuple(img[0, 0]) == (10, 20, 30, 255)


def test_from_tile_replicates(spark):
    tiles = from_tile(spark, b"BLOB", "bin", 1, 1)
    rows = tiles.collect()
    assert len(rows) == 4
    assert all(bytes(r["tile"]) == b"BLOB" for r in rows)


def test_from_debug_self_describing(spark):
    tiles = from_debug(spark, 2, 2)
    for r in tiles.collect():
        layers = decode_tile(bytes(r["tile"]))
        f = layers["debug"]["features"][0]
        assert (f.props["z"], f.props["x"], f.props["y"]) == (r["z"], r["x"], r["y"])


def test_from_csv_quakes_like(spark, tmp_path):
    csv = tmp_path / "quakes.csv"
    csv.write_text(
        "event_id,longitude,latitude,magnitude\n"
        "1,13.4,52.5,3.2\n2,-100.0,40.0,5.0\n3,139.7,35.7,4.1\n"
    )
    tiles = from_csv(
        spark, str(csv), id_col="event_id", min_zoom=0, max_zoom=3,
        layer_name="quakes", props_cols=["magnitude"],
    )
    assert tiles.filter("z = 0").agg(F.sum("n_features")).collect()[0][0] == 3
    row = tiles.filter("z = 0").first()
    from versatiles_rs_spark.functions.compression import decompress

    layers = decode_tile(decompress(bytes(row["tile"]), row["compression"]))
    feats = layers["quakes"]["features"]
    assert {f.props["magnitude"] for f in feats} == {"3.2", "5.0", "4.1"}


def test_directory_roundtrip(spark, tmp_path):
    src = from_color(spark, (1, 2, 3, 4), 1, 2)
    root = str(tmp_path / "tree")
    write_directory(src, root)
    back = from_directory(spark, root, "png")
    assert back.count() == src.count()
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in src.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_read_tile_table_roundtrip(spark, tmp_path):
    src = from_color(spark, (9, 9, 9, 9), 0, 1)
    path = str(tmp_path / "tbl")
    src.write.partitionBy("z").parquet(path)
    back = read_tile_table(spark, path)
    assert back.count() == 5
    # z partition pruning applies (PushedFilters / partition filter)
    plan = back.filter("z = 1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.filter("z = 1").count() == 4


def test_tilejson_merge_union():
    a = TileJson(name="a", bounds=[-10, -10, 10, 10], minzoom=2, maxzoom=8,
                 vector_layers=[{"id": "roads", "fields": {"k": "String"}}])
    b = TileJson(bounds=[0, -20, 30, 5], minzoom=0, maxzoom=6,
                 vector_layers=[{"id": "water", "fields": {}}])
    m = a.merge(b)
    assert m.bounds == [-10, -20, 30, 10]
    assert (m.minzoom, m.maxzoom) == (0, 8)
    assert [layer["id"] for layer in m.vector_layers] == ["roads", "water"]
    j = TileJson.from_json(m.to_json())
    assert j.bounds == m.bounds


def test_tilejson_from_tiles(spark):
    tiles = from_color(spark, (0, 0, 0, 0), 0, 3)
    tj = TileJson.from_tiles(tiles, name="colors")
    assert (tj.minzoom, tj.maxzoom) == (0, 3)
    w, s, e, n = tj.bounds
    assert w <= -179 and e >= 179 and s < -80 and n > 80
    upd = tj.update(name="renamed", attribution="test")
    assert upd.name == "renamed" and upd.extra["attribution"] == "test"
