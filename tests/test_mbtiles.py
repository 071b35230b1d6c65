"""MBTiles container ingest/export (sources/mbtiles.py).

Round-trip parity with the reference's convert_integrity tests
(mbtiles reader.rs:354-380 TMS y-flip, writer.rs:85-121 schema): a tile
table written to .mbtiles and re-ingested must be byte-identical per
coordinate, and the metadata table must follow the 1.3 spec mapping.
"""

from __future__ import annotations

import sqlite3

import pytest

from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
from versatiles_rs_spark.sources.mbtiles import (
    mbtiles_tilejson,
    read_mbtiles,
    read_mbtiles_metadata,
    write_mbtiles,
)


@pytest.fixture(scope="module")
def pyramid(spark, sf_dir):
    from versatiles_rs_spark.queries import _docs_geo

    return convert_pages_to_tiles(_docs_geo(spark, sf_dir), 0, 5, keep_ratio=1.0).cache()


def test_roundtrip_byte_identical(spark, pyramid, tmp_path):
    path = str(tmp_path / "rt.mbtiles")
    stats = write_mbtiles(pyramid, path, metadata={"name": "roundtrip"})
    src = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in pyramid.collect()}
    assert stats["tiles"] == len(src)
    assert stats["format"] == "pbf"  # mvt + gzip -> pbf per spec table
    back = read_mbtiles(spark, path)
    got = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert got.keys() == src.keys()
    assert all(got[k] == src[k] for k in src), "blob bytes must survive untouched"
    rows = back.limit(1).collect()
    assert rows[0]["format"] == "mvt" and rows[0]["compression"] == "gzip"


def test_tms_y_flip_in_db(spark, pyramid, tmp_path):
    """On disk rows are TMS (tile_row = 2^z - 1 - y, writer.rs:103)."""
    path = str(tmp_path / "flip.mbtiles")
    write_mbtiles(pyramid, path)
    with sqlite3.connect(path) as conn:
        db = conn.execute("SELECT zoom_level, tile_column, tile_row FROM tiles").fetchall()
    src = {(r["z"], r["x"], r["y"]) for r in pyramid.collect()}
    assert {(z, x, (1 << z) - 1 - row) for z, x, row in db} == src


def test_metadata_spec_fields(spark, pyramid, tmp_path):
    path = str(tmp_path / "meta.mbtiles")
    write_mbtiles(pyramid, path, metadata={"name": "t", "bounds": "-180,-85,180,85"})
    meta = read_mbtiles_metadata(path)
    assert meta["format"] == "pbf"
    assert meta["type"] == "baselayer" and meta["version"] == "3.0"
    assert meta["minzoom"] == "0" and meta["maxzoom"] == "5"
    tj = mbtiles_tilejson(path)
    assert tj["bounds"] == [-180.0, -85.0, 180.0, 85.0]
    assert tj["minzoom"] == 0 and tj["maxzoom"] == 5


def test_missing_format_rejected(spark, tmp_path):
    path = str(tmp_path / "bad.mbtiles")
    with sqlite3.connect(path) as conn:
        conn.executescript(
            "CREATE TABLE metadata (name TEXT, value TEXT);"
            "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, "
            "tile_row INTEGER, tile_data BLOB);"
        )
    with pytest.raises(ValueError, match="does not specify tile format"):
        read_mbtiles(spark, path)


def test_unsupported_combo_rejected(spark, pyramid):
    bad = pyramid.withColumn("compression", pyramid.compression.substr(0, 0))  # ''
    from pyspark.sql import functions as F

    bad = pyramid.withColumn("compression", F.lit("zstd"))
    with pytest.raises(ValueError, match="not supported"):
        write_mbtiles(bad, "/tmp/never_written.mbtiles")


def test_parallel_slices_cover_all_rows(spark, pyramid, tmp_path):
    """Rowid-sliced ingest: many small slices still see every row once."""
    path = str(tmp_path / "slices.mbtiles")
    write_mbtiles(pyramid, path)
    n = pyramid.count()
    back = read_mbtiles(spark, path, slices_per_core=8)
    assert back.count() == n
    assert back.select("z", "x", "y").distinct().count() == n
