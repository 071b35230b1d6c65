"""Incremental dirty-tile re-render == full rebuild, byte for byte."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.operators.convert import assign_tiles, convert_pages_to_tiles
from versatiles_rs_spark.operators.incremental import (
    dirty_tiles,
    doc_delta,
    incremental_convert,
)
from versatiles_rs_spark.pages.generator import lat_expr, lon_expr
from versatiles_rs_spark.queries import _docs_geo
from versatiles_rs_spark.session import get_spark

SF = "/root/testdata/sf0.001"
ZMIN, ZMAX = 0, 6


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="test-incr", master="local[4]", shuffle_partitions=4)


def _old(spark):
    return _docs_geo(spark, SF).select("doc_id", "lon", "lat", "lang")


def _new(spark):
    """Deterministic delta: delete %17, move %13 (position re-derived from
    doc_id*31+7), add a clone at id+1000000 for %19."""
    old = _old(spark)
    moved_id = F.col("doc_id") * 31 + 7
    surv = old.where("doc_id % 17 != 0").select(
        "doc_id",
        F.when(F.col("doc_id") % 13 == 0, lon_expr(moved_id)).otherwise(F.col("lon")).alias("lon"),
        F.when(F.col("doc_id") % 13 == 0, lat_expr(moved_id)).otherwise(F.col("lat")).alias("lat"),
        "lang",
    )
    added_id = F.col("doc_id") + 1000000
    added = old.where("doc_id % 19 = 0").select(
        added_id.alias("doc_id"),
        lon_expr(added_id).alias("lon"),
        lat_expr(added_id).alias("lat"),
        "lang",
    )
    return surv.unionByName(added)


def _tile_map(df):
    return {
        (r["z"], r["x"], r["y"]): hashlib.md5(bytes(r["tile"])).hexdigest()
        for r in df.collect()
    }


def test_incremental_equals_full_rebuild(spark):
    old, new = _old(spark), _new(spark)
    base = convert_pages_to_tiles(old, ZMIN, ZMAX)
    delta = doc_delta(old, new)
    dirty = dirty_tiles(delta, ZMIN, ZMAX)
    inc = incremental_convert(base, new, dirty, ZMIN, ZMAX)
    full = convert_pages_to_tiles(new, ZMIN, ZMAX)
    assert _tile_map(inc) == _tile_map(full)


def test_incremental_with_thinning_equals_full(spark):
    # keep_ratio < 1: the per-doc thinning hash must agree between the
    # base build and the re-render for clean AND dirty tiles
    old, new = _old(spark), _new(spark)
    base = convert_pages_to_tiles(old, ZMIN, ZMAX, keep_ratio=0.7)
    dirty = dirty_tiles(doc_delta(old, new), ZMIN, ZMAX)
    inc = incremental_convert(base, new, dirty, ZMIN, ZMAX, keep_ratio=0.7)
    full = convert_pages_to_tiles(new, ZMIN, ZMAX, keep_ratio=0.7)
    assert _tile_map(inc) == _tile_map(full)


def test_delta_classes(spark):
    old, new = _old(spark), _new(spark)
    delta = doc_delta(old, new)
    n_old = old.count()
    n_del = old.where("doc_id % 17 = 0").count()
    n_mov = old.where("doc_id % 13 = 0 AND doc_id % 17 != 0").count()
    n_add = old.where("doc_id % 19 = 0").count()
    # deleted + moved contribute 'old' rows; moved + added contribute 'new'
    assert delta.where("side = 'old'").count() == n_del + n_mov
    assert delta.where("side = 'new'").count() == n_mov + n_add
    assert n_old > n_del + n_mov + n_add  # the delta is a sliver


def test_clean_tiles_not_rerendered(spark):
    # tiles outside the dirty set must be the base DataFrame's rows
    old, new = _old(spark), _new(spark)
    base = convert_pages_to_tiles(old, ZMIN, ZMAX)
    dirty = dirty_tiles(doc_delta(old, new), ZMIN, ZMAX)
    inc = incremental_convert(base, new, dirty, ZMIN, ZMAX)
    n_dirty = dirty.count()
    n_base = base.count()
    n_kept = inc.join(dirty, ["z", "x", "y"], "left_anti").count()
    assert n_kept == n_base - base.join(dirty, ["z", "x", "y"], "left_semi").count()
    assert n_dirty < n_base  # re-render work is delta-sized
