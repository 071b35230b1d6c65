"""Salted aggregation == plain aggregation; overzoom climbing; sampling."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.operators.convert import assign_tiles, render_point_tiles
from versatiles_rs_spark.operators.overzoom import overzoom_lookup
from versatiles_rs_spark.operators.probe import sample_windows
from versatiles_rs_spark.operators.skew import (
    cap_features_per_tile,
    detect_hot_tiles,
    salted_tile_stats,
)
from versatiles_rs_spark.queries import _docs_geo


@pytest.fixture(scope="module")
def skewed(spark, sf_dir):
    """A skewed point set: all docs duplicated 50x into one city + spread."""
    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat")
    hot = geo.crossJoin(spark.range(50).select(F.col("id").alias("r"))).select(
        (F.col("doc_id") * 100 + F.col("r") + 10_000_000).alias("doc_id"),
        F.lit(13.40).alias("lon"),
        F.lit(52.52).alias("lat"),
        F.lit(1.0).alias("value"),
    )
    spread = geo.select("doc_id", "lon", "lat", F.lit(2.0).alias("value"))
    return assign_tiles(hot.unionByName(spread), 4, 8).cache()


def test_salted_equals_plain(skewed):
    plain = (
        skewed.groupBy("z", "x", "y")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("value_sum"))
    )
    salted = salted_tile_stats(skewed, n_salts=8, value_col="value")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_detect_hot_tiles(skewed):
    hot = detect_hot_tiles(skewed, threshold=5000).toPandas()
    assert len(hot) >= 1  # the Berlin pile at each zoom
    assert (hot["n"] > 5000).all()


def test_cap_features_deterministic(skewed):
    capped = cap_features_per_tile(skewed, max_features=100)
    sizes = capped.groupBy("z", "x", "y").count().agg(F.max("count")).collect()[0][0]
    assert sizes <= 100
    a = capped.select("z", "x", "y", "doc_id").toPandas().sort_values(
        ["z", "x", "y", "doc_id"]).reset_index(drop=True)
    b = cap_features_per_tile(skewed, max_features=100).select(
        "z", "x", "y", "doc_id").toPandas().sort_values(
        ["z", "x", "y", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_overzoom_lookup_climbing(spark, sf_dir):
    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    # tile table with z3 and z5 levels (z4 missing -> climbing skips it)
    t3 = render_point_tiles(assign_tiles(geo, 3, 3))
    t5 = render_point_tiles(assign_tiles(geo, 5, 5))
    tiles = t3.unionByName(t5).cache()
    # request all z6 children of existing z5 tiles plus one orphan
    kids = tiles.filter("z = 5").select(
        (F.col("x") * 2).alias("x"), (F.col("y") * 2).alias("y")
    )
    out = overzoom_lookup(kids, tiles, target_zoom=6, max_climb=3).toPandas()
    assert len(out) == kids.count()
    # every request resolves to its z5 parent (climb 0), never z3
    assert (out["parent_z"] == 5).all()
    # remove z5 -> resolves by climbing to z3
    out2 = overzoom_lookup(kids, t3, target_zoom=6, max_climb=3).toPandas()
    assert (out2["parent_z"] == 3).all()
    assert len(out2) == len(out)


def test_sample_windows(spark, sf_dir):
    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    tiles = render_point_tiles(assign_tiles(geo, 6, 6)).cache()
    sampled = sample_windows(tiles, window_size=8, keep_ratio=0.3)
    n_all, n_s = tiles.count(), sampled.count()
    assert 0 < n_s < n_all
    # deterministic
    assert sample_windows(tiles, 8, 0.3).count() == n_s
