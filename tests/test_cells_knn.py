"""Cell cover, cell-join PIP, and kNN (bruteforce == cell-ring == numpy oracle)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.spatial import pip_join, sample_polygons
from versatiles_rs_spark.spatial.cells import pip_join_cells, point_cells, polygon_cell_cover
from versatiles_rs_spark.spatial.knn import knn_bruteforce, knn_cell_ring
from versatiles_rs_spark.spatial.pip import FULLY_INSIDE, PARTIAL


@pytest.fixture(scope="module")
def pts_df(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(5000),
            "lon": rng.uniform(-180, 180, 5000),
            "lat": rng.uniform(-85, 85, 5000),
        }
    )
    return spark.createDataFrame(pdf).cache(), pdf


def test_polygon_cell_cover_partition():
    poly = sample_polygons()[0]  # eurasia_box
    ids, classes = polygon_cell_cover(poly, zoom=6)
    assert len(ids) == len(set(ids.tolist()))  # disjoint cells
    assert (classes == FULLY_INSIDE).sum() > 0
    assert (classes == PARTIAL).sum() > 0


def test_pip_join_cells_matches_broadcast(spark, pts_df):
    df, _ = pts_df
    a = pip_join(df, sample_polygons()).select("doc_id", "feature_id")
    b = pip_join_cells(df, sample_polygons(), cell_zoom=6).select("doc_id", "feature_id")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_knn_bruteforce_matches_numpy(spark, pts_df):
    df, pdf = pts_df
    queries = [(0, 13.4, 52.5), (1, -100.0, 40.0), (2, 179.0, -80.0)]
    k = 7
    got = knn_bruteforce(df, queries, k).toPandas().sort_values(["qid", "rank"])
    for qid, qlon, qlat in queries:
        d2 = (pdf["lon"].values - qlon) ** 2 + (pdf["lat"].values - qlat) ** 2
        order = np.lexsort((pdf["doc_id"].values, d2))
        want = pdf["doc_id"].values[order[:k]]
        sub = got[got["qid"] == qid]
        np.testing.assert_array_equal(sub["pid"].values, want)
        np.testing.assert_allclose(sub["dist2"].values, np.round(np.sort(d2)[:k], 9))


def test_knn_cell_ring_matches_bruteforce(spark, pts_df):
    df, _ = pts_df
    queries = [(0, 13.4, 52.5), (1, -100.0, 40.0), (2, 0.0, -84.9)]
    k = 5
    a = knn_bruteforce(df, queries, k).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    b = knn_cell_ring(df, queries, k, cell_zoom=5).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["qid", "pid", "rank"]], b[["qid", "pid", "rank"]])


def test_point_cells_key_range(spark, pts_df):
    df, _ = pts_df
    z = 4
    out = point_cells(df, z).agg(F.min("cell_id"), F.max("cell_id")).collect()[0]
    offset = (4**z - 1) // 3
    assert out[0] >= offset
    assert out[1] < offset + 4**z
