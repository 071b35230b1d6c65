"""Point-in-polygon: ray-cast parity, tile classification, join semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.spatial import (
    Polygon,
    classify_tiles,
    pip_contains_np,
    pip_join,
    sample_polygons,
)
from versatiles_rs_spark.spatial.pip import FULLY_INSIDE, FULLY_OUTSIDE, PARTIAL


def _unit_square() -> Polygon:
    return Polygon(1, "sq", "box", [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]])


def test_pip_basic():
    sq = _unit_square()
    px = np.array([5.0, 15.0, -1.0, 5.0])
    py = np.array([5.0, 5.0, 5.0, 15.0])
    got = pip_contains_np(px, py, sq.edges())
    assert got.tolist() == [True, False, False, False]


def test_pip_boundary_rule_half_open():
    """Strict > / < comparisons (mask_geometry.rs:85): points on the left/
    bottom edge are IN, on the right/top edge are OUT — every point lands in
    exactly one tile of a partition, never two."""
    sq = _unit_square()
    edges = sq.edges()
    # left edge x=0: ray crosses right edge only -> inside
    assert pip_contains_np(np.array([0.0]), np.array([5.0]), edges)[0]
    # right edge x=10: px < x_at_y is false for its own edge -> outside
    assert not pip_contains_np(np.array([10.0]), np.array([5.0]), edges)[0]
    # bottom-left corner
    assert pip_contains_np(np.array([0.0]), np.array([0.0]), edges)[0]
    # top-left corner y=10: both top edges fail the strict y straddle -> out
    assert not pip_contains_np(np.array([0.0]), np.array([10.0]), edges)[0]


def test_pip_concave():
    arrow = next(p for p in sample_polygons() if p.name == "concave_arrow")
    # the notch (90, -15) is outside; (70, -45) inside left prong
    got = pip_contains_np(np.array([90.0, 70.0]), np.array([-15.0, -45.0]), arrow.edges())
    assert got.tolist() == [False, True]


def test_pip_matches_matplotlib_oracle():
    """Cross-check vs an independent implementation (matplotlib.path)."""
    mpl = pytest.importorskip("matplotlib.path")
    rng = np.random.default_rng(11)
    px = rng.uniform(-180, 180, 4000)
    py = rng.uniform(-85, 85, 4000)
    for poly in sample_polygons():
        ours = pip_contains_np(px, py, poly.edges())
        path = mpl.Path(np.array(poly.rings[0] + [poly.rings[0][0]]))
        theirs = path.contains_points(np.c_[px, py])
        disagree = ours != theirs
        # allow disagreement only exactly on the boundary (measure-zero set;
        # random doubles never land there)
        assert disagree.sum() == 0, f"{poly.name}: {disagree.sum()} mismatches"


def test_classify_tiles():
    sq = Polygon(1, "sq", "box", [[(-90.0, -60.0), (90.0, -60.0), (90.0, 60.0), (-90.0, 60.0)]])
    z = 3
    xs, ys = np.meshgrid(np.arange(8), np.arange(8))
    cls = classify_tiles(z, xs.ravel(), ys.ravel(), sq)
    assert set(cls.tolist()) <= {FULLY_OUTSIDE, PARTIAL, FULLY_INSIDE}
    # x=0 column (lon [-180,-135], strictly west of the box) is fully outside
    # (x=1 touches the box's left edge at lon=-90, which the half-open rule
    # counts as inside, so that column is correctly PARTIAL)
    far_west = xs.ravel() == 0
    assert (cls[far_west] == FULLY_OUTSIDE).all()
    # the center tiles are fully inside
    center = (xs.ravel() == 4) & (ys.ravel() == 3)
    assert (cls[center] == FULLY_INSIDE).all()
    # classification is conservative: FULLY_INSIDE tiles have all corners in
    from versatiles_rs_spark.tile_math.coords import tile_geo_bbox_np

    for flag, x, y in zip(cls, xs.ravel(), ys.ravel()):
        w, s, e, n = (a[0] for a in tile_geo_bbox_np(z, np.array([x]), np.array([y])))
        corners_in = pip_contains_np(
            np.array([w, e, e, w]), np.array([s, s, n, n]), sq.edges()
        )
        if flag == FULLY_INSIDE:
            assert corners_in.all()
        if flag == FULLY_OUTSIDE:
            assert not corners_in.any()


def test_pip_join_dataframe(spark):
    import pandas as pd

    pts = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "lon": [13.0, -100.0, 90.0, 0.0],
            "lat": [52.0, 0.0, -15.0, -89.0],
        }
    )
    df = spark.createDataFrame(pts)
    out = pip_join(df, sample_polygons()).toPandas()
    by_doc = out.groupby("doc_id")["poly_name"].apply(list).to_dict()
    assert by_doc[0] == ["eurasia_box"]  # Berlin
    assert by_doc[1] == ["america_box"]
    assert 2 not in by_doc  # notch of the concave arrow
    assert 3 not in by_doc  # southern ocean
    left = pip_join(df, sample_polygons(), how="left").toPandas()
    assert len(left) == 4
    assert left.loc[left["doc_id"] == 2, "feature_id"].isna().all()


def test_pip_join_multi_polygon_membership(spark):
    """A point in k polygons yields k rows (sliver overlaps africa_tri)."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "lon": [6.0], "lat": [0.0]}))
    out = pip_join(df, sample_polygons()).toPandas()
    assert sorted(out["poly_name"]) == ["africa_tri", "sliver"]
