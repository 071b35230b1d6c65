"""S2 cell ids (tile_math/s2.py): structure, hierarchy, locality.

The face/UV/ST math is oracle-checked by the driver (s2_face_ij query);
the Hilbert position is pinned here by the invariants that define it:
bijectivity on a face, prefix hierarchy (parent = child prefix), curve
adjacency (consecutive positions are edge-neighbor cells), and the
standard id bit layout (trailing-one marker at 2*(30-level)).
"""

from __future__ import annotations

import numpy as np
import pytest

from versatiles_rs_spark.tile_math.s2 import (
    cell_id_level,
    cell_id_parent,
    face_ij_to_cell_id,
    lonlat_to_face_uv,
    s2_cell_id_np,
    st_to_ij,
    uv_to_st,
)


def test_face_selection_cardinal_points():
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    face, u, v = lonlat_to_face_uv(lon, lat)
    assert face.tolist() == [0, 1, 2, 3, 4, 5]
    np.testing.assert_allclose(u, 0, atol=1e-12)
    np.testing.assert_allclose(v, 0, atol=1e-12)


def test_st_projection_monotone_and_centered():
    u = np.linspace(-1, 1, 1001)
    s = uv_to_st(u)
    assert (np.diff(s) > 0).all()
    assert s[0] == 0.0 and s[-1] == 1.0
    assert abs(uv_to_st(np.array([0.0]))[0] - 0.5) < 1e-15


def test_id_bit_layout_and_level():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89.9, 89.9, 500)
    for level in (0, 5, 12, 30):
        ids = s2_cell_id_np(lon, lat, level).astype(np.uint64)
        lsb = ids & (~ids + np.uint64(1))
        assert (lsb == np.uint64(1 << (2 * (30 - level)))).all()
        assert (cell_id_level(ids.astype(np.int64)) == level).all()
        assert ((ids >> np.uint64(61)) <= 5).all()  # face bits


def test_prefix_hierarchy():
    rng = np.random.default_rng(8)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-89.9, 89.9, 2000)
    deep = s2_cell_id_np(lon, lat, 30)
    for level in (4, 10, 20):
        direct = s2_cell_id_np(lon, lat, level)
        via_parent = cell_id_parent(deep, level)
        np.testing.assert_array_equal(direct, via_parent)


def test_hilbert_bijective_on_face():
    """Every (i,j) pair at a small level maps to a distinct position and
    positions cover 0..4^level-1 exactly (a space-filling bijection)."""
    level_bits = 5  # 32x32 grid per face
    ij = np.arange(1 << level_bits)
    ii, jj = np.meshgrid(ij, ij, indexing="ij")
    shift = 30 - level_bits
    for face in (0, 1, 4):
        ids = face_ij_to_cell_id(
            np.full(ii.size, face, dtype=np.int64),
            ii.ravel() << shift,
            jj.ravel() << shift,
            level=level_bits,
        ).astype(np.uint64)
        pos = (ids >> np.uint64(2 * (30 - level_bits) + 1)) & np.uint64((1 << (2 * level_bits)) - 1)
        assert len(set(pos.tolist())) == ii.size
        assert pos.min() == 0 and pos.max() == ii.size - 1


def test_hilbert_curve_adjacency():
    """Consecutive curve positions must be edge-adjacent (i,j) cells — the
    locality property that makes the id a good partition/sort key."""
    level_bits = 5
    ij = np.arange(1 << level_bits)
    ii, jj = np.meshgrid(ij, ij, indexing="ij")
    shift = 30 - level_bits
    ids = face_ij_to_cell_id(
        np.zeros(ii.size, dtype=np.int64), ii.ravel() << shift, jj.ravel() << shift,
        level=level_bits,
    ).astype(np.uint64)
    pos = ((ids >> np.uint64(2 * (30 - level_bits) + 1))).astype(np.int64)
    order = np.argsort(pos)
    pi, pj = ii.ravel()[order], jj.ravel()[order]
    step = np.abs(np.diff(pi)) + np.abs(np.diff(pj))
    assert (step == 1).all()  # Hilbert: every step is a unit edge move


def test_round_sphere_coverage_unique_at_depth():
    rng = np.random.default_rng(9)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-89.9, 89.9, 5000)
    ids = s2_cell_id_np(lon, lat, 30)
    assert len(set(ids.tolist())) == len(ids)  # level 30 ~ cm^2 cells


def test_column_form(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    from versatiles_rs_spark.tile_math.s2 import s2_cell_id_col

    pdf = pd.DataFrame({"lon": [0.0, 13.4, -74.0], "lat": [0.0, 52.5, 40.7]})
    df = spark.createDataFrame(pdf).withColumn("cell", s2_cell_id_col(F.col("lon"), F.col("lat"), 12))
    got = np.array([r["cell"] for r in df.orderBy("lon").collect()])
    want = s2_cell_id_np(np.array([-74.0, 0.0, 13.4]), np.array([40.7, 0.0, 52.5]), 12)
    np.testing.assert_array_equal(got, want)
