"""S2 cell ids (the real thing, not the quadkey stand-in).

Implements the public S2 geometry cell-id scheme end to end, vectorized in
numpy: lat/lng -> unit sphere -> cube face (+ per-face UV), the QUADRATIC
ST projection (the curvature-equalizing variant the S2 library defaults
to), 30-bit IJ discretization, and the per-face Hilbert traversal with
the canonical orientation tables (swap/invert masks), producing the
standard 64-bit id layout: 3 face bits, 2*level position bits, a trailing
1 marker bit, zero-padded — so ids are lexicographically sortable,
hierarchy is prefix truncation, and containment is a range test.

This is the second true spatial index next to the XYZ/quadkey cells
(spatial/cells.py); both serve as partition/bucket keys for the
cell-cover joins. DuckDB can express the face/UV/ST/IJ math in SQL (the
driver oracle checks it); the Hilbert position is property-tested
(bijectivity, prefix hierarchy, curve adjacency) in tests/test_s2.py.

North-rule anchor: "pages are geocoded, encoded into H3/S2 cells and XYZ
tile coordinates via batched pandas/Arrow UDFs".
"""

from __future__ import annotations

import numpy as np

# Hilbert orientation machinery (public S2 constants)
_SWAP, _INVERT = 1, 2
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical order
        [0, 2, 3, 1],  # swap
        [3, 2, 0, 1],  # invert
        [3, 1, 0, 2],  # swap + invert
    ],
    dtype=np.int64,
)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p
_POS_TO_ORIENTATION = np.array([_SWAP, 0, 0, _SWAP | _INVERT], dtype=np.int64)

_MAX_LEVEL = 30


def lonlat_to_face_uv(lon: np.ndarray, lat: np.ndarray):
    """(lon, lat) degrees -> (face 0..5, u, v) on the unit cube."""
    phi = np.radians(lat)
    theta = np.radians(lon)
    x = np.cos(phi) * np.cos(theta)
    y = np.cos(phi) * np.sin(theta)
    z = np.sin(phi)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az), 0, np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [y / x, -x / y, -x / z, z / x, z / y, -y / z],
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [z / x, z / y, -y / z, y / x, -x / y, -x / z],
        )
    return face, u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (S2_QUADRATIC_PROJECTION): equalizes cell area
    distortion across each face."""
    q = 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u))  # sqrt(1+3u) == sqrt(1-3(-u))
    return np.where(u >= 0, q, 1.0 - q)


def st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(s * (1 << _MAX_LEVEL)), 0, (1 << _MAX_LEVEL) - 1
    ).astype(np.int64)


def face_ij_to_cell_id(face: np.ndarray, i: np.ndarray, j: np.ndarray,
                       level: int = _MAX_LEVEL) -> np.ndarray:
    """Per-face Hilbert traversal -> 64-bit S2 cell id at ``level``.

    Vectorized: 30 constant-time numpy steps, each mapping the next
    (i-bit, j-bit) pair through the orientation lookup tables."""
    n = len(face)
    pos = np.zeros(n, dtype=np.int64)
    orientation = (face & _SWAP).astype(np.int64)
    for k in range(_MAX_LEVEL - 1, -1, -1):
        ibit = (i >> k) & 1
        jbit = (j >> k) & 1
        ij = 2 * ibit + jbit
        p = _IJ_TO_POS[orientation, ij]
        pos = (pos << 2) | p
        orientation = orientation ^ _POS_TO_ORIENTATION[p]
    # id layout: face(3) | pos(2*level) | 1 | zeros
    if not 0 <= level <= _MAX_LEVEL:
        raise ValueError(f"level must be 0..{_MAX_LEVEL}")
    shift = 2 * (_MAX_LEVEL - level)
    pos_l = pos >> shift if shift else pos
    with np.errstate(over="ignore"):
        out = (
            (face.astype(np.uint64) << np.uint64(61))
            | (pos_l.astype(np.uint64) << np.uint64(shift + 1))
            | np.uint64(1 << shift)
        )
    return out.astype(np.int64)  # two's-complement view for BIGINT columns


def s2_cell_id_np(lon: np.ndarray, lat: np.ndarray, level: int = _MAX_LEVEL) -> np.ndarray:
    face, u, v = lonlat_to_face_uv(np.asarray(lon, float), np.asarray(lat, float))
    i = st_to_ij(uv_to_st(u))
    j = st_to_ij(uv_to_st(v))
    return face_ij_to_cell_id(face, i, j, level)


def cell_id_level(cell_id: np.ndarray) -> np.ndarray:
    """Level from the trailing-one position (standard S2 lsb rule)."""
    c = cell_id.astype(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # lsb = 1 << (2*(30-level))
    shift = np.zeros(len(c), dtype=np.int64)
    v = lsb.copy()
    for b in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(b))
        shift += m * b
        v = np.where(m, v >> np.uint64(b), v)
    return _MAX_LEVEL - shift // 2


def cell_id_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Prefix-truncate to an ancestor level (pure bit math)."""
    c = cell_id.astype(np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (_MAX_LEVEL - level))
    with np.errstate(over="ignore"):
        # (id & -lsb) | lsb: clear all bits below the new lsb, set the marker
        return ((c & ~(lsb - np.uint64(1))) | lsb).astype(np.int64)


def s2_cell_id_col(lon_col, lat_col, level: int = 12):
    """Column form via one Arrow-batched pandas UDF (the batched-UDF
    geocode path the north rule names)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def _s2(lon, lat):
        return pd.Series(s2_cell_id_np(lon.values, lat.values, level))

    # no type hints: `from __future__ import annotations` stringifies them,
    # which Spark's hint introspection cannot resolve here
    udf = F.pandas_udf(_s2, "long")
    return udf(lon_col, lat_col)
