"""Space-filling-curve keys: Hilbert, Morton (z-order), quadkey.

Hilbert semantics mirror versatiles_core/src/utils/tile_hilbert_index.rs:85-160
(zoom levels stack: all tiles of zooms < z precede zoom z; within a zoom the
canonical iterative Hilbert d-index). All functions are numpy-vectorized so
they run inside Arrow batches; `hilbert_index_np` is the clustering key used
for locality-preserving writes (pmtiles-style ordering).
"""

from __future__ import annotations

import numpy as np


def _level_offset(z: int) -> int:
    """Sum of 4^t for t < z — tiles in all coarser zoom levels."""
    return ((1 << (2 * z)) - 1) // 3


def hilbert_index_np(z: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(z, x, y) -> 64-bit Hilbert position (tile_hilbert_index.rs:85-123).

    Vectorized port of the canonical iterative algorithm incl. the
    rotate/reflect step; ~50M coords/sec/core.
    """
    tx = np.asarray(x, dtype=np.int64).copy()
    ty = np.asarray(y, dtype=np.int64).copy()
    size = np.int64(1) << z
    if np.any((tx < 0) | (tx >= size) | (ty < 0) | (ty >= size)):
        raise ValueError("tile x/y outside zoom level bounds")
    d = np.zeros_like(tx)
    s = size >> 1
    while s > 0:
        rx = ((tx & s) > 0).astype(np.int64)
        ry = ((ty & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate (tile_hilbert_index.rs:125-134): only where ry == 0
        m = ry == 0
        flip = m & (rx == 1)
        tx[flip] = s - 1 - tx[flip]
        ty[flip] = s - 1 - ty[flip]
        swap_x = tx[m].copy()
        tx[m] = ty[m]
        ty[m] = swap_x
        s >>= 1
    return d + _level_offset(z)


def hilbert_to_coord_np(index: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of ``hilbert_index_np`` (tile_hilbert_index.rs:143-…)."""
    index = np.asarray(index, dtype=np.int64)
    # zoom level = largest z whose cumulative offset is <= index
    z = np.zeros_like(index)
    for t_z in range(1, 32):
        z[index >= _level_offset(t_z)] = t_z
    t = index - np.array([_level_offset(int(v)) for v in z], dtype=np.int64)
    tx = np.zeros_like(index)
    ty = np.zeros_like(index)
    max_n = np.int64(1) << z
    s = np.ones_like(index)
    active = s < max_n
    while active.any():
        rx = np.where(active, (t >> 1) & 1, 0)
        ry = np.where(active, (t ^ rx) & 1, 0)
        # rotate
        m = active & (ry == 0)
        flip = m & (rx == 1)
        tx[flip] = s[flip] - 1 - tx[flip]
        ty[flip] = s[flip] - 1 - ty[flip]
        sw = tx[m].copy()
        tx[m] = ty[m]
        ty[m] = sw
        tx[active & (rx == 1)] += s[active & (rx == 1)]
        ty[active & (ry == 1)] += s[active & (ry == 1)]
        t = np.where(active, t >> 2, t)
        s = np.where(active, s << 1, s)
        active = s < max_n
    return z.astype(np.int8), tx, ty


def zorder_index_np(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton interleave of two ≤31-bit coords (tile_bbox/iter_zorder.rs
    semantics: x gets the even bits, y the odd bits)."""
    def _part1by1(v: np.ndarray) -> np.ndarray:
        v = np.asarray(v, dtype=np.uint64)
        v &= np.uint64(0xFFFFFFFF)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    return (_part1by1(x) | (_part1by1(y) << np.uint64(1))).astype(np.int64)


def quadkey_np(z: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Bing-style quadkey strings — our S2-like hierarchical cell id (the
    XYZ tile id *is* an S2-style cell; SURVEY.md §7 Phase 1 fallback)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    out = np.full(x.shape, "", dtype=object)
    for i in range(z - 1, -1, -1):
        digit = (((x >> i) & 1) | (((y >> i) & 1) << 1)).astype(np.int8)
        out = np.char.add(out.astype(str), digit.astype(str)).astype(object)
    return out


def splitmix64_np(v: np.ndarray) -> np.ndarray:
    """splitmix64 mixer, exact wrapping semantics of reduce_points.rs:139-145.

    Returns uint64; used by the drop_rate point-reduction parity path.
    """
    with np.errstate(over="ignore"):
        x = np.asarray(v, dtype=np.uint64).copy()
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def splitmix64_unit_np(v: np.ndarray) -> np.ndarray:
    """Map ids to uniform [0,1) exactly like reduce_points.rs:130-136
    (high 53 bits / 2^53)."""
    return (splitmix64_np(v) >> np.uint64(11)).astype(np.float64) / float(1 << 53)
