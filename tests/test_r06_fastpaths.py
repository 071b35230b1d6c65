"""Round-6 optimization guards: the hot-path twins must stay
byte/value-identical to the generic forms they replaced."""

import random

from versatiles_rs_spark.functions.geometry import clip_polygon_sh
from versatiles_rs_spark.functions.mvt import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    _encode_geometry_bytes,
    _varint,
    encode_geometry,
)


def test_fused_geometry_bytes_identical_randomized():
    rng = random.Random(42)
    for _ in range(5000):
        gt = rng.choice([GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON])
        rings = []
        for _ in range(rng.randint(1, 4)):
            n = rng.randint(0, 8)
            ring = [
                (rng.randint(-5000, 70000), rng.randint(-5000, 70000))
                for _ in range(n)
            ]
            if ring and rng.random() < 0.5:
                ring.append(ring[0])  # closed ring form
            rings.append(ring)
        generic = b"".join(_varint(g) for g in encode_geometry(gt, rings))
        assert _encode_geometry_bytes(gt, rings) == generic


def _clip_reference(ring, x0, y0, x1, y1):
    """The pre-fast-path SH: four passes unconditionally."""
    def clip_edge(pts, inside, intersect):
        out = []
        if not pts:
            return out
        prev, prev_in = pts[-1], inside(pts[-1])
        for cur in pts:
            cur_in = inside(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect(prev, cur))
            prev, prev_in = cur, cur_in
        return out

    def ix_x(xb):
        return lambda p, q: (xb, p[1] + (xb - p[0]) / (q[0] - p[0]) * (q[1] - p[1]))

    def ix_y(yb):
        return lambda p, q: (p[0] + (yb - p[1]) / (q[1] - p[1]) * (q[0] - p[0]), yb)

    pts = list(ring)
    if pts and pts[0] == pts[-1]:
        pts = pts[:-1]
    pts = clip_edge(pts, lambda p: p[0] >= x0, ix_x(x0))
    pts = clip_edge(pts, lambda p: p[0] <= x1, ix_x(x1))
    pts = clip_edge(pts, lambda p: p[1] >= y0, ix_y(y0))
    pts = clip_edge(pts, lambda p: p[1] <= y1, ix_y(y1))
    return pts


def test_clip_bbox_fastpath_identical_randomized():
    rng = random.Random(7)
    lo, hi = -80.0 / 4096, 1.0 + 80.0 / 4096
    for _ in range(5000):
        n = rng.randint(3, 9)
        # mix of interior-only, crossing, and fully-outside rings
        scale = rng.choice([0.3, 1.0, 3.0])
        cx, cy = rng.uniform(-1, 2), rng.uniform(-1, 2)
        ring = [
            (cx + rng.uniform(-0.5, 0.5) * scale, cy + rng.uniform(-0.5, 0.5) * scale)
            for _ in range(n)
        ]
        if rng.random() < 0.5:
            ring.append(ring[0])
        assert clip_polygon_sh(ring, lo, lo, hi, hi) == _clip_reference(
            ring, lo, lo, hi, hi
        )
