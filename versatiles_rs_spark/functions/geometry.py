"""Geometry primitives for the feature-tiling cascade (SURVEY.md §2.6).

Mirrors versatiles_geometry/src/feature_import/tile_render.rs and
arc_graph/simplify.rs semantics:

- ``simplify_dp``        : Douglas-Peucker polyline simplification
  (chained per-zoom tolerances in the cascade).
- ``clip_polygon_sh``    : Sutherland-Hodgman polygon clipping against an
  axis-aligned box (tile_render.rs:112 per-ring).
- ``clip_line_lb``       : Liang-Barsky line-segment clipping; a polyline
  splits into multiple parts where it exits the box (tile_render.rs:210).
- ``quantize_ring``      : snap to the 4096 tile grid + drop degenerate
  results (<2 distinct vertices for lines, <3 for rings +
  zero-area check — tile_render.rs:74-92).
- ``ring_area2``         : signed doubled area (winding; reverse to spec).

Pure Python/numpy — these run inside Arrow batches in the from_geo render.
"""

from __future__ import annotations

import math

Pt = tuple[float, float]


def simplify_dp(points: list[Pt], tolerance: float) -> list[Pt]:
    """Douglas-Peucker; keeps endpoints; iterative stack (no recursion
    limits on long coastlines)."""
    n = len(points)
    if n <= 2 or tolerance <= 0:
        return list(points)
    keep = [False] * n
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    t2 = tolerance * tolerance
    while stack:
        a, b = stack.pop()
        ax, ay = points[a]
        bx, by = points[b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        best = -1.0
        best_i = -1
        for i in range(a + 1, b):
            px, py = points[i]
            if seg2 == 0:
                d2 = (px - ax) ** 2 + (py - ay) ** 2
            else:
                t = ((px - ax) * dx + (py - ay) * dy) / seg2
                t = 0.0 if t < 0 else (1.0 if t > 1 else t)
                qx, qy = ax + t * dx, ay + t * dy
                d2 = (px - qx) ** 2 + (py - qy) ** 2
            if d2 > best:
                best = d2
                best_i = i
        if best > t2:
            keep[best_i] = True
            stack.append((a, best_i))
            stack.append((best_i, b))
    return [p for p, k in zip(points, keep) if k]


def clip_polygon_sh(ring: list[Pt], x0: float, y0: float, x1: float, y1: float) -> list[Pt]:
    """Sutherland-Hodgman against [x0,x1]x[y0,y1]; returns possibly-empty
    clipped ring (unclosed)."""
    def clip_edge(pts: list[Pt], inside, intersect) -> list[Pt]:
        out: list[Pt] = []
        if not pts:
            return out
        prev = pts[-1]
        prev_in = inside(prev)
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

    def ix_at_x(xb):
        def f(p, q):
            t = (xb - p[0]) / (q[0] - p[0])
            return (xb, p[1] + t * (q[1] - p[1]))

        return f

    def ix_at_y(yb):
        def f(p, q):
            t = (yb - p[1]) / (q[1] - p[1])
            return (p[0] + t * (q[0] - p[0]), yb)

        return f

    pts = list(ring)
    if pts and pts[0] == pts[-1]:
        pts = pts[:-1]
    # Fast path (round-6): a ring entirely inside the box is its own clip
    # — every SH pass keeps every vertex in order, so the output equals
    # the input exactly. The bbox test is four C-level min/max scans vs
    # four Python clip passes; most candidate rings at deep zooms are
    # interior to their (buffered) tile.
    if pts:
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        if min(xs) >= x0 and max(xs) <= x1 and min(ys) >= y0 and max(ys) <= y1:
            return pts
    pts = clip_edge(pts, lambda p: p[0] >= x0, ix_at_x(x0))
    pts = clip_edge(pts, lambda p: p[0] <= x1, ix_at_x(x1))
    pts = clip_edge(pts, lambda p: p[1] >= y0, ix_at_y(y0))
    pts = clip_edge(pts, lambda p: p[1] <= y1, ix_at_y(y1))
    return pts


def clip_line_lb(line: list[Pt], x0: float, y0: float, x1: float, y1: float) -> list[list[Pt]]:
    """Liang-Barsky per segment; consecutive surviving segments chain into
    parts (a polyline leaving and re-entering the box splits)."""
    parts: list[list[Pt]] = []
    cur: list[Pt] = []
    for i in range(len(line) - 1):
        (ax, ay), (bx, by) = line[i], line[i + 1]
        dx, dy = bx - ax, by - ay
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in ((-dx, ax - x0), (dx, x1 - ax), (-dy, ay - y0), (dy, y1 - ay)):
            if p == 0:
                if q < 0:
                    ok = False
                    break
            else:
                t = q / p
                if p < 0:
                    t0 = max(t0, t)
                else:
                    t1 = min(t1, t)
                if t0 > t1:
                    ok = False
                    break
        if not ok:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
            continue
        pa = (ax + t0 * dx, ay + t0 * dy)
        pb = (ax + t1 * dx, ay + t1 * dy)
        if not cur:
            cur = [pa]
        elif cur[-1] != pa:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [pa]
        cur.append(pb)
        if t1 < 1.0:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
    if len(cur) >= 2:
        parts.append(cur)
    return parts


def quantize_ring(pts: list[Pt], scale: float, is_ring: bool) -> list[tuple[int, int]] | None:
    """Snap to integer grid; drop consecutive duplicates; None when
    degenerate (<2 distinct for lines, <3 + nonzero area for rings)."""
    q = [(int(math.floor(x * scale + 0.5)), int(math.floor(y * scale + 0.5))) for x, y in pts]
    out: list[tuple[int, int]] = []
    for p in q:
        if not out or out[-1] != p:
            out.append(p)
    if is_ring and len(out) >= 2 and out[0] == out[-1]:
        out.pop()
    if is_ring:
        if len(out) < 3 or ring_area2(out) == 0:
            return None
        return out
    if len(out) < 2:
        return None
    return out


def ring_area2(ring: list[tuple[int, int]] | list[Pt]) -> float:
    """Signed doubled area (positive = counter-clockwise in y-up coords)."""
    s = 0.0
    n = len(ring)
    for i in range(n):
        x0, y0 = ring[i]
        x1, y1 = ring[(i + 1) % n]
        s += x0 * y1 - x1 * y0
    return s


def mercator_length_m(line: list[Pt]) -> float:
    """Planar mercator length (for min-size filters / auto_max_zoom)."""
    return sum(
        math.hypot(line[i + 1][0] - line[i][0], line[i + 1][1] - line[i][1])
        for i in range(len(line) - 1)
    )
