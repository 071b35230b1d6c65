"""Map matching (nearest-segment snap): assign each point to the closest
segment of a road network — the trajectory-analytics primitive between
raw GPS/event points and network-level aggregation (flows per road,
speed per edge).

Reference parity: VersaTiles carries the line geometry machinery
(versatiles_geometry/src/geometry — clip/simplify over LineString) but
no network assignment; this extends the engine's spatial-join family
(PIP, cell-cover, kNN, box-box, distance, now point-to-SEGMENT).

Exactness design: point-to-segment distance needs the clamped projection
t = clamp(w.v / |v|^2, 0, 1), whose division would break cross-engine
parity. Two constraints remove all division:

- every network segment has the SAME squared length D = |v|^2, so the
  scaled distance S = D*dist^2 is a pure integer:
      c = clamp(w.v, 0, D)
      S = D*|w|^2 - c*(2*w.v - c)
  (c = w.v inside the segment gives D|w|^2 - (w.v)^2; c = 0 gives the
  distance to endpoint a; c = D gives D*|p-b|^2 — one closed form);
- coordinates quantize to MILLIDEGREES (int), so with |w| <= 4e5 and
  D <= ~1e7 every term stays far below int64 overflow.

Ties break to the lowest segment id (argmin first-min over the
id-sorted broadcast matrix == the oracle's ORDER BY s, seg_id).

Scale shape: a road network is bounded (dimension-table sized), so its
(ax, ay, vx, vy) int64 matrix broadcasts and ONE mapInPandas pass
computes the (batch x segments) argmin — zero joins, zero shuffles, the
point table streams through once (the reverse_geocode /
semantic_decontaminate shape, with segment algebra instead of centers).
For networks too large to broadcast, pre-bucket segments by tile cell
and reuse the distance_join 3x3 probe; this module is the broadcast
path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def snap_to_segments(
    points: DataFrame,
    segments: np.ndarray,
    d_sq: int,
    x_col: str = "qx",
    y_col: str = "qy",
    id_col: str = "event_id",
) -> DataFrame:
    """Snap each point to its nearest segment.

    ``segments``: int64 array of rows (seg_id, ax, ay, vx, vy) sorted by
    seg_id, with vx*vx + vy*vy == d_sq for EVERY row. Returns
    (id_col, seg_id, s_scaled) where s_scaled = d_sq * dist^2 exactly.
    """
    if segments.dtype != np.int64:
        raise ValueError("segments must be int64")
    v2 = segments[:, 3] ** 2 + segments[:, 4] ** 2
    if not (v2 == d_sq).all():
        raise ValueError("all segments must have squared length d_sq")
    if not (np.diff(segments[:, 0]) > 0).all():
        raise ValueError("segments must be sorted by seg_id")
    spark = points.sparkSession
    b = spark.sparkContext.broadcast(segments)

    def nearest(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seg = b.value
        ax, ay, vx, vy = seg[:, 1], seg[:, 2], seg[:, 3], seg[:, 4]
        for pdf in it:
            if not len(pdf):
                continue
            wx = pdf[x_col].values[:, None] - ax[None, :]
            wy = pdf[y_col].values[:, None] - ay[None, :]
            dot = wx * vx[None, :] + wy * vy[None, :]
            c = np.clip(dot, 0, d_sq)
            s = d_sq * (wx * wx + wy * wy) - c * (2 * dot - c)
            j = s.argmin(axis=1)  # first min == lowest seg_id (sorted)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "seg_id": seg[j, 0],
                    "s_scaled": s[np.arange(len(j)), j],
                }
            )

    return points.mapInPandas(nearest, f"{id_col} bigint, seg_id bigint, s_scaled bigint")
