"""Trajectory similarity: Hausdorff distance between point sets.

The similarity-join step over trajectories (which users/vehicles moved
alike?): for a PAIR TABLE of candidate (u, v) trajectories, compute the
directed Hausdorff distances h(A→B) = max_{a∈A} min_{b∈B} d²(a, b) and
h(B→A), plus their max (the symmetric Hausdorff). Distances are exact
integer d² over quantized coords — no float enters the metric, so the
DuckDB oracle reproduces every value bit-for-bit.

Scale shape: pair generation is the caller's BLOCKING choice (cell
signatures, LSH over visited-cell sets, same-home-cell — any bounded-
degree rule; never all-pairs). The operator's cost is then explicit:
each trajectory is replicated once per pair it participates in (degree-
bounded), co-located by ONE hash exchange on the pair key, and the
max-min matrix math runs executor-locally in numpy blocks. Nothing in
the plan scales with users², only with |pairs| x points-per-trajectory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_HAUS = StructType(
    [
        StructField("u", LongType()),
        StructField("v", LongType()),
        StructField("h_ab", LongType()),
        StructField("h_ba", LongType()),
        StructField("h_sym", LongType()),
    ]
)


def hausdorff_pairs(points: DataFrame, pairs: DataFrame) -> DataFrame:
    """Hausdorff distances for candidate trajectory pairs.

    ``points``: (user, qx, qy) integer quantized coords, one row per
    trajectory point. ``pairs``: (u, v) candidate pairs from the
    caller's blocking rule. Output: (u, v, h_ab, h_ba, h_sym) exact
    int64 squared distances; pairs where either side has no points are
    dropped.

    Plan: the (small, blocked) pair table broadcast-joins the point
    table twice — side A on u, side B on v — the union hashes ONCE on
    (u, v), and applyInPandas computes the (|A| x |B|) integer distance
    matrix per pair. Long trajectories stream through numpy in row
    blocks, so memory per task is O(block x |B|), not |A| x |B|.
    """
    a = (
        pairs.join(points, pairs["u"] == points["user"])
        .select("u", "v", F.lit(0).alias("side"), "qx", "qy")
    )
    b = (
        pairs.join(points, pairs["v"] == points["user"])
        .select("u", "v", F.lit(1).alias("side"), "qx", "qy")
    )

    def per_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        asel = pdf["side"].values == 0
        ax = pdf["qx"].values[asel].astype(np.int64)
        ay = pdf["qy"].values[asel].astype(np.int64)
        bx = pdf["qx"].values[~asel].astype(np.int64)
        by = pdf["qy"].values[~asel].astype(np.int64)
        if not len(ax) or not len(bx):
            return pd.DataFrame({f.name: [] for f in _HAUS.fields}).astype("int64")
        # blocked max-min: min over the other side per point, then max
        def directed(px, py, qx, qy, block=2048):
            worst = np.int64(0)
            for i in range(0, len(px), block):
                dx = px[i:i + block, None] - qx[None, :]
                dy = py[i:i + block, None] - qy[None, :]
                worst = max(worst, (dx * dx + dy * dy).min(axis=1).max())
            return int(worst)

        h_ab = directed(ax, ay, bx, by)
        h_ba = directed(bx, by, ax, ay)
        return pd.DataFrame(
            {
                "u": [int(pdf["u"].iloc[0])],
                "v": [int(pdf["v"].iloc[0])],
                "h_ab": [h_ab],
                "h_ba": [h_ba],
                "h_sym": [max(h_ab, h_ba)],
            }
        )

    return a.unionByName(b).groupBy("u", "v").applyInPandas(per_pair, _HAUS)
