"""Skyline (Pareto frontier) query — the multi-criteria "best documents"
operator: keep every row not DOMINATED by another (dominated = some row
is >= in both dimensions and strictly > in at least one). The canonical
use here: corpus triage on (quality_score, freshness) — no weighting
needed, the frontier is the set of defensible picks.

Scale shape (the classic two-phase distributed skyline): phase 1 runs
the O(n log n) sweep per Arrow batch (mapInPandas, executor-local) —
a point dominated within its batch is dominated globally, so survivors
are a sound superset of the skyline. On independent dims the expected
frontier of n points is O(log n), so phase 2's input is tiny: ONE group
(constant key) re-runs the same sweep exactly. No self-join, no n²
stage, one exchange of candidate-sized data.

Dominance ties are exact-set semantics: duplicate points dominate
neither each other (no strict inequality), so BOTH survive — the sweep
keeps every point matching its d1-group's max d2, matching the oracle's
NOT EXISTS definition bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _skyline_mask(d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    """Boolean mask of the maximizing skyline via the sort sweep:
    process d1 groups in descending order; a point survives iff its d2
    equals its group's max AND that max strictly exceeds every
    higher-d1 group's max."""
    o = np.lexsort((-d2, -d1))
    s1, s2 = d1[o], d2[o]
    newg = np.empty(len(s1), dtype=bool)
    newg[0] = True
    newg[1:] = s1[1:] != s1[:-1]
    gid = np.cumsum(newg) - 1
    gm = s2[newg]  # per-group max d2 (d2 sorted desc within group)
    prev = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(gm)[:-1])
    )
    keep_sorted = (s2 == gm[gid]) & (gm[gid] > prev[gid])
    mask = np.zeros(len(d1), dtype=bool)
    mask[o[keep_sorted]] = True
    return mask


def skyline(points: DataFrame, id_col: str = "id", d1_col: str = "d1",
            d2_col: str = "d2") -> DataFrame:
    """Two-phase maximizing skyline over integer dimensions.
    Input: (id, d1, d2). Output: the non-dominated rows."""
    cols = [id_col, d1_col, d2_col]

    def local(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            m = _skyline_mask(
                pdf[d1_col].values.astype(np.int64),
                pdf[d2_col].values.astype(np.int64),
            )
            yield pdf.loc[m, cols]

    schema = ", ".join(f"{c} bigint" for c in cols)
    cand = points.select(*cols).mapInPandas(local, schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        m = _skyline_mask(
            pdf[d1_col].values.astype(np.int64),
            pdf[d2_col].values.astype(np.int64),
        )
        return pdf.loc[m, cols]

    return (
        cand.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(lambda pdf: final(pdf), schema)
    )
