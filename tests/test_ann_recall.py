"""ANN quality: recall@k of the approximate paths (LSH / IVF / IVF-PQ)
against exact brute force on CLUSTERED random vectors — the regime the
bucketed indexes are built for. The oracle fixtures prove exactness on
the sf tables; this proves the approximate trade-off is sane."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from versatiles_rs_spark.dedup.embedding import ann_ivf_topk, ann_lsh_topk
from versatiles_rs_spark.dedup.pq import ann_ivfpq_topk

N, DIM, K = 1500, 32, 10
QUERY_IDS = [3, 117, 256, 901, 1404]


def _clustered_vectors() -> np.ndarray:
    rng = np.random.default_rng(1234)
    centers = rng.normal(size=(12, DIM)) * 4.0
    assign = rng.integers(0, 12, size=N)
    return centers[assign] + rng.normal(size=(N, DIM))


@pytest.fixture(scope="module")
def vecs(spark):
    v = _clustered_vectors()
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(N), "embedding": [r.astype(float).tolist() for r in v]})
    )
    return df.cache(), v


def _exact_topk(v: np.ndarray, qid: int) -> set[int]:
    # same integer micro-quantization as the engine's scorer
    # the engine quantizes at 1e6 per side with half-away-from-zero
    # rounding (embedding._quantized / SQL round semantics)
    q = (np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)).astype(np.int64)
    dots = q @ q[qid]
    dots[qid] = -(2**62)  # engine paths exclude self (int64-min would
    # overflow under the -dots sort key)
    order = np.lexsort((np.arange(len(dots)), -dots))  # dot desc, vid asc
    return set(order[:K].tolist())


def _recall(df, v) -> float:
    got: dict[int, set[int]] = {}
    for r in df.collect():
        got.setdefault(r["qid"], set()).add(r["vid"])
    total = 0.0
    for qid in QUERY_IDS:
        exact = _exact_topk(v, qid)
        inter = len(got.get(qid, set()) & exact)
        total += inter / K
    return total / len(QUERY_IDS)


def test_lsh_recall(vecs):
    df, v = vecs
    r = _recall(ann_lsh_topk(df, QUERY_IDS, k=K, n_planes=6, n_tables=8), v)
    assert r >= 0.7, r


def test_ivf_recall_and_exhaustive_exactness(vecs):
    df, v = vecs
    r = _recall(ann_ivf_topk(df, QUERY_IDS, k=K, n_cells=12, nprobe=4), v)
    assert r >= 0.7, r
    # nprobe == n_cells degenerates to exact brute force
    r_full = _recall(ann_ivf_topk(df, QUERY_IDS, k=K, n_cells=12, nprobe=12), v)
    assert r_full >= 0.999, r_full


def test_ivfpq_recall(vecs):
    df, v = vecs
    r = _recall(
        ann_ivfpq_topk(df, QUERY_IDS, k=K, n_cells=12, nprobe=6, m_sub=8,
                       n_codes=32, refine=4 * K), v)
    assert r >= 0.6, r


def test_knn_graph_recall_on_clustered_data(vecs):
    """The r3-documented knn_graph caveat was 'the uniform fixture forces
    nprobe=n_cells'. On CLUSTERED data the intended shape holds: probing
    HALF the cells recovers >= 0.9 of every vector's exact top-k edges
    (averaged), while candidate generation stays the cell-local equi-join."""
    from versatiles_rs_spark.dedup.pq import knn_graph

    df, v = vecs
    k = 5
    out = knn_graph(df, k=k, n_cells=12, nprobe=6)
    got: dict[int, set[int]] = {}
    for r in out.collect():
        got.setdefault(r["qid"], set()).add(r["vid"])
    assert len(got) == N  # every vector got neighbors
    q = (np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5)).astype(np.int64)
    rng = np.random.default_rng(7)
    probe_ids = rng.choice(N, size=150, replace=False)
    total = 0.0
    for qid in probe_ids:
        dots = q @ q[qid]
        dots[qid] = -(2**62)
        order = np.lexsort((np.arange(N), -dots))[:k]
        exact = set(int(i) for i in order)
        total += len(got[qid] & exact) / k
    assert total / len(probe_ids) >= 0.9, total / len(probe_ids)
