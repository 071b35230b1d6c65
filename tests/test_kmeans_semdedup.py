"""Relational Lloyd k-means, SemDeDup, and the curation funnel.

Oracle parity at sf0.01 runs in test_oracle_parity; here: equivalence to
an independent numpy reference of the same integer spec, clone
co-clustering, funnel monotonicity, and plan-shape guards.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from versatiles_rs_spark.dedup.kmeans import (
    QUANT,
    kmeans_summary,
    lloyd_kmeans,
    semdedup_pairs,
)
from versatiles_rs_spark.pages.quality_filters import filter_funnel


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _numpy_lloyd(vecs: np.ndarray, ids: np.ndarray, k: int, iters: int):
    """Independent single-node reference of the exact integer spec:
    1e6 quantization, packed (dist, cid) argmin, trunc-mean updates."""
    q = np.floor(vecs.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    order = np.argsort(ids)
    q, ids = q[order], ids[order]
    cents = {cid: q[cid].copy() for cid in range(k)}
    assign = None
    for _ in range(iters):
        cids = sorted(cents)
        dists = np.stack(
            [((q - cents[c][None, :]) ** 2).sum(axis=1) for c in cids], axis=1
        )
        # tie -> lowest cid: argmin over stable cid order
        assign = np.array([cids[j] for j in dists.argmin(axis=1)])
        new = {}
        for c in cids:
            m = q[assign == c]
            if len(m):
                s = m.sum(axis=0)
                new[c] = np.where(s < 0, -((-s) // len(m)), s // len(m))
        cents = new
    return ids, assign, cents


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = np.array(tbl["vec_id"])
    vecs = np.array([np.array(v) for v in tbl["embedding"].to_pylist()])
    ref_ids, ref_assign, ref_cents = _numpy_lloyd(vecs, ids, k=8, iters=2)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, cents = lloyd_kmeans(emb, k=8, iters=2)
    got = {r["vec_id"]: r["cid"] for r in assigned.select("vec_id", "cid").collect()}
    want = dict(zip(ref_ids.tolist(), ref_assign.tolist()))
    assert got == want
    for cid, cv in cents:
        assert np.array_equal(np.array(cv), ref_cents[cid]), cid


def test_kmeans_assignment_is_zero_shuffle(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, _ = lloyd_kmeans(emb, k=4, iters=1)
    plan = _plan(assigned)
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_kmeans_summary_covers_all_rows(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, cents = lloyd_kmeans(emb, k=8, iters=2)
    total = emb.count()
    summary = kmeans_summary(assigned, cents).collect()
    assert sum(r["n_members"] for r in summary) == total
    assert len(summary) <= 8


def test_semdedup_clones_cocluster_and_pair(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clones = emb.filter("vec_id % 50 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(clones)
    n_clones = clones.count()
    pairs = semdedup_pairs(aug, k=8, iters=2).collect()
    # identical vectors MUST co-cluster (same argmin) -> every clone pair found
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    expected = {(i, i + 100000) for i in range(0, 500, 50)}
    assert expected <= found
    # at sf0.01 the natural max within-cluster cosine is ~0.51: no extras
    assert found == expected
    assert len(found) == n_clones
    for r in pairs:
        assert r["qdot"] >= 950_000_000_000


def test_kmeans_k_exceeds_rows(spark):
    """k > n: init takes what exists; every row is its own seed cluster."""
    import pandas as pd

    rows = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]],
    })
    df = spark.createDataFrame(rows)
    assigned, cents = lloyd_kmeans(df, k=8, iters=2)
    got = {r["vec_id"]: r["cid"] for r in assigned.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    assert [c for c, _ in cents] == [0, 1, 2]


def test_funnel_monotone_and_consistent(spark, docs, sf_dir):
    rows = {r["stage"]: r for r in filter_funnel(docs).collect()}
    assert set(rows) == {"all", "c4", "c4_gopher", "c4_gopher_dedup"}
    n = [rows[s]["n_docs"] for s in ("all", "c4", "c4_gopher", "c4_gopher_dedup")]
    t = [rows[s]["n_tokens"] for s in ("all", "c4", "c4_gopher", "c4_gopher_dedup")]
    assert n == sorted(n, reverse=True)
    assert t == sorted(t, reverse=True)
    assert n[0] == docs.count()
    # stage counts agree with the standalone operators
    from versatiles_rs_spark.pages.quality_filters import c4_filter, gopher_filter

    c4 = c4_filter(docs).where("c4_keep").count()
    assert rows["c4"]["n_docs"] == c4
    both = (
        c4_filter(docs)
        .join(gopher_filter(docs), "doc_id")
        .where("c4_keep AND gopher_keep")
        .count()
    )
    assert rows["c4_gopher"]["n_docs"] == both


def test_funnel_dedup_stage_drops_only_duplicates(spark):
    rows = [
        (0, "alpha beta gamma delta " * 8),
        (1, "alpha beta gamma delta " * 8),  # same normalized text as 0
        (2, "epsilon zeta eta theta " * 8),
    ]
    docs = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id bigint, text string"
    )
    out = {r["stage"]: r for r in filter_funnel(docs).collect()}
    surv2 = out.get("c4_gopher")
    surv3 = out.get("c4_gopher_dedup")
    if surv2 and surv3:
        # dedup can only remove the duplicate of doc 0/1, never doc 2
        assert surv2["n_docs"] - surv3["n_docs"] in (0, 1)
