"""Snapshot-incremental dedup (dedup/snapshots.py). Oracle parity is
swept by test_oracle_parity (snapshot_dedup); these pin the verdict
semantics on a hand-computable frame and the one-batch-shuffle plan."""

from __future__ import annotations

import re

from versatiles_rs_spark.dedup.snapshots import (
    snapshot_dedup,
    snapshot_fingerprints,
)


def test_verdict_semantics(spark):
    # store knows "alpha beta"; batch re-crawls it twice (messy case),
    # carries an internal dup pair, and one genuinely new doc
    store = spark.createDataFrame(
        [("alpha beta",)], "text string")
    batch = spark.createDataFrame(
        [
            (1, "ALPHA   beta!"),   # dup_store (normalizes to the stored form)
            (2, "alpha beta"),      # dup_store too — store precedence
            (3, "gamma delta"),     # new (first occurrence in batch)
            (4, "GAMMA delta."),    # dup_batch (3 saw it first)
            (5, "epsilon"),         # new
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_dedup(batch, snapshot_fingerprints(store)).collect()
    }
    assert got == {1: "dup_store", 2: "dup_store", 3: "new",
                   4: "dup_batch", 5: "new"}


def test_neardup_verdict_semantics(spark):
    """snapshot_neardup on a hand-computable frame: store precedence,
    batch-internal min-id keeper, and genuinely-new docs — with texts
    long enough (>= 3 tokens) that 3-gram Jaccard is meaningful."""
    from versatiles_rs_spark.dedup.snapshots import snapshot_neardup

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    store = spark.createDataFrame([(100, base)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [
            (1, base + " rev"),        # dup_store (near-identical to stored)
            (2, base + " rev rev"),    # dup_store too — precedence over sibling 1
            (3, "pack my box with five dozen liquor jugs for the long trip home"),
            (4, "pack my box with five dozen liquor jugs for the long trip away"),
            (5, "completely unrelated text about tile pyramids and zoom levels"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_neardup(batch, store, threshold=0.5).collect()
    }
    # 3+4 share all but the tail gram -> batch-internal cluster, 3 keeps
    assert got == {1: "dup_store", 2: "dup_store", 3: "new",
                   4: "dup_batch", 5: "new"}


def test_neardup_prebuilt_index_equivalent(spark):
    """Passing a prebuilt store_band_index (the persisted-index path a
    production incremental pipeline uses) is result-identical to
    computing it inline."""
    from versatiles_rs_spark.dedup.snapshots import (
        snapshot_neardup,
        store_band_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    store = docs.where("doc_id % 3 = 1").select("doc_id", "text")
    batch = docs.where("doc_id % 3 = 0").select(
        (docs.doc_id + 1000000).alias("doc_id"), "text")
    idx = store_band_index(store).localCheckpoint()
    inline = sorted(map(tuple, snapshot_neardup(batch, store).collect()))
    prebuilt = sorted(map(tuple, snapshot_neardup(
        batch, store, store_bands=idx).collect()))
    assert inline == prebuilt and len(inline) == batch.count()


def test_batch_shuffles_once(spark):
    store = spark.createDataFrame([("a",)], "text string")
    batch = spark.createDataFrame([(1, "a"), (2, "b")],
                                  "doc_id long, text string")
    out = snapshot_dedup(batch, snapshot_fingerprints(store))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # one exchange per side (batch join key + store distinct); the
    # first-occurrence window must NOT add a third — it reuses the
    # join's fp partitioning
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
