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
