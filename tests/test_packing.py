"""Sequence packing (pages/packing.py). Oracle parity is swept by
test_oracle_parity (sequence_packing); these pin the packing invariants
on a hand-computable frame and the one-shuffle plan."""

from __future__ import annotations

import re

from versatiles_rs_spark.pages.packing import pack_sequences


def test_hand_computed_layout(spark):
    # one shard (n_shards=1), L=4: docs of 3, 3, 4, 2 tokens
    #   d0: [0,3)  -> seq 0 only
    #   d1: [3,6)  -> spans seqs 0-1
    #   d2: [6,10) -> spans seqs 1-2
    #   d3: [10,12)-> seq 2 only
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f"), (2, "g h i j"), (3, "k l")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            pack_sequences(docs, seq_len=4, n_shards=1).collect()}
    got = {i: (r["start_off"], r["first_seq"], r["n_seqs"]) for i, r in rows.items()}
    assert got == {0: (0, 0, 1), 1: (3, 0, 2), 2: (6, 1, 2), 3: (10, 2, 1)}


def test_shards_are_contiguous_streams(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = pack_sequences(docs).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) == 8
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in shard_rows:
            assert r["start_off"] == off  # no gaps, no overlaps
            assert r["n_seqs"] >= 1
            off += r["n_tok"]


def test_plan_is_one_shuffle_no_global_sort(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = pack_sequences(docs)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
