"""Streaming exact dedup across micro-batches (streaming/dedup.py)."""

import os

import pandas as pd
from pyspark.sql.types import LongType, StringType, StructField, StructType

from versatiles_rs_spark.streaming.dedup import streaming_dedup_exact

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _write_batch(spark, src, name, rows):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]), SCHEMA)
    df.coalesce(1).write.parquet(os.path.join(src, name))


def test_dedup_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    chk = str(tmp_path / "chk")
    _write_batch(spark, src, "b0", [(1, "alpha"), (2, "beta"), (3, "alpha")])

    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    q = (
        streaming_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()}
        # within-batch dup (doc 3 == doc 1) dropped; lowest doc_id wins
        assert got == {1, 2}

        # batch 2: one cross-batch dup, one new
        _write_batch(spark, src, "b1", [(4, "beta"), (5, "gamma")])
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()}
        assert got == {1, 2, 5}

        # batch 3: everything already seen -> nothing new
        _write_batch(spark, src, "b2", [(6, "alpha"), (7, "gamma"), (8, "beta")])
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()}
        assert got == {1, 2, 5}
    finally:
        q.stop()


def test_dedup_matches_batch_first_seen(spark, tmp_path, sf_dir):
    """Streaming result == batch first-seen dedup on the same documents."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "in2")
    os.makedirs(src)
    chk = str(tmp_path / "chk2")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs.write.parquet(os.path.join(src, "b0"))

    stream = spark.readStream.schema(docs.schema).parquet(f"{src}/*")
    q = (
        streaming_dedup_exact(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream2")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream2").collect()}
    finally:
        q.stop()
    want = {
        r["doc_id"]
        for r in docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert got == want


def test_update_shard_lowest_doc_id_wins_across_chunks():
    """The within-batch determinism contract must hold across Arrow chunk
    boundaries: a duplicate hash in an EARLIER chunk must lose to a lower
    doc_id arriving in a LATER chunk of the same micro-batch."""
    import pandas as pd

    from versatiles_rs_spark.streaming.dedup import _update_shard

    class FakeState:
        exists = False

        def update(self, v):
            self.stored = v

    chunk1 = pd.DataFrame({"doc_id": [50, 60], "content_hash": ["aa", "bb"]})
    chunk2 = pd.DataFrame({"doc_id": [7, 99], "content_hash": ["aa", "cc"]})
    out = pd.concat(list(_update_shard(("a",), iter([chunk1, chunk2]), FakeState())))
    winners = dict(zip(out["content_hash"], out["doc_id"]))
    assert winners == {"aa": 7, "bb": 60, "cc": 99}
