"""Streaming curation: the C4/Gopher flags are stateless Column math, so
they compose unchanged onto a readStream; normalized dedup rides the
existing stateful streaming_dedup_exact. The stream's survivor set must
equal the batch funnel's (first-seen == min-doc_id when batches arrive
in id order)."""

import os

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from versatiles_rs_spark.pages.quality_filters import (
    _c4_cols,
    _gopher_cols,
    _with_decorated,
    normalize_text,
)
from versatiles_rs_spark.streaming.dedup import streaming_dedup_exact

SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)

GOOD = " ".join(["the", "a"] + [f"word{i}" for i in range(38)])  # passes both filters
GOOD2 = " ".join(["the", "a"] + [f"tok{i}" for i in range(48)])
SHORT = "too short"  # fails gopher word floor


def _quality_pass(stream):
    d = _with_decorated(stream, "doc_id", "text")
    keep = _c4_cols()["keep"] & _gopher_cols()["keep"]
    return (
        d.where(keep)
        .select("doc_id", F.expr(normalize_text("text")).alias("norm"), "text")
    )


def _write_batch(spark, src, name, rows):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]), SCHEMA)
    df.coalesce(1).write.parquet(os.path.join(src, name))


def test_streaming_funnel_matches_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    chk = str(tmp_path / "chk")
    _write_batch(spark, src, "b0", [(1, GOOD), (2, SHORT), (3, GOOD)])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    out = streaming_dedup_exact(_quality_pass(stream), text_col="norm")
    q = (
        out.writeStream.format("memory")
        .queryName("curate_stream")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql("SELECT * FROM curate_stream").collect()}
        # SHORT fails quality before dedup; doc 3 is a dup of doc 1
        assert got == {1}

        # next micro-batch: a punctuation variant of GOOD (still passes the
        # quality filters — uppercase would fail the stopword check) must
        # dedup via the NORMALIZED key; a genuinely new good doc survives
        _write_batch(spark, src, "b1", [(4, GOOD + " !!"), (5, GOOD2)])
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql("SELECT * FROM curate_stream").collect()}
        assert got == {1, 5}
    finally:
        q.stop()

    # parity with the batch funnel on the full input
    from versatiles_rs_spark.pages.quality_filters import filter_funnel

    batch = spark.createDataFrame(
        pd.DataFrame(
            [(1, GOOD), (2, SHORT), (3, GOOD), (4, GOOD + " !!"), (5, GOOD2)],
            columns=["doc_id", "text"],
        ),
        SCHEMA,
    )
    want = {r["stage"]: r["n_docs"] for r in filter_funnel(batch).collect()}
    assert want["c4_gopher_dedup"] == len(got)
    # doc 4 passed QUALITY (4 of 5 clear the filters) and was dropped by
    # the normalized-dedup state — not silently rejected upstream
    ids = sorted(r.doc_id for r in _quality_pass(batch).collect())
    assert ids == [1, 3, 4, 5], ids
