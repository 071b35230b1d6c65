"""Streaming exact deduplication — drop documents whose content hash was
already seen in ANY earlier micro-batch.

A live crawl feed re-fetches pages constantly; batch dedup can't help
until the next full pass. This operator keeps the seen-hash set as
partitioned streaming state: documents are keyed by a hash PREFIX (the
shard key, bounded fan-out), and each shard's state stores the full
hashes it has admitted. First occurrence wins (within a batch,
lowest doc_id wins, deterministically); later occurrences are dropped.

Scale shape: state is sharded by the prefix key, so no shard holds more
than |corpus| / 16^prefix_len hashes, and each micro-batch touches only
the shards its rows hash into. The per-shard state is a single packed
string column (hex hashes joined) — one state row per shard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content_hash", StringType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("seen", StringType())])


def _update_shard(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    seen: set[str] = set()
    if state.exists:
        (packed,) = state.get
        if packed:
            seen = set(packed.split(","))
    out = []
    # Materialize ALL Arrow chunks of this shard's micro-batch before the
    # seen-set pass: the "lowest doc_id wins within a batch" contract must
    # hold across chunk boundaries, not merely per chunk.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
        for did, h in zip(batch["doc_id"], batch["content_hash"]):
            if h not in seen:
                seen.add(h)
                out.append((int(did), h))
    state.update((",".join(sorted(seen)),))
    if out:
        yield pd.DataFrame(out, columns=["doc_id", "content_hash"])


def streaming_dedup_exact(
    stream: DataFrame, text_col: str = "text", prefix_len: int = 2
) -> DataFrame:
    """Streaming DataFrame (doc_id, text, ...) -> first-seen rows only,
    exact-dedup across all micro-batches. Returns (doc_id, content_hash)."""
    hashed = stream.select(
        "doc_id", F.md5(F.col(text_col)).alias("content_hash")
    ).withColumn("shard", F.substring("content_hash", 1, prefix_len))
    return hashed.groupBy("shard").applyInPandasWithState(
        _update_shard,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
