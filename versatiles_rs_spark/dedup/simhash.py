"""SimHash near-duplicate detection.

64-bit SimHash: each token's stable hash votes ±1 per bit; the signature's
sign pattern is the fingerprint. Near-dups have small Hamming distance.
Candidate generation uses the standard 4x16-bit block permutation trick:
docs sharing any of the 4 blocks are candidates (guarantees recall for
Hamming distance <= 3), then exact Hamming verification.

Deterministic: the same polynomial-rolling-hash + splitmix64 token hashing
as minhash.py (vectorized, no per-byte Python).
Shuffle profile: one groupBy per block table (4 total), each map-side
combinable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from versatiles_rs_spark.dedup.minhash import _shingle_hashes


def simhash64(text: str, shingle_n: int = 1) -> int:
    hs = _shingle_hashes(text, shingle_n)
    if len(hs) == 0:
        return 0
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for b in range(64):
        if votes[b] > 0:
            sig |= np.uint64(1) << np.uint64(b)
    return int(sig.astype(np.int64))  # two's-complement view for BIGINT cols


_SIG_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash", LongType())]
)


def simhash_signatures(
    docs: DataFrame, shingle_n: int = 1, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    def sign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "simhash": [simhash64(t, shingle_n) for t in pdf[text_col]],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(sign, _SIG_SCHEMA)


_PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("hamming", IntegerType()),
    ]
)


def _block_layout(n_blocks: int) -> list[tuple[int, int]]:
    """Split 64 bits into ``n_blocks`` nearly-equal (offset, width) blocks."""
    w, r = divmod(64, n_blocks)
    layout = []
    off = 0
    for i in range(n_blocks):
        width = w + (1 if i < r else 0)
        layout.append((off, width))
        off += width
    return layout


def simhash_dedup_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    shingle_n: int = 1,
    max_bucket: int = 64,
    n_blocks: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs sharing any signature block, verified by exact Hamming
    distance <= max_hamming.

    Pigeonhole completeness: with B blocks, any pair at Hamming <= B-1 shares
    at least one identical block, so ``n_blocks`` defaults to
    ``max_hamming + 1`` — candidates are COMPLETE for the requested radius
    (previously a fixed 4-block table silently lost recall above Hamming 3).
    More blocks mean narrower block keys, hence bigger buckets at web scale —
    the ``max_bucket`` cap is the documented skew valve for that tradeoff."""
    if n_blocks is None:
        n_blocks = max(4, max_hamming + 1)
    layout = _block_layout(n_blocks)
    offsets = ", ".join(str(o) for o, _ in layout)
    masks = ", ".join(str((1 << w) - 1) for _, w in layout)
    sigs = simhash_signatures(docs, shingle_n, id_col, text_col)
    blocks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_blocks - 1}), b -> struct(b as blk, "
                f"shiftrightunsigned(simhash, element_at(array({offsets}), b + 1)) "
                f"& element_at(array({masks}), b + 1) as bval))"
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.bval").alias("bval"))
    buckets = (
        blocks.groupBy("blk", "bval")
        .agg(
            F.slice(
                F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))), 1, max_bucket
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (a, i) -> "
                    "transform(slice(members, i + 2, size(members)), b -> struct("
                    "a.doc_id as id_a, b.doc_id as id_b, "
                    "a.simhash as ha, b.simhash as hb))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int")
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )
