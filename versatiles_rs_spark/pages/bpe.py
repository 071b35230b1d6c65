"""Distributed BPE tokenizer training (Sennrich et al. 2016, public
algorithm) — the tokenizer-training leg of a training-data pipeline:
vocab -> merges -> token counts, end-to-end on DataFrames.

Scale shape (100 TB corpus): the ONLY corpus-sized pass is
``word_counts`` — one explode + one map-side-combined aggregation that
collapses 10^12 documents to the unique-word table (~10^7-10^8 rows for
web text; Heaps' law keeps it sublinear). Training then iterates over
that word table alone: each merge is

- one pair-count shuffle (adjacent symbol pairs, weighted by word
  frequency, map-side combined),
- ONE row collected at the driver (the argmax pair, deterministic
  tie-break count DESC / left ASC / right ASC),
- one Arrow-batched rewrite of the symbol arrays.

Words reduced to a single symbol leave the active set; the label table
is localCheckpoint-ed every k iterations (the same lineage hygiene as
dedup/clusters.py) so 1000-merge runs keep a bounded plan. Nothing
corpus-sized ever reaches the driver.

Classic BPE is inherently sequential in the merge choice, so the
per-iteration driver round-trip (one row) is the algorithm's floor, not
a shortcut.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# shared with q_token_count_bpe (queries.py): word runs or single
# non-word-non-space chars, ASCII classes so Spark and DuckDB agree.
WORD_RX = "[0-9A-Za-z_]+|[^0-9A-Za-z_ ]"

_SYMS_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("freq", LongType()),
        StructField("syms", ArrayType(StringType())),
    ]
)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq): the one corpus-sized pass. Explode stays
    JVM-side; the aggregation map-side-combines before its single
    shuffle."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all({text_col}, '{WORD_RX}', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """(word, freq) -> (word, freq, syms): character-split via pure Column
    math (substring is character-indexed, so multibyte text splits on
    codepoints, not bytes)."""
    w = F.col("word")
    syms = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
    )
    return words.select("word", F.col("freq").cast("long").alias("freq"), syms.alias("syms"))


def _pair_counts(active: DataFrame) -> DataFrame:
    """Adjacent symbol pairs weighted by word freq — arrays_zip of the
    array against its shift, exploded, aggregated with map-side combine."""
    a = F.col("syms")
    n = F.size(a)
    pairs = F.arrays_zip(
        F.slice(a, 1, n - 1).alias("left"), F.slice(a, 2, n - 1).alias("right")
    )
    return (
        active.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _merge_pair(left: str, right: str):
    """Single-word merge scan (the classic BPE rewrite), returned as a
    picklable closure for the Arrow-batched rewrite."""
    merged = left + right

    def apply_one(syms):
        out = []
        i, n = 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    return apply_one


def train_bpe(
    words: DataFrame,
    n_merges: int = 100,
    min_pair_count: int = 2,
    checkpoint_every: int = 8,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from a (word, freq) table.

    Returns [{"rank", "left", "right", "merged", "pair_count"}] in merge
    order. Stops early when no pair reaches ``min_pair_count``.
    """
    spark = words.sparkSession
    active = _initial_symbols(words).where(F.size("syms") > 1).cache()
    merges: list[dict] = []
    try:
        for rank in range(n_merges):
            top = (
                _pair_counts(active)
                .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["pair_count"] < min_pair_count:
                break
            left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
            merges.append(
                {"rank": rank, "left": left, "right": right,
                 "merged": left + right, "pair_count": cnt}
            )
            fn = _merge_pair(left, right)

            # loop vars bound as defaults: a cache-evicted partition may be
            # recomputed in a LATER iteration, after left/right re-bind
            def rewrite(
                it: Iterator[pd.DataFrame], left=left, right=right, fn=fn
            ) -> Iterator[pd.DataFrame]:
                for pdf in it:
                    mask = [
                        any(a == left and b == right for a, b in zip(s, s[1:]))
                        for s in pdf["syms"]
                    ]
                    if any(mask):
                        pdf = pdf.copy()
                        pdf.loc[mask, "syms"] = pdf.loc[mask, "syms"].map(fn)
                    yield pdf

            new = active.mapInPandas(rewrite, _SYMS_SCHEMA).where(F.size("syms") > 1)
            if (rank + 1) % checkpoint_every == 0:
                new = new.localCheckpoint(eager=True)  # truncate plan lineage
            else:
                new = new.cache()
                new.count()  # materialize before dropping the parent
            active.unpersist()
            active = new
    finally:
        active.unpersist()
    return merges


def bpe_encode(docs: DataFrame, merges: list[dict], text_col: str = "text") -> DataFrame:
    """Append ``n_bpe_tokens``: token count per document under the learned
    merge list. Merges ride a closure (list of tuples, broadcast-small);
    encoding is Arrow-batched with a per-batch word cache — each UNIQUE
    word is encoded once per batch, so hot words cost O(1)."""
    ranked = [(m["left"], m["right"], m["merged"]) for m in merges]

    import re

    rx = re.compile(WORD_RX)

    def encode_word(word: str) -> int:
        syms = list(word)
        for left, right, merged in ranked:
            if len(syms) < 2:
                break
            i, out = 0, []
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in it:
            counts = []
            for text in pdf[text_col]:
                total = 0
                for w in rx.findall(text or ""):
                    c = cache.get(w)
                    if c is None:
                        c = cache[w] = encode_word(w)
                    total += c
                counts.append(total)
            out = pdf[["doc_id"]].copy()
            out["n_bpe_tokens"] = pd.Series(counts, index=pdf.index, dtype="int64")
            yield out

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("n_bpe_tokens", LongType())]
    )
    return docs.select("doc_id", text_col).mapInPandas(encode, schema)


def train_bpe_reference(word_freqs: dict[str, int], n_merges: int,
                        min_pair_count: int = 2) -> list[dict]:
    """Independent single-node reference (dict-based, no Spark) used by
    tests to validate the distributed trainer merge-for-merge."""
    vocab = {w: list(w) for w in word_freqs}
    merges: list[dict] = []
    for rank in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append({"rank": rank, "left": left, "right": right,
                       "merged": left + right, "pair_count": cnt})
        fn = _merge_pair(left, right)
        vocab = {w: fn(s) if len(s) > 1 else s for w, s in vocab.items()}
    return merges
