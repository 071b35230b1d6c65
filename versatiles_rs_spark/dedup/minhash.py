"""MinHash + LSH near-duplicate detection (shingle -> minhash -> band ->
bucket-join -> exact verify).

Deterministic throughout: shingles hash with splitmix64 (the same mixer the
reference uses for stable thinning, reduce_points.rs:139) and the k hash
functions are splitmix64(shingle_hash ^ seed_i) — reproducible across runs
and engines with no RNG state.

Scale shape: signatures are one mapInPandas (no shuffle); banding explodes
each doc to n_bands rows; the only shuffle is the groupBy on (band, band
hash), whose buckets are the candidate sets. Pairs are generated per bucket
(bounded by bucket size), then exact-verified with n-gram Jaccard. Hot
buckets (boilerplate text at web scale) are capped with a per-bucket limit —
the documented skew valve.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x + _SM_GAMMA
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    # stable 64-bit content hash: python's hash() is salted, so use a simple
    # FNV-1a over utf-8 bytes then splitmix to spread
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        h = np.uint64(0xCBF29CE484222325)
        with np.errstate(over="ignore"):
            for b in g.encode("utf-8"):
                h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
        out[i] = h
    return np.unique(_splitmix64(out))


def _signature(sh: np.ndarray, num_hashes: int, seeds: np.ndarray) -> np.ndarray:
    """k-minwise signature: min over shingles of splitmix64(sh ^ seed_k)."""
    with np.errstate(over="ignore"):
        mixed = _splitmix64(sh[None, :] ^ seeds[:, None])  # (k, S)
    return mixed.min(axis=1)


_SIG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sig", ArrayType(LongType())),
    ]
)


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One mapInPandas pass -> (doc_id, sig: array<long>[num_hashes])."""
    seeds = _splitmix64(np.arange(num_hashes, dtype=np.uint64))

    def sign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sigs = [
                _signature(_shingle_hashes(t, shingle_n), num_hashes, seeds).astype(np.int64).tolist()
                for t in pdf[text_col]
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(sign, _SIG_SCHEMA)


def minhash_dedup_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full MinHash-LSH pipeline -> verified near-dup pairs
    (id_a < id_b, jaccard >= threshold)."""
    from versatiles_rs_spark.dedup.ngram import jaccard_pairs

    rows = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, shingle_n, id_col, text_col)
    # band key = hash of the band's signature slice; explode to n_bands rows
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b as band, xxhash64(slice(sig, b * {rows} + 1, {rows})) as bkey))"
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))

    # bucket-join: collect ids per (band, bkey); cap hot buckets (skew valve)
    buckets = (
        banded.groupBy("band", "bkey")
        .agg(F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_bucket).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = (
        buckets.select(F.explode(F.expr(
            "flatten(transform(ids, (a, i) -> transform(slice(ids, i + 2, size(ids)), "
            "b -> struct(a as id_a, b as id_b))))"
        )).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    verified = jaccard_pairs(docs, pairs, n=shingle_n, id_col=id_col, text_col=text_col)
    return verified.filter(F.col("jaccard") >= threshold)
