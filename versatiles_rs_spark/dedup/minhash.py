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


_POLY_P = np.uint64(0x100000001B3)  # FNV prime reused as the odd Horner multiplier
_POLY_P_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    """All word-n-gram hashes of ``text`` in O(bytes) vectorized numpy ops.

    Stable 64-bit content hash (python's hash() is salted): a polynomial
    rolling hash H(s,e) = sum_{j=s}^{e-1} d[j] * P^(e-1-j) mod 2^64 over the
    byte array of the space-normalized text — equal to Horner's
    h = h*P + byte over the gram's bytes — then splitmix64 to spread
    (reduce_points.rs:139 mixer, unchanged). Every gram hash is recovered
    from one prefix-sum pass: pre[i] = sum_{j<i} d[j] * P^-j (P odd, hence
    invertible mod 2^64), H(s,e) = (pre[e]-pre[s]) * P^(e-1). No per-gram
    string construction, no per-byte Python loop."""
    toks = text.split()
    if not toks:
        return np.zeros(1, dtype=np.uint64)
    enc = [t.encode("utf-8") for t in toks]
    data = np.frombuffer(b" ".join(enc), dtype=np.uint8).astype(np.uint64)
    length = data.shape[0]
    with np.errstate(over="ignore"):
        pw = np.full(length, _POLY_P, dtype=np.uint64)
        pw[0] = np.uint64(1)
        powers = np.cumprod(pw)  # powers[i] = P^i mod 2^64
        ipw = np.full(length, _POLY_P_INV, dtype=np.uint64)
        ipw[0] = np.uint64(1)
        inv_powers = np.cumprod(ipw)  # inv_powers[i] = P^-i mod 2^64
        pre = np.zeros(length + 1, dtype=np.uint64)
        pre[1:] = np.cumsum(data * inv_powers)
        lens = np.array([len(b) for b in enc], dtype=np.int64)
        starts = np.zeros(len(enc), dtype=np.int64)
        if len(enc) > 1:
            starts[1:] = np.cumsum(lens[:-1] + 1)
        if len(toks) < n:
            s = np.zeros(1, dtype=np.int64)
            e = np.array([length], dtype=np.int64)
        else:
            m = len(toks) - n + 1
            s = starts[:m]
            e = starts[n - 1 :] + lens[n - 1 :]
        h = (pre[e] - pre[s]) * powers[e - 1]
    return np.unique(_splitmix64(h))


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


def minhash_band_keys(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc_id, band, bkey): explode each signature into its LSH band keys.

    band key = hash of the band's signature slice; each doc becomes
    ``bands`` rows. This is the shared banding step of the batch near-dup
    pipeline (minhash_dedup_pairs) and the persistable store band index
    (dedup/snapshots.store_band_index)."""
    rows = num_hashes // bands
    return sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"struct(b as band, xxhash64(slice(sig, b * {rows} + 1, {rows})) as bkey))"
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))


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

    sigs = minhash_signatures(docs, num_hashes, shingle_n, id_col, text_col)
    banded = minhash_band_keys(sigs, num_hashes, bands)

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
