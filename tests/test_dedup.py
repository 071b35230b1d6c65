"""Dedup family: minhash-LSH, simhash, ngram jaccard, embedding near-dup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.dedup import (
    jaccard_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    shingle_set,
    simhash_dedup_pairs,
    simhash_signatures,
)
from versatiles_rs_spark.dedup.embedding import ann_lsh_topk, embedding_neardup_pairs
from versatiles_rs_spark.dedup.ngram import jaccard
from versatiles_rs_spark.dedup.simhash import simhash64


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Corpus with planted near-duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while spark shuffles "
        "partitions across the cluster and catalyst optimizes the plan"
    )
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different content about tile pyramids and mercator math"),
        (4, "another unrelated document mentioning embeddings and vectors"),
        (5, base + " with a tiny suffix appended"),  # near dup of 0
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).cache()


def test_shingles_and_jaccard():
    s1 = shingle_set("a b c d", 3)
    assert s1 == {"a b c", "b c d"}
    assert jaccard(s1, s1) == 1.0
    assert jaccard(s1, {"x y z"}) == 0.0
    assert jaccard(set(), set()) == 1.0


def test_minhash_signature_properties(dup_docs):
    sigs = minhash_signatures(dup_docs, num_hashes=64).toPandas().set_index("doc_id")["sig"]
    assert all(len(s) == 64 for s in sigs)
    assert list(sigs[0]) == list(sigs[1])  # identical text -> identical sig
    sim_02 = np.mean(np.array(sigs[0]) == np.array(sigs[2]))
    sim_03 = np.mean(np.array(sigs[0]) == np.array(sigs[3]))
    assert sim_02 > 0.5 > sim_03  # signature similarity ≈ jaccard


def test_minhash_dedup_finds_planted_dups(dup_docs):
    pairs = minhash_dedup_pairs(dup_docs, threshold=0.5).toPandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got
    assert (0, 2) in got or (0, 5) in got
    for a, b in got:
        assert {a, b} <= {0, 1, 2, 5}, f"false positive pair ({a},{b})"


def test_minhash_deterministic(dup_docs):
    a = minhash_dedup_pairs(dup_docs, threshold=0.5).toPandas().sort_values(["id_a", "id_b"])
    b = minhash_dedup_pairs(dup_docs, threshold=0.5).toPandas().sort_values(["id_a", "id_b"])
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_simhash_near_dup_small_hamming(dup_docs):
    sigs = simhash_signatures(dup_docs).toPandas().set_index("doc_id")["simhash"]
    assert sigs[0] == sigs[1]
    ham_02 = bin((int(sigs[0]) ^ int(sigs[2])) & ((1 << 64) - 1)).count("1")
    ham_03 = bin((int(sigs[0]) ^ int(sigs[3])) & ((1 << 64) - 1)).count("1")
    assert ham_02 < ham_03
    pairs = simhash_dedup_pairs(dup_docs, max_hamming=8).toPandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got


def test_simhash64_pure():
    assert simhash64("") == 0
    assert simhash64("hello world") == simhash64("hello world")
    assert simhash64("hello world") != simhash64("goodbye world")


def test_jaccard_pairs_dataframe(spark, dup_docs):
    pairs = spark.createDataFrame(pd.DataFrame({"id_a": [0, 0], "id_b": [1, 3]}))
    out = jaccard_pairs(dup_docs, pairs).toPandas().set_index("id_b")["jaccard"]
    assert out[1] == 1.0
    assert out[3] < 0.1


@pytest.fixture(scope="module")
def emb_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_embedding_neardup_self_consistency(spark, emb_df):
    # plant a duplicate vector: vec 0 copied as id 999999
    dup = emb_df.filter("vec_id = 0").select(
        F.lit(999999).cast("bigint").alias("vec_id"), "embedding", "label"
    )
    with_dup = emb_df.unionByName(dup)
    pairs = embedding_neardup_pairs(with_dup, min_dot=990_000_000_000).toPandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 999999) in got


def test_ann_lsh_recall_vs_bruteforce(spark, emb_df, sf_dir):
    from versatiles_rs_spark.queries import q_ann_topk

    exact = q_ann_topk(spark, sf_dir).toPandas()
    approx = ann_lsh_topk(emb_df, [0, 1, 2, 3, 4], k=3).toPandas()
    # approximate top-3 should overlap exact top-3 reasonably (recall >= 1/3
    # per query on random data with 8 planes + multiprobe)
    recall = 0
    for qid in range(5):
        e = set(exact[exact["qid"] == qid]["vid"])
        a = set(approx[approx["qid"] == qid]["vid"])
        recall += len(e & a) / 3
    assert recall / 5 >= 0.3


def test_simhash_block_layout_pigeonhole():
    """n_blocks defaults to max_hamming+1; layout covers all 64 bits with
    non-overlapping blocks, so any pair at Hamming <= n_blocks-1 shares at
    least one identical block (complete candidates at the full radius)."""
    from versatiles_rs_spark.dedup.simhash import _block_layout

    for n_blocks in (4, 7, 9):
        layout = _block_layout(n_blocks)
        assert len(layout) == n_blocks
        assert sum(w for _, w in layout) == 64
        off = 0
        for o, w in layout:
            assert o == off and w > 0
            off += w


def test_simhash_complete_at_max_hamming(spark, sf_dir):
    """All pairs at Hamming == max_hamming are found (the old 4-block table
    silently lost recall above Hamming 3; n_blocks=max_hamming+1 restores
    the pigeonhole guarantee). Brute-force python signatures are the truth."""
    import itertools

    import numpy as np

    from versatiles_rs_spark.dedup import simhash_dedup_pairs
    from versatiles_rs_spark.dedup.simhash import simhash64

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pdf = docs.select("doc_id", "text").toPandas().sort_values("doc_id")
    sigs = np.array([simhash64(t, 3) for t in pdf.text], dtype=np.int64).view(np.uint64)
    ids = pdf.doc_id.values
    max_h = 6
    want = set()
    for i, j in itertools.combinations(range(len(pdf)), 2):
        h = bin(int(sigs[i] ^ sigs[j])).count("1")
        if h <= max_h:
            want.add((min(ids[i], ids[j]), max(ids[i], ids[j]), h))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_dedup_pairs(docs, max_hamming=max_h, shingle_n=3).collect()
    }
    assert got == want
    assert any(h == max_h for _, _, h in want), "fixture must exercise the boundary"


def test_ann_ivf_matches_bruteforce(spark, sf_dir):
    """IVF top-k with exactness-tuned nprobe equals brute-force top-k; with
    a smaller nprobe it returns a subset-quality result (recall < 1 allowed
    but ranks must still be correct within the probed candidates)."""
    from versatiles_rs_spark.dedup.embedding import ann_ivf_topk
    from versatiles_rs_spark.queries import q_ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r["qid"], r["rank"]): r["vid"] for r in q_ann_topk(spark, sf_dir).collect()}
    ivf = {(r["qid"], r["rank"]): r["vid"]
           for r in ann_ivf_topk(emb, [0, 1, 2, 3, 4], k=3, n_cells=8, nprobe=6).collect()}
    assert ivf == exact
    # cheap probe: still returns k rows per query with strictly ranked dots
    cheap = ann_ivf_topk(emb, [0, 1], k=3, n_cells=16, nprobe=2).collect()
    by_q = {}
    for r in cheap:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["dot"]))
    for q, rows in by_q.items():
        rows.sort()
        dots = [d for _, d in rows]
        assert dots == sorted(dots, reverse=True)


def test_shingle_hash_vectorized_matches_horner_reference():
    """The prefix-sum formulation in _shingle_hashes must equal the plain
    per-gram Horner evaluation h = h*P + byte mod 2^64 (the definition the
    DuckDB simhash oracle implements in SQL)."""
    import random

    from versatiles_rs_spark.dedup.minhash import _shingle_hashes, _splitmix64

    def horner(text, n):
        toks = text.split()
        if not toks:
            return np.zeros(1, dtype=np.uint64)
        grams = (
            [" ".join(toks)]
            if len(toks) < n
            else [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        )
        out = np.empty(len(grams), dtype=np.uint64)
        for i, g in enumerate(grams):
            h = 0
            for b in g.encode("utf-8"):
                h = (h * 0x100000001B3 + b) % (1 << 64)
            out[i] = np.uint64(h)
        return np.unique(_splitmix64(out))

    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "x", "naïve", "東京", "a" * 50]
    for _ in range(60):
        t = " ".join(rng.choice(words) for _ in range(rng.randint(0, 10)))
        for n in (1, 3, 5):
            assert np.array_equal(_shingle_hashes(t, n), horner(t, n))


def test_semantic_decontaminate_planted(spark):
    """Planted paraphrase (scaled copy of a benchmark vector -> cosine 1)
    is flagged; orthogonal vectors stay clean; empty benchmark raises."""
    import pytest as _pytest

    from versatiles_rs_spark.dedup.decontam import semantic_decontaminate

    rows = [
        (0, [1.0, 0.0, 0.0]),        # benchmark member itself
        (1, [0.999, 0.0447, 0.0]),   # near-copy of benchmark -> contaminated
        (2, [0.0, 1.0, 0.0]),        # orthogonal -> clean
        (3, [0.0, 0.0, -1.0]),       # orthogonal -> clean
    ]
    corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    bench = corpus.filter("vec_id = 0")
    got = {
        r["vec_id"]: (r["max_dot"], r["contaminated"])
        for r in semantic_decontaminate(corpus, bench).collect()
    }
    assert got[0][1] == 1 and got[0][0] == 10**12  # exact self-dot at 1e6 quant
    assert got[1][1] == 1 and got[1][0] >= 9 * 10**11
    assert got[2] == (0, 0) and got[3] == (0, 0)

    with _pytest.raises(ValueError):
        semantic_decontaminate(corpus, bench.filter("vec_id < 0"))


def test_jaccard_join_hand_case_boundary(spark):
    import pandas as pd

    from versatiles_rs_spark.dedup.setjoin import jaccard_similarity_join

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                # shingle sets (n=2): d1 {a b, b c, c d} d2 {a b, b c, c x}
                # inter=2, union=4 -> J=1/2 exactly (boundary pair: kept)
                (1, "a b c d"),
                (2, "a b c x"),
                # d3 shares nothing
                (3, "p q r s"),
                # d4 == d1 (J=1)
                (4, "a b c d"),
            ],
            columns=["doc_id", "text"],
        )
    )
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["na"], r["nb"])
        for r in jaccard_similarity_join(docs, tn=1, td=2, shingle_n=2).collect()
    }
    assert got == {(1, 2): (2, 3, 3), (1, 4): (3, 3, 3), (2, 4): (2, 3, 3)}

    # raise threshold past the boundary: only the identical pair stays
    strict = {
        (r["id_a"], r["id_b"])
        for r in jaccard_similarity_join(docs, tn=2, td=3, shingle_n=2).collect()
    }
    assert strict == {(1, 4)}


def test_jaccard_join_short_docs_empty_sets(spark):
    import pandas as pd
    import pytest as _pt

    from versatiles_rs_spark.dedup.setjoin import jaccard_similarity_join

    docs = spark.createDataFrame(
        pd.DataFrame([(1, "a b"), (2, "a b")], columns=["doc_id", "text"])
    )
    # < n tokens -> empty shingle set -> never paired
    assert jaccard_similarity_join(docs, 1, 2, shingle_n=3).count() == 0
    with _pt.raises(ValueError):
        jaccard_similarity_join(docs, 3, 2)
