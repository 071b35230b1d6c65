"""Dedup/ANN-domain queries: exact and near-dup, LSH, k-means, SemDeDup, curation funnel.

Split from the single-file registry in round 5; QUERIES/ORACLES stay in
`versatiles_rs_spark.queries` (the package __init__), in driver-sweep order.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.queries._shared import (
    _BPE_RX,
    _TOKEN_COUNT_EXPR,
)

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (hash-groupBy; md5 matches across engines)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper"))
    )


O_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keeper
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 9. ANN: brute-force cosine top-k with exact integer quantization
# ---------------------------------------------------------------------------

def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k, shaped for 10^12 rows: the BOUNDED
    query set is collected and broadcast (round-2 shape broadcast the whole
    CORPUS and nested-loop-joined it — backwards at scale); the corpus
    streams through ONE mapInPandas computing all query dots per Arrow
    batch as a single int64 matmul, emitting only each batch's local top-k;
    the global window top-k then ranks candidate rows only. Integer
    micro-quantization (half-away-from-zero, matching SQL round) keeps the
    dot products exact and order-independent across engines."""
    import numpy as np
    from pyspark.sql import Window

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter("vec_id < 5").select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qraw = np.array([r["embedding"] for r in qrows], dtype=np.float64) * 1e6
    qm = (np.sign(qraw) * np.floor(np.abs(qraw) + 0.5)).astype(np.int64)
    bc = spark.sparkContext.broadcast((qids, qm))

    def score(it):
        import pandas as pd

        bqids, bqm = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            raw = np.array(pdf["embedding"].tolist(), dtype=np.float64) * 1e6
            vm = (np.sign(raw) * np.floor(np.abs(raw) + 0.5)).astype(np.int64)
            vids = pdf["vec_id"].values
            dots = bqm @ vm.T  # (n_queries, batch) exact int64
            parts = []
            for t, qid in enumerate(bqids):
                mask = vids != qid
                d, vv = dots[t][mask], vids[mask]
                k = min(3, len(vv))
                order = np.lexsort((vv, -d))[:k]  # (dot desc, vid asc)
                parts.append(pd.DataFrame({"qid": qid, "vid": vv[order], "dot": d[order]}))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    local = emb.select("vec_id", "embedding").mapInPandas(
        score, "qid long, vid long, dot long"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vid"))
    return local.withColumn("rank", F.row_number().over(w)).filter("rank <= 3")


O_ANN_TOPK = """
WITH scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
    CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(round(CAST(p[1] AS DOUBLE)*1000000) AS BIGINT) * CAST(round(CAST(p[2] AS DOUBLE)*1000000) AS BIGINT)), 'sum') AS BIGINT) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 5
), ranked AS (
  SELECT qid, vid, dot, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, dot, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# 15. dedup family (training-data ops): minhash-LSH / simhash / ngram /
#     embedding near-dup / fingerprint
# ---------------------------------------------------------------------------

# Shared DuckDB fragments: word-3-gram shingle sets exactly matching
# dedup.ngram.shingle_set (python text.split() tokenization; whole-text
# gram when fewer than 3 tokens).
_SQL_GRAMS_CTE = """
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id,
    CASE WHEN len(tk) = 0 THEN []
         WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - 1),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
    END AS gs
  FROM toks
)"""


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, projected to the exact-verified output:
    (id_a, id_b, micro-quantized 3-gram Jaccard). The LSH banding itself is
    not SQL-expressible, but its VERIFIED OUTPUT is — the oracle brute-forces
    all pairs at threshold 0.5, so equality attests both recall (every true
    pair found) and precision (no extra pairs) end to end."""
    from versatiles_rs_spark.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    return pairs.select(
        "id_a", "id_b",
        F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)).cast("bigint").alias("jaccard_u"),
    )


O_MINHASH_NEARDUP = f"""
WITH {_SQL_GRAMS_CTE},
sets AS (SELECT doc_id, list_distinct(gs) AS s FROM grams),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(floor(j * 1000000 + 0.5) AS BIGINT) AS jaccard_u
FROM pairs WHERE j >= 0.5
"""


def _sql_simhash_sigs() -> str:
    """DuckDB CTE computing the EXACT 64-bit SimHash of dedup.simhash
    (polynomial rolling hash h = h*P + byte mod 2^64, P = the FNV prime,
    -> splitmix64 -> per-bit votes, 3-gram shingles) with HUGEINT modular
    arithmetic — a true cross-engine signature oracle. The reduce below is
    the Horner form of minhash._shingle_hashes' prefix-sum formulation;
    both compute sum d[j] * P^(len-1-j) mod 2^64 per gram."""
    m64 = "18446744073709551616::HUGEINT"

    def mulmod(a: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"((({a}) * {lo}::HUGEINT + (((({a}) * {hi}::HUGEINT) % 4294967296::HUGEINT)"
            f" * 4294967296::HUGEINT)) % {m64})"
        )

    def xor64(a: str, b: str) -> str:
        return f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) AS HUGEINT)"

    def shr(a: str, n: int) -> str:
        return f"CAST((CAST(({a}) AS UBIGINT) >> {n}) AS HUGEINT)"

    # splitmix64 (reduce_points.rs:139 mixer, same constants as dedup.minhash)
    s = f"(((x) + {0x9E3779B97F4A7C15}::HUGEINT) % {m64})"
    s = mulmod(xor64(s, shr(s, 30)), 0xBF58476D1CE4E5B9)
    s = mulmod(xor64(s, shr(s, 27)), 0x94D049BB133111EB)
    splitmix = xor64(s, shr(s, 31))
    poly = (
        "list_reduce(list_prepend(0::HUGEINT, "
        "list_transform(range(1, length(g) + 1), i -> ord(substr(g, i, 1))::HUGEINT)), "
        f"(h, c) -> (({mulmod('h', 0x100000001B3)}) + c) % {m64})"
    )
    gram_hash = splitmix.replace("(x)", f"({poly})")
    return f"""
hashes AS (
  SELECT doc_id,
    CASE WHEN len(gs) = 0 THEN [0::HUGEINT]
         ELSE list_distinct(list_transform(gs, g -> {gram_hash}))
    END AS hs
  FROM grams
), sigs AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(0, 64), b ->
      CASE WHEN 2 * list_sum(list_transform(hs,
               h -> CAST((CAST(h AS UBIGINT) >> b) & 1 AS HUGEINT))) > len(hs)
           THEN (1::HUGEINT << b) ELSE 0::HUGEINT END
    )) AS UBIGINT) AS sig
  FROM hashes
)"""


_SIMHASH_MAX_HAMMING = 6


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming <= 6 with COMPLETE candidates
    (7 signature blocks -> pigeonhole guarantees recall for the full radius;
    the old 4-block table only guaranteed Hamming <= 3). The oracle
    recomputes the signatures in pure SQL and brute-forces all pairs."""
    from versatiles_rs_spark.dedup import simhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_dedup_pairs(docs, max_hamming=_SIMHASH_MAX_HAMMING, shingle_n=3)


O_SIMHASH_NEARDUP = f"""
WITH {_SQL_GRAMS_CTE},{_sql_simhash_sigs()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {_SIMHASH_MAX_HAMMING}
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH embedding near-dup over the embeddings table augmented with
    deterministic clones (vec_id + 100000 for vec_id % 50 == 0). The natural
    table has no near-dup pairs (max cosine ~0.51 at sf0.01), so the clones
    provide structurally-guaranteed positives: identical vectors share every
    LSH bucket, making recall 1.0 by construction, while min_dot=950e9 (cos
    ~0.95 for unit vectors) excludes every non-clone pair — the oracle
    brute-forces the same augmented table."""
    from versatiles_rs_spark.dedup.embedding import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clones = emb.filter("vec_id % 50 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(clones)
    return embedding_neardup_pairs(aug, min_dot=950_000_000_000)


O_EMBEDDING_NEARDUP = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 50 = 0
), q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM aug
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_aggregate(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2]), 'sum') AS BIGINT) AS dot
  FROM q a JOIN q b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, dot FROM pairs WHERE dot >= 950000000000
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH approximate top-k. Table/probe counts are sized
    so the candidate set provably contains the exact top-3 at oracle scale
    (verified against the brute-force oracle); at 100 TB the same knobs trade
    recall for scan fraction."""
    from versatiles_rs_spark.dedup.embedding import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_lsh_topk(emb, [0, 1, 2, 3, 4], k=3, n_tables=8, probe_hamming=2)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted-file) approximate top-k — the second ANN scale
    path next to sign-LSH. The synthetic embeddings are near-uniform on the
    sphere (no cluster structure), so exactness at oracle scale needs
    nprobe/n_cells = 0.75; on real clustered embeddings the same code runs
    with a much smaller scan fraction."""
    from versatiles_rs_spark.dedup.embedding import ann_ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivf_topk(emb, [0, 1, 2, 3, 4], k=3, n_cells=8, nprobe=6)


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (dedup/pq.py) — the compressed-index ANN path: 32x PQ code
    compression, ADC lookup-table scoring over probed cells, exact
    integer-dot refine of the top pool. The synthetic embeddings are
    near-uniform on the sphere (worst case for PQ), so oracle-scale
    exactness needs nprobe=7/refine=48; clustered real embeddings run with far
    smaller pools."""
    from versatiles_rs_spark.dedup.pq import ann_ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivfpq_topk(emb, [0, 1, 2, 3, 4], k=3, n_cells=8, nprobe=7, refine=48)


O_ANN_LSH_TOPK = """
WITH scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
    CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(round(CAST(p[1] AS DOUBLE)*1000000) AS BIGINT) * CAST(round(CAST(p[2] AS DOUBLE)*1000000) AS BIGINT)), 'sum') AS BIGINT) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 5
), ranked AS (
  SELECT qid, vid, dot, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, dot, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 3
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard on a deterministic pair sample — SQL oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta")).filter("id_a % 10 = 0")
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    ta = F.array_distinct(F.split("ta", " "))
    tb = F.array_distinct(F.split("tb", " "))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = (F.size(ta) + F.size(tb)).cast("double") - F.size(F.array_intersect(ta, tb))
    return pairs.select(
        "id_a", "id_b", F.round(inter / union, 9).alias("jaccard")
    )


O_NGRAM_JACCARD = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(
    CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
                            list_distinct(string_split(b.text, ' ')))) AS DOUBLE)
    / (len(list_distinct(string_split(a.text, ' ')))
       + len(list_distinct(string_split(b.text, ' ')))
       - len(list_intersect(list_distinct(string_split(a.text, ' ')),
                            list_distinct(string_split(b.text, ' '))))), 9) AS jaccard
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id % 10 = 0
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-content fingerprint (md5 of first 64 chars + length bucket)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, 64)).alias("fp"),
        F.floor(F.length("text") / 100).cast("int").alias("len_bucket"),
    )


O_DOC_FINGERPRINT = """
SELECT doc_id, md5(substr(text, 1, 64)) AS fp,
       CAST(floor(length(text) / 100.0) AS INTEGER) AS len_bucket
FROM documents
"""


# BPE-ish tokenization: word runs OR single non-word-non-space chars —
# ASCII classes spelled out so Spark's and DuckDB's regex engines agree.


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting (the BPE-ish path of the training-data brief) —
    stays JVM-side via regexp_count; compare with the whitespace count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.expr(f"regexp_count(text, '{_BPE_RX}')").cast("bigint").alias("n_bpe_tokens"),
        F.expr(_TOKEN_COUNT_EXPR).cast("bigint").alias("n_ws_tokens"),
    )


O_TOKEN_COUNT_BPE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RX}')) AS BIGINT) AS n_bpe_tokens,
       CAST({_TOKEN_COUNT_EXPR} AS BIGINT) AS n_ws_tokens
FROM documents
"""


# Rabin-Karp polynomial rolling hash, base 131 mod 2^31-1: products stay
# below 2^39, exact in BIGINT on both engines. Fingerprint = (full-text
# hash, min 16-char-window hash) — the winnowing-style selection.
_RK_P = 2147483647
_RK_B = 131
_RK_W = 16


def q_doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    codes = "transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))"
    roll = f"(acc, c) -> (acc * {_RK_B} + c) % {_RK_P}"
    full = f"aggregate({codes}, 0L, {roll})"
    win = (
        f"array_min(transform(sequence(1, greatest(size({codes}) - {_RK_W - 1}, 1)), "
        f"i -> aggregate(slice({codes}, i, {_RK_W}), 0L, {roll})))"
    )
    return docs.select(
        "doc_id",
        F.expr(full).alias("rk_full"),
        F.expr(win).alias("rk_min_window"),
    )


O_DOC_FINGERPRINT_ROLLING = f"""
WITH codes AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS cs
  FROM documents
)
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, cs),
                   (acc, c) -> (acc * {_RK_B} + c) % {_RK_P}) AS rk_full,
       list_min(list_transform(range(1, greatest(len(cs) - {_RK_W - 1}, 1) + 1),
                i -> list_reduce(list_prepend(0::BIGINT, cs[i:i+{_RK_W - 1}]),
                                 (acc, c) -> (acc * {_RK_B} + c) % {_RK_P}))) AS rk_min_window
FROM codes
"""



# ---------------------------------------------------------------------------
# 15b. training-data hygiene: benchmark decontamination + quality-weighted
#      sampling (first-class LLM-pipeline ops)
# ---------------------------------------------------------------------------

_DECONTAM_N = 4
_DECONTAM_MOD = 97  # docs with doc_id % 97 == 0 form the "benchmark" set


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination (GPT-3-style hygiene): flag every
    corpus document sharing a verbatim word 4-gram with the benchmark
    subset. Pure Column n-gram explode + broadcast hash join — zero
    Python, zero corpus shuffle (dedup/decontam.py)."""
    from versatiles_rs_spark.dedup.decontam import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % _DECONTAM_MOD == 0)
    rest = docs.filter(F.col("doc_id") % _DECONTAM_MOD != 0)
    out = decontaminate(rest, bench, n=_DECONTAM_N)
    return out.select("doc_id", F.col("n_hits").cast("bigint").alias("n_hits"))


def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination (dedup/decontam.py): benchmark =
    every 50th embedding; corpus = the whole table (so the benchmark
    members themselves are the leaked-into-corpus positives — self-dot
    ~1e12 for near-unit vectors — while the natural max cosine ~0.51
    keeps every other doc clean). One broadcast + one mapInPandas pass;
    the oracle brute-forces the same quantized max-dot per corpus doc."""
    from versatiles_rs_spark.dedup.decontam import semantic_decontaminate

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = emb.filter("vec_id % 50 = 0")
    return semantic_decontaminate(emb, bench)


O_SEMANTIC_DECONTAMINATE = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM embeddings
), bench AS (
  SELECT qv FROM q WHERE vec_id % 50 = 0
), scored AS (
  SELECT c.vec_id,
         max(CAST(list_aggregate(list_transform(list_zip(c.qv, b.qv),
             p -> p[1] * p[2]), 'sum') AS BIGINT)) AS max_dot
  FROM q c CROSS JOIN bench b
  GROUP BY c.vec_id
)
SELECT vec_id, max_dot,
       CAST(max_dot >= 900000000000 AS BIGINT) AS contaminated
FROM scored
"""


O_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk FROM documents
), grams AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) = 0 THEN []
         WHEN len(tk) < {_DECONTAM_N} THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - {_DECONTAM_N - 2}),
                             i -> array_to_string(tk[i:i+{_DECONTAM_N - 1}], ' '))
    END) AS gs
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % {_DECONTAM_MOD} = 0
)
SELECT g.doc_id, CAST(count(DISTINCT u.gram) AS BIGINT) AS n_hits
FROM grams g, unnest(g.gs) AS u(gram)
WHERE u.gram IN (SELECT gram FROM bench) AND g.doc_id % {_DECONTAM_MOD} != 0
GROUP BY g.doc_id
"""


def q_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-weighted sampling (training-mix shaping): keep
    probability grows with document length, decided by the same portable
    integer hash as drop_rate thinning — reproducible across engines and
    runs, embarrassingly parallel (pure Column math in codegen)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    u = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    kept = docs.filter((u / F.lit(4294967296.0)) < p)
    return kept.groupBy("lang").agg(
        F.count("*").alias("kept"), F.sum("doc_id").alias("id_sum")
    )


O_QUALITY_SAMPLE = """
SELECT lang, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296.0
      < least(1.0, n_chars / 400.0)
GROUP BY lang
"""


# ---------------------------------------------------------------------------
# 20. paragraph-level corpus dedup (CCNet/GPT-3-style boilerplate removal)
# ---------------------------------------------------------------------------

# Deterministic multi-paragraph pages: every doc gets its unique body plus
# shared boilerplate — a footer on residue classes 0-2 of 4 (corpus-wide
# duplicate -> dropped) and a per-source banner (duplicated within each
# source group -> dropped), while 'extra <doc_id>' stays unique (kept).
_PARA_FOOTER = "all rights reserved footer"


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup (dedup/paragraphs.py): posexplode ->
    hash-count with map-side combine -> join on hash -> order-preserving
    reassembly. The oracle reimplements it in pure SQL (list aggregation
    with ORDER BY pos)."""
    from versatiles_rs_spark.dedup.paragraphs import paragraph_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    body = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 < 3, F.lit("\n\n" + _PARA_FOOTER)).otherwise(F.lit("")),
        F.lit("\n\nbanner for "), F.col("source"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("\n\nextra "), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )
    out = paragraph_dedup(docs.select("doc_id", body.alias("text")), max_occurrences=1)
    return out.select("doc_id", "text", "n_kept", "n_dropped")


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-NN graph over the embedding corpus (dedup/pq.py knn_graph):
    every vector's top-3 cosine neighbors via cell-local candidate
    generation (IVF member x probe equi-join on the cell key — the
    partition key at corpus scale) + exact integer-dot rescoring. Nothing
    corpus-sized ever reaches the driver. The synthetic embeddings are
    uniform on the sphere (no cluster structure — the IVF worst case), and
    ALL 500 per-vector top-3 sets must be simultaneously exact for the
    hash gate, so the oracle-scale run probes every cell (nprobe=8/8; the
    candidate join stays cell-local/co-located — the SHAPE that scales —
    while clustered real embeddings run nprobe << n_cells). The oracle is
    the all-pairs window top-3."""
    from versatiles_rs_spark.dedup.pq import knn_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_graph(emb, k=3, n_cells=8, nprobe=8)


O_KNN_GRAPH = """
WITH scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
    CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(round(CAST(p[1] AS DOUBLE)*1000000) AS BIGINT) * CAST(round(CAST(p[2] AS DOUBLE)*1000000) AS BIGINT)), 'sum') AS BIGINT) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT qid, vid, dot, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, dot, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 3
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters (dedup/clusters.py): MinHash-LSH pairs become
    connected components via iterative min-label propagation; output is
    one row per clustered doc with its canonical representative, cluster
    size, and the keep/drop decision. The oracle recomputes the SAME pair
    graph by brute force and takes its transitive closure with a
    recursive CTE — graph construction AND clustering are cross-checked."""
    from versatiles_rs_spark.dedup import minhash_dedup_pairs
    from versatiles_rs_spark.dedup.clusters import dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    return dedup_clusters(pairs).select("node", "cluster", "cluster_size", "keep")


def _o_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE {_SQL_GRAMS_CTE},
sets AS (SELECT doc_id, list_distinct(gs) AS s FROM grams),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
cc(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, cc.lab FROM cc JOIN edges e ON e.u = cc.node
),
comp AS (SELECT node, min(lab) AS cluster FROM cc GROUP BY node)
SELECT node, cluster,
       CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size,
       node = cluster AS keep
FROM comp
"""


O_DEDUP_CLUSTERS = _o_dedup_clusters()


O_PARAGRAPH_DEDUP = f"""
WITH pages AS (
  SELECT doc_id,
         text
         || (CASE WHEN doc_id % 4 < 3 THEN e'\\n\\n{_PARA_FOOTER}' ELSE '' END)
         || e'\\n\\nbanner for ' || source
         || (CASE WHEN doc_id % 5 = 0 THEN e'\\n\\nextra ' || CAST(doc_id AS VARCHAR) ELSE '' END)
         AS text
  FROM documents
), split AS (
  SELECT doc_id, string_split(text, e'\\n\\n') AS l FROM pages
), paras AS (
  SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
                 i -> {{'pos': i, 'para': l[i]}})) AS s
  FROM split
), flat AS (
  SELECT doc_id, s.pos AS pos, s.para AS para FROM paras WHERE trim(s.para) != ''
), counts AS (
  SELECT para, count(*) AS n_occ FROM flat GROUP BY para
)
SELECT f.doc_id,
       array_to_string(list(f.para ORDER BY f.pos) FILTER (WHERE c.n_occ <= 1), e'\\n\\n') AS text,
       CAST(count(*) FILTER (WHERE c.n_occ <= 1) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE c.n_occ > 1) AS BIGINT) AS n_dropped
FROM flat f JOIN counts c USING (para)
GROUP BY f.doc_id
"""


# ---------------------------------------------------------------------------
# 35. exact-substring duplication: dup n-grams (Lee et al.) + winnowing (MOSS)
# ---------------------------------------------------------------------------

def q_dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-duplicated word-5-gram coverage per document (Lee et al.,
    ACL 2022): one explode + one map-side-combined gram-hash aggregate +
    one equi-join against the (small) duplicate set."""
    from versatiles_rs_spark.dedup.substrings import dup_ngram_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dup_ngram_stats(docs, n=5, min_count=2)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer et al., SIGMOD 2003):
    k=3-word-gram Rabin-Karp hashes, window w=4 minima with the exact
    rightmost-min tie rule (packed-key construction). Zero-shuffle
    per-row array math."""
    from versatiles_rs_spark.dedup.substrings import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnow_fingerprints(docs, k=3, w=4)


def _o_dup_ngram_stats() -> str:
    from versatiles_rs_spark.dedup.substrings import dup_ngram_stats_sql

    return dup_ngram_stats_sql(n=5, min_count=2)


def _o_winnow_fingerprints() -> str:
    from versatiles_rs_spark.dedup.substrings import winnow_fingerprints_sql

    return winnow_fingerprints_sql(k=3, w=4)


O_DUP_NGRAM_STATS = _o_dup_ngram_stats()
O_WINNOW_FINGERPRINTS = _o_winnow_fingerprints()


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup's *edit* step (Lee et al., ACL 2022 §3):
    delete every token covered by a corpus-duplicated word-5-gram and
    fingerprint the cleaned text. Same bounded passes as dup_ngram_stats
    plus one doc-keyed join; the deletion is per-row array math."""
    from versatiles_rs_spark.dedup.substrings import dup_span_removal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dup_span_removal(docs, n=5, min_count=2)


def _o_dup_span_removal() -> str:
    from versatiles_rs_spark.dedup.substrings import dup_span_removal_sql

    return dup_span_removal_sql(n=5, min_count=2)


O_DUP_SPAN_REMOVAL = _o_dup_span_removal()


# ---------------------------------------------------------------------------
# 36. corpus curation funnel + relational k-means + SemDeDup
# ---------------------------------------------------------------------------

def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel all -> C4 -> +Gopher -> +normalized
    dedup with per-stage doc and token counts: one per-row flag
    projection, one dedup window, one 4-group aggregate."""
    from versatiles_rs_spark.pages.quality_filters import filter_funnel

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return filter_funnel(docs)


def _o_filter_funnel() -> str:
    from versatiles_rs_spark.pages.quality_filters import filter_funnel_sql

    return filter_funnel_sql()


O_FILTER_FUNNEL = _o_filter_funnel()


_NEARDUP_FUNNEL_THRESHOLD = 0.5


def q_filter_funnel_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel extended with a 5th near-dup stage (the
    `curate_job --neardup minhash` pipeline): stage-3 survivors go
    through MinHash-LSH banded pairs -> exact-Jaccard verify ->
    connected components, keeping the min-doc_id representative per
    cluster. The oracle brute-forces the same pair graph among the
    survivors and closes it with a recursive CTE, so banding recall,
    the verify threshold, AND the cluster-keeper rule are all attested."""
    from versatiles_rs_spark.pages.quality_filters import filter_funnel

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return filter_funnel(docs, neardup_threshold=_NEARDUP_FUNNEL_THRESHOLD)


def _o_filter_funnel_neardup() -> str:
    from versatiles_rs_spark.pages.quality_filters import filter_funnel_sql

    return filter_funnel_sql(neardup_threshold=_NEARDUP_FUNNEL_THRESHOLD)


O_FILTER_FUNNEL_NEARDUP = _o_filter_funnel_neardup()


_SEM_CLONE_MOD = 50
_SEM_CLONE_OFFSET = 100000


def _aug_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clone-augmented embeddings table q_embedding_neardup
    established: identical vectors at vec_id+100000 for vec_id%50==0
    guarantee near-dup positives (the natural table's max cosine ~0.51)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clones = emb.filter(f"vec_id % {_SEM_CLONE_MOD} = 0").select(
        (F.col("vec_id") + _SEM_CLONE_OFFSET).alias("vec_id"), "embedding"
    )
    return emb.select("vec_id", "embedding").unionByName(clones)


_AUG_SQL = f"""aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_SEM_CLONE_OFFSET}, embedding FROM embeddings
  WHERE vec_id % {_SEM_CLONE_MOD} = 0
)"""


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (k=8, 2 assign/update rounds) over the
    clone-augmented embeddings: per-cluster membership counts + exact
    integer centroid checksums. Assignment is a zero-shuffle map against
    broadcast centroid literals; each update is one K*dim-group
    aggregate; the oracle unrolls both iterations in SQL."""
    from versatiles_rs_spark.dedup.kmeans import kmeans_summary, lloyd_kmeans

    assigned, cents = lloyd_kmeans(_aug_embeddings(spark, sf_dir), k=8, iters=2)
    return kmeans_summary(assigned, cents)


def _o_kmeans_clusters() -> str:
    from versatiles_rs_spark.dedup.kmeans import kmeans_summary_sql

    sql = kmeans_summary_sql(k=8, iters=2, table="aug")
    return sql.replace("WITH ", f"WITH {_AUG_SQL},\n", 1)


O_KMEANS_CLUSTERS = _o_kmeans_clusters()


def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means clustering then exact
    quantized-dot near-dup pairs WITHIN clusters — cluster-keyed equi-join,
    never corpus-quadratic. Clone augmentation guarantees positives; the
    identical-vector clones must co-cluster by construction."""
    from versatiles_rs_spark.dedup.kmeans import semdedup_pairs

    return semdedup_pairs(_aug_embeddings(spark, sf_dir), k=8, iters=2)


def _o_semdedup_pairs() -> str:
    from versatiles_rs_spark.dedup.kmeans import semdedup_pairs_sql

    sql = semdedup_pairs_sql(k=8, iters=2, table="aug")
    return sql.replace("WITH ", f"WITH {_AUG_SQL},\n", 1)


O_SEMDEDUP_PAIRS = _o_semdedup_pairs()




# ---------------------------------------------------------------------------
# 40. Snapshot-incremental dedup (new crawl batch vs seen-fingerprint store)
# ---------------------------------------------------------------------------


def q_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental crawl dedup (dedup/snapshots.py): the store holds
    fingerprints of previously-kept docs (doc_id % 3 <> 0); the incoming
    batch is every even doc re-crawled as a MESSY variant of its base
    doc's content (base = doc_id floored to a multiple of 10), so the
    oracle attests normalization-keyed store membership ('dup_store'),
    batch-internal first-occurrence ('dup_batch'), and survivors ('new')
    in one verdict column. One shuffle total: the first-occurrence
    window reuses the fp join's partitioning."""
    from versatiles_rs_spark.dedup.snapshots import (
        snapshot_dedup,
        snapshot_fingerprints,
    )
    from versatiles_rs_spark.pages.quality_filters import messy_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(F.col("doc_id").alias("base_id"),
                       F.col("text").alias("base_text"))
    batch = (
        docs.where("doc_id % 2 = 0")
        .withColumn("base_id",
                    F.expr("doc_id - ((doc_id % 10) + 10) % 10"))
        .join(base, "base_id")
        .select("doc_id",
                F.expr(messy_text("doc_id", "base_text")).alias("text"))
    )
    store = docs.where("doc_id % 3 <> 0").select("text")
    return snapshot_dedup(batch, snapshot_fingerprints(store))


def q_snapshot_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup (dedup/snapshots.py): the store band index
    holds the LSH buckets of previously-kept docs (every 10th doc whose
    id % 3 <> 0); the batch re-crawls every 5th doc as its base doc's
    text plus a short revision tail (1 or 2 ' rev' tokens, so siblings
    of one base are near- but not exact dups of the base and of each
    other). The oracle brute-forces exact 3-gram Jaccard batch x store
    and the transitive closure among survivors — attesting banding
    recall, the verify threshold, store precedence, and the min-id
    cluster-keeper rule in one verdict column."""
    from versatiles_rs_spark.dedup.snapshots import snapshot_neardup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.select(F.col("doc_id").alias("base_id"),
                       F.col("text").alias("base_text"))
    batch = (
        docs.where("doc_id % 5 = 0")
        .withColumn("base_id", F.expr("doc_id - doc_id % 10"))
        .join(base, "base_id")
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.expr(
                "concat(base_text, repeat(' rev', "
                "CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 2 END))"
            ).alias("text"),
        )
    )
    store = docs.where("doc_id % 10 = 0 AND doc_id % 3 <> 0") \
                .select("doc_id", "text")
    return snapshot_neardup(batch, store, threshold=0.5)


def _o_snapshot_neardup() -> str:
    from versatiles_rs_spark.dedup.snapshots import snapshot_neardup_sql

    batch_cte = (
        "SELECT d.doc_id + 1000000 AS doc_id, "
        "concat(b.text, repeat(' rev', "
        "CASE WHEN d.doc_id % 10 = 0 THEN 1 ELSE 2 END)) AS text "
        "FROM documents d JOIN documents b ON b.doc_id = d.doc_id - d.doc_id % 10 "
        "WHERE d.doc_id % 5 = 0"
    )
    store_cte = ("SELECT doc_id, text FROM documents "
                 "WHERE doc_id % 10 = 0 AND doc_id % 3 <> 0")
    return snapshot_neardup_sql(batch_cte, store_cte, threshold=0.5)


O_SNAPSHOT_NEARDUP = _o_snapshot_neardup()


def _o_snapshot_dedup() -> str:
    from versatiles_rs_spark.dedup.snapshots import snapshot_dedup_sql
    from versatiles_rs_spark.pages.quality_filters import messy_text

    batch_cte = (
        "SELECT d.doc_id AS doc_id, "
        + messy_text("d.doc_id", "b.text")
        + " AS text FROM documents d JOIN documents b "
        "ON b.doc_id = d.doc_id - ((d.doc_id % 10) + 10) % 10 "
        "WHERE d.doc_id % 2 = 0"
    )
    store_cte = "SELECT text FROM documents WHERE doc_id % 3 <> 0"
    return snapshot_dedup_sql(batch_cte, store_cte)


O_SNAPSHOT_DEDUP = _o_snapshot_dedup()


def q_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join (dedup/setjoin.py): ALL pairs with
    3-gram-shingle Jaccard >= 1/2 via prefix filtering — the exact
    complement of the probabilistic MinHash path (no false negatives by
    the prefix theorem, attested because the oracle brute-forces every
    pair). Integer threshold algebra: i*(td+tn) >= tn*(na+nb)."""
    from versatiles_rs_spark.dedup.setjoin import jaccard_similarity_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return jaccard_similarity_join(docs, tn=1, td=2)


O_JACCARD_JOIN = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(CASE WHEN len(l) < 3 THEN []
    ELSE list_transform(range(1, len(l) - 1),
                        i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]) END) AS s
  FROM toks
), e AS (SELECT doc_id, unnest(s) AS g FROM sh),
sz AS (SELECT doc_id, len(s) AS n FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter, sa.n AS na, sb.n AS nb
FROM inter i JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b
WHERE i.inter * 3 >= 1 * (sa.n + sb.n)
"""


def q_edit1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 join (dedup/setjoin.edit1_join): vocabulary of
    single-substitution variants of an 8-char base word (position
    doc_id % 8 replaced by letter 'a' + doc_id % 7 — 50 distinct words
    at sf0.01 with a rich ed=1 pair structure); FastSS deletion-
    neighborhood blocking + native levenshtein verify. The oracle
    brute-forces the full cross product with the same levenshtein, so
    MATCH attests RECALL of the blocking, not just precision."""
    from versatiles_rs_spark.dedup.setjoin import edit1_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    word = F.expr(
        "concat(substring('tokenstr', 1, cast(doc_id % 8 as int)),"
        " chr(97 + doc_id % 7),"
        " substring('tokenstr', cast(doc_id % 8 as int) + 2, 8))"
    )
    words = docs.select(word.alias("word")).distinct()
    return edit1_join(words).orderBy("a", "b")


O_EDIT1_PAIRS = """
WITH w AS (
  SELECT DISTINCT concat(substring('tokenstr', 1, CAST(doc_id % 8 AS INT)),
                         chr(CAST(97 + doc_id % 7 AS INT)),
                         substring('tokenstr', CAST(doc_id % 8 AS INT) + 2, 8)) AS word
  FROM documents
)
SELECT a.word AS a, b.word AS b
FROM w a JOIN w b ON a.word < b.word
WHERE levenshtein(a.word, b.word) <= 1
ORDER BY a, b
"""


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions, fully JVM-side (the Spark-first
    path the numpy-backed ANN ops deliberately bypass): per-vector
    quantized L2 norm² via transform + aggregate lambdas — zero Python,
    zero explode — bucketed per label. Components quantize to 1e3 ints
    per element BEFORE squaring (order-free exact sums; dim=64 * 1e6 max
    per term fits int64 easily). Oracle = DuckDB list lambdas."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qnorm2 = F.expr(
        "aggregate(transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),"
        " CAST(0 AS BIGINT), (acc, q) -> acc + q * q)"
    )
    return (
        emb.select("label", qnorm2.alias("qnorm2"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qnorm2").alias("sum_qnorm2"),
            F.min("qnorm2").alias("min_qnorm2"),
            F.max("qnorm2").alias("max_qnorm2"),
        )
        .orderBy("label")
    )


O_EMBEDDING_NORMS = """
WITH q AS (
  SELECT label,
         list_sum(list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                * CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS qnorm2
  FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
       CAST(sum(qnorm2) AS BIGINT) AS sum_qnorm2,
       CAST(min(qnorm2) AS BIGINT) AS min_qnorm2,
       CAST(max(qnorm2) AS BIGINT) AS max_qnorm2
FROM q GROUP BY label ORDER BY label
"""
