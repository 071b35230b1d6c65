"""Snapshot-incremental dedup: dedup a NEW crawl batch against the
fingerprint store of everything previously kept.

A continuously-crawled 10^12-document corpus is never deduped from
scratch: each incoming snapshot is checked against the store of
fingerprints already committed (CCNet and the Common Crawl index do
exactly this — content digests per snapshot, new snapshots joined
against prior digests). The batch-internal first-occurrence rule and
the store membership test compose into a per-doc verdict:

    dup_store  — normalized fingerprint already in the store
    dup_batch  — first seen earlier (smaller doc_id) within this batch
    new        — survives; its fingerprint joins the store afterwards

Scale shape: ONE shuffle. The batch joins the store on the fingerprint
key, and the batch-internal first-occurrence window runs over the SAME
partitioning (fp), so Catalyst reuses the exchange — plan-asserted in
tests (exactly one Exchange over the batch side). In production the
store is written bucketed by fp (lineage.keyed_resumable's bucket
column), so the store side re-shuffles nothing; the batch — the small,
new side — is the only moving data. The corpus is never re-deduped.

Fingerprints are md5 over the canonical normal form
(pages/quality_filters.normalize_text), so messy re-crawls of identical
content (case, punctuation, whitespace drift) land on the same store
key — the same normalization contract as `normalized_dedup`.

No reference counterpart (versatiles-rs has no corpus dedup); extends
the §2.13 training-data layer next to dedup/substrings.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.quality_filters import (
    normalize_text,
    normalize_text_sql,
)


def fingerprint_expr(text_col: str) -> str:
    """Spark SQL: the store key — md5 of the canonical normal form."""
    return f"md5({normalize_text(text_col)})"


def fingerprint_sql(text_col: str) -> str:
    """DuckDB twin of fingerprint_expr."""
    return f"md5({normalize_text_sql(text_col)})"


def snapshot_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct fingerprint store of a kept corpus: one map-side-combined
    hash aggregate, output bounded by distinct content."""
    return docs.select(
        F.expr(fingerprint_expr(text_col)).alias("fp")
    ).distinct()


def snapshot_dedup(batch: DataFrame, store_fps: DataFrame,
                   doc_id: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Classify every batch doc: (doc_id, fp, status).

    status = 'dup_store' (fp in store) | 'dup_batch' (an earlier batch
    doc — smaller doc_id — has the same fp) | 'new'. Store membership
    takes precedence: a re-crawled page is a store-dup even if the batch
    also contains it twice."""
    b = batch.select(
        F.col(doc_id).alias("doc_id"),
        F.expr(fingerprint_expr(text_col)).alias("fp"),
    )
    seen = store_fps.select("fp").distinct().withColumn("_seen", F.lit(True))
    j = b.join(seen, "fp", "left")
    first = F.min("doc_id").over(Window.partitionBy("fp"))
    return j.select(
        "doc_id",
        "fp",
        F.when(F.col("_seen").isNotNull(), F.lit("dup_store"))
        .when(F.col("doc_id") > first, F.lit("dup_batch"))
        .otherwise(F.lit("new"))
        .alias("status"),
    )


def store_band_index(
    store_docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    max_bucket: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The persistable LSH index of a kept corpus: (band, bkey,
    ids: array<long>) — one bucket row per (band, band-slice hash) with
    the member doc ids, sorted and capped at ``max_bucket`` (the hot-
    bucket skew valve; boilerplate text at web scale lands millions of
    docs on one key).

    This is the near-dup analog of snapshot_fingerprints: built ONCE per
    corpus and maintained incrementally (new kept docs append their band
    rows), so each incoming snapshot probes it without re-signing or
    re-shuffling the corpus. In production it is written bucketed by
    (band, bkey) so the probe join moves only the batch side."""
    from versatiles_rs_spark.dedup.minhash import (
        minhash_band_keys,
        minhash_signatures,
    )

    sigs = minhash_signatures(store_docs, num_hashes, shingle_n, id_col, text_col)
    return (
        minhash_band_keys(sigs, num_hashes, bands)
        .groupBy("band", "bkey")
        .agg(F.slice(F.sort_array(F.collect_list("doc_id")), 1, max_bucket).alias("ids"))
    )


def snapshot_neardup(
    batch: DataFrame,
    store_docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_n: int = 3,
    max_bucket: int = 64,
    store_bands: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental NEAR-dup: classify every batch doc against the kept
    corpus without re-deduping the corpus -> (doc_id, status).

        dup_store — verified n-gram Jaccard >= threshold with >= 1 store
                    doc (candidates from the store band index)
        dup_batch — batch-internal near-dup cluster non-representative
                    (connected components over verified pairs among the
                    docs that survived the store check; keeper = min id)
        new       — survives; its band rows join the index afterwards

    Store membership takes precedence, mirroring snapshot_dedup: a
    re-crawl near-identical to kept content is a store-dup even if the
    batch contains siblings of it.

    Scale shape: the batch is signed once (mapInPandas, no shuffle) and
    its band rows probe the index with an equi-join on (band, bkey) —
    with the index bucketed on that key, only the batch moves. Exact
    verification joins texts for the O(candidates) pair set only; the
    batch-internal stage runs the ordinary LSH cascade over the (small)
    batch alone. Doc ids must be globally unique across store + batch
    (true of any corpus with stable ids).

    ``store_bands``, if given, must have been built by store_band_index
    with the SAME num_hashes/bands/shingle_n.

    No reference counterpart; extends the snapshot-incremental layer
    next to snapshot_dedup (CCNet-style cross-snapshot dedup).
    """
    from versatiles_rs_spark.dedup.clusters import dedup_clusters
    from versatiles_rs_spark.dedup.minhash import (
        minhash_band_keys,
        minhash_dedup_pairs,
        minhash_signatures,
    )
    from versatiles_rs_spark.dedup.ngram import jaccard_pairs

    b = batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    s = store_docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    idx = (
        store_bands
        if store_bands is not None
        else store_band_index(s, num_hashes, bands, shingle_n, max_bucket)
    )
    sigs = minhash_signatures(b, num_hashes, shingle_n)
    cand = (
        minhash_band_keys(sigs, num_hashes, bands)
        .join(idx, ["band", "bkey"])
        .select(F.col("doc_id").alias("id_a"), F.explode("ids").alias("id_b"))
        .distinct()
    )
    # verify texts: batch side + ONLY the candidate store docs
    texts = b.unionByName(
        s.join(cand.select(F.col("id_b").alias("doc_id")).distinct(), "doc_id", "left_semi")
    )
    sdup = (
        jaccard_pairs(texts, cand, n=shingle_n)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias("doc_id"))
        .distinct()
    )
    rest = b.join(sdup, "doc_id", "left_anti")
    bpairs = minhash_dedup_pairs(
        rest, num_hashes, bands, shingle_n, threshold, max_bucket
    )
    bdrop = (
        dedup_clusters(bpairs)
        .where(~F.col("keep"))
        .select(F.col("node").alias("doc_id"))
    )
    return (
        b.select("doc_id")
        .join(sdup.withColumn("_s", F.lit(True)), "doc_id", "left")
        .join(bdrop.withColumn("_b", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_s").isNotNull(), F.lit("dup_store"))
            .when(F.col("_b").isNotNull(), F.lit("dup_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


def _grams_sql(tk: str) -> str:
    """DuckDB: word-3-gram shingle set of a token list (the twin of
    dedup/ngram.shingle_set: empty -> [], < 3 tokens -> the whole text
    as one gram)."""
    return (
        f"list_distinct(CASE WHEN len({tk}) = 0 THEN [] "
        f"WHEN len({tk}) < 3 THEN [array_to_string({tk}, ' ')] "
        f"ELSE list_transform(range(1, len({tk}) - 1), "
        f"i -> {tk}[i] || ' ' || {tk}[i+1] || ' ' || {tk}[i+2]) END)"
    )


_JAC_SQL = (
    "CASE WHEN len({a}) = 0 AND len({b}) = 0 THEN 1.0 "
    "ELSE CAST(len(list_intersect({a}, {b})) AS DOUBLE) "
    "/ (len({a}) + len({b}) - len(list_intersect({a}, {b}))) END"
)


def snapshot_neardup_sql(batch_cte: str, store_cte: str,
                         threshold: float = 0.5) -> str:
    """DuckDB twin of snapshot_neardup over two CTE bodies producing
    batch(doc_id, text) and store(doc_id, text): brute-force exact
    3-gram Jaccard batch x store, then a recursive-CTE transitive
    closure among the store-check survivors with the min-label keeper
    rule — the oracle attests banding recall, the verify threshold, and
    store precedence."""
    jac = _JAC_SQL.format(a="a.s", b="b.s")
    return f"""
WITH RECURSIVE batch AS ({batch_cte}), store AS ({store_cte}),
bs AS (
  SELECT doc_id, {_grams_sql("list_filter(string_split(text, ' '), t -> t != '')")} AS s
  FROM batch
), ss AS (
  SELECT doc_id, {_grams_sql("list_filter(string_split(text, ' '), t -> t != '')")} AS s
  FROM store
), sdup AS (
  SELECT DISTINCT a.doc_id FROM bs a JOIN ss b ON {jac} >= {threshold}
), rest AS (
  SELECT * FROM bs WHERE doc_id NOT IN (SELECT doc_id FROM sdup)
), rpairs AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM rest a JOIN rest b ON a.doc_id < b.doc_id
  WHERE {jac} >= {threshold}
), redges AS (
  SELECT u, v FROM rpairs UNION SELECT v, u FROM rpairs
), rcc(node, lab) AS (
  SELECT u, u FROM redges
  UNION
  SELECT e.v, rcc.lab FROM rcc JOIN redges e ON e.u = rcc.node
), rdrop AS (
  SELECT node FROM rcc GROUP BY node HAVING node != min(lab)
)
SELECT doc_id,
       CASE WHEN doc_id IN (SELECT doc_id FROM sdup) THEN 'dup_store'
            WHEN doc_id IN (SELECT node FROM rdrop) THEN 'dup_batch'
            ELSE 'new' END AS status
FROM batch
"""


def snapshot_dedup_sql(batch_cte: str, store_cte: str) -> str:
    """DuckDB twin over two CTE bodies producing batch(doc_id, text) and
    store(text)."""
    fp = fingerprint_sql("text")
    return f"""
WITH batch AS ({batch_cte}),
store AS (SELECT DISTINCT {fp} AS fp FROM ({store_cte})),
bf AS (SELECT doc_id, {fp} AS fp FROM batch),
j AS (
  SELECT bf.doc_id, bf.fp, store.fp IS NOT NULL AS seen,
         min(bf.doc_id) OVER (PARTITION BY bf.fp) AS first_id
  FROM bf LEFT JOIN store ON bf.fp = store.fp
)
SELECT doc_id, fp,
       CASE WHEN seen THEN 'dup_store'
            WHEN doc_id > first_id THEN 'dup_batch'
            ELSE 'new' END AS status
FROM j
"""
