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
