"""Paragraph-level corpus deduplication (CCNet / GPT-3-style hygiene).

Web pages share boilerplate paragraphs (cookie banners, nav footers,
license blurbs) that document-level dedup never removes. The standard
remedy is corpus-wide paragraph dedup: hash every paragraph, count
occurrences across the WHOLE corpus, and drop paragraphs appearing more
than ``max_occurrences`` times while keeping each document's remaining
paragraphs in order.

Scale shape (100 TB): paragraphs are exploded with ``posexplode`` (pure
codegen), the occurrence count is a hash aggregation with map-side
partial combine, and the drop decision joins paragraphs to their count on
the hash key — no driver-side state, no all-pairs anything. Reassembly is
one groupBy(doc) with an order-preserving ``array_sort(collect_list(
struct(pos, para)))``. Two shuffles total (count, reassemble), both on
keys with web-natural cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_paragraphs(docs: DataFrame, text_col: str = "text", sep: str = "\n\n") -> DataFrame:
    """One row per (doc_id, pos, paragraph); blank paragraphs dropped."""
    import re

    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias("pos", "para"),
        )
        .where(F.trim(F.col("para")) != "")
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    max_occurrences: int = 1,
    sep: str = "\n\n",
) -> DataFrame:
    """Remove corpus-duplicated paragraphs; returns (doc_id, text, n_kept,
    n_dropped) with surviving paragraphs rejoined by ``sep`` in original
    order. A paragraph survives iff its exact text occurs in at most
    ``max_occurrences`` times across the corpus."""
    paras = explode_paragraphs(docs, text_col, sep).withColumn(
        "phash", F.md5(F.col("para"))
    )
    counts = paras.groupBy("phash").agg(F.count("*").alias("n_occ"))
    marked = paras.join(counts, "phash")
    kept = F.array_sort(
        F.collect_list(
            F.when(F.col("n_occ") <= max_occurrences, F.struct("pos", "para"))
        )
    )
    out = marked.groupBy("doc_id").agg(
        kept.alias("kept"),
        F.count("*").alias("n_total"),
        F.sum((F.col("n_occ") <= max_occurrences).cast("long")).alias("n_kept"),
    )
    return out.select(
        "doc_id",
        F.array_join(F.transform(F.col("kept"), lambda s: s["para"]), sep).alias(text_col),
        F.col("n_kept"),
        (F.col("n_total") - F.col("n_kept")).alias("n_dropped"),
    )
