"""Repetition-based quality signals (Gopher / MassiveText-style filters).

Heavily repetitive pages (SEO spam, templated listings, scraper echo) are
filtered by repetition fractions rather than content judgments. The three
standard signals here:

- ``dup_line_frac``      — fraction of non-blank lines that are repeats of
  an earlier line in the same document,
- ``dup_para_frac``      — same at paragraph granularity,
- ``top_bigram_frac``    — fraction of word-bigram occurrences taken by the
  document's single most frequent bigram.

Scale shape: the line/paragraph fractions are PURE Column math on split
arrays (``array_distinct`` — no shuffle, no Python, computed in the scan
stage). The bigram signal needs a per-(doc, gram) count: posexplode +
two-level aggregation, both map-side combinable and keyed by doc_id, so
it partitions perfectly at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nonblank(parts: Column) -> Column:
    return F.filter(parts, lambda x: F.trim(x) != F.lit(""))


def dup_fraction(text: Column, sep: str) -> Column:
    """1 - distinct/total over non-blank ``sep``-separated segments (0.0
    for empty documents)."""
    import re

    parts = _nonblank(F.split(text, re.escape(sep)))
    n = F.size(parts)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(parts)) / n.cast("double")
    )


def dup_fraction_sql(expr: str, sep_sql: str) -> str:
    """The identical fraction as DuckDB SQL (sep_sql is a SQL literal,
    e.g. ``e'\\n'``)."""
    parts = f"list_filter(string_split({expr}, {sep_sql}), x -> trim(x) != '')"
    return (
        f"CASE WHEN len({parts}) <= 0 THEN 0.0 "
        f"ELSE 1.0 - len(list_distinct({parts})) * 1.0 / len({parts}) END"
    )


def with_line_para_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Append dup_line_frac / dup_para_frac — zero-shuffle Column math."""
    t = F.col(text_col)
    return docs.withColumn("dup_line_frac", dup_fraction(t, "\n")).withColumn(
        "dup_para_frac", dup_fraction(t, "\n\n")
    )


def top_bigram_fraction(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_bigrams, top_bigram_frac): the most frequent word
    bigram's share of all bigram occurrences (0.0 when < 2 words)."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    exploded = docs.select("doc_id", F.explode_outer(grams).alias("gram"))
    per_gram = exploded.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.coalesce(F.sum(F.when(F.col("gram").isNotNull(), F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("n_bigrams"),
        F.when(
            F.coalesce(F.sum(F.when(F.col("gram").isNotNull(), F.col("c"))), F.lit(0)) == 0,
            F.lit(0.0),
        )
        .otherwise(
            F.max(F.when(F.col("gram").isNotNull(), F.col("c")).otherwise(F.lit(0)))
            / F.sum(F.when(F.col("gram").isNotNull(), F.col("c"))).cast("double")
        )
        .alias("top_bigram_frac"),
    )
