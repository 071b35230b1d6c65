"""Benchmark decontamination: flag documents sharing an n-gram with a
benchmark/eval set.

The standard training-data hygiene step (popularized by GPT-3's 13-gram
and C4's line-level checks): any document containing a verbatim word
n-gram from a held-out benchmark is flagged (or dropped) so the model is
not evaluated on memorized training text.

Spark shape (designed for 10^12 docs vs a bounded benchmark set):
- both sides produce DISTINCT word n-grams with pure Column math
  (split -> transform(sequence) -> array_distinct -> explode) — zero
  Python, fully codegen;
- the benchmark side is tiny by construction, so the equi-join on the
  gram is a broadcast hash join: no shuffle of the document corpus at
  all, just a map-side probe per exploded gram;
- output is one row per contaminated document with the count of distinct
  matching grams (callers drop or audit).

At 100 TB the exploded-gram stream never materializes: the explode, the
broadcast probe and the count-distinct aggregate sit in one stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams_col(text_col, n: int):
    """DISTINCT word n-grams of a text column as array<string>, pure
    Column math (same tokenization as dedup.ngram.shingle_set: split on
    whitespace, drop empties; whole text when shorter than n)."""
    toks = F.filter(F.split(text_col, " "), lambda t: t != "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(grams)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_hits): documents sharing >= 1 word n-gram with the
    benchmark table, with the count of distinct shared grams."""
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram")
        )
        .filter(F.col("gram") != "")  # empty text -> no gram (not "")
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams_col(F.col(text_col), n)).alias("gram"),
    ).filter(F.col("gram") != "")
    return (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hits"))
    )
