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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


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


_SEM_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("max_dot", LongType())]
)


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    min_dot: int = 900_000_000_000,  # cosine ~0.9 for unit vectors at 1e6 quant
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: flag corpus docs whose embedding
    is too close to ANY benchmark embedding -> (vec_id, max_dot,
    contaminated 0/1). Catches paraphrased contamination the verbatim
    n-gram check (``decontaminate``) misses.

    Scale shape: the benchmark is bounded by definition (an eval set),
    so its quantized matrix broadcasts to every task and each Arrow
    batch computes one (batch x bench) integer matmul — zero joins, zero
    shuffles, one mapInPandas pass over the corpus. Dots are exact
    int64 sums of 1e6-quantized components (same quantization as
    dedup/embedding.py), so scores are order-free and cross-engine
    reproducible; no overflow up to ~9e6 dims.
    """
    bm = benchmark.select(vec_col).collect()
    if not bm:
        raise ValueError("semantic_decontaminate: empty benchmark set")
    bq = _quant_i64(np.array([list(r[0]) for r in bm], dtype=np.float64))

    spark = corpus.sparkSession
    b = spark.sparkContext.broadcast(bq)

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bench_q = b.value
        for pdf in it:
            if not len(pdf):
                continue
            x = _quant_i64(
                np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            )
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].values,
                    "max_dot": (x @ bench_q.T).max(axis=1),
                }
            )

    out = corpus.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        score, _SEM_SCHEMA
    )
    return out.withColumn(
        "contaminated",
        (F.col("max_dot") >= F.lit(int(min_dot))).cast("bigint"),
    )


def _quant_i64(v: np.ndarray) -> np.ndarray:
    """Half-away-from-zero 1e6 quantization (the twin of Spark/DuckDB
    ``round(x * 1e6)``; numpy's rint is half-to-even and would diverge
    on exact .5 ties)."""
    s = v * 1e6
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)).astype(np.int64)
