"""n-gram shingling + exact Jaccard verification (pure numpy/pandas).

The exact-verify stage shared by the MinHash/SimHash candidate generators:
candidates are cheap and recall-oriented; this computes true n-gram Jaccard
on the (tiny) candidate pair set.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def shingle_set(text: str, n: int = 3) -> set[str]:
    """Word n-gram shingles; n=1 degenerates to the token set."""
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


_PAIR_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("jaccard", DoubleType()),
    ]
)


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs.

    Plan: join pair ids to texts twice (broadcast if pairs are small), then
    one vectorized batch pass. At scale the joins shuffle on doc id — the
    pair set after LSH banding is O(duplicates), not O(N^2)."""
    texts = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    joined = (
        pairs.join(texts.withColumnRenamed("_id", "id_a").withColumnRenamed("_txt", "text_a"), "id_a")
        .join(texts.withColumnRenamed("_id", "id_b").withColumnRenamed("_txt", "text_b"), "id_b")
    )

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sims = [
                jaccard(shingle_set(ta, n), shingle_set(tb, n))
                for ta, tb in zip(pdf["text_a"], pdf["text_b"])
            ]
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].values,
                    "id_b": pdf["id_b"].values,
                    "jaccard": np.round(sims, 9),
                }
            )

    return joined.select("id_a", "id_b", "text_a", "text_b").mapInPandas(score, _PAIR_SCHEMA)
