"""Repetition quality signals (pages/repetition.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.repetition import (
    dup_fraction,
    top_bigram_fraction,
    with_line_para_stats,
)


def test_dup_fraction_lines(spark):
    rows = [
        (1, "a\nb\nc"),  # all unique
        (2, "a\na\na\nb"),  # 4 lines, 2 distinct -> 0.5
        (3, "x"),  # single line
        (4, "a\n\n\na"),  # blanks ignored: 2 lines, 1 distinct -> 0.5
        (5, ""),  # empty -> 0.0
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: r["f"]
        for r in df.select("doc_id", dup_fraction(F.col("text"), "\n").alias("f")).collect()
    }
    assert got[1] == 0.0
    assert got[2] == pytest.approx(0.5)
    assert got[3] == 0.0
    assert got[4] == pytest.approx(0.5)
    assert got[5] == 0.0


def test_para_stats_zero_shuffle(spark):
    df = spark.createDataFrame(
        pd.DataFrame([(1, "p\n\np\n\nq")], columns=["doc_id", "text"])
    )
    out = with_line_para_stats(df).collect()[0]
    assert out["dup_para_frac"] == pytest.approx(1 / 3)
    plan = with_line_para_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_top_bigram_fraction(spark):
    rows = [
        (1, "buy now buy now buy now"),  # bigrams: 'buy now' x3, 'now buy' x2 -> 3/5
        (2, "all words are different here"),  # 4 distinct bigrams -> 1/4
        (3, "single"),  # <2 words -> 0 bigrams
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in top_bigram_fraction(df).collect()}
    assert got[1]["n_bigrams"] == 5 and got[1]["top_bigram_frac"] == pytest.approx(0.6)
    assert got[2]["n_bigrams"] == 4 and got[2]["top_bigram_frac"] == pytest.approx(0.25)
    assert got[3]["n_bigrams"] == 0 and got[3]["top_bigram_frac"] == 0.0
