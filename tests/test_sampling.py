"""Stratified sampling + vocabulary building (pages/sampling.py)."""

import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.sampling import stratified_sample, vocab_topk


def _docs(spark, n=2000):
    rows = [(i, "en" if i % 2 == 0 else "de", f"w{i % 7} w{i % 3}") for i in range(n)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang", "text"]))


def test_stratified_fractions_and_determinism(spark):
    docs = _docs(spark)
    kept = stratified_sample(docs, {"en": 0.2, "de": 0.8})
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # deterministic hash ~ uniform: within a loose band of the targets
    assert 120 <= counts["en"] <= 280  # 1000 * 0.2
    assert 700 <= counts["de"] <= 900  # 1000 * 0.8
    # exact reproducibility: same rows every run
    again = stratified_sample(docs, {"en": 0.2, "de": 0.8})
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in again.collect())
    assert a == b


def test_stratified_subset_monotone(spark):
    """Raising a stratum's fraction only ADDS rows (nested samples — the
    property that makes mix re-weighting reproducible)."""
    docs = _docs(spark)
    small = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.3}, default_fraction=1.0).collect()}
    large = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.6}, default_fraction=1.0).collect()}
    assert small <= large


def test_vocab_topk_order_and_plan(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            [(1, "a a a b b c"), (2, "b a  c\td")], columns=["doc_id", "text"]
        )
    )
    got = [(r["rank"], r["word"], r["n"]) for r in vocab_topk(docs, k=3).collect()]
    assert got == [(1, "a", 4), (2, "b", 3), (3, "c", 2)]
    plan = vocab_topk(docs, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
