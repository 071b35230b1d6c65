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


def test_mixture_sample_semantics(spark):
    """Hand-computable budget cut: greedy doc_id-ordered prefix per
    stratum; before-doc cumulative < budget keeps the doc (the last doc
    may overshoot); absent strata get budget 0."""
    from versatiles_rs_spark.pages.sampling import mixture_sample

    docs = spark.createDataFrame(
        [
            (1, "a", "w w w"),        # en: before 0  < 7 -> keep (3 tok)
            (2, "a", "w w w w"),      # en: before 3  < 7 -> keep (overshoots to 7)
            (3, "a", "w"),            # en: before 7 !< 7 -> drop
            (10, "b", "w w"),         # de: before 0 < 2 -> keep
            (11, "b", "w"),           # de: before 2 !< 2 -> drop
            (20, "c", "w"),           # no budget -> drop
        ],
        "doc_id long, lang string, text string",
    )
    got = sorted(
        (r["doc_id"], r["n_tok"])
        for r in mixture_sample(docs, {"a": 7, "b": 2}).collect()
    )
    assert got == [(1, 3), (2, 4), (10, 2)]


def test_mixture_sample_bucket_split_invariant(spark):
    """The bucketed two-phase plan must give identical rows at any
    bucket granularity: bits=0 (every doc its own bucket), the default,
    and bits=40 (one bucket, pure window) — proving the full/edge/drop
    split equals the corpus-wide prefix-sum spec."""
    from versatiles_rs_spark.pages.sampling import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budgets = {"en": 4000, "zh": 1000, "es": 1000, "de": 1000, "fr": 1000}
    ref = sorted(map(tuple, mixture_sample(docs, budgets, bucket_bits=40).collect()))
    assert ref  # non-degenerate
    for bits in (0, 6):
        got = sorted(map(tuple, mixture_sample(docs, budgets, bucket_bits=bits).collect()))
        assert got == ref, f"bucket_bits={bits}"


def test_mixture_sample_plan_shape(spark):
    """The bulk (full-bucket) path is a broadcast-join filter with no
    exchange; the only hash exchange in the result plan is the window
    over the edge buckets (one bucket per stratum)."""
    import re

    from versatiles_rs_spark.pages.sampling import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = mixture_sample(docs, {"en": 4000, "de": 1000})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
