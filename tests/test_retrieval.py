"""BM25 retrieval (pages/retrieval.py)."""

import math

import pandas as pd
import pytest

from versatiles_rs_spark.pages.retrieval import bm25_topk, build_postings


def _docs(spark):
    rows = [
        (1, "spark spark spark engine"),
        (2, "spark engine fast"),
        (3, "totally unrelated words here today"),
        (4, "engine engine engine engine engine engine"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_postings(spark):
    p = {(r["term"], r["doc_id"]): r["tf"] for r in build_postings(_docs(spark)).collect()}
    assert p[("spark", 1)] == 3 and p[("spark", 2)] == 1
    assert p[("engine", 4)] == 6
    assert ("spark", 3) not in p


def test_bm25_matches_hand_formula(spark):
    got = {r["doc_id"]: r["score"] for r in bm25_topk(_docs(spark), ["spark"], k=10).collect()}
    # hand computation: N=4, df=2, avgdl=(4+3+5+6)/4=4.5
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    k1, b = 1.2, 0.75

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / 4.5)), 6)

    assert set(got) == {1, 2}
    assert got[1] == pytest.approx(s(3, 4))
    assert got[2] == pytest.approx(s(1, 3))


def test_bm25_ranking_and_multi_term(spark):
    rows = [r["doc_id"] for r in bm25_topk(_docs(spark), ["spark", "engine"], k=4).collect()]
    # doc 1: high-tf spark + engine; doc 4: engine-only but tf-saturated
    assert rows[0] == 1
    assert set(rows) == {1, 2, 4}


def test_bm25_plan_shape(spark):
    """Distributed top-k, and the query-term prune sits in a Filter before
    the scoring aggregation (postings for other terms never aggregate)."""
    docs = _docs(spark)
    plan = bm25_topk(docs, ["spark"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Filter" in plan and "spark" in plan  # the isin prune is present
