"""Bigram LM perplexity scoring (pages/lm.py)."""

import math

import pandas as pd
import pytest

from versatiles_rs_spark.pages.lm import perplexity, train_bigram_lm


def _corpus(spark):
    rows = [
        (1, "the cat sat"),          # reference
        (2, "the cat ran"),          # reference
        (3, "the cat sat"),          # in-domain: low ppl
        (4, "zap blorp qux"),        # fully OOV: high ppl
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_perplexity_hand_computed(spark):
    docs = _corpus(spark)
    ref = docs.where("doc_id <= 2")
    uni, bi, vocab = train_bigram_lm(ref)
    assert vocab == 4  # the, cat, sat, ran
    got = {r["doc_id"]: r for r in perplexity(docs, uni, bi, vocab).collect()}

    k = 0.5
    # doc 3: bigrams (the,cat) c2=2 c1=2; (cat,sat) c2=1 c1=2
    lp = math.log((2 + k) / (2 + k * 5)) + math.log((1 + k) / (2 + k * 5))
    want = round(math.exp(-lp / 2), 6)
    assert got[3]["ppl"] == pytest.approx(want)
    assert got[3]["n_bigrams"] == 2

    # doc 4: all unseen -> every transition gets the uniform k-mass
    lp_oov = 2 * math.log(k / (0 + k * 5))
    assert got[4]["ppl"] == pytest.approx(round(math.exp(-lp_oov / 2), 6))

    # in-domain text scores (much) lower perplexity than OOV text
    assert got[3]["ppl"] < got[4]["ppl"] / 2


def test_reference_docs_score_best(spark):
    docs = _corpus(spark)
    uni, bi, vocab = train_bigram_lm(docs.where("doc_id <= 2"))
    got = {r["doc_id"]: r["ppl"] for r in perplexity(docs, uni, bi, vocab).collect()}
    assert max(got[1], got[2], got[3]) < got[4]
