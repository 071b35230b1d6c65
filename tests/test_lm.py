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


def test_kn_perplexity_hand_computed(spark):
    from versatiles_rs_spark.pages.lm import kn_perplexity, train_kn_lm

    docs = _corpus(spark)
    ref = docs.where("doc_id <= 2")
    bi, ctx, cont, t, v_cont = train_kn_lm(ref)
    # ref bigrams: (the,cat) c2=2; (cat,sat) c2=1; (cat,ran) c2=1
    assert t == 3 and v_cont == 3  # types; continuations {cat, sat, ran}
    got = {r["doc_id"]: r for r in kn_perplexity(docs, bi, ctx, cont, t, v_cont).collect()}

    d, k = 0.75, 1.0 / 64.0
    denom = t + k * (v_cont + 1)

    def pc(n1b):
        return (n1b + k) / denom

    # doc 3 "the cat sat": (the,cat): c1=2 n1f=1; (cat,sat): c1=2 n1f=2
    p1 = (2 - d) / 2 + d * 1 / 2 * pc(1)   # n1b(cat)=1
    p2 = (1 - d) / 2 + d * 2 / 2 * pc(1)   # n1b(sat)=1
    want3 = round(math.exp(-(math.log(p1) + math.log(p2)) / 2), 6)
    assert got[3]["ppl"] == pytest.approx(want3)

    # doc 4 fully OOV: both transitions back off to the continuation floor
    p_oov = pc(0)
    want4 = round(math.exp(-math.log(p_oov)), 6)
    assert got[4]["ppl"] == pytest.approx(want4)

    # discount mass conservation: sum_w2 P(w2 | 'cat') over the seen
    # continuations + OOV floor mass stays <= 1 (proper distribution)
    p_sat = (1 - d) / 2 + d * 2 / 2 * pc(1)
    p_ran = (1 - d) / 2 + d * 2 / 2 * pc(1)
    p_cat = 0 / 2 + d * 2 / 2 * pc(1)  # unseen continuation of 'cat'
    assert p_sat + p_ran + p_cat < 1.0

    # KN separates in-domain from OOV text like the add-k model does
    assert got[3]["ppl"] < got[4]["ppl"] / 2


def test_phrase_search_hand_case(spark):
    from versatiles_rs_spark.pages.retrieval import phrase_search

    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, "a b c a b"),      # "a b" twice, positions 1 and 4
                (2, "b a b a"),        # once at 2
                (3, "a a a"),          # repeated word: "a a" at 1 and 2
                (4, "b b c"),          # no match for "a b"
                (5, "a"),              # too short
            ],
            columns=["doc_id", "text"],
        )
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, ["a", "b"]).collect()
    }
    assert got == {1: (2, 1), 2: (1, 2)}

    rep = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, ["a", "a"]).collect()
    }
    assert rep == {3: (2, 1)}  # overlapping anchors both count

    three = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(docs, ["a", "b", "c"]).collect()
    }
    assert three == {1: (1, 1)}


def test_phrase_search_rejects_single_token(spark):
    from versatiles_rs_spark.pages.retrieval import phrase_search

    docs = spark.createDataFrame(pd.DataFrame([(1, "a b")], columns=["doc_id", "text"]))
    with pytest.raises(ValueError):
        phrase_search(docs, ["a"])


def test_blocklist_match_hand_case(spark):
    from versatiles_rs_spark.pages.retrieval import blocklist_match

    docs = spark.createDataFrame(
        [
            (1, "the hash join is slow"),          # phrase 0 once
            (2, "hash table then join later"),     # words apart: no match
            (3, "bad word here"),                  # single-token entry
            (4, "hash join and hash join again"),  # phrase 0 twice
            (5, "clean text only"),
        ],
        "doc_id long, text string",
    )
    bl = [["hash", "join"], ["bad"]]
    got = {
        r["doc_id"]: (r["n_phrases"], r["n_hits"])
        for r in blocklist_match(docs, bl).collect()
    }
    assert got == {1: (1, 1), 3: (1, 1), 4: (1, 2)}


def test_blocklist_match_repeated_word_phrase(spark):
    from versatiles_rs_spark.pages.retrieval import blocklist_match

    # overlapping runs of a repeated-word phrase: "go go go" contains
    # "go go" at anchors 1 and 2
    docs = spark.createDataFrame([(1, "go go go")], "doc_id long, text string")
    got = blocklist_match(docs, [["go", "go"]]).collect()[0]
    assert (got["n_phrases"], got["n_hits"]) == (1, 2)


def test_blocklist_match_empty_list_rejected(spark):
    import pytest

    from versatiles_rs_spark.pages.retrieval import blocklist_match

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        blocklist_match(docs, [])
