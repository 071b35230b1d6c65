"""Corpus-wide paragraph dedup (dedup/paragraphs.py)."""

import pandas as pd

from versatiles_rs_spark.dedup.paragraphs import explode_paragraphs, paragraph_dedup


def _docs(spark):
    rows = [
        (1, "unique one\n\nshared footer\n\nbody A"),
        (2, "unique two\n\nshared footer"),
        (3, "unique three\n\nshared footer\n\n\n\nbody A"),  # blank para dropped
        (4, "only unique"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_explode_skips_blanks(spark):
    paras = explode_paragraphs(_docs(spark)).toPandas()
    assert len(paras) == 3 + 2 + 3 + 1  # doc 3's empty paragraph dropped
    assert (paras["para"].str.strip() != "").all()


def test_dedup_drops_corpus_duplicates_keeps_order(spark):
    out = {r["doc_id"]: r for r in paragraph_dedup(_docs(spark)).collect()}
    # 'shared footer' (3 docs) and 'body A' (2 docs) are corpus duplicates
    assert out[1]["text"] == "unique one"
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "unique three"
    assert out[4]["text"] == "only unique"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (1, 2)
    assert (out[4]["n_kept"], out[4]["n_dropped"]) == (1, 0)


def test_max_occurrences_threshold(spark):
    out = {r["doc_id"]: r for r in paragraph_dedup(_docs(spark), max_occurrences=2).collect()}
    # 'body A' occurs twice -> now survives; 'shared footer' (3x) still dropped
    assert out[1]["text"] == "unique one\n\nbody A"
    assert out[3]["text"] == "unique three\n\nbody A"
    assert out[2]["text"] == "unique two"


def test_order_preserved_with_many_paragraphs(spark):
    text = "\n\n".join(f"p{i}" for i in range(20))
    df = spark.createDataFrame(pd.DataFrame([(9, text)], columns=["doc_id", "text"]))
    out = paragraph_dedup(df).collect()[0]
    assert out["text"] == text  # all unique -> identity, order intact
    assert out["n_kept"] == 20
