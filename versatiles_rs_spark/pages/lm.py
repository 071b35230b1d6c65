"""N-gram language-model perplexity scoring (CCNet-style quality filter).

CCNet/fastText-era pipelines score every page against a reference-domain
LM (e.g. Wikipedia) and keep the low-perplexity tail. Here that is fully
relational: train add-k-smoothed bigram counts on a reference slice
(two hash aggregations), then score documents by joining their exploded
bigrams to the model — no model server, no per-row Python.

Model: P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * (V + 1)), with V the
reference unigram vocabulary size and unseen counts coalesced to zero,
so OOV transitions get the uniform k-mass. Per doc with tokens t1..tn:
ppl = exp(-1/(n-1) * sum ln P(ti | ti-1)), n >= 2.

Scale shape: the model tables are the reference corpus' vocabulary —
broadcast for any realistic reference (Wikipedia bigrams fit executors);
swap the broadcast hints for plain joins if the reference is the whole
corpus. Scoring is explode (codegen) + two joins on term keys + one
aggregation keyed by doc_id: everything map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _toks(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )


def _doc_bigrams(docs: DataFrame, text_col: str) -> DataFrame:
    toks = _toks(text_col)
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return docs.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
    )


def train_bigram_lm(ref: DataFrame, text_col: str = "text"):
    """Reference slice -> (unigram counts, bigram counts, vocab size)."""
    uni = (
        ref.select(F.explode(_toks(text_col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        _doc_bigrams(ref, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    vocab = uni.count()
    return uni, bi, vocab


def perplexity(
    docs: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab: int,
    k: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, ppl) — add-k bigram perplexity per document."""
    grams = _doc_bigrams(docs, text_col)
    joined = (
        grams.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(uni), ["w1"], "left")
        .withColumn(
            "lp",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k * (vocab + 1)))
            ),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.exp(-F.sum("lp") / F.count("*")), 6).alias("ppl"),
    )


def perplexity_sql(ref_pred: str, k: float = 0.5) -> str:
    """The identical train+score pipeline as DuckDB SQL over ``documents``;
    ``ref_pred`` selects the reference slice (e.g. 'doc_id % 10 = 0')."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, unnest(CASE WHEN len(l) < 2 THEN []
                             ELSE list_transform(range(1, len(l)),
                                  i -> {{'w1': l[i], 'w2': l[i + 1]}})
                        END) AS g
  FROM toks
), flat AS (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM grams
), uni AS (
  SELECT w1, count(*) AS c1 FROM (
    SELECT t.doc_id, unnest(t.l) AS w1 FROM toks t WHERE {ref_pred}
  ) GROUP BY 1
), bi AS (
  SELECT w1, w2, count(*) AS c2 FROM flat WHERE {ref_pred} GROUP BY 1, 2
), v AS (SELECT count(*) AS vocab FROM uni)
SELECT f.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(exp(-sum(ln((coalesce(b.c2, 0) + {k})
                         / (coalesce(u.c1, 0) + {k} * ((SELECT vocab FROM v) + 1))))
                 / count(*)), 6) AS ppl
FROM flat f
LEFT JOIN bi b ON f.w1 = b.w1 AND f.w2 = b.w2
LEFT JOIN uni u ON f.w1 = u.w1
GROUP BY f.doc_id
"""


def train_kn_lm(ref: DataFrame, text_col: str = "text"):
    """Interpolated Kneser-Ney tables from a reference slice (Kneser &
    Ney 1995; Chen & Goodman 1999 — the standard n-gram smoothing):

    - ctx:   c1(w1)  = bigram-context count (sum of c2 over w2)
             n1f(w1) = distinct continuations N1+(w1, .)
    - bi:    c2(w1, w2)
    - cont:  n1b(w2) = distinct histories N1+(., w2)
    - t:     total distinct bigram types; v_cont: distinct w2 types

    All five are two hash aggregations over the exploded bigrams —
    the same relational shape as train_bigram_lm, one extra rollup.
    """
    bi = (
        _doc_bigrams(ref, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    ctx = bi.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n1f")
    )
    cont = bi.groupBy("w2").agg(F.count("*").alias("n1b"))
    totals = bi.agg(
        F.count("*").alias("t"), F.count_distinct("w2").alias("v_cont")
    ).collect()[0]
    return bi, ctx, cont, int(totals["t"]), int(totals["v_cont"])


def kn_perplexity(
    docs: DataFrame,
    bi: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    n_types: int,
    v_cont: int,
    discount: float = 0.75,
    k: float = 1.0 / 64.0,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, ppl) under interpolated Kneser-Ney:

    P(w2|w1) = max(c2 - d, 0)/c1 + d*n1f(w1)/c1 * Pc(w2)   if c1 > 0
             = Pc(w2)                                       otherwise
    Pc(w2)   = (n1b(w2) + k) / (T + k*(Vc + 1))

    d = 3/4 and k = 1/64 are dyadic, so the rationals are float-exact
    before the ln; the continuation floor k gives OOV w2 nonzero mass
    (the uniform add-k role in the add-k model).
    """
    grams = _doc_bigrams(docs, text_col)
    pc = (F.coalesce(F.col("n1b"), F.lit(0)) + F.lit(k)) / F.lit(
        n_types + k * (v_cont + 1)
    )
    seen = F.col("c1").isNotNull()
    p = F.when(
        seen,
        F.greatest(F.coalesce(F.col("c2"), F.lit(0)) - F.lit(discount), F.lit(0.0))
        / F.col("c1")
        + F.lit(discount) * F.col("n1f") / F.col("c1") * pc,
    ).otherwise(pc)
    joined = (
        grams.join(F.broadcast(bi), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), ["w1"], "left")
        .join(F.broadcast(cont), ["w2"], "left")
        .withColumn("lp", F.log(p))
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.exp(-F.sum("lp") / F.count("*")), 6).alias("ppl"),
    )


def kn_perplexity_sql(ref_pred: str, discount: float = 0.75, k: float = 1.0 / 64.0) -> str:
    """The identical KN train+score pipeline as DuckDB SQL over
    ``documents``; ``ref_pred`` selects the reference slice."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM documents
), grams AS (
  SELECT doc_id, unnest(CASE WHEN len(l) < 2 THEN []
                             ELSE list_transform(range(1, len(l)),
                                  i -> {{'w1': l[i], 'w2': l[i + 1]}})
                        END) AS g
  FROM toks
), flat AS (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM grams
), bi AS (
  SELECT w1, w2, count(*) AS c2 FROM flat WHERE {ref_pred} GROUP BY 1, 2
), ctx AS (
  SELECT w1, sum(c2) AS c1, count(*) AS n1f FROM bi GROUP BY 1
), cont AS (
  SELECT w2, count(*) AS n1b FROM bi GROUP BY 1
), tot AS (
  SELECT count(*) AS t, count(DISTINCT w2) AS v_cont FROM bi
)
SELECT f.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(exp(-sum(ln(
         CASE WHEN x.c1 IS NOT NULL THEN
           greatest(coalesce(b.c2, 0) - {discount}, 0.0) / x.c1
           + {discount} * x.n1f / x.c1
             * ((coalesce(n.n1b, 0) + {k})
                / ((SELECT t FROM tot) + {k} * ((SELECT v_cont FROM tot) + 1)))
         ELSE
           (coalesce(n.n1b, 0) + {k})
           / ((SELECT t FROM tot) + {k} * ((SELECT v_cont FROM tot) + 1))
         END)) / count(*)), 6) AS ppl
FROM flat f
LEFT JOIN bi b ON f.w1 = b.w1 AND f.w2 = b.w2
LEFT JOIN ctx x ON f.w1 = x.w1
LEFT JOIN cont n ON f.w2 = n.w2
GROUP BY f.doc_id
"""
