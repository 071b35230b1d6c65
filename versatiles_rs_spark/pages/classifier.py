"""Hashed-feature text classifiers for corpus curation: multinomial
Naive Bayes quality scoring and DSIR importance resampling.

Both are staples of LLM training-data pipelines:

- CCNet / LLaMA-style curation trains a linear classifier on a small
  labeled seed set and scores the whole crawl with it; docs are kept or
  sampled by the score. The trainable-in-SQL member of that family is
  multinomial Naive Bayes over hashed bag-of-words features (the
  "hashing trick", Weinberger et al., ICML 2009). The queries()
  instantiation distills the C4 heuristic filter into a learned model:
  seed labels come from the engine's own C4 rules (pages/
  quality_filters.py) over the decorated page, and the NB genuinely
  learns the injected boilerplate vocabulary ("lorem", "javascript",
  "function") as negative evidence — train on 25% of docs, generalize
  to the rest.
- DSIR (Xie et al., NeurIPS 2023, "Data Selection for Language Models
  via Importance Resampling") estimates importance weights
  log p_target(x) - log p_raw(x) under bag-of-hashed-ngrams unigram
  models and resamples the raw corpus by those weights. We compute the
  exact DSIR weight (hashed word-bigram features, add-1 smoothing) with
  target = the C4-passing seed docs, and take the deterministic top-k
  (the paper's Gumbel-noise resampling degenerates to top-k at
  temperature 0).

Scale shape (the part that matters at 10^12 documents):

- TRAINING touches only the seed set; its per-(label, feature) counts
  are bounded by 2*m rows (m = hashed bucket count) REGARDLESS of seed
  size — one map-side-combined aggregate, then a driver pull of <= 2*m
  integers (same bounded-collect contract as dedup/kmeans.py centroid
  updates).
- SCORING never shuffles: the weight tables are compiled into literal
  fixed-width hex strings (the pages/bloom.py literal-bitmap trick) and
  every document's score is one `aggregate()` over its token array
  inside a single codegen Project — zero joins, zero exchanges, zero
  Python. A 100 TB scoring pass is exactly one scan.

Cross-engine determinism (the oracle contract): feature buckets are the
first 8 hex chars of md5 (identical bytes on both engines), and all
per-feature log weights are quantized to integer micro-nats BEFORE any
summation, so per-document scores are exact integer sums — order-free.
The only float step is one ln() per (feature, label) on identical IEEE
rationals (c+1)/(tot+m); a 1-ulp ln discrepancy flips floor(x*1e6+0.5)
only if x sits within ~1e-9 of a rounding boundary, and the ln of a
ratio of small integers has no mechanism to land there.

No reference counterpart (versatiles-rs has no text classifiers); the
operators extend the §2.13 training-data layer alongside
pages/quality_filters.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NB_M = 4096  # hashed feature buckets (unigrams and bigrams alike)
# add-alpha smoothing. alpha = 1/64 keeps the estimates cross-engine exact
# (1/64 and m/64 are dyadic, so c + alpha and tot + m*alpha are exact IEEE
# doubles) while fixing the add-1 pathology: with alpha = 1, the m >> tot
# smoothing mass of a small seed class deflates ALL its token
# probabilities, and that systematic per-token bias (~0.5 nat here) swamps
# the discriminative vocabulary (measured: add-1 scored 0.773 held-out
# accuracy vs a 0.768 majority baseline; add-1/64 recovers the signal).
NB_ALPHA = 1.0 / 64
_OFFSET = 1 << 27  # weight offset making every stored value non-negative
_WIDTH = 7  # fixed hex width per weight; 16^7 = 268M > 2*_OFFSET

# seed selection shared by both engines: every 4th doc is "labeled"
SEED_PRED = "doc_id % 4 = 0"


def tokens_expr(col: str) -> str:
    """Spark SQL: lowercase alnum word tokens of a text column."""
    return f"filter(split(lower({col}), '[^a-z0-9]+'), t -> t <> '')"


def tokens_sql(col: str) -> str:
    """DuckDB twin of tokens_expr."""
    return (
        f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'),"
        f" t -> t <> '')"
    )


def bucket_expr(tok: str, m: int = NB_M) -> str:
    """Spark SQL: hashed feature bucket of a token expression (md5 hex
    prefix -> int, the engine-portable hashing trick)."""
    return f"cast(conv(substring(md5({tok}), 1, 8), 16, 10) as bigint) % {m}"


def bucket_sql(tok: str, m: int = NB_M) -> str:
    """DuckDB twin of bucket_expr."""
    return f"CAST(('0x' || substr(md5({tok}), 1, 8))::UBIGINT % {m} AS BIGINT)"


def bigram_buckets_expr(toks: str, m: int = NB_M) -> str:
    """Spark SQL: array of hashed word-bigram buckets of a token array.
    Guarded: sequence(2, 1) would COUNT DOWN in Spark, so short arrays
    short-circuit to array()."""
    b = bucket_expr("concat(element_at(%s, i - 1), ' ', element_at(%s, i))"
                    % (toks, toks), m)
    return (
        f"if(size({toks}) >= 2, "
        f"transform(sequence(2, size({toks})), i -> {b}), "
        f"cast(array() as array<bigint>))"
    )


def bigram_buckets_sql(toks: str, m: int = NB_M) -> str:
    """DuckDB twin (1-based lists; range(1, 1) is already empty)."""
    b = bucket_sql(f"({toks})[i] || ' ' || ({toks})[i + 1]", m)
    return f"list_transform(range(1, len({toks})), i -> {b})"


def _quantize(p_num: float, p_den: float) -> int:
    """floor(ln(p_num/p_den) * 1e6 + 0.5) on exact inputs — the shared
    micro-nat quantization (identical formula in the SQL twins)."""
    return math.floor(math.log(p_num / p_den) * 1e6 + 0.5)


def _hex_table(weights: list[int]) -> str:
    """Compile integer weights into the literal fixed-width hex string
    scanned by substr/conv at score time (pages/bloom.py trick)."""
    out = []
    for w in weights:
        v = w + _OFFSET
        if not (0 <= v < 16 ** _WIDTH):
            raise ValueError(f"weight {w} out of the {_WIDTH}-hex range")
        out.append(format(v, f"0{_WIDTH}x"))
    return "".join(out)


def _lookup_expr(table_hex: str, bucket: str) -> str:
    """Spark SQL: decode weight #bucket from a literal hex table."""
    return (
        f"cast(conv(substring('{table_hex}', "
        f"cast(({bucket}) * {_WIDTH} + 1 as int), {_WIDTH}), 16, 10) "
        f"as bigint) - {_OFFSET}L"
    )


@dataclass
class NBModel:
    """Trained NB weights, compiled for literal-lookup scoring."""

    w_pos_hex: str
    w_neg_hex: str
    prior_pos: int
    prior_neg: int
    m: int = NB_M


def train_nb(labeled: DataFrame, text_col: str = "text",
             label_col: str = "label", m: int = NB_M) -> NBModel:
    """Train multinomial NB (add-1 smoothing) on a labeled seed frame
    (boolean `label_col`, string `text_col`).

    One aggregate over the seed's exploded tokens — the shuffled key
    space is (label, bucket), bounded by 2*m rows at ANY seed size —
    then a <= 2*m-integer driver pull to compile the weight tables."""
    seed = labeled.select(
        F.col(label_col).alias("pos"),
        F.expr(tokens_expr(text_col)).alias("toks"),
    )
    counts = (
        seed.select("pos", F.explode("toks").alias("t"))
        .select("pos", F.expr(bucket_expr("t", m)).alias("f"))
        .groupBy("pos", "f")
        .count()
        .collect()
    )
    n_docs = {r["pos"]: r["n"] for r in
              seed.groupBy("pos").agg(F.count("*").alias("n")).collect()}
    c = {True: [0] * m, False: [0] * m}
    for r in counts:
        c[r["pos"]][r["f"]] = r["count"]
    n_seed = sum(n_docs.values())
    if not (n_docs.get(True) and n_docs.get(False)):
        raise ValueError(
            "train_nb needs BOTH classes in the seed "
            f"(got {n_docs.get(True, 0)} positive / "
            f"{n_docs.get(False, 0)} negative labeled docs)"
        )
    w, prior = {}, {}
    for lab in (True, False):
        tot = sum(c[lab])
        w[lab] = [_quantize(cf + NB_ALPHA, tot + m * NB_ALPHA)
                  for cf in c[lab]]
        prior[lab] = _quantize(n_docs.get(lab, 0), n_seed)
    return NBModel(_hex_table(w[True]), _hex_table(w[False]),
                   prior[True], prior[False], m)


def nb_keep_expr(model: NBModel, text_col: str = "text") -> str:
    """Spark SQL boolean: positive-class prediction of `text_col`, fully
    inline (no extra columns, no joins) — the zero-shuffle filter form
    used by the curation CLI's --classifier stage. The feature array
    appears in both class sums; whole-stage codegen subexpression-
    eliminates the duplicate (measured no-op vs a LET binding)."""
    fs = (f"transform({tokens_expr(text_col)},"
          f" t -> {bucket_expr('t', model.m)})")
    s_pos = (
        f"aggregate({fs}, {model.prior_pos}L, "
        f"(a, f) -> a + ({_lookup_expr(model.w_pos_hex, 'f')}))"
    )
    s_neg = (
        f"aggregate({fs}, {model.prior_neg}L, "
        f"(a, f) -> a + ({_lookup_expr(model.w_neg_hex, 'f')}))"
    )
    return f"({s_pos}) > ({s_neg})"


def score_nb(docs: DataFrame, model: NBModel,
             text_col: str = "text") -> DataFrame:
    """Score every document: (doc_id, pred, margin). Zero-shuffle — the
    whole pass is one Project (token split, md5 buckets, two literal-
    table aggregates) over the scan."""
    s_pos = (
        f"aggregate(_fs, {model.prior_pos}L, "
        f"(a, f) -> a + ({_lookup_expr(model.w_pos_hex, 'f')}))"
    )
    s_neg = (
        f"aggregate(_fs, {model.prior_neg}L, "
        f"(a, f) -> a + ({_lookup_expr(model.w_neg_hex, 'f')}))"
    )
    return (
        docs.withColumn(
            "_fs",
            F.expr(f"transform({tokens_expr(text_col)},"
                   f" t -> {bucket_expr('t', model.m)})"),
        )
        .select("doc_id",
                F.expr(s_pos).alias("_sp"), F.expr(s_neg).alias("_sn"))
        .select(
            "doc_id",
            F.expr("_sp > _sn").alias("pred"),
            F.expr("_sp - _sn").alias("margin"),
        )
    )


def _page_and_label_ctes(table: str) -> str:
    """DuckDB CTEs: pg(doc_id, page) = the decorated page joined to one
    string; c4(doc_id, c4_keep) = the engine's own C4 page rule."""
    from versatiles_rs_spark.pages.quality_filters import (
        c4_filter_sql,
        decorated_lines_sql,
    )

    return f"""
pg AS (
  SELECT doc_id,
         array_to_string({decorated_lines_sql("doc_id", "text")}, ' ') AS page
  FROM {table}
),
c4 AS (
  SELECT doc_id, c4_keep FROM ({c4_filter_sql("doc_id", "text", table)})
)"""


def nb_oracle_sql(table: str = "documents", m: int = NB_M) -> str:
    """DuckDB twin: retrains the same NB in CTEs (same seed, same
    buckets, same add-1 quantized weights) and rescores per document via
    an ordered weight list — integer-exact parity with score_nb."""
    toks = tokens_sql("page")
    bucket = bucket_sql("t", m)
    q = ("CAST(floor(ln((coalesce(c, 0) + 1e0/64) / (tot + {m}e0/64))"
         " * 1e6 + 5e-1) AS BIGINT)").format(m=m)
    return f"""
WITH {_page_and_label_ctes(table)},
seed AS (
  SELECT c4.c4_keep AS pos, {toks} AS toks
  FROM pg JOIN c4 USING (doc_id) WHERE {SEED_PRED}
),
cnt AS (
  SELECT pos, {bucket} AS f, count(*) AS c
  FROM (SELECT pos, unnest(toks) AS t FROM seed) GROUP BY 1, 2
),
tots AS (SELECT pos, sum(c) AS tot FROM cnt GROUP BY 1),
grid AS (
  SELECT l.pos, g.f, t.tot, cnt.c
  FROM (SELECT true AS pos UNION ALL SELECT false) l
  CROSS JOIN (SELECT unnest(range(0, {m})) AS f) g
  JOIN tots t ON t.pos = l.pos
  LEFT JOIN cnt ON cnt.pos = l.pos AND cnt.f = g.f
),
w AS (SELECT pos, f, {q} AS q FROM grid),
wl AS (
  SELECT
    (SELECT list(q ORDER BY f) FROM w WHERE pos) AS wp,
    (SELECT list(q ORDER BY f) FROM w WHERE NOT pos) AS wn,
    (SELECT CAST(floor(ln(
        sum(CASE WHEN pos THEN 1e0 ELSE 0e0 END) / count(*)) * 1e6 + 5e-1)
      AS BIGINT) FROM seed) AS pp,
    (SELECT CAST(floor(ln(
        sum(CASE WHEN pos THEN 0e0 ELSE 1e0 END) / count(*)) * 1e6 + 5e-1)
      AS BIGINT) FROM seed) AS pn
),
scored AS (
  SELECT doc_id,
    pp + coalesce(CAST(list_sum(list_transform(
      list_transform({toks}, t -> {bucket}), f -> wp[CAST(f + 1 AS INTEGER)]
    )) AS BIGINT), 0) AS s_pos,
    pn + coalesce(CAST(list_sum(list_transform(
      list_transform({toks}, t -> {bucket}), f -> wn[CAST(f + 1 AS INTEGER)]
    )) AS BIGINT), 0) AS s_neg
  FROM pg, wl
)
SELECT doc_id, s_pos > s_neg AS pred, s_pos - s_neg AS margin
FROM scored
"""


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------


def train_dsir(target: DataFrame, raw: DataFrame,
               text_col: str = "text", m: int = NB_M) -> str:
    """Importance weight table: Q(f) = quantized
    ln p_target(f) - ln p_raw(f) under add-1-smoothed hashed-bigram
    unigram models. Same bounded (<= 2*m rows collected) training shape
    as NB."""

    def _counts(df: DataFrame) -> list[int]:
        rows = (
            df.withColumn("_toks", F.expr(tokens_expr(text_col)))
            .select(F.explode(
                F.expr(bigram_buckets_expr("_toks", m))
            ).alias("f"))
            .groupBy("f").count().collect()
        )
        c = [0] * m
        for r in rows:
            c[r["f"]] = r["count"]
        return c

    ct, cr = _counts(target), _counts(raw)
    tt, tr = sum(ct), sum(cr)
    a0, m0 = NB_ALPHA, m * NB_ALPHA
    w = [
        math.floor(
            (math.log((a + a0) / (tt + m0)) - math.log((b + a0) / (tr + m0)))
            * 1e6 + 0.5
        )
        for a, b in zip(ct, cr)
    ]
    return _hex_table(w)


def dsir_weights(docs: DataFrame, table_hex: str,
                 text_col: str = "text", m: int = NB_M) -> DataFrame:
    """Per-doc importance weight (integer micro-nat sum over bigram
    instances): the same zero-shuffle literal-table Project as
    score_nb."""
    fs = bigram_buckets_expr("_toks", m)
    wsum = (
        f"aggregate({fs}, 0L, (a, f) -> a + ({_lookup_expr(table_hex, 'f')}))"
    )
    return docs.withColumn("_toks", F.expr(tokens_expr(text_col))).select(
        "doc_id", F.expr(wsum).alias("dsir_weight")
    )


def dsir_topk(docs: DataFrame, table_hex: str, k: int = 100,
              text_col: str = "text", m: int = NB_M) -> DataFrame:
    """Deterministic DSIR selection: top k by (weight desc, doc_id).
    One TakeOrdered — no full sort materializes."""
    return (
        dsir_weights(docs, table_hex, text_col, m)
        .orderBy(F.desc("dsir_weight"), F.asc("doc_id")).limit(k)
    )


def dsir_oracle_sql(table: str = "documents", k: int = 100,
                    m: int = NB_M) -> str:
    """DuckDB twin of train_dsir + dsir_topk (target = C4-passing seed
    docs, raw = the whole seed)."""
    toks = tokens_sql("page")
    bigrams = bigram_buckets_sql(f"({toks})", m)
    q = (
        "CAST(floor((ln((coalesce(tc.c, 0) + 1e0/64) / (tt.tot + {m}e0/64))"
        " - ln((coalesce(rc.c, 0) + 1e0/64) / (rt.tot + {m}e0/64)))"
        " * 1e6 + 5e-1) AS BIGINT)"
    ).format(m=m)
    return f"""
WITH {_page_and_label_ctes(table)},
seedpg AS (
  SELECT pg.doc_id, pg.page, c4.c4_keep
  FROM pg JOIN c4 USING (doc_id) WHERE {SEED_PRED}
),
tgt AS (SELECT unnest({bigrams}) AS f FROM seedpg WHERE c4_keep),
raw AS (SELECT unnest({bigrams}) AS f FROM seedpg),
tc AS (SELECT f, count(*) AS c FROM tgt GROUP BY 1),
rc AS (SELECT f, count(*) AS c FROM raw GROUP BY 1),
tt AS (SELECT count(*) AS tot FROM tgt),
rt AS (SELECT count(*) AS tot FROM raw),
w AS (
  SELECT g.f, {q} AS q
  FROM (SELECT unnest(range(0, {m})) AS f) g
  CROSS JOIN tt CROSS JOIN rt
  LEFT JOIN tc ON tc.f = g.f
  LEFT JOIN rc ON rc.f = g.f
),
wl AS (SELECT list(q ORDER BY f) AS ws FROM w),
scored AS (
  SELECT doc_id,
    coalesce(CAST(list_sum(list_transform(
      {bigrams}, f -> ws[CAST(f + 1 AS INTEGER)]
    )) AS BIGINT), 0) AS dsir_weight
  FROM pg, wl
)
SELECT doc_id, dsir_weight FROM scored
ORDER BY dsir_weight DESC, doc_id ASC LIMIT {k}
"""
