"""Text/webtext-domain queries: tokenization, quality, URLs, PII, links, BPE, robots, domains.

Split from the single-file registry in round 5; QUERIES/ORACLES stay in
`versatiles_rs_spark.queries` (the package __init__), in driver-sweep order.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.queries._shared import (
    _BPE_RX,
    _TOKEN_COUNT_EXPR,
)

# ---------------------------------------------------------------------------
# 8. text analysis (training-data pipeline ops)
# ---------------------------------------------------------------------------



def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.expr(_TOKEN_COUNT_EXPR).cast("bigint").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


O_TOKEN_COUNT = f"""
SELECT doc_id, CAST({_TOKEN_COUNT_EXPR} AS BIGINT) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual
FROM documents
"""

# Integer micro-quantization instead of round(x, 6): DuckDB rounds decimal
# ties half-even while Spark rounds half-up, so decimal `round` hash-mismatches.
# floor(x*1e6 + 0.5) as BIGINT is tie-unambiguous and identical on both engines
# (scores here are always >= 0).
_QUALITY_RAW = (
    "(((length(text) - length(replace(text, 'the', ''))) / 3.0)"
    " / (length(text) + 1))"
)
_QUALITY_EXPR = f"CAST(floor({_QUALITY_RAW} * 1000000 + 0.5) AS BIGINT)"
_MEAN_TOKEN_RAW = f"(length(text) / greatest({_TOKEN_COUNT_EXPR}, 1))"
_MEAN_TOKEN_EXPR = f"CAST(floor({_MEAN_TOKEN_RAW} * 1000000 + 0.5) AS BIGINT)"


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword-density + mean-token-length signals (micro-units)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.expr(_QUALITY_EXPR).alias("stopword_density_u"),
        F.expr(_MEAN_TOKEN_EXPR).alias("mean_token_len_u"),
    )


O_QUALITY_SCORE = f"""
SELECT doc_id, {_QUALITY_EXPR} AS stopword_density_u,
       {_MEAN_TOKEN_EXPR} AS mean_token_len_u
FROM documents
"""


_LANG_PRED_EXPR = (
    "CASE WHEN length(text) - length(replace(text, 'spark', '')) >= "
    "length(text) - length(replace(text, 'vector', '')) THEN 'tech' ELSE 'math' END"
)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language/topic-ID heuristic; deterministic CASE expr."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select("lang", F.expr(_LANG_PRED_EXPR).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


O_LANG_ID = f"""
SELECT lang, {_LANG_PRED_EXPR} AS predicted, count(*) AS n
FROM documents GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# 17. generic HTML -> text extraction (webtext payload; pure codegen)
# ---------------------------------------------------------------------------

# Deterministic "wild" page template: comment, script, style, entities —
# everything a real extractor must strip. Built identically in Spark and
# DuckDB from the documents table; single quotes avoided so the SQL literal
# needs no escaping.
_RICH_HTML_PARTS = [
    '<!DOCTYPE html><html><head><!-- crawl &amp; extract --><style type="text/css">body { color: #000; }</style>'
    '<script src="t.js">var x = 1; if (x) { track("pv"); }</script></head><body><h1>Doc ',
    "</h1><p>",
    '</p><div class="footer">lang &lt;',
    "&gt; &amp; source ",
    "</div></body></html>",
]


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic HTML->text extraction (pages/html_text.py): strip comments /
    script / style / tags, decode entities, collapse whitespace — the whole
    chain is regexp_replace Columns inside whole-stage codegen (zero
    Python), and the oracle runs the IDENTICAL rule list via
    html_to_text_sql, so the rules are cross-engine-verified, not
    self-checked."""
    from versatiles_rs_spark.pages.html_text import html_to_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _RICH_HTML_PARTS
    html = F.concat(
        F.lit(p[0]), F.col("doc_id").cast("string"),
        F.lit(p[1]), F.col("text"),
        F.lit(p[2]), F.col("lang"),
        F.lit(p[3]), F.col("source"),
        F.lit(p[4]),
    )
    txt = html_to_text(html)
    return docs.select(
        "doc_id",
        txt.alias("txt"),
        F.length(txt).cast("bigint").alias("n_chars_out"),
    )


def _o_html_extract() -> str:
    from versatiles_rs_spark.pages.html_text import html_to_text_sql

    p = _RICH_HTML_PARTS
    html = (
        f"'{p[0]}' || CAST(doc_id AS VARCHAR) || '{p[1]}' || text || "
        f"'{p[2]}' || lang || '{p[3]}' || source || '{p[4]}'"
    )
    txt = html_to_text_sql(html)
    return (
        f"SELECT doc_id, {txt} AS txt, CAST(length({txt}) AS BIGINT) AS n_chars_out "
        "FROM documents"
    )


O_HTML_EXTRACT = _o_html_extract()


# ---------------------------------------------------------------------------
# 18. URL canonicalization + host keys (crawl dedup prerequisite)
# ---------------------------------------------------------------------------

# Deterministic "messy crawl" URL: case noise, default ports, userinfo,
# doubled slashes, unsorted query params, fragments — varied by doc_id so
# every branch of the canonicalizer is exercised.
_MESSY_URL_SPARK = None  # built in the query from the same parts as the SQL

_MESSY_PARTS = {
    "scheme": ("http", "HTTPS", "https", "HTTP"),  # doc_id % 4
    "port": ("", ":80", ":443", ":8080"),  # doc_id % 4 (paired with scheme)
}


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (pages/urls.py): scheme/host lowercase, default
    port + userinfo + fragment stripped, doubled slashes collapsed, query
    params sorted — all codegen Columns; the oracle applies the IDENTICAL
    rule chain via canonical_url_sql. Grouped by reversed-host key so the
    hash compares canonical urls, host keys, and group sizes at once."""
    from versatiles_rs_spark.pages.urls import canonical_url, host_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m4 = F.col("doc_id") % 4
    scheme = F.element_at(F.array(*[F.lit(s) for s in _MESSY_PARTS["scheme"]]), (m4 + 1).cast("int"))
    port = F.element_at(F.array(*[F.lit(p) for p in _MESSY_PARTS["port"]]), (m4 + 1).cast("int"))
    user = F.when(F.col("doc_id") % 5 == 0, F.lit("bot:pw@")).otherwise(F.lit(""))
    messy = F.concat(
        scheme, F.lit("://"), user,
        F.lit("WWW."), F.upper(F.col("source")), F.lit(".Example.COM"), port,
        F.lit("//docs//"), (F.col("doc_id") % 7).cast("string"), F.lit("/page"),
        F.lit("?z="), (F.col("doc_id") % 3).cast("string"), F.lit("&a=1"),
        F.lit("#sec"), (F.col("doc_id") % 2).cast("string"),
    )
    canon = canonical_url(messy)
    return (
        docs.select(canon.alias("curl"), host_key(canon).alias("hkey"))
        .groupBy("curl", "hkey")
        .agg(F.count("*").alias("n"))
    )


def _o_url_canonical() -> str:
    from versatiles_rs_spark.pages.urls import canonical_url_sql, host_key_sql

    schemes = ", ".join(f"'{s}'" for s in _MESSY_PARTS["scheme"])
    ports = ", ".join(f"'{p}'" for p in _MESSY_PARTS["port"])
    messy = (
        f"list_extract([{schemes}], CAST(doc_id % 4 + 1 AS INT)) || '://' || "
        "(CASE WHEN doc_id % 5 = 0 THEN 'bot:pw@' ELSE '' END) || "
        "'WWW.' || upper(source) || '.Example.COM' || "
        f"list_extract([{ports}], CAST(doc_id % 4 + 1 AS INT)) || "
        "'//docs//' || CAST(doc_id % 7 AS VARCHAR) || '/page' || "
        "'?z=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1' || "
        "'#sec' || CAST(doc_id % 2 AS VARCHAR)"
    )
    canon = canonical_url_sql(messy)
    return (
        f"SELECT {canon} AS curl, {host_key_sql(canon)} AS hkey, count(*) AS n "
        "FROM documents GROUP BY 1, 2"
    )


O_URL_CANONICAL = _o_url_canonical()


# ---------------------------------------------------------------------------
# 19. PII scrubbing (training-data hygiene)
# ---------------------------------------------------------------------------


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (pages/pii.py): emails / cards / phones / IPv4s
    replaced by typed tokens — regexp_replace Columns in codegen, rule
    list shared verbatim with the DuckDB oracle via scrub_pii_sql.
    Deterministic PII is injected per doc_id (each kind on its own residue
    class, none on class 0) so every rule and the no-op path are hit."""
    from versatiles_rs_spark.pages.pii import pii_counts, scrub_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    m4 = did % 4
    noisy = F.concat(
        F.col("text"),
        F.when(m4 == 1, F.concat(F.lit(" mail user"), did.cast("string"), F.lit("@ex.org")))
        .when(m4 == 2, F.concat(F.lit(" tel +1 555-01"), F.lpad((did % 100).cast("string"), 2, "0"), F.lit(" end")))
        .when(m4 == 3, F.concat(F.lit(" card 4111 1111 1111 "), F.lpad((did % 10000).cast("string"), 4, "0"), F.lit(" ip 10.0.0."), (did % 256).cast("string")))
        .otherwise(F.lit("")),
    )
    counts = pii_counts(noisy)
    return docs.select(
        "doc_id",
        scrub_pii(noisy).alias("clean"),
        counts["n_email"].alias("n_email"),
        counts["n_card"].alias("n_card"),
        counts["n_phone"].alias("n_phone"),
        counts["n_ip"].alias("n_ip"),
    )


def _o_pii_scrub() -> str:
    from versatiles_rs_spark.pages.pii import scrub_pii_sql

    noisy = (
        "text || (CASE "
        "WHEN doc_id % 4 = 1 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@ex.org' "
        "WHEN doc_id % 4 = 2 THEN ' tel +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' end' "
        "WHEN doc_id % 4 = 3 THEN ' card 4111 1111 1111 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) "
        "ELSE '' END)"
    )
    clean = scrub_pii_sql(noisy)
    cnt = {
        tok: f"CAST((length({clean}) - length(replace({clean}, '<{tok}>', ''))) / {len(tok) + 2} AS BIGINT)"
        for tok in ("EMAIL", "CARD", "PHONE", "IP")
    }
    return (
        f"SELECT doc_id, {clean} AS clean, "
        f"{cnt['EMAIL']} AS n_email, {cnt['CARD']} AS n_card, "
        f"{cnt['PHONE']} AS n_phone, {cnt['IP']} AS n_ip "
        "FROM documents"
    )


O_PII_SCRUB = _o_pii_scrub()


# ---------------------------------------------------------------------------
# 20b. repetition quality signals (Gopher/MassiveText-style filters)
# ---------------------------------------------------------------------------


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (pages/repetition.py): dup-line fraction as
    zero-shuffle array Column math and top-bigram share via exploded
    two-level aggregation. Deterministic repetition is injected per
    residue class: duplicated lines (class 1), unique extra lines
    (class 2), and a spammy repeated bigram tail (class 3)."""
    from versatiles_rs_spark.pages.repetition import (
        dup_fraction,
        top_bigram_fraction,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m4 = F.col("doc_id") % 4
    body = (
        F.when(m4 == 1, F.concat(F.col("text"), F.lit("\n"), F.col("text"), F.lit("\n"), F.col("text")))
        .when(m4 == 2, F.concat(F.col("text"), F.lit("\nunique line one\nunique line two")))
        .when(m4 == 3, F.concat(F.col("text"), F.lit(" "), F.repeat(F.lit("buy now "), 12)))
        .otherwise(F.col("text"))
    )
    shaped = docs.select("doc_id", body.alias("text"))
    lines = shaped.select(
        "doc_id", F.round(dup_fraction(F.col("text"), "\n"), 6).alias("dup_line_frac")
    )
    grams = top_bigram_fraction(shaped)
    return lines.join(grams, "doc_id").select(
        "doc_id",
        "dup_line_frac",
        "n_bigrams",
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    )


def _o_repetition_stats() -> str:
    from versatiles_rs_spark.pages.repetition import dup_fraction_sql

    body = (
        "CASE WHEN doc_id % 4 = 1 THEN text || e'\\n' || text || e'\\n' || text "
        "WHEN doc_id % 4 = 2 THEN text || e'\\nunique line one\\nunique line two' "
        "WHEN doc_id % 4 = 3 THEN text || ' ' || repeat('buy now ', 12) "
        "ELSE text END"
    )
    dup = dup_fraction_sql("s.text", "e'\\n'")
    return f"""
WITH shaped AS (
  SELECT doc_id, {body} AS text FROM documents
), toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM shaped
), grams AS (
  SELECT doc_id, unnest(CASE WHEN len(l) < 2 THEN []
                             ELSE list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])
                        END) AS gram
  FROM toks
), per_gram AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac
  FROM per_gram GROUP BY 1
)
SELECT s.doc_id, round({dup}, 6) AS dup_line_frac,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       coalesce(p.top_bigram_frac, 0.0) AS top_bigram_frac
FROM shaped s LEFT JOIN per_doc p USING (doc_id)
"""


O_REPETITION_STATS = _o_repetition_stats()


# ---------------------------------------------------------------------------
# 20d. stratified sampling + vocabulary (training-mix shaping)
# ---------------------------------------------------------------------------

_STRATA = {"en": 0.9, "de": 0.5, "fr": 0.25}


_MIX_BUDGETS = {"en": 4000, "zh": 1000, "es": 1000, "de": 1000, "fr": 1000}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing (pages/sampling.mixture_sample): per
    language, the greedy doc_id-ordered prefix whose cumulative token
    count stays under the stratum budget — the fixed-mixture step of a
    training pipeline. The Spark plan is the bucketed two-phase split
    (broadcast bucket marks + window over ONE edge bucket per stratum);
    the oracle is the straightforward corpus-wide prefix-sum cut the
    plan must equal, row for row."""
    from versatiles_rs_spark.pages.sampling import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixture_sample(docs, _MIX_BUDGETS)


def _o_mixture_sample() -> str:
    from versatiles_rs_spark.pages.sampling import mixture_sample_sql

    return mixture_sample_sql(_MIX_BUDGETS)


O_MIXTURE_SAMPLE = _o_mixture_sample()


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sampling (pages/sampling.py): deterministic
    portable-hash keep decision per stratum fraction — zero-shuffle Column
    predicate; the oracle runs the identical predicate via
    stratified_sample_sql. Audit aggregate: kept count + id checksum per
    language."""
    from versatiles_rs_spark.pages.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = stratified_sample(docs, _STRATA, default_fraction=0.75)
    return kept.groupBy("lang").agg(
        F.count("*").alias("kept"), F.sum("doc_id").alias("id_sum")
    )


def _o_stratified_sample() -> str:
    from versatiles_rs_spark.pages.sampling import stratified_sample_sql

    pred = stratified_sample_sql(_STRATA, default_fraction=0.75)
    return (
        "SELECT lang, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum "
        f"FROM documents WHERE {pred} GROUP BY lang"
    )


O_STRATIFIED_SAMPLE = _o_stratified_sample()

_VOCAB_K = 50


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-k vocabulary (tokenizer-training step 1): word explode in
    codegen, map-side-combined counts, distributed TakeOrderedAndProject
    top-k with a deterministic (count DESC, word ASC) total order."""
    from versatiles_rs_spark.pages.sampling import vocab_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_topk(docs, k=_VOCAB_K).select(
        F.col("rank").cast("bigint").alias("rank"), "word", F.col("n").cast("bigint").alias("n")
    )


_ROBOTS_TXT = "User-agent: *\nDisallow: /d/\nAllow: /d/ok/\n"


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance filter (pages/robots.py): parse per-host
    policies into a rules table, broadcast-join pages with the prefix
    match in the join condition, longest-prefix winner per row (allow
    beats disallow on ties). Even-numbered hosts carry a policy
    (disallow /d/, allow-override /d/ok/); odd hosts have none. The
    oracle reimplements the winner selection in SQL over the SAME rule
    set written as literals — so both the parser and the applier are
    cross-checked."""
    import pandas as pd

    from versatiles_rs_spark.pages.robots import apply_robots, parse_robots

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    robots = spark.createDataFrame(
        pd.DataFrame(
            [(f"src{k}.ex.com", _ROBOTS_TXT.encode()) for k in range(0, 20, 2)],
            columns=["host", "robots"],
        )
    )
    rules = parse_robots(robots)
    m5 = F.col("doc_id") % 5
    path = (
        F.when(m5 == 0, F.lit("/d/x"))
        .when(m5 == 1, F.lit("/d/ok/y"))
        .when(m5 == 2, F.lit("/p/z"))
        .when(m5 == 3, F.lit("/d/"))
        .otherwise(F.lit("/q"))
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://src"), (F.col("doc_id") % 20).cast("string"), F.lit(".ex.com"), path
        ).alias("url"),
    )
    return apply_robots(pages, rules).select("doc_id", "url", "allowed")


def _o_robots_filter() -> str:
    rules = ", ".join(
        f"('src{k}.ex.com', 'disallow', '/d/'), ('src{k}.ex.com', 'allow', '/d/ok/')"
        for k in range(0, 20, 2)
    )
    return f"""
WITH pages AS (
  SELECT doc_id,
         'src' || CAST(doc_id % 20 AS VARCHAR) || '.ex.com' AS host,
         CASE doc_id % 5 WHEN 0 THEN '/d/x' WHEN 1 THEN '/d/ok/y'
              WHEN 2 THEN '/p/z' WHEN 3 THEN '/d/' ELSE '/q' END AS path
  FROM documents
), rules AS (
  SELECT * FROM (VALUES {rules}) AS t(host, rule, prefix)
), cand AS (
  SELECT p.doc_id, p.host, p.path, r.rule, r.prefix
  FROM pages p LEFT JOIN rules r
    ON r.host = p.host AND starts_with(p.path, r.prefix)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY length(prefix) DESC NULLS LAST, rule ASC) AS rn
  FROM cand
)
SELECT doc_id, 'http://' || host || path AS url,
       coalesce(rule = 'allow', TRUE) AS allowed
FROM ranked WHERE rn = 1
"""


O_ROBOTS_FILTER = _o_robots_filter()


_SESSION_GAP_MIN = 20.0


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessions.py): lag + running-sum
    windows on the user key, boundaries compared in integer microseconds
    so the SQL oracle's sessions are bit-identical."""
    from versatiles_rs_spark.operators.sessions import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = session_stats(ev, gap_minutes=_SESSION_GAP_MIN)
    return out.select(
        "user_id",
        F.col("session_no").cast("bigint").alias("session_no"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("duration_s", 6).alias("duration_s"),
        "value_sum",
    )


def _o_sessionize() -> str:
    from versatiles_rs_spark.operators.sessions import session_stats_sql

    sql = session_stats_sql(gap_minutes=_SESSION_GAP_MIN).rstrip()
    # wrap to round duration identically to the Spark side
    return (
        "SELECT user_id, session_no, n_events, round(duration_s, 6) AS duration_s, "
        f"value_sum FROM ({sql})"
    )


O_SESSIONIZE = _o_sessionize()


_LM_REF_MOD = 10


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (pages/lm.py): add-k bigram LM
    trained on the doc_id % 10 == 0 reference slice (two hash
    aggregations), every document scored by joining its exploded bigrams
    to the broadcast model. The oracle retrains and rescores entirely in
    SQL — model AND scorer are cross-engine-verified."""
    from versatiles_rs_spark.pages.lm import perplexity, train_bigram_lm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("doc_id") % _LM_REF_MOD == 0)
    uni, bi, vocab = train_bigram_lm(ref)
    return perplexity(docs, uni, bi, vocab)


def _o_lm_perplexity() -> str:
    from versatiles_rs_spark.pages.lm import perplexity_sql

    return perplexity_sql(f"doc_id % {_LM_REF_MOD} = 0")


O_LM_PERPLEXITY = _o_lm_perplexity()


def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix analysis: documents ranked into exact deciles by
    length (ntile over a total order with doc_id tiebreak — deterministic,
    unlike approximate percentiles), with per-decile population, bounds,
    and id checksum. One window + one aggregation."""
    from pyspark.sql.window import Window as _W

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = _W.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    binned = docs.withColumn("decile", F.ntile(10).over(w))
    return binned.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.min("n_chars").alias("len_min"),
        F.max("n_chars").alias("len_max"),
        F.sum("doc_id").alias("id_sum"),
    )


O_QUALITY_DECILES = """
WITH binned AS (
  SELECT doc_id, n_chars,
         ntile(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS decile
  FROM documents
)
SELECT decile, count(*) AS n,
       min(n_chars) AS len_min, max(n_chars) AS len_max,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM binned GROUP BY decile
"""


_PMI_MIN_PAIR = 5


def q_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-association mining: pointwise mutual information of adjacent
    word pairs over the corpus — PMI(w1,w2) = ln(N * c12 / (c1 * c2))
    with N the bigram total. Collocations (high PMI) drive tokenizer
    merges and phrase detection. Pure two-level aggregation: bigram and
    unigram counts (map-side combinable) joined on the word keys; the
    oracle rebuilds the identical statistic in SQL."""
    from versatiles_rs_spark.pages.lm import _doc_bigrams, _toks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bi = _doc_bigrams(docs, "text").groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = (
        docs.select(F.explode(_toks("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n = bi.agg(F.sum("c12")).collect()[0][0]
    out = (
        bi.where(F.col("c12") >= _PMI_MIN_PAIR)
        .join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")), "w2")
        .select(
            "w1", "w2", F.col("c12").cast("bigint").alias("c12"),
            F.round(
                F.log(F.lit(float(n)) * F.col("c12") / (F.col("c1") * F.col("c2"))), 6
            ).alias("pmi"),
        )
    )
    return out


O_WORD_PMI = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM documents
), grams AS (
  SELECT unnest(CASE WHEN len(l) < 2 THEN []
                     ELSE list_transform(range(1, len(l)), i -> {{'w1': l[i], 'w2': l[i + 1]}})
                END) AS g
  FROM toks
), bi AS (
  SELECT g.w1 AS w1, g.w2 AS w2, count(*) AS c12 FROM grams GROUP BY 1, 2
), uni2 AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(l) AS w FROM toks) GROUP BY 1
), n AS (SELECT sum(c12) AS total FROM bi)
SELECT b.w1, b.w2, CAST(b.c12 AS BIGINT) AS c12,
       round(ln((SELECT total FROM n) * b.c12 / (u1.c * u2.c)), 6) AS pmi
FROM bi b JOIN uni2 u1 ON b.w1 = u1.w JOIN uni2 u2 ON b.w2 = u2.w
WHERE b.c12 >= {_PMI_MIN_PAIR}
"""


_BM25_TERMS = ["spark", "window", "hash"]
_BM25_K = 15


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (pages/retrieval.py): inverted-index postings pruned
    to the query terms before any scoring, Lucene-variant idf, document-
    length normalization, distributed top-k on a (rounded score, doc_id)
    total order. The oracle recomputes the full formula in SQL."""
    from versatiles_rs_spark.pages.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, _BM25_TERMS, k=_BM25_K)


def _o_bm25_topk() -> str:
    from versatiles_rs_spark.pages.retrieval import bm25_topk_sql

    return bm25_topk_sql(_BM25_TERMS, k=_BM25_K)


O_BM25_TOPK = _o_bm25_topk()


O_VOCAB_TOPK = f"""
WITH words AS (
  SELECT unnest(list_filter(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' '),
                x -> x != '')) AS word
  FROM documents
), counts AS (
  SELECT word, count(*) AS n FROM words GROUP BY word
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, word ASC) AS BIGINT) AS rank,
       word, CAST(n AS BIGINT) AS n
FROM counts ORDER BY n DESC, word ASC LIMIT {_VOCAB_K}
"""


# ---------------------------------------------------------------------------
# 20c. WARC archive round-trip (Common-Crawl container path)
# ---------------------------------------------------------------------------


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the synthetic pages to Common-Crawl-layout .warc.gz archives
    (member-per-record + CDX sidecars), re-ingest with the distributed
    reader, and emit (url, md5 of the html payload, second-truncated
    timestamp). The oracle recomputes all three straight from the
    documents table via the shared SQL derivations — byte-level survival
    of every record through the archive format is what the hash proves."""
    import hashlib
    import shutil
    import tempfile

    from versatiles_rs_spark.pages.generator import synth_pages
    from versatiles_rs_spark.sources.warc import read_warc, write_warc

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = f"{tempfile.gettempdir()}/vt_warc_rt_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    write_warc(synth_pages(spark, sf_dir).repartition(4), out)
    back = read_warc(spark, out)
    return back.select(
        "url",
        F.md5(F.col("html").cast("string")).alias("html_md5"),
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )


O_WARC_ROUNDTRIP = """
SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       md5('<html><head><meta name="geo" content="'
           || CAST((doc_id * 2654435761) % 360000000 AS VARCHAR) || ','
           || CAST((doc_id * 2246822519) % 170000000 AS VARCHAR)
           || '"></head><body>' || text || '</body></html>') AS html_md5,
       strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id),
                '%Y-%m-%d %H:%M:%S') AS ts
FROM documents
"""


# ---------------------------------------------------------------------------
# 21. link graph + PageRank (web-graph layer)
# ---------------------------------------------------------------------------

_PR_DAMPING = 0.85
_PR_ITER = 3


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph PageRank (pages/links.py): href extraction with
    regexp_extract_all, weighted host edge list (self-loops dropped),
    3 power iterations as DataFrame joins with the dangling-mass term kept
    in-plan. Deterministic linky HTML: every src<k> page links to
    src<k+1>, every third page links to the hub src0, and src19 pages
    emit no links (a dangling host). Oracle: the same graph + 3 unrolled
    iterations in pure SQL CTEs."""
    from versatiles_rs_spark.pages.links import extract_links, host_edges, pagerank_hosts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = F.col("doc_id") % 20
    url = F.concat(F.lit("http://src"), k.cast("string"), F.lit(".ex.com/d/"), F.col("doc_id").cast("string"))
    nxt = (F.col("doc_id") + 1) % 20
    html = F.when(k == 19, F.lit("<p>no links</p>")).otherwise(
        F.concat(
            F.lit('<a href="http://src'), nxt.cast("string"), F.lit('.ex.com/p">n</a>'),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit('<a href="http://src0.ex.com/h">h</a>')
            ).otherwise(F.lit("")),
        )
    )
    pages = docs.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    edges = host_edges(extract_links(pages))
    ranks = pagerank_hosts(edges, n_iter=_PR_ITER, damping=_PR_DAMPING)
    return ranks.select("host", F.round("rank", 6).alias("rank"))


def _o_link_pagerank() -> str:
    from versatiles_rs_spark.pages.links import HREF_PATTERN
    from versatiles_rs_spark.pages.urls import host_of_sql

    d = _PR_DAMPING
    pat = HREF_PATTERN.replace("'", "''").replace('"', '"')
    html = (
        "CASE WHEN doc_id % 20 = 19 THEN '<p>no links</p>' ELSE "
        "'<a href=\"http://src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.ex.com/p\">n</a>' || "
        "(CASE WHEN doc_id % 3 = 0 THEN '<a href=\"http://src0.ex.com/h\">h</a>' ELSE '' END) END"
    )
    url = "'http://src' || CAST(doc_id % 20 AS VARCHAR) || '.ex.com/d/' || CAST(doc_id AS VARCHAR)"
    sql = f"""
WITH pages AS (
  SELECT {url} AS url, {html} AS html FROM documents
), links AS (
  SELECT url, unnest(regexp_extract_all(html, '{pat}', 1)) AS link FROM pages
), edges_raw AS (
  SELECT {host_of_sql('url')} AS src, {host_of_sql('link')} AS dst FROM links
), edges AS (
  SELECT src, dst, count(*) AS weight FROM edges_raw WHERE src != dst GROUP BY 1, 2
), nodes AS (
  SELECT DISTINCT host FROM (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)
), nn AS (SELECT count(*) AS n FROM nodes
), outw AS (SELECT src, sum(weight) AS w_out FROM edges GROUP BY 1
), share AS (
  SELECT e.src, e.dst, e.weight * 1.0 / o.w_out AS share FROM edges e JOIN outw o USING (src)
), r0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    for i in range(1, _PR_ITER + 1):
        p = i - 1
        sql += f""", f{i} AS (
  SELECT s.dst AS host, sum(s.share * r.rank) AS inflow
  FROM share s JOIN r{p} r ON s.src = r.host GROUP BY 1
), d{i} AS (
  SELECT coalesce(sum(rank), 0) AS dm FROM r{p}
  WHERE host NOT IN (SELECT src FROM outw)
), r{i} AS (
  SELECT n.host,
         (1 - {d}) / (SELECT n FROM nn)
         + {d} * (coalesce(f.inflow, 0) + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM nodes n LEFT JOIN f{i} f USING (host)
)"""
    sql += f"\nSELECT host, round(rank, 6) AS rank FROM r{_PR_ITER}"
    return sql


O_LINK_PAGERANK = _o_link_pagerank()


_BPE_TOPK = 20
_BPE_MERGES = 12


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed BPE trainer's pair-counting core (pages/bpe.py):
    corpus -> word counts -> adjacent character-pair counts, top-k with a
    deterministic (count DESC, left ASC, right ASC) total order. This is
    iteration 0 of training, the one step SQL can express — so the oracle
    checks the exact aggregation the whole trainer loops on."""
    from versatiles_rs_spark.pages.bpe import _initial_symbols, _pair_counts, word_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc = word_counts(docs)
    return (
        _pair_counts(_initial_symbols(wc).where(F.size("syms") > 1))
        .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        .limit(_BPE_TOPK)
        .select(
            F.col("left").alias("l_sym"),
            F.col("right").alias("r_sym"),
            F.col("pair_count").cast("bigint").alias("pair_count"),
        )
    )


O_BPE_PAIR_COUNTS = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '{_BPE_RX}')) AS word FROM documents
), wc AS (
  SELECT word, COUNT(*) AS freq FROM words GROUP BY word
), prs AS (
  SELECT unnest(list_zip(regexp_extract_all(word, '.'),
                         regexp_extract_all(word, '.')[2:])) AS p, freq
  FROM wc WHERE length(word) > 1
)
SELECT p[1] AS l_sym, p[2] AS r_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
FROM prs WHERE p[2] IS NOT NULL
GROUP BY 1, 2
ORDER BY pair_count DESC, l_sym ASC, r_sym ASC
LIMIT {_BPE_TOPK}
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sequential BPE training (pages/bpe.py train_bpe) on the
    documents corpus: the learned merge list in rank order. Classic BPE's
    argmax-then-rewrite loop is not SQL-expressible, so this entry has no
    DuckDB oracle (rows-only driver check); the merge-for-merge equality
    against an independent single-node reference implementation is
    covered by tests/test_bpe.py."""
    from versatiles_rs_spark.pages.bpe import train_bpe, word_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(word_counts(docs), n_merges=_BPE_MERGES)
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("rank", LongType()),
            StructField("l_sym", StringType()),
            StructField("r_sym", StringType()),
            StructField("merged", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in merges],
        schema,
    )


# ---------------------------------------------------------------------------
# 34. heuristic quality filters (C4 / Gopher) + normalization-before-dedup
# ---------------------------------------------------------------------------

def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line+page quality rules (Raffel et al. 2020 §2.2) over the
    deterministic decorated page built from (doc_id, text) — terminal
    punctuation, >= 3 words/line, javascript-line drop, '{' and
    'lorem ipsum' page drops. Zero shuffles; the oracle renders the
    IDENTICAL rule chain via pages.quality_filters.c4_filter_sql."""
    from versatiles_rs_spark.pages.quality_filters import c4_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return c4_filter(docs)


def q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher Table-A1 quality signals (Rae et al. 2021): word-count
    bounds, mean word length, alpha-word / bullet-line / ellipsis-line
    fractions (micro-quantized), stop-word floor. Zero shuffles."""
    from versatiles_rs_spark.pages.quality_filters import gopher_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_filter(docs)


def q_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup AFTER canonical text normalization (lowercase, strip
    punctuation, collapse whitespace): deterministic case/punct/space
    noise is injected per doc_id, and n_variants > 1 groups prove the
    normalizer merged raw-distinct rows. Same single-shuffle shape as
    dedup_exact."""
    from versatiles_rs_spark.pages.quality_filters import normalized_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return normalized_dedup(docs)


def _o_c4_filter() -> str:
    from versatiles_rs_spark.pages.quality_filters import c4_filter_sql

    return c4_filter_sql()


def _o_gopher_filter() -> str:
    from versatiles_rs_spark.pages.quality_filters import gopher_filter_sql

    return gopher_filter_sql()


def _o_normalized_dedup() -> str:
    from versatiles_rs_spark.pages.quality_filters import normalized_dedup_sql

    return normalized_dedup_sql()


O_C4_FILTER = _o_c4_filter()
O_GOPHER_FILTER = _o_gopher_filter()
O_NORMALIZED_DEDUP = _o_normalized_dedup()


# ---------------------------------------------------------------------------
# 36b. registered domains (PSL algorithm) + crawl politeness scheduling
# ---------------------------------------------------------------------------

# deterministic host zoo exercising every branch of the PSL algorithm:
# multi-label public suffixes (2- and 3-label), deep subdomains, plain TLDs
_HOST_SPARK = (
    "CASE cast(doc_id % 4 as int) "
    "WHEN 0 THEN 'www.' || source || '.example.co.uk' "
    "WHEN 1 THEN source || '.github.io' "
    "WHEN 2 THEN 'a.b.' || source || '.com' "
    "ELSE source || '.blogspot.com' END"
)
_HOST_DUCK = (
    "CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN 'www.' || source || '.example.co.uk' "
    "WHEN 1 THEN source || '.github.io' "
    "WHEN 2 THEN 'a.b.' || source || '.com' "
    "ELSE source || '.blogspot.com' END"
)


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain rollup (the crawl-dedup / politeness key): the
    public-suffix algorithm (longest multi-label suffix + one label) as
    pure Column math over a host zoo hitting every branch. One hash-agg."""
    from versatiles_rs_spark.pages.urls import registered_domain

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host = F.expr(_HOST_SPARK)
    return (
        docs.select(
            registered_domain(host).alias("rdomain"), host.alias("host")
        )
        .groupBy("rdomain")
        .agg(F.count("*").alias("n_docs"), F.countDistinct("host").alias("n_hosts"))
    )


def _o_domain_stats() -> str:
    from versatiles_rs_spark.pages.urls import registered_domain_sql

    rd = registered_domain_sql(f"({_HOST_DUCK})")
    return f"""
SELECT {rd} AS rdomain, count(*) AS n_docs,
       count(DISTINCT ({_HOST_DUCK})) AS n_hosts
FROM documents GROUP BY 1
"""


O_DOMAIN_STATS = _o_domain_stats()

_CRAWL_RATE = 3  # fetches per politeness slot per registered domain


def q_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier politeness scheduling: per registered domain,
    deterministic fetch order (doc_id) bucketed into rate-limited slots —
    one window shuffle on the domain key, the frontier-scheduler shape."""
    from pyspark.sql import Window

    from versatiles_rs_spark.pages.urls import registered_domain

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host = F.expr(_HOST_SPARK)
    d = docs.select("doc_id", registered_domain(host).alias("rdomain"))
    rn = F.row_number().over(Window.partitionBy("rdomain").orderBy("doc_id"))
    d = d.withColumn("slot", ((rn - 1) / _CRAWL_RATE).cast("bigint"))
    return d.groupBy("rdomain").agg(
        F.count("*").alias("n_docs"),
        (F.max("slot") + 1).alias("n_slots"),
        F.sum("slot").alias("slot_checksum"),
    )


def _o_crawl_schedule() -> str:
    from versatiles_rs_spark.pages.urls import registered_domain_sql

    rd = registered_domain_sql(f"({_HOST_DUCK})")
    return f"""
WITH d AS (
  SELECT doc_id, {rd} AS rdomain FROM documents
), s AS (
  SELECT rdomain,
         CAST((row_number() OVER (PARTITION BY rdomain ORDER BY doc_id) - 1)
              // {_CRAWL_RATE} AS BIGINT) AS slot
  FROM d
)
SELECT rdomain, count(*) AS n_docs, max(slot) + 1 AS n_slots,
       CAST(sum(slot) AS BIGINT) AS slot_checksum
FROM s GROUP BY 1
"""


O_CRAWL_SCHEDULE = _o_crawl_schedule()




# ---------------------------------------------------------------------------
# 38. Bloom-filter URL-seen (crawl-frontier membership at 10^12 scale)
# ---------------------------------------------------------------------------

_BLOOM_QUERY_M = 1024  # small enough that the false-positive class is non-empty


def q_url_seen_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter crawl-frontier dedup (pages/bloom.py): filter state is
    a DISTINCT over hash positions (bounded by m, broadcastable at any
    corpus size); the exact-verify join runs only over the maybe-seen
    sliver. The oracle attests the no-false-negative theorem as data: the
    (truly seen AND NOT maybe_seen) class never appears."""
    from versatiles_rs_spark.pages.bloom import url_seen_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return url_seen_stats(docs, m=_BLOOM_QUERY_M)


def _o_url_seen_bloom() -> str:
    from versatiles_rs_spark.pages.bloom import url_seen_stats_sql

    return url_seen_stats_sql(m=_BLOOM_QUERY_M)


O_URL_SEEN_BLOOM = _o_url_seen_bloom()


# ---------------------------------------------------------------------------
# 39. Hashed NB quality classifier + DSIR importance resampling
# ---------------------------------------------------------------------------


def _decorated_pages(spark: SparkSession, sf_dir: str):
    """(pages, seed_labeled): the decorated page joined to one string per
    doc, and the 25% seed subset labeled with the engine's own C4 page
    rule — the heuristic-distillation setup (CCNet/LLaMA bootstraps its
    quality classifier from heuristic labels the same way)."""
    from versatiles_rs_spark.pages.quality_filters import (
        c4_filter,
        decorated_lines,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = docs.select(
        "doc_id",
        F.expr(f"array_join({decorated_lines()}, ' ')").alias("text"),
    )
    labels = c4_filter(docs).select("doc_id", "c4_keep")
    seed = (
        pages.where("doc_id % 4 = 0")
        .join(labels, "doc_id")
        .select(F.col("c4_keep").alias("label"), "text")
    )
    return pages, seed


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/LLaMA-style corpus scoring: train multinomial NB on the seed
    subset (doc_id % 4 == 0, label = the C4 page rule over the decorated
    page), score ALL documents — the classifier genuinely learns the
    injected boilerplate vocabulary as negative evidence and generalizes
    to the unlabeled 75%. Training shuffles <= 2*m (label, bucket) rows
    regardless of corpus size; scoring is one zero-shuffle codegen
    Project over literal weight tables (pages/classifier.py). The oracle
    retrains + rescores the identical model relationally — integer
    micro-nat margins match value-for-value."""
    from versatiles_rs_spark.pages.classifier import score_nb, train_nb

    pages, seed = _decorated_pages(spark, sf_dir)
    return score_nb(pages, train_nb(seed))


def _o_quality_classifier() -> str:
    from versatiles_rs_spark.pages.classifier import nb_oracle_sql

    return nb_oracle_sql()


O_QUALITY_CLASSIFIER = _o_quality_classifier()


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023): importance weight
    ln p_target - ln p_raw under add-1 hashed-bigram unigram models
    (target = the C4-passing seed pages, raw = the whole seed),
    deterministic top-100 selection. Bounded training aggregate +
    zero-shuffle scoring + TakeOrdered."""
    from versatiles_rs_spark.pages.classifier import dsir_topk, train_dsir

    pages, seed = _decorated_pages(spark, sf_dir)
    table = train_dsir(seed.where("label"), seed)
    return dsir_topk(pages, table, k=100)


def _o_dsir_sample() -> str:
    from versatiles_rs_spark.pages.classifier import dsir_oracle_sql

    return dsir_oracle_sql(k=100)


O_DSIR_SAMPLE = _o_dsir_sample()


# ---------------------------------------------------------------------------
# 40. Sequence packing (concat-and-chunk into fixed-length training seqs)
# ---------------------------------------------------------------------------


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc packing assignment into 512-token training sequences,
    packed per shard (pages/packing.py): one hash shuffle + in-partition
    running sum — no global sort. The oracle recomputes the identical
    windowed cumsum; start offsets, boundary spans, and shard layout all
    match integer-for-integer."""
    from versatiles_rs_spark.pages.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # start_off crosses the oracle bridge as a DuckDB windowed
    # sum(BIGINT) -> HUGEINT -> pandas float64: match the dtype so the
    # driver's value hash agrees (the CORRECTNESS_r05 hash-red class;
    # this query was never driver-swept, caught by the round-6
    # dtype-strict check_queries gate)
    return pack_sequences(docs).withColumn(
        "start_off", F.col("start_off").cast("double")
    )


def _o_sequence_packing() -> str:
    from versatiles_rs_spark.pages.packing import pack_sequences_sql

    return pack_sequences_sql()


O_SEQUENCE_PACKING = _o_sequence_packing()


def q_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training shuffle (pages/sampling.shard_shuffle):
    docs permuted by a portable 32-bit hash into 64 fixed hash-range
    shards with in-shard positions — one hash exchange + in-partition
    sort, NO global sort (plan-guarded in tests). Oracle recomputes the
    identical (shard, pos) assignment with a window over the same key."""
    from versatiles_rs_spark.pages.sampling import shard_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shard_shuffle(docs, n_shards=64)


O_SHARD_SHUFFLE = """
WITH k AS (
  SELECT doc_id, (doc_id * 2654435761) % 4294967296 AS skey FROM documents
)
SELECT doc_id, skey // 67108864 AS shard,
       CAST(row_number() OVER (PARTITION BY skey // 67108864
                               ORDER BY skey, doc_id) AS BIGINT) AS pos
FROM k
"""


def q_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney perplexity (pages/lm.py train_kn_lm /
    kn_perplexity): the standard n-gram smoothing (Kneser-Ney 1995;
    Chen & Goodman 1999) next to the add-k model — absolute discount
    d=3/4 off seen bigrams, discount mass re-spent on the CONTINUATION
    distribution N1+(., w2)/T (how many contexts a word follows, not how
    often it occurs). Same relational shape: three hash aggregations to
    train, three broadcast joins + one doc-keyed agg to score. The
    oracle retrains and rescores entirely in SQL."""
    from versatiles_rs_spark.pages.lm import kn_perplexity, train_kn_lm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("doc_id") % _LM_REF_MOD == 0)
    bi, ctx, cont, t, v_cont = train_kn_lm(ref)
    return kn_perplexity(docs, bi, ctx, cont, t, v_cont)


def _o_lm_kneser_ney() -> str:
    from versatiles_rs_spark.pages.lm import kn_perplexity_sql

    return kn_perplexity_sql(f"doc_id % {_LM_REF_MOD} = 0")


O_LM_KNESER_NEY = _o_lm_kneser_ney()


_PHRASE = ["table", "table"]  # repeated-word phrase: the hard slot case


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval (pages/retrieval.phrase_search): positional
    postings pruned to the phrase words, broadcast (word, slot) join,
    anchor = pos - slot votes, count == k <=> full match — no k-way
    self-join, corpus never shuffles. The repeated-word phrase attests
    the per-slot vote semantics (overlapping runs count every anchor)."""
    from versatiles_rs_spark.pages.retrieval import phrase_search

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return phrase_search(docs, _PHRASE)


def _o_phrase_search() -> str:
    from versatiles_rs_spark.pages.retrieval import phrase_search_sql

    return phrase_search_sql(_PHRASE)


O_PHRASE_SEARCH = _o_phrase_search()


def q_link_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting (pages/links.triangle_counts) on a circulant
    graph over doc_id % 100 nodes (hops +1, +3, +4 — every node closes
    triangles (u, u+1, u+4) and (u, u+3, u+4) mod 100): wedge join +
    closing semi-join, each triangle once via sorted node order. Oracle
    runs the identical relational plan in SQL."""
    from versatiles_rs_spark.pages.links import triangle_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = F.col("doc_id") % 100
    hops = F.array(F.lit(1), F.lit(3), F.lit(4))
    raw = docs.select(u.alias("u"), F.explode(hops).alias("h")).select(
        "u", ((F.col("u") + F.col("h")) % 100).alias("v")
    )
    edges = raw.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()
    return triangle_counts(edges)


O_LINK_TRIANGLES = """
WITH nodes AS (
  SELECT doc_id % 100 AS u FROM documents
), raw AS (
  SELECT u, (u + h) % 100 AS v
  FROM nodes CROSS JOIN (SELECT unnest([1, 3, 4]) AS h)
), e AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw
), tri AS (
  SELECT ab.a, ab.b, bc.c
  FROM (SELECT a, b FROM e) ab
  JOIN (SELECT a AS b, b AS c FROM e) bc USING (b)
  WHERE EXISTS (SELECT 1 FROM e x WHERE x.a = ab.a AND x.b = bc.c)
), flat AS (
  SELECT unnest([a, b, c]) AS node FROM tri
)
SELECT node, count(*) AS n_triangles FROM flat GROUP BY 1
"""


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS crawl depth (pages/links.bfs_hops): minimum hop
    count from the seed set (nodes ≡ 0 mod 50) over a directed graph on
    doc_id % 500 nodes with edges u -> (2u+1) % 500 and u -> (u+7) % 500,
    capped at 4 hops (chosen so a real fraction of nodes is OUTSIDE the cap — the exclusion rule is attested, not vacuous). Level-synchronous frontier expansion with
    localCheckpointed rounds; the oracle follows every path with a
    deduplicating recursive CTE and takes min(hop) per node — attesting
    layer order, the visited anti-join, and the cap."""
    from versatiles_rs_spark.pages.links import bfs_hops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = (F.col("doc_id") % 500).alias("u")
    nodes = docs.select(u).distinct()
    edges = (
        nodes.select("u", F.explode(F.array((F.col("u") * 2 + 1) % 500,
                                            (F.col("u") + 7) % 500)).alias("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
    )
    seeds = nodes.filter(F.col("u") % 50 == 0).select(F.col("u").alias("node"))
    # rows_hint = 500: the node space is doc_id % 500 by construction, so
    # dist/frontier are bounded a priori — the loop runs static one-job
    # rounds (operators/iterconf.py) sized from that bound.
    return bfs_hops(edges, seeds, max_hops=4, rows_hint=500).select(
        "node", F.col("hops").cast("long").alias("hops")
    ).orderBy("node")


O_BFS_HOPS = """
WITH RECURSIVE nodes AS (
  SELECT DISTINCT doc_id % 500 AS u FROM documents
), e AS (
  SELECT DISTINCT u AS src, (2 * u + 1) % 500 AS dst FROM nodes
  UNION
  SELECT DISTINCT u AS src, (u + 7) % 500 AS dst FROM nodes
), seeds AS (
  SELECT u AS node FROM nodes WHERE u % 50 = 0
), walk AS (
  SELECT node, 0 AS hop FROM seeds
  UNION
  SELECT e.dst AS node, w.hop + 1 AS hop
  FROM walk w JOIN e ON e.src = w.node WHERE w.hop < 4
)
SELECT node, CAST(min(hop) AS BIGINT) AS hops FROM walk GROUP BY node ORDER BY node
"""


_BLOCKLIST = [["hash", "join"], ["slow", "scan"], ["dup"], ["fast", "merge", "batch"]]


def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-phrase blocklist matching (pages/retrieval.blocklist_match):
    the C4-banned-list op at phrase granularity — one broadcast
    (phrase_id, word, slot) dictionary, postings pruned to its word set
    at the scan, anchor votes counted per phrase. The list mixes 1-, 2-
    and 3-token entries so the k = count(*) rule is attested across
    lengths. Oracle = the identical anchor algebra in SQL."""
    from versatiles_rs_spark.pages.retrieval import blocklist_match

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return blocklist_match(docs, _BLOCKLIST).orderBy("doc_id")


def _o_blocklist_filter() -> str:
    from versatiles_rs_spark.pages.retrieval import blocklist_match_sql

    return blocklist_match_sql(_BLOCKLIST) + " ORDER BY doc_id"


O_BLOCKLIST_FILTER = _o_blocklist_filter()


def q_skyline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier corpus triage (operators/skyline.skyline): the
    non-dominated documents on two independent integer score dims —
    phase-1 batch sweeps prune locally-dominated rows (sound: in-batch
    domination implies global), phase 2 re-sweeps the O(log n)-expected
    candidate set in one group. Duplicate-point tie semantics match the
    oracle's NOT EXISTS definition exactly."""
    from versatiles_rs_spark.operators.skyline import skyline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"),
        ((F.col("doc_id") * 7919) % 1000003).alias("d1"),
        ((F.col("doc_id") * 104729) % 1000033).alias("d2"),
    )
    return skyline(docs).orderBy("id")


O_SKYLINE_DOCS = """
WITH p AS (
  SELECT doc_id AS id, (doc_id * 7919) % 1000003 AS d1,
         (doc_id * 104729) % 1000033 AS d2
  FROM documents
)
SELECT id, d1, d2 FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.d1 >= a.d1 AND b.d2 >= a.d2 AND (b.d1 > a.d1 OR b.d2 > a.d2)
)
ORDER BY id
"""


def q_sssp_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest paths (pages/links.sssp_costs): frontier
    Bellman-Ford from the mod-50 seed set over the bfs_hops graph with
    positive weights 1 + (src*7 + dst*13) % 9 — converges to the exact
    fixpoint (early exit on no improvement). The oracle explores all
    paths with a deduplicating recursive CTE under the sound cost cap
    90 (every node is within 10 hops of a seed and max weight is 9, so
    every optimal path — and each of its prefixes — costs <= 90)."""
    from versatiles_rs_spark.pages.links import sssp_costs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    u = (F.col("doc_id") % 500).alias("u")
    nodes = docs.select(u).distinct()
    edges = (
        nodes.select("u", F.explode(F.array((F.col("u") * 2 + 1) % 500,
                                            (F.col("u") + 7) % 500)).alias("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
        .select("src", "dst", (1 + (F.col("src") * 7 + F.col("dst") * 13) % 9).alias("wgt"))
    )
    seeds = nodes.filter(F.col("u") % 50 == 0).select(F.col("u").alias("node"))
    # rows_hint = 500: the node space is doc_id % 500 by construction,
    # so the rounds run as static one-job SMJ plans sized from that
    # bound (operators/iterconf.py).  Under the static plan the
    # broadcast hint LOSES (every wave's broadcast build re-executes as
    # its own job per action: 22 -> 113 jobs measured) and the stride
    # optimum moves DOWN — static rounds are cheap, speculative wave
    # volume is not (interleaved sweep, results asserted identical:
    # stride 2/4/6/8 -> 1.56/1.37/1.43/1.68 s, vs the former
    # broadcast+AQE stride-8 shape at 2.08-2.57 s in the same sessions).
    return sssp_costs(edges, seeds, stride=4, rows_hint=500).select(
        "node", F.col("cost").cast("long").alias("cost")
    ).orderBy("node")


O_SSSP_COSTS = """
WITH RECURSIVE nodes AS (
  SELECT DISTINCT doc_id % 500 AS u FROM documents
), e0 AS (
  SELECT DISTINCT u AS src, (2 * u + 1) % 500 AS dst FROM nodes
  UNION
  SELECT DISTINCT u AS src, (u + 7) % 500 AS dst FROM nodes
), e AS (
  SELECT src, dst, 1 + (src * 7 + dst * 13) % 9 AS wgt FROM e0
), seeds AS (
  SELECT u AS node FROM nodes WHERE u % 50 = 0
), walk AS (
  SELECT node, 0 AS cost FROM seeds
  UNION
  SELECT e.dst AS node, w.cost + e.wgt AS cost
  FROM walk w JOIN e ON e.src = w.node WHERE w.cost + e.wgt <= 90
)
SELECT node, CAST(min(cost) AS BIGINT) AS cost FROM walk GROUP BY node ORDER BY node
"""
