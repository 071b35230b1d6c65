"""Heuristic document-quality filters (C4 / Gopher) + dedup text normalization.

The reference engine has no text-quality layer; these operators extend the
webtext payload axis with the standard public filter sets used to build
LLM pretraining corpora:

- C4 line/page rules (Raffel et al., "Exploring the Limits of Transfer
  Learning with a Unified Text-to-Text Transformer", JMLR 2020, §2.2):
  keep lines ending in terminal punctuation with >= 3 words and no
  "javascript"; drop pages containing '{' or "lorem ipsum"; require a
  minimum number of surviving lines.
- Gopher quality signals (Rae et al., "Scaling Language Models: Methods,
  Analysis & Insights from Training Gopher", 2021, Table A1): word-count
  bounds, mean word length, alphabetic-word fraction, bullet-line and
  ellipsis-line fractions, stop-word presence.
- Normalization-before-dedup (lowercase, punctuation strip, whitespace
  collapse) — the canonical form used before exact/MinHash dedup.

Engine-twin style follows pages/html_text.py: every rule is rendered for
Spark SQL AND DuckDB SQL from the same module constants, so the DuckDB
oracle cross-verifies the rule chain instead of self-checking.

The driver's `documents` table is single-line word salad, so line-level
rules would be degenerate on the raw text. Like queries.q_url_canonical's
messy-URL builder, `decorated_lines` deterministically synthesizes a
multi-line page from (doc_id, text) with pure column arithmetic — word
chunking, rotating terminal punctuation ('.', '!', '...', none), bullet
prefixes, and injected "lorem ipsum" / '{' / "javascript" lines on a
doc_id schedule — so every branch of every rule fires on both engines.

Scale shape: all three operators are per-row array/string math — ZERO
shuffles, no Python in the row path; at 10^12 rows they are pure map
stages. `normalized_dedup` adds the one hash-aggregate any dedup needs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LINE_WORDS = 8
SUFFIXES = (".", "!", "...", "", ".")
BULLET_MOD = 6  # (doc_id*7 + i) % 6 == 0 -> '- ' prefix
LOREM_MOD = 13
LOREM_LINE = "lorem ipsum dolor sit amet."
BRACE_MOD = 17
BRACE_LINE = "function f() { return 1; } javascript."

C4_MIN_WORDS_PER_LINE = 3
C4_MIN_KEPT_LINES = 3

GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100000
GOPHER_MEAN_LEN_LO_U = 3_000_000
GOPHER_MEAN_LEN_HI_U = 10_000_000
GOPHER_ALPHA_FRAC_U = 800_000
GOPHER_BULLET_FRAC_U = 900_000
GOPHER_ELLIPSIS_FRAC_U = 300_000
GOPHER_STOPWORDS = ("the", "a")
GOPHER_MIN_STOPWORDS = 2


def _suffix_array_sql() -> str:
    return ", ".join(f"'{s}'" for s in SUFFIXES)


def decorated_lines(doc_id: str = "doc_id", text: str = "text") -> str:
    """Spark SQL expr: array<string> of deterministic decorated lines."""
    ws = f"split({text}, ' ')"
    nl = f"cast(ceil(size({ws}) / {LINE_WORDS}.0) as int)"
    body = f"array_join(slice({ws}, i * {LINE_WORDS} + 1, {LINE_WORDS}), ' ')"
    bullet = f"(CASE WHEN ({doc_id} * 7 + i) % {BULLET_MOD} = 0 THEN '- ' ELSE '' END)"
    # (((x % m) + m) % m): portable positive mod — doc_id may be a negative
    # xxhash64 (WARC-derived ids), and both engines' % keeps the sign
    suffix = (
        f"element_at(array({_suffix_array_sql()}), "
        f"cast(((({doc_id} + i) % {len(SUFFIXES)}) + {len(SUFFIXES)}) % {len(SUFFIXES)} as int) + 1)"
    )
    base = f"transform(sequence(0, {nl} - 1), i -> {bullet} || {body} || {suffix})"
    # slice(arr, 1, 0/1) keeps the element type concrete (array() would be
    # array<null> and poison the CASE branches)
    lorem = (
        f"slice(array('{LOREM_LINE}'), 1, "
        f"CASE WHEN {doc_id} % {LOREM_MOD} = 0 THEN 1 ELSE 0 END)"
    )
    brace = (
        f"slice(array('{BRACE_LINE}'), 1, "
        f"CASE WHEN {doc_id} % {BRACE_MOD} = 0 THEN 1 ELSE 0 END)"
    )
    return f"concat({base}, {lorem}, {brace})"


def decorated_lines_sql(doc_id: str = "doc_id", text: str = "text") -> str:
    """DuckDB twin of decorated_lines (same constants, list dialect)."""
    ws = f"string_split({text}, ' ')"
    nl = f"CAST(ceil(len({ws}) / {LINE_WORDS}.0) AS INT)"
    body = f"array_to_string({ws}[i * {LINE_WORDS} + 1 : i * {LINE_WORDS} + {LINE_WORDS}], ' ')"
    bullet = f"(CASE WHEN ({doc_id} * 7 + i) % {BULLET_MOD} = 0 THEN '- ' ELSE '' END)"
    suffix = (
        f"[{_suffix_array_sql()}]"
        f"[CAST(((({doc_id} + i) % {len(SUFFIXES)}) + {len(SUFFIXES)}) % {len(SUFFIXES)} AS INT) + 1]"
    )
    base = f"list_transform(range(0, {nl}), i -> {bullet} || {body} || {suffix})"
    lorem = (
        f"(CASE WHEN {doc_id} % {LOREM_MOD} = 0 THEN ['{LOREM_LINE}'] "
        f"ELSE []::VARCHAR[] END)"
    )
    brace = (
        f"(CASE WHEN {doc_id} % {BRACE_MOD} = 0 THEN ['{BRACE_LINE}'] "
        f"ELSE []::VARCHAR[] END)"
    )
    return f"({base} || {lorem} || {brace})"


# -- C4 -----------------------------------------------------------------

_KEPT_PRED = (
    "(l LIKE '%.' OR l LIKE '%!') AND {size}({split}) >= "
    f"{C4_MIN_WORDS_PER_LINE} AND NOT contains(l, 'javascript')"
)


def _with_decorated(docs: DataFrame, doc_id: str, text: str) -> DataFrame:
    d = docs.withColumn("_ls", F.expr(decorated_lines(doc_id, text)))
    return d.withColumn("_gw", F.expr("flatten(transform(_ls, l -> split(l, ' ')))"))


def _c4_cols() -> dict:
    """Column pieces over a frame carrying `_ls` (shared by c4_filter and
    filter_funnel so both paths use literally the same expressions)."""
    kept_pred = _KEPT_PRED.format(size="size", split="split(l, ' ')")
    n_kept = F.expr(f"size(filter(_ls, l -> {kept_pred}))")
    has_brace = F.expr("exists(_ls, l -> contains(l, '{'))")
    has_lorem = F.expr("exists(_ls, l -> contains(lower(l), 'lorem ipsum'))")
    return {
        "n_kept": n_kept,
        "has_brace": has_brace,
        "has_lorem": has_lorem,
        "keep": (n_kept >= C4_MIN_KEPT_LINES) & ~has_brace & ~has_lorem,
    }


def c4_filter(docs: DataFrame, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """C4 line+page rules over the decorated page. One codegen-side Project
    + array HOFs; zero shuffles, zero Python."""
    d = _with_decorated(docs, doc_id, text)
    c = _c4_cols()
    return d.select(
        F.col(doc_id),
        F.expr("size(_ls)").cast("bigint").alias("n_lines"),
        c["n_kept"].cast("bigint").alias("n_kept"),
        c["has_brace"].alias("has_brace"),
        c["has_lorem"].alias("has_lorem"),
        c["keep"].alias("c4_keep"),
    )


def c4_filter_sql(doc_id: str = "doc_id", text: str = "text", table: str = "documents") -> str:
    kept_pred = _KEPT_PRED.format(size="len", split="string_split(l, ' ')")
    return f"""
WITH ls AS (
  SELECT {doc_id}, {decorated_lines_sql(doc_id, text)} AS lines FROM {table}
)
SELECT {doc_id},
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(list_filter(lines, l -> {kept_pred})) AS BIGINT) AS n_kept,
       len(list_filter(lines, l -> contains(l, '{{'))) > 0 AS has_brace,
       len(list_filter(lines, l -> contains(lower(l), 'lorem ipsum'))) > 0 AS has_lorem,
       (len(list_filter(lines, l -> {kept_pred})) >= {C4_MIN_KEPT_LINES}
        AND NOT len(list_filter(lines, l -> contains(l, '{{'))) > 0
        AND NOT len(list_filter(lines, l -> contains(lower(l), 'lorem ipsum'))) > 0)
       AS c4_keep
FROM ls
"""


# -- Gopher -------------------------------------------------------------

def _stop_in_sql() -> str:
    return ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)


def _gopher_cols() -> dict:
    """Column pieces over a frame carrying `_ls` and `_gw` (shared by
    gopher_filter and filter_funnel)."""
    n_words = F.expr("size(_gw)")
    mean_u = F.expr(
        "cast(floor(aggregate(_gw, 0L, (a, w) -> a + length(w)) / size(_gw)"
        " * 1000000.0 + 0.5) as bigint)"
    )
    alpha_u = F.expr(
        "cast(floor(size(filter(_gw, w -> w rlike '[A-Za-z]')) / size(_gw)"
        " * 1000000.0 + 0.5) as bigint)"
    )
    bullet_u = F.expr(
        "cast(floor(size(filter(_ls, l -> l LIKE '- %')) / size(_ls)"
        " * 1000000.0 + 0.5) as bigint)"
    )
    ellipsis_u = F.expr(
        "cast(floor(size(filter(_ls, l -> l LIKE '%...')) / size(_ls)"
        " * 1000000.0 + 0.5) as bigint)"
    )
    n_stop = F.expr(f"size(filter(_gw, w -> w IN ({_stop_in_sql()})))")
    keep = (
        n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & mean_u.between(GOPHER_MEAN_LEN_LO_U, GOPHER_MEAN_LEN_HI_U)
        & (alpha_u >= GOPHER_ALPHA_FRAC_U)
        & (bullet_u <= GOPHER_BULLET_FRAC_U)
        & (ellipsis_u <= GOPHER_ELLIPSIS_FRAC_U)
        & (n_stop >= GOPHER_MIN_STOPWORDS)
    )
    return {
        "n_words": n_words,
        "mean_u": mean_u,
        "alpha_u": alpha_u,
        "bullet_u": bullet_u,
        "ellipsis_u": ellipsis_u,
        "n_stop": n_stop,
        "keep": keep,
    }


def gopher_filter(docs: DataFrame, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """Gopher Table-A1 signals over the decorated page. Fractions are
    micro-quantized (floor(x*1e6+0.5)) so thresholds compare in exact
    integer space on both engines. Zero shuffles, zero Python."""
    d = _with_decorated(docs, doc_id, text)
    g = _gopher_cols()
    return d.select(
        F.col(doc_id),
        g["n_words"].cast("bigint").alias("n_words"),
        g["mean_u"].alias("mean_word_len_u"),
        g["alpha_u"].alias("alpha_frac_u"),
        g["bullet_u"].alias("bullet_frac_u"),
        g["ellipsis_u"].alias("ellipsis_frac_u"),
        g["n_stop"].cast("bigint").alias("n_stop"),
        g["keep"].alias("gopher_keep"),
    )


def gopher_filter_sql(doc_id: str = "doc_id", text: str = "text", table: str = "documents") -> str:
    mean_u = (
        "CAST(floor(list_sum(list_transform(gw, w -> length(w))) / len(gw)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    alpha_u = (
        "CAST(floor(len(list_filter(gw, w -> regexp_matches(w, '[A-Za-z]'))) / len(gw)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    bullet_u = (
        "CAST(floor(len(list_filter(lines, l -> l LIKE '- %')) / len(lines)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    ellipsis_u = (
        "CAST(floor(len(list_filter(lines, l -> l LIKE '%...')) / len(lines)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    n_stop = f"len(list_filter(gw, w -> w IN ({_stop_in_sql()})))"
    return f"""
WITH ls AS (
  SELECT {doc_id}, {decorated_lines_sql(doc_id, text)} AS lines FROM {table}
), gws AS (
  SELECT {doc_id}, lines,
         flatten(list_transform(lines, l -> string_split(l, ' '))) AS gw
  FROM ls
)
SELECT {doc_id},
       CAST(len(gw) AS BIGINT) AS n_words,
       {mean_u} AS mean_word_len_u,
       {alpha_u} AS alpha_frac_u,
       {bullet_u} AS bullet_frac_u,
       {ellipsis_u} AS ellipsis_frac_u,
       CAST({n_stop} AS BIGINT) AS n_stop,
       (len(gw) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND {mean_u} BETWEEN {GOPHER_MEAN_LEN_LO_U} AND {GOPHER_MEAN_LEN_HI_U}
        AND {alpha_u} >= {GOPHER_ALPHA_FRAC_U}
        AND {bullet_u} <= {GOPHER_BULLET_FRAC_U}
        AND {ellipsis_u} <= {GOPHER_ELLIPSIS_FRAC_U}
        AND {n_stop} >= {GOPHER_MIN_STOPWORDS}) AS gopher_keep
FROM gws
"""


# -- normalization-before-dedup ----------------------------------------

def messy_text(doc_id: str = "doc_id", text: str = "text") -> str:
    """Deterministic case/punctuation/whitespace noise (engine-shared):
    the three variants all normalize back to the raw text."""
    return (
        f"CASE cast({doc_id} % 3 as int) WHEN 0 THEN upper({text}) "
        f"WHEN 1 THEN {text} || ' !!' ELSE '  ' || {text} || '  ' END"
    )


def normalize_text(col: str) -> str:
    """Spark SQL expr: lowercase -> strip non [0-9a-z ] -> collapse runs of
    spaces -> trim. The canonical pre-dedup normal form."""
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^0-9a-z ]', ''), ' +', ' '))"
    )


def normalize_text_sql(col: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({col}), '[^0-9a-z ]', '', 'g'),"
        f" ' +', ' ', 'g'))"
    )


def normalize_text_pandas():
    """Arrow-batched twin of normalize_text (pandas str ops, same two
    regexes + trim) — the SCALE path. Measured on this box: the JVM
    regexp_replace chain is memory-bandwidth-bound across threads (flat
    wall time local[1]->local[32], see BENCH/BASELINE.md "Curation-funnel
    scaling"), while separate Python worker processes with pandas' C
    regex engine run the identical normalization ~7x faster at equal
    cores. Equality with the Column path is pytest-asserted
    character-for-character; oracle queries keep the Column form (the
    cross-engine-shared rule chain)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        out = s.str.lower().str.replace(r"[^0-9a-z ]", "", regex=True)
        return out.str.replace(r" +", " ", regex=True).str.strip()

    return _norm


def normalized_dedup(docs: DataFrame, doc_id: str = "doc_id", text: str = "text") -> DataFrame:
    """Exact dedup AFTER normalization: the messy variants of identical raw
    texts land in one group (n_variants proves the merge). One map-side-
    combined hash aggregate — the same shuffle shape as dedup_exact."""
    messy = messy_text(doc_id, text)
    norm = normalize_text(f"({messy})")
    return (
        docs.select(
            F.col(doc_id),
            F.md5(F.expr(norm)).alias("norm_hash"),
            F.md5(F.expr(messy)).alias("_raw_hash"),
        )
        .groupBy("norm_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("_raw_hash").alias("n_variants"),
            F.min(doc_id).alias("keeper"),
        )
    )


# -- the corpus curation funnel ----------------------------------------

_FUNNEL_STAGES = ("all", "c4", "c4_gopher", "c4_gopher_dedup")
_NEARDUP_STAGE = "c4_gopher_neardup"


def filter_funnel(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text: str = "text",
    neardup_threshold: float | None = None,
) -> DataFrame:
    """The end-to-end curation funnel: (stage_ord, stage, n_docs,
    n_tokens) for all -> C4 -> +Gopher -> +normalized-dedup, where dedup
    keeps the min-doc_id survivor per normalized-text group AMONG the
    C4+Gopher survivors (the order a real pipeline applies them).

    Shape: ONE per-row projection computing every flag (the same shared
    Column pieces as c4_filter / gopher_filter), one window over the
    normalized-text hash (the dedup shuffle any dedup needs), one tiny
    4-group aggregate. No joins back to the corpus.

    With ``neardup_threshold`` set, a 5th stage drops MinHash-LSH
    near-duplicates among the stage-3 survivors: banded bucket join ->
    exact-Jaccard verify -> connected components -> keep the min-doc_id
    representative per cluster (dedup/minhash.py + dedup/clusters.py).
    The drop set is O(duplicates) and broadcast back — the corpus is
    never shuffled a second time."""
    from pyspark.sql import Window

    d = _with_decorated(docs, doc_id, text)
    tokens = F.expr(
        f"CASE WHEN length(trim({text})) = 0 THEN 0 "
        f"ELSE length(trim({text})) - length(replace(trim({text}), ' ', '')) + 1 END"
    ).cast("bigint")
    d = d.select(
        F.col(doc_id).alias("_id"),
        tokens.alias("_tok"),
        _c4_cols()["keep"].alias("_c4"),
        _gopher_cols()["keep"].alias("_g"),
        F.md5(F.expr(normalize_text(text))).alias("_nh"),
    )
    w = Window.partitionBy("_nh")
    keeper = F.min(F.when(F.col("_c4") & F.col("_g"), F.col("_id"))).over(w)
    d = d.withColumn(
        "_surv3", F.col("_c4") & F.col("_g") & (F.col("_id") == keeper)
    )
    stage_structs = [
        F.struct(F.lit(0).alias("o"), F.lit(_FUNNEL_STAGES[0]).alias("s"), F.lit(True).alias("inc")),
        F.struct(F.lit(1).alias("o"), F.lit(_FUNNEL_STAGES[1]).alias("s"), F.col("_c4").alias("inc")),
        F.struct(F.lit(2).alias("o"), F.lit(_FUNNEL_STAGES[2]).alias("s"), (F.col("_c4") & F.col("_g")).alias("inc")),
        F.struct(F.lit(3).alias("o"), F.lit(_FUNNEL_STAGES[3]).alias("s"), F.col("_surv3").alias("inc")),
    ]
    if neardup_threshold is not None:
        from pyspark.sql.functions import broadcast

        drops = neardup_drop_ids(
            docs.join(
                d.where("_surv3").select(F.col("_id").alias(doc_id)),
                doc_id, "left_semi",
            ),
            threshold=neardup_threshold, doc_id=doc_id, text=text,
        )
        d = d.join(
            broadcast(drops.select(F.col(doc_id).alias("_id"),
                                   F.lit(True).alias("_nd"))),
            "_id", "left",
        )
        stage_structs.append(
            F.struct(F.lit(4).alias("o"), F.lit(_NEARDUP_STAGE).alias("s"),
                     (F.col("_surv3") & F.col("_nd").isNull()).alias("inc"))
        )
    stages = F.array(*stage_structs)
    return (
        d.select("_tok", F.explode(stages).alias("st"))
        .where(F.col("st.inc"))
        .groupBy(
            F.col("st.o").alias("stage_ord"), F.col("st.s").alias("stage")
        )
        .agg(F.count("*").alias("n_docs"), F.sum("_tok").alias("n_tokens"))
    )


def neardup_drop_ids(
    docs: DataFrame,
    threshold: float = 0.5,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """-> DataFrame(doc_id) of documents to DROP as near-duplicates:
    MinHash-LSH banded pairs (exact-Jaccard verified at ``threshold``)
    clustered by connected components; every non-representative (node !=
    min of its cluster) is a drop. Output is O(duplicates) — safe to
    broadcast or localCheckpoint before anti-joining the corpus."""
    from versatiles_rs_spark.dedup import minhash_dedup_pairs
    from versatiles_rs_spark.dedup.clusters import dedup_clusters

    pairs = minhash_dedup_pairs(
        docs, threshold=threshold, id_col=doc_id, text_col=text
    )
    return (
        dedup_clusters(pairs)
        .where(~F.col("keep"))
        .select(F.col("node").alias(doc_id))
    )


def filter_funnel_sql(
    doc_id: str = "doc_id",
    text: str = "text",
    table: str = "documents",
    neardup_threshold: float | None = None,
) -> str:
    c4_kept = _KEPT_PRED.format(size="len", split="string_split(l, ' ')")
    c4_keep = (
        f"(len(list_filter(lines, l -> {c4_kept})) >= {C4_MIN_KEPT_LINES}"
        f" AND NOT len(list_filter(lines, l -> contains(l, '{{'))) > 0"
        f" AND NOT len(list_filter(lines, l -> contains(lower(l), 'lorem ipsum'))) > 0)"
    )
    mean_u = (
        "CAST(floor(list_sum(list_transform(gw, w -> length(w))) / len(gw)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    alpha_u = (
        "CAST(floor(len(list_filter(gw, w -> regexp_matches(w, '[A-Za-z]'))) / len(gw)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    bullet_u = (
        "CAST(floor(len(list_filter(lines, l -> l LIKE '- %')) / len(lines)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    ellipsis_u = (
        "CAST(floor(len(list_filter(lines, l -> l LIKE '%...')) / len(lines)"
        " * 1000000.0 + 0.5) AS BIGINT)"
    )
    g_keep = (
        f"(len(gw) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}"
        f" AND {mean_u} BETWEEN {GOPHER_MEAN_LEN_LO_U} AND {GOPHER_MEAN_LEN_HI_U}"
        f" AND {alpha_u} >= {GOPHER_ALPHA_FRAC_U}"
        f" AND {bullet_u} <= {GOPHER_BULLET_FRAC_U}"
        f" AND {ellipsis_u} <= {GOPHER_ELLIPSIS_FRAC_U}"
        f" AND len(list_filter(gw, w -> w IN ({_stop_in_sql()}))) >= {GOPHER_MIN_STOPWORDS})"
    )
    tokens = (
        f"CASE WHEN length(trim({text})) = 0 THEN 0 "
        f"ELSE length(trim({text})) - length(replace(trim({text}), ' ', '')) + 1 END"
    )
    stage_preds = {0: "TRUE", 1: "c4k", 2: "c4k AND gk", 3: "surv3"}
    stage_names = list(_FUNNEL_STAGES)
    neardup_ctes = ""
    if neardup_threshold is not None:
        stage_names.append(_NEARDUP_STAGE)
        stage_preds[4] = "surv3 AND id NOT IN (SELECT node FROM ndrop)"
        # brute-force exact 3-word-gram Jaccard among stage-3 survivors +
        # recursive-CTE transitive closure — the oracle twin of
        # neardup_drop_ids (mirrors dedup/ngram.py shingle_set: empty
        # text -> empty set, < 3 tokens -> the whole text as one gram;
        # jaccard(empty, empty) = 1)
        neardup_ctes = f""", s3 AS (
  SELECT id, txt FROM fl3 WHERE surv3
), ntoks AS (
  SELECT id, list_filter(string_split(txt, ' '), t -> t != '') AS tk FROM s3
), nsets AS (
  SELECT id, list_distinct(
    CASE WHEN len(tk) = 0 THEN []
         WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - 1),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
    END) AS s
  FROM ntoks
), npairs AS (
  SELECT a.id AS u, b.id AS v
  FROM nsets a JOIN nsets b ON a.id < b.id
  WHERE CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
             ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
        END >= {neardup_threshold}
), nedges AS (
  SELECT u, v FROM npairs UNION SELECT v, u FROM npairs
), ncc(node, lab) AS (
  SELECT u, u FROM nedges
  UNION
  SELECT e.v, ncc.lab FROM ncc JOIN nedges e ON e.u = ncc.node
), ndrop AS (
  SELECT node FROM ncc GROUP BY node HAVING node != min(lab)
)"""
    stage_rows = " UNION ALL ".join(
        f"SELECT {o} AS stage_ord, '{s}' AS stage, "
        + stage_preds[o]
        + " AS inc, tok FROM fl3"
        for o, s in enumerate(stage_names)
    )
    recursive = "RECURSIVE " if neardup_threshold is not None else ""
    return f"""
WITH {recursive}ls AS (
  SELECT {doc_id}, {text}, {decorated_lines_sql(doc_id, text)} AS lines FROM {table}
), gws AS (
  SELECT {doc_id}, {text}, lines,
         flatten(list_transform(lines, l -> string_split(l, ' '))) AS gw
  FROM ls
), fl AS (
  SELECT {doc_id} AS id, {text} AS txt, CAST({tokens} AS BIGINT) AS tok,
         {c4_keep} AS c4k, {g_keep} AS gk,
         md5({normalize_text_sql(text)}) AS nh
  FROM gws
), fl3 AS (
  SELECT *, (c4k AND gk AND id = min(CASE WHEN c4k AND gk THEN id END)
             OVER (PARTITION BY nh)) AS surv3
  FROM fl
){neardup_ctes}
SELECT stage_ord, stage, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
FROM ({stage_rows}) WHERE inc GROUP BY 1, 2
"""


def normalized_dedup_sql(doc_id: str = "doc_id", text: str = "text", table: str = "documents") -> str:
    messy = messy_text(doc_id, text)
    norm = normalize_text_sql(f"({messy})")
    return f"""
SELECT md5({norm}) AS norm_hash,
       count(*) AS n_docs,
       count(DISTINCT md5({messy})) AS n_variants,
       min({doc_id}) AS keeper
FROM {table}
GROUP BY 1
"""
