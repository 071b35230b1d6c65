"""Full-text retrieval over the corpus: inverted index + BM25 top-k.

The quality-filter side of a training pipeline needs retrieval (near-
benchmark probes, targeted subset pulls, eval-set mining); at corpus
scale that is an inverted index, not a scan with LIKE. Everything here is
relational:

- ``build_postings``: explode lowercased terms (codegen), aggregate
  (term, doc_id, tf) with map-side combine — the postings list, naturally
  partitioned by term.
- ``bm25_topk``: classic BM25 (Robertson/Sparck Jones; the
  ``ln(1 + (N - df + .5)/(df + .5))`` idf variant Lucene uses) — postings
  are filtered to the query's terms FIRST (an isin prune that reaches the
  aggregation), so scoring touches only the query's posting lists, never
  the corpus. Document lengths and the global avgdl join in as one tiny
  broadcast each. Top-k is orderBy+limit = distributed
  TakeOrderedAndProject on (rounded score DESC, doc_id ASC) — a total
  order, so results are deterministic and cross-engine comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _terms(text_col: str):
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )


def build_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf) — the inverted index as a DataFrame."""
    return (
        docs.select("doc_id", F.explode(_terms(text_col)).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select("doc_id", F.size(_terms(text_col)).alias("dl"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query: (doc_id, score)."""
    postings = build_postings(docs, text_col)
    lengths = doc_lengths(docs, text_col)
    n_docs = docs.count()
    avgdl = lengths.agg(F.avg("dl")).collect()[0][0]

    q = [t.lower() for t in query_terms]
    # the pruned postings are used twice (df and scoring) and are tiny
    # (query terms only) — cache so the corpus isn't re-exploded per use
    hits = postings.where(F.col("term").isin(q)).cache()
    df_t = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        hits.join(F.broadcast(df_t), "term")
        .join(F.broadcast(lengths), "doc_id")
        .withColumn(
            "contrib",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(float(avgdl)))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def bm25_topk_sql(
    query_terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75
) -> str:
    """The identical BM25 computation as DuckDB SQL over ``documents``."""
    q = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM documents
), lengths AS (
  SELECT doc_id, len(l) AS dl FROM toks
), stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl FROM lengths
), postings AS (
  SELECT doc_id, unnest(l) AS term FROM toks
), tf AS (
  SELECT term, doc_id, count(*) AS tf FROM postings
  WHERE term IN ({q}) GROUP BY 1, 2
), dft AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1
)
SELECT t.doc_id,
       round(sum(ln(1.0 + ((SELECT n FROM stats) - d.df + 0.5) / (d.df + 0.5))
                 * (t.tf * ({k1} + 1))
                 / (t.tf + {k1} * (1 - {b} + {b} * l.dl / (SELECT avgdl FROM stats)))), 6)
       AS score
FROM tf t JOIN dft d USING (term) JOIN lengths l ON t.doc_id = l.doc_id
GROUP BY t.doc_id
ORDER BY score DESC, t.doc_id ASC
LIMIT {k}
"""


def phrase_search(
    docs: DataFrame, phrase: list[str], text_col: str = "text"
) -> DataFrame:
    """Exact-phrase query over a positional index: (doc_id, n_matches,
    first_pos) for documents containing the consecutive token sequence
    ``phrase`` (1-based first_pos). The retrieval op BM25 can't express —
    bag-of-words scoring loses adjacency.

    Plan (the anchor trick — no k-way self-join): positional postings
    (posexplode, codegen) filter to the phrase's words FIRST (isin prune
    at the scan), broadcast-join the k-row (word, slot) table, and every
    matching posting votes for anchor = pos - slot. An anchor collecting
    k votes is a full match: each (anchor, slot) pair can only be
    produced by the single posting at pos = anchor + slot with word_slot
    there, so count(*) == k <=> every slot matched (repeated phrase
    words included). One aggregation over the PRUNED postings — the
    corpus shuffles nothing; cost scales with the phrase words' posting
    lists, as an inverted-index engine's phrase query does.
    """
    k = len(phrase)
    if k < 2:
        raise ValueError("phrase needs >= 2 tokens")
    spark = docs.sparkSession
    slots = spark.createDataFrame(
        [(w.lower(), i) for i, w in enumerate(phrase)], "w string, i bigint"
    )
    posts = docs.select(
        "doc_id", F.posexplode(_terms(text_col)).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    votes = (
        posts.filter(F.col("w").isin([w.lower() for w in phrase]))
        .join(F.broadcast(slots), "w")
        .select("doc_id", (F.col("pos") - F.col("i")).alias("anchor"))
    )
    full = (
        votes.groupBy("doc_id", "anchor")
        .agg(F.count("*").alias("nv"))
        .filter(F.col("nv") == k)
    )
    return full.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"), F.min("anchor").alias("first_pos")
    )


def phrase_search_sql(phrase: list[str]) -> str:
    """The identical anchor-vote phrase query as DuckDB SQL over
    ``documents`` (1-based positions via generate_subscripts)."""
    k = len(phrase)
    slot_rows = ", ".join(f"('{w.lower()}', {i})" for i, w in enumerate(phrase))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM documents
), posts AS (
  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos FROM toks
), slots(w, i) AS (VALUES {slot_rows}),
votes AS (
  SELECT p.doc_id, p.pos - s.i AS anchor
  FROM posts p JOIN slots s ON s.w = p.w
), full_match AS (
  SELECT doc_id, anchor FROM votes GROUP BY 1, 2 HAVING count(*) = {k}
)
SELECT doc_id, count(*) AS n_matches, CAST(min(anchor) AS BIGINT) AS first_pos
FROM full_match GROUP BY 1
"""


def blocklist_match(
    docs: DataFrame, phrases: list[list[str]], text_col: str = "text"
) -> DataFrame:
    """Multi-phrase dictionary matching — the blocklist/safety-filter op
    (C4's banned-word list at PHRASE granularity, brand-safety lists,
    compliance terms): which documents contain ANY of the listed exact
    consecutive-token phrases, and how many distinct list entries / hit
    positions. Single-token entries are ordinary dictionary words; the
    anchor-vote algebra of phrase_search degenerates to them cleanly
    (count(*) == 1 per anchor).

    Plan: ONE broadcast of the flattened (phrase_id, word, slot) table —
    the distributed Aho-Corasick stand-in: postings prune to the
    dictionary's word set at the scan (isin -> codegen), each posting
    votes (phrase_id, anchor = pos - slot), and an anchor with k votes
    for its phrase is a hit. Cost scales with the dictionary words'
    posting lists; the corpus never shuffles and the dictionary never
    exceeds one broadcast row per (phrase, slot).

    Output: (doc_id, n_phrases, n_hits) for docs with >= 1 match.
    """
    if not phrases:
        raise ValueError("empty blocklist")
    spark = docs.sparkSession
    rows = []
    for pid, ph in enumerate(phrases):
        for i, w in enumerate(ph):
            rows.append((pid, w.lower(), i, len(ph)))
    slots = spark.createDataFrame(rows, "pid bigint, w string, i bigint, k bigint")
    words = sorted({w for _, w, _, _ in rows})
    posts = docs.select(
        "doc_id", F.posexplode(_terms(text_col)).alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    votes = (
        posts.filter(F.col("w").isin(words))
        .join(F.broadcast(slots), "w")
        .select("doc_id", "pid", "k", (F.col("pos") - F.col("i")).alias("anchor"))
    )
    hits = (
        votes.groupBy("doc_id", "pid", "k", "anchor")
        .agg(F.count("*").alias("nv"))
        .filter(F.col("nv") == F.col("k"))
    )
    return hits.groupBy("doc_id").agg(
        F.count_distinct("pid").alias("n_phrases"),
        F.count("*").alias("n_hits"),
    )


def blocklist_match_sql(phrases: list[list[str]]) -> str:
    """The identical anchor-vote dictionary match as DuckDB SQL."""
    slot_rows = ", ".join(
        f"({pid}, '{w.lower()}', {i}, {len(ph)})"
        for pid, ph in enumerate(phrases)
        for i, w in enumerate(ph)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM documents
), posts AS (
  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos FROM toks
), slots(pid, w, i, k) AS (VALUES {slot_rows}),
hits AS (
  SELECT p.doc_id, s.pid, p.pos - s.i AS anchor
  FROM posts p JOIN slots s ON s.w = p.w
  GROUP BY p.doc_id, s.pid, s.k, p.pos - s.i
  HAVING count(*) = s.k
)
SELECT doc_id, count(DISTINCT pid) AS n_phrases, count(*) AS n_hits
FROM hits GROUP BY 1
"""
