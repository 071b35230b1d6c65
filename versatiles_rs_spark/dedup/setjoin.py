"""Exact set-similarity join with prefix filtering (SSJoin/PPJoin family:
Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07, Xiao et al. WWW'08).

MinHash/SimHash give probabilistic recall; this is the EXACT join — every
pair with shingle Jaccard >= t, no false negatives — without the all-pairs
product. The prefix-filter theorem: order every document's shingle set by
one global total order (rarest first, ties on the shingle string); with
prefix length L_d = |d| - ceil(t*|d|) + 1, any pair with J >= t shares at
least one shingle within BOTH prefixes. Joining prefixes on the shingle is
therefore complete, and rare-first ordering makes the join's key
distribution the LIGHT tail of the vocabulary — the candidate set stays
near the true pair set instead of exploding on stopword-shingles.

Everything is integer-exact: the threshold is the rational tn/td, the
verify predicate is i*(td+tn) >= tn*(na+nb)  (equivalent to
i/(na+nb-i) >= tn/td), and prefix lengths use integer ceil.

Scale shape: one shingle-frequency aggregation (vocabulary-sized), one
frequency join + per-doc window for prefix ranks, one prefix-prefix
equi-join on the shingle, then verification joins bounded by the
CANDIDATE set. No stage touches doc x doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _shingles(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, g): DISTINCT lowercased word n-gram shingles per document;
    documents shorter than n tokens have the empty set (no rows)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )
    return docs.select(
        F.col(id_col).alias("id"), F.explode(F.array_distinct(grams)).alias("g")
    )


def jaccard_similarity_join(
    docs: DataFrame,
    tn: int,
    td: int,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle Jaccard >= tn/td, exactly:
    (id_a, id_b, inter, na, nb)."""
    if not (0 < tn <= td):
        raise ValueError("threshold tn/td must be in (0, 1]")
    posts = _shingles(docs, shingle_n, id_col, text_col)
    sizes = posts.groupBy("id").agg(F.count("*").alias("n_sh"))
    freq = posts.groupBy("g").agg(F.count("*").alias("df"))
    ranked = posts.join(freq, "g").withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("g").asc())
        ),
    )
    # L = n_sh - ceil(tn*n_sh/td) + 1, integer ceil over positive ints
    pref = (
        ranked.join(sizes, "id")
        .filter(
            F.col("r")
            <= F.col("n_sh") - F.expr(f"(n_sh * {tn} + {td} - 1) div {td}") + 1
        )
        .select("id", "g")
    )
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "g")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    pa = posts.select(F.col("id").alias("id_a"), "g")
    pb = posts.select(F.col("id").alias("id_b"), "g")
    inter = (
        cand.join(pa, "id_a")
        .join(pb, ["id_b", "g"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .filter(
            F.col("inter") * F.lit(td + tn) >= F.lit(tn) * (F.col("na") + F.col("nb"))
        )
    )
    return out.select("id_a", "id_b", "inter", "na", "nb")


def edit1_join(words: DataFrame, word_col: str = "word") -> DataFrame:
    """Edit-distance-1 similarity self-join over a string column — the
    typo/variant-level member of the similarity-join family (vocabulary
    normalization, near-duplicate tokens, OCR-noise merging), exact and
    never all-pairs.

    Blocking is the FastSS deletion neighborhood (Bocek et al. 2007):
    every word emits itself plus its |w| single-deletion variants; any
    pair at edit distance <= 1 shares a bucket (substitution: deleting
    the edited position makes both sides equal; insert/delete: the
    shorter word IS a variant of the longer; equality: the word
    itself), so the variant equi-join is a SOUND candidate generator.
    Exact verification is the engines' native levenshtein — shared by
    the oracle, so the MATCH attests recall (no lost pair), not just
    precision. Candidate volume is bounded by bucket sizes (vocabulary
    statistics), never vocab².

    Input: distinct words. Output: unordered pairs (a, b), a < b,
    levenshtein == 1.
    """
    variants = F.concat(
        F.array(F.col(word_col)),
        F.expr(
            f"transform(sequence(1, length({word_col})), i ->"
            f" concat(substring({word_col}, 1, i - 1),"
            f" substring({word_col}, i + 1, length({word_col}))))"
        ),
    )
    v = words.select(F.col(word_col).alias("w"), F.explode(variants).alias("v"))
    a = v.select(F.col("w").alias("a"), "v")
    b = v.select(F.col("w").alias("b"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return cand.filter(F.levenshtein("a", "b") <= 1)
