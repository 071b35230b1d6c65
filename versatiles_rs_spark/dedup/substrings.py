"""Exact-substring duplication signals: corpus-duplicated n-grams and
winnowing fingerprints.

Two public algorithms the LLM-corpus literature uses for substring-level
dedup, complementing the document-level MinHash/SimHash family:

- Duplicated n-gram detection (Lee et al., "Deduplicating Training Data
  Makes Language Models Better", ACL 2022): find word n-grams that occur
  >= min_count times across the corpus and score each document by the
  fraction of its n-gram positions covered by such duplicates. (The paper
  uses suffix arrays for 50-token exact substrings; the n-gram-hash
  formulation is its standard scalable relational equivalent.)
- Winnowing fingerprints (Schleimer, Wilkerson, Aiken, "Winnowing: Local
  Algorithms for Document Fingerprinting", SIGMOD 2003): hash all k-grams,
  slide a window of w consecutive hashes, select each window's minimum —
  rightmost position on ties — and keep the distinct selections. The MOSS
  fingerprint set guarantees any shared substring of length >= w + k - 1
  is detected.

Scale shape:
- `winnow_fingerprints` is per-row array math only — ZERO shuffles; at
  10^12 docs it is a pure map stage (fingerprint posting-list building
  would add the same one hash-agg as any inverted index).
- `dup_ngram_stats`'s corpus-sized passes are: one explode + one
  map-side-combined hash aggregate over 16-byte gram hashes, one shuffle
  equi-join of positions against the (much smaller, count>=2) duplicate
  set — AQE broadcasts it when small — and one per-doc aggregate. Nothing
  corpus-sized touches the driver.

Cross-engine determinism: gram hashes are md5 strings (identical on both
engines); winnowing uses the Rabin-Karp polynomial hash (base 131 mod
2^31-1 — products < 2^39, exact in BIGINT on both engines, same constants
as queries.q_doc_fingerprint_rolling). The rightmost-min tie rule is made
total-order-exact by packing (hash, position) into one BIGINT key:
key = h * POS_M + (POS_M - 1 - pos), so min(key) = (min hash, rightmost
position) with no engine-dependent tie behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RK_P = 2147483647
RK_B = 131
POS_M = 1 << 20  # supports documents up to ~1M k-grams; key stays < 2^51


# -- duplicated n-grams (Lee et al. 2022) -------------------------------

def _gram_hashes_expr(n: int, text: str) -> str:
    ws = f"split({text}, ' ')"
    n_g = f"(size({ws}) - {n - 1})"
    return (
        f"CASE WHEN {n_g} < 1 THEN slice(array(''), 1, 0) "
        f"ELSE transform(sequence(1, {n_g}), "
        f"i -> md5(array_join(slice({ws}, i, {n}), ' '))) END"
    )


def dup_ngram_stats(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-document duplicated-n-gram coverage: (doc_id, n_grams, n_dup,
    dup_frac_u) where n_dup counts gram POSITIONS whose gram occurs
    >= min_count times corpus-wide (within-doc repeats included, as in
    Lee et al.'s substring counting)."""
    ws = f"split({text}, ' ')"
    n_g = f"(size({ws}) - {n - 1})"
    base = docs.select(
        F.col(doc_id),
        F.expr(_gram_hashes_expr(n, text)).alias("_gh"),
        F.expr(f"greatest({n_g}, 0)").cast("bigint").alias("n_grams"),
    )
    exploded = base.select(doc_id, F.explode("_gh").alias("gh"))
    dup_set = (
        exploded.groupBy("gh")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("gh")
    )
    per_doc_dup = exploded.join(dup_set, "gh").groupBy(doc_id).agg(
        F.count("*").alias("_n_dup")
    )
    n_dup = F.coalesce(F.col("_n_dup"), F.lit(0)).cast("bigint")
    return (
        base.select(doc_id, "n_grams")
        .join(per_doc_dup, doc_id, "left")
        .select(
            F.col(doc_id),
            F.col("n_grams"),
            n_dup.alias("n_dup"),
            F.floor(
                n_dup / F.greatest(F.col("n_grams"), F.lit(1)) * 1000000.0 + 0.5
            ).cast("bigint").alias("dup_frac_u"),
        )
    )


def dup_ngram_stats_sql(
    n: int = 5,
    min_count: int = 2,
    doc_id: str = "doc_id",
    text: str = "text",
    table: str = "documents",
) -> str:
    n_g = f"greatest(len(ws) - {n - 1}, 0)"
    return f"""
WITH w AS (
  SELECT {doc_id}, string_split({text}, ' ') AS ws FROM {table}
), g AS (
  SELECT {doc_id},
         unnest(list_transform(range(1, {n_g} + 1),
                i -> md5(array_to_string(ws[i : i + {n - 1}], ' ')))) AS gh
  FROM w
), c AS (
  SELECT gh FROM g GROUP BY gh HAVING count(*) >= {min_count}
), d AS (
  SELECT {doc_id}, count(*) AS n_dup FROM g JOIN c USING (gh) GROUP BY {doc_id}
)
SELECT w.{doc_id},
       CAST({n_g} AS BIGINT) AS n_grams,
       CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup,
       CAST(floor(coalesce(d.n_dup, 0) / greatest({n_g}, 1) * 1000000.0 + 0.5)
            AS BIGINT) AS dup_frac_u
FROM w LEFT JOIN d USING ({doc_id})
"""


# -- winnowing (Schleimer et al. 2003) ----------------------------------

def _winnow_keys_expr(k: int, text: str) -> str:
    """Spark SQL expr: array<bigint> of packed (RK k-gram hash, pos) keys."""
    ws = f"split({text}, ' ')"
    n_g = f"(size({ws}) - {k - 1})"
    gram = f"array_join(slice({ws}, j, {k}), ' ')"
    rk = (
        f"aggregate(split({gram}, ''), 0L, "
        f"(a, c) -> (a * {RK_B} + ascii(c)) % {RK_P})"
    )
    return (
        f"CASE WHEN {n_g} < 1 THEN slice(array(0L), 1, 0) "
        f"ELSE transform(sequence(1, {n_g}), "
        f"j -> {rk} * {POS_M}L + ({POS_M - 1} - j)) END"
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Per-document winnowing fingerprint summary: (doc_id, n_grams, n_fp,
    fp_hash_sum, fp_pos_sum). Selection = distinct over per-window minima
    of the packed keys (rightmost-min tie rule by construction). Entirely
    per-row array math — a zero-shuffle map stage."""
    d = docs.withColumn("_wk", F.expr(_winnow_keys_expr(k, text)))
    n_win = f"greatest(size(_wk) - {w - 1}, 1)"
    sel = (
        f"CASE WHEN size(_wk) = 0 THEN slice(array(0L), 1, 0) "
        f"ELSE array_distinct(transform(sequence(1, {n_win}), "
        f"s -> array_min(slice(_wk, s, {w})))) END"
    )
    d = d.withColumn("_sel", F.expr(sel))
    return d.select(
        F.col(doc_id),
        F.expr("size(_wk)").cast("bigint").alias("n_grams"),
        F.expr("size(_sel)").cast("bigint").alias("n_fp"),
        F.expr(f"aggregate(_sel, 0L, (a, x) -> a + x div {POS_M}L)").alias("fp_hash_sum"),
        F.expr(
            f"aggregate(_sel, 0L, (a, x) -> a + ({POS_M - 1}L - x % {POS_M}L))"
        ).alias("fp_pos_sum"),
    )


def winnow_fingerprints_sql(
    k: int = 3,
    w: int = 4,
    doc_id: str = "doc_id",
    text: str = "text",
    table: str = "documents",
) -> str:
    gram = f"array_to_string(ws[j : j + {k - 1}], ' ')"
    rk = (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(1, length({gram}) + 1), "
        f"i -> CAST(ord(substr({gram}, i, 1)) AS BIGINT))), "
        f"(a, c) -> (a * {RK_B} + c) % {RK_P})"
    )
    n_win = f"greatest(len(keys) - {w - 1}, 1)"
    return f"""
WITH wsx AS (
  SELECT {doc_id}, string_split({text}, ' ') AS ws FROM {table}
), ks AS (
  SELECT {doc_id},
         list_transform(range(1, greatest(len(ws) - {k - 1}, 0) + 1),
                        j -> {rk} * {POS_M} + ({POS_M - 1} - j)) AS keys
  FROM wsx
), sels AS (
  SELECT {doc_id}, keys,
         CASE WHEN len(keys) = 0 THEN []::BIGINT[]
              ELSE list_distinct(list_transform(range(1, {n_win} + 1),
                     s -> list_min(keys[s : s + {w - 1}])))
         END AS sel
  FROM ks
)
SELECT {doc_id},
       CAST(len(keys) AS BIGINT) AS n_grams,
       CAST(len(sel) AS BIGINT) AS n_fp,
       CAST(coalesce(list_sum(list_transform(sel, x -> x // {POS_M})), 0)
            AS BIGINT) AS fp_hash_sum,
       CAST(coalesce(list_sum(list_transform(sel,
              x -> {POS_M - 1} - x % {POS_M})), 0) AS BIGINT) AS fp_pos_sum
FROM sels
"""


# -- duplicated-span REMOVAL (Lee et al. 2022, the deletion step) -------

def dup_span_removal(
    docs: DataFrame,
    n: int = 5,
    min_count: int = 2,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Exact-substring deduplication's *edit* step (Lee et al., ACL 2022
    §3: delete every duplicated substring occurrence, not just score it):
    remove every token covered by at least one corpus-duplicated n-gram
    and return (doc_id, n_tokens, n_removed, clean_md5) where clean_md5
    fingerprints the cleaned text (kept tokens joined by ' ').

    Scale shape (the same bounded passes as `dup_ngram_stats` plus one
    doc-keyed join): one explode + map-side-combined hash agg builds the
    duplicate-gram set; one equi-join of gram positions against that
    (small) set, aggregated to a per-doc sorted start list — output is
    O(duplicated positions), not corpus-sized; one left join back on
    doc_id; the deletion itself is pure per-row array math (positions
    covered by [s, s+n-1] windows filtered out in one codegen Project).
    Nothing corpus-sized touches the driver."""
    ws = f"split({text}, ' ')"
    base = docs.select(
        F.col(doc_id),
        F.expr(ws).alias("_ws"),
        F.expr(_gram_hashes_expr(n, text)).alias("_gh"),
    )
    ex = base.select(
        doc_id, F.posexplode("_gh").alias("_p", "gh")
    ).select(doc_id, (F.col("_p") + 1).cast("bigint").alias("s"), "gh")
    dup_set = (
        ex.groupBy("gh")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_count)
        .select("gh")
    )
    starts = (
        ex.join(dup_set, "gh")
        .groupBy(doc_id)
        .agg(F.sort_array(F.collect_list("s")).alias("_starts"))
    )
    st = "coalesce(_starts, slice(array(0L), 1, 0))"
    kept = (
        f"filter(sequence(1, size(_ws)), "
        f"p -> NOT exists({st}, s -> s <= p AND p <= s + {n - 1}))"
    )
    return (
        base.join(starts, doc_id, "left")
        .withColumn("_kept", F.expr(kept))
        .select(
            F.col(doc_id),
            F.expr("size(_ws)").cast("bigint").alias("n_tokens"),
            F.expr("size(_ws) - size(_kept)").cast("bigint").alias("n_removed"),
            F.expr(
                "md5(array_join(transform(_kept, p -> element_at(_ws, p)), ' '))"
            ).alias("clean_md5"),
        )
    )


def dup_span_removal_sql(
    n: int = 5,
    min_count: int = 2,
    doc_id: str = "doc_id",
    text: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin of `dup_span_removal` (identical md5 fingerprints)."""
    n_g = f"greatest(len(ws) - {n - 1}, 0)"
    return f"""
WITH w AS (
  SELECT {doc_id}, string_split({text}, ' ') AS ws FROM {table}
), g AS (
  SELECT {doc_id}, ws, unnest(range(1, {n_g} + 1)) AS s FROM w
), gh AS (
  SELECT {doc_id}, s,
         md5(array_to_string(ws[s : s + {n - 1}], ' ')) AS gh
  FROM g
), c AS (
  SELECT gh FROM gh GROUP BY gh HAVING count(*) >= {min_count}
), st AS (
  SELECT {doc_id}, list_sort(list(s)) AS dup_starts
  FROM gh JOIN c USING (gh) GROUP BY {doc_id}
), k AS (
  SELECT w.{doc_id}, ws,
         list_filter(range(1, len(ws) + 1),
           p -> len(list_filter(coalesce(dup_starts, []::BIGINT[]),
                  s -> s <= p AND p <= s + {n - 1})) = 0) AS kept
  FROM w LEFT JOIN st USING ({doc_id})
)
SELECT {doc_id},
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
       md5(coalesce(
         array_to_string(list_transform(kept, p -> ws[p]), ' '), ''
       )) AS clean_md5
FROM k
"""
