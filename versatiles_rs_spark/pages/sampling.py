"""Training-mix shaping: stratified sampling + vocabulary building.

``stratified_sample`` keeps a per-stratum target fraction (e.g. upsample
rare languages, downsample boilerplate-heavy sources) with the engine's
portable deterministic hash — the SAME rows are kept on every run, on
every engine, at any parallelism, so a training mix is reproducible
byte-for-byte. Zero shuffle: the keep decision is pure Column arithmetic
applied in the scan stage; only the audit aggregation exchanges.

``vocab_topk`` builds the corpus word vocabulary (the first step of any
tokenizer training): explode words (codegen), two-level count with
map-side combine, rank with a single window over the (tiny) aggregated
vocab. The full-corpus explode never materializes — counts collapse per
partition before the one exchange on the word key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Knuth 2^32/phi — the portable hash already used by quality_sample /
# drop_rate oracles (pages/generator.py cites the constants)
_HASH_MULT = 2654435761
_HASH_MOD = 4294967296


def keep_expr(key: Column, fraction: Column) -> Column:
    """Deterministic keep decision: uniform-ish u(key) < fraction."""
    u = (key * F.lit(_HASH_MULT)) % F.lit(_HASH_MOD)
    return (u / F.lit(float(_HASH_MOD))) < fraction


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 1.0,
) -> DataFrame:
    """Keep each stratum at its target fraction, deterministically."""
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == value, F.lit(float(f))).otherwise(frac)
    return docs.where(keep_expr(F.col(key_col), frac))


def stratified_sample_sql(
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_fraction: float = 1.0,
) -> str:
    """The identical keep predicate as DuckDB SQL."""
    cases = " ".join(
        f"WHEN {stratum_col} = '{v}' THEN {float(f)!r}" for v, f in sorted(fractions.items())
    )
    frac = f"(CASE {cases} ELSE {float(default_fraction)!r} END)"
    return f"(({key_col} * {_HASH_MULT}) % {_HASH_MOD}) / {_HASH_MOD}.0 < {frac}"


def vocab_topk(
    docs: DataFrame, k: int = 100, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Top-k corpus vocabulary: (rank, word, n) with a deterministic
    (count DESC, word ASC) total order."""
    words = docs.select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit(""))
        ).alias("word")
    )
    counts = words.groupBy("word").agg(F.count("*").alias("n"))
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition local
    # top-k then a tiny driver merge) — no global single-task window ever
    # sees the full vocabulary
    top = counts.where(F.col("n") >= min_count).orderBy(
        F.col("n").desc(), F.col("word").asc()
    ).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("word").asc())
    return top.withColumn("rank", F.row_number().over(w)).select("rank", "word", "n")
