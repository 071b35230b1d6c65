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


_TOK_SQL = (
    "CASE WHEN length(trim({t})) = 0 THEN 0 "
    "ELSE length(trim({t})) - length(replace(trim({t}), ' ', '')) + 1 END"
)


def mixture_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_bits: int = 6,
) -> DataFrame:
    """Token-budget data mixing: per stratum (source/language), keep the
    greedy doc_id-ordered prefix whose cumulative token count BEFORE each
    doc is < the stratum's budget (the fixed-mixture step of a training
    pipeline — The Pile / DoReMi-style source weights expressed as token
    budgets). Deterministic: same rows on every run at any parallelism.
    Strata absent from ``budgets`` get budget 0 (dropped).

    -> (doc_id, stratum, n_tok) of the selected docs.

    Scale shape: a corpus-wide ordered prefix-sum per stratum would
    serialize each stratum through one reducer. Instead, docs bucket by
    id range (rng = doc_id >> bucket_bits; monotone in doc_id), one
    map-side-combined agg produces per-(stratum, bucket) token sums —
    bounded by id_span/2^bucket_bits rows, NOT corpus size; pick
    bucket_bits so this stays ~1e3-1e5 rows at the target scale — the
    driver prefixes them, and each bucket is marked full / edge /
    dropped. Fully-kept buckets are a broadcast-join filter (no corpus
    shuffle, no window); the exact window runs only over the ONE edge
    bucket per stratum. Correctness of the split: a bucket is 'full'
    only if its end-of-bucket cumulative sum is strictly < budget, so
    every doc inside satisfies before < budget; a dropped bucket starts
    at >= budget, so every doc inside fails; the edge bucket applies
    the exact per-doc rule (this also handles zero-token docs sitting
    exactly at the budget boundary)."""
    tok = _TOK_SQL.format(t=text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        F.expr(tok).cast("bigint").alias("n_tok"),
        F.expr(f"shiftright({id_col}, {bucket_bits})").alias("rng"),
    )
    per = base.groupBy("stratum", "rng").agg(F.sum("n_tok").alias("s")).collect()
    by_stratum: dict[str, list] = {}
    for r in per:
        by_stratum.setdefault(r["stratum"], []).append((r["rng"], r["s"]))
    marks = []  # (stratum, rng, mark, tokens_before_bucket)
    for st, lst in by_stratum.items():
        budget = budgets.get(st, 0)
        acc = 0
        for rng, s in sorted(lst):
            if acc + s < budget:
                marks.append((st, rng, "full", 0))
            elif acc < budget:
                marks.append((st, rng, "edge", acc))
            acc += s
    spark = docs.sparkSession
    mdf = spark.createDataFrame(
        marks, "stratum string, rng bigint, mark string, before bigint"
    )
    j = base.join(F.broadcast(mdf), ["stratum", "rng"])
    fulls = j.where("mark = 'full'").select("doc_id", "stratum", "n_tok")
    w = Window.partitionBy("stratum").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bud = F.lit(0)
    for k, v in sorted(budgets.items()):
        bud = F.when(F.col("stratum") == k, F.lit(int(v))).otherwise(bud)
    edge = (
        j.where("mark = 'edge'")
        .withColumn(
            "_before",
            F.col("before") + F.coalesce(F.sum("n_tok").over(w), F.lit(0)),
        )
        .where(F.col("_before") < bud)
        .select("doc_id", "stratum", "n_tok")
    )
    return fulls.unionByName(edge)


def mixture_sample_sql(
    budgets: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB twin: the straightforward per-stratum ordered prefix-sum
    budget cut (the spec the bucketed plan must equal)."""
    tok = _TOK_SQL.format(t=text_col)
    cases = " ".join(f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(budgets.items()))
    return f"""
WITH t AS (
  SELECT {id_col} AS doc_id, {stratum_col} AS stratum,
         CAST({tok} AS BIGINT) AS n_tok
  FROM {table}
), c AS (
  SELECT *, coalesce(sum(n_tok) OVER (
    PARTITION BY stratum ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM t
)
SELECT doc_id, stratum, n_tok FROM c
WHERE bef < CASE stratum {cases} ELSE 0 END
"""


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


def shard_shuffle(
    docs: DataFrame, n_shards: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global training shuffle WITHOUT a global sort: every
    doc gets a portable 32-bit hash key; shard = the key's top bits
    (fixed ranges of the hash domain, so concatenating shards 0..n-1 in
    (shard, pos) order IS the full permutation sorted by key); pos =
    rank within the shard. One hash exchange on shard + an in-partition
    sort — never a rangepartitioning/global sort, and shards are
    balanced by hash uniformity at any corpus size (n_shards must be a
    power of two so shard boundaries are exact integer divisions).

    The permutation is reproducible across engines and runs (ties break
    on id), which is what makes shuffled training shards resumable.
    """
    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
    width = 4294967296 // n_shards
    key = (F.col(id_col).cast("bigint") * F.lit(2654435761)) % F.lit(4294967296)
    w = Window.partitionBy("shard").orderBy(F.col("skey").asc(), F.col(id_col).asc())
    return (
        docs.select(id_col, key.alias("skey"))
        .withColumn("shard", (F.col("skey") - F.col("skey") % F.lit(width)) / F.lit(width))
        .withColumn("shard", F.col("shard").cast("bigint"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", F.col("pos").cast("bigint").alias("pos"))
    )
