"""Distributed Lloyd k-means over embedding columns + SemDeDup semantic dedup.

Relational k-means for corpus curation (cluster-balanced sampling, semantic
dedup): the classic Lloyd iteration expressed as DataFrame ops so it runs
at 10^12-row scale:

- ASSIGN: argmin squared-L2 distance to K broadcast centroid literals —
  a zero-shuffle map stage (the centroids are plan constants, K*dim ints).
- UPDATE: posexplode(embedding) -> groupBy (cluster, dim) partial-sum —
  ONE shuffle whose group count is K*dim (tiny), map-side combined; the
  K*dim aggregated rows are the only driver materialization per iteration
  (same bounded-collect contract as dedup.pq's IVF training).

SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", 2023): cluster, then mark near-duplicate
pairs WITHIN each cluster — the cluster key turns the quadratic pair
search into a per-cluster equi-join (the same bucketed-verify shape as
dedup.embedding's LSH path, with k-means cells instead of hash buckets).

Cross-engine determinism: embeddings quantized to 1e6 integers (the
quantization queries.q_ann_topk established); distances, trunc-mean
centroid updates, and dot-product thresholds are all exact BIGINT math;
argmin ties break to the lowest cluster id via (dist, cid) ordering.
float re-normalization is deliberately NOT part of the spec (that is the
driver-side spherical variant in dedup.embedding._kmeans_fit) so the
relational form stays integer-exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUANT = 1_000_000


def _quantized(vec_col: str):
    # explicit DOUBLE cast: float * int-literal coerces to FLOAT under
    # non-ANSI mode (the engine default session) but DOUBLE under ANSI —
    # the cast pins the double-exact spec in both modes and in DuckDB
    return F.expr(
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT))"
    )


def _assign_expr(centroids: list[tuple[int, list[int]]], k: int) -> str:
    """Spark SQL expr over column `qv`: packed argmin (dist, cid) over the
    centroid literals -> cluster id. Pure per-row array math; cluster ids
    keep their ORIGINAL values even if an earlier cluster emptied out."""
    dists = []
    for cid, c in centroids:
        arr = "array(" + ", ".join(f"{v}L" for v in c) + ")"
        dists.append(
            f"aggregate(zip_with(qv, {arr}, (a, b) -> (a - b) * (a - b)), 0L, (s, d) -> s + d)"
            f" * {k}L + {cid}"
        )
    packed = "array(" + ", ".join(dists) + ")"
    return f"CAST(array_min({packed}) % {k} AS INT)"


def _init_centroids(qv: DataFrame, k: int) -> list[tuple[int, list[int]]]:
    """Deterministic init: the first k vectors by id (the convention
    dedup.embedding._kmeans_fit and dedup.pq use)."""
    rows = qv.orderBy("vec_id").limit(k).collect()
    return [(cid, list(r["qv"])) for cid, r in enumerate(rows)]


def _update_centroids(assigned: DataFrame, dim: int) -> list[tuple[int, list[int]]]:
    """Trunc-mean per (cluster, dim): one K*dim-group aggregate; empty
    clusters keep no row and drop out (deterministic on both engines;
    surviving clusters keep their ids)."""
    rows = (
        assigned.select("cid", F.posexplode("qv").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    by_cid: dict[int, list[int]] = {}
    for r in rows:
        # trunc-toward-zero division: the exact integer mean spec shared
        # with the oracle (DuckDB's // truncates; Python's // floors)
        s, n = r["s"], r["n"]
        by_cid.setdefault(r["cid"], [0] * dim)[r["pos"]] = (
            -((-s) // n) if s < 0 else s // n
        )
    return [(c, by_cid[c]) for c in sorted(by_cid)]


def lloyd_kmeans(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Run `iters` assign/update rounds; returns (assignments, centroids)
    where assignments = (vec_id, qv, cid) under the FINAL update's
    centroids' predecessor assignment (i.e. the membership the last
    update aggregated), and centroids = the final updated list."""
    qv = vectors.select(F.col(id_col).alias("vec_id"), _quantized(vec_col).alias("qv"))
    dim = qv.select(F.size("qv").alias("d")).first()["d"]
    cents = _init_centroids(qv, k)
    assigned = None
    for _ in range(iters):
        assigned = qv.withColumn("cid", F.expr(_assign_expr(cents, k)))
        cents = _update_centroids(assigned, dim)
    return assigned, cents


def kmeans_summary(assigned: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Per-cluster roll-up joined with centroid checksums: (cid, n_members,
    min_member, centroid_sum, centroid_l1)."""
    spark = assigned.sparkSession
    cent_rows = [
        (cid, sum(c), sum(abs(v) for v in c)) for cid, c in cents
    ]
    cdf = spark.createDataFrame(
        cent_rows, "cid int, centroid_sum bigint, centroid_l1 bigint"
    )
    return (
        assigned.groupBy("cid")
        .agg(F.count("*").alias("n_members"), F.min("vec_id").alias("min_member"))
        .join(cdf, "cid")
    )


def semdedup_pairs(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    min_dot: int = 950_000_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: near-duplicate pairs (id_a < id_b, qdot >= min_dot)
    restricted to k-means co-members. The pair join is keyed by cid, so
    work is sum of per-cluster squares — never corpus-quadratic."""
    assigned, _ = lloyd_kmeans(vectors, k, iters, id_col, vec_col)
    a = assigned.select(
        F.col("cid"), F.col("vec_id").alias("id_a"), F.col("qv").alias("qa")
    )
    b = assigned.select(
        F.col("cid"), F.col("vec_id").alias("id_b"), F.col("qv").alias("qb")
    )
    qdot = F.expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (s, d) -> s + d)")
    return (
        a.join(b, ["cid"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("cid", "id_a", "id_b", qdot.alias("qdot"))
        .where(F.col("qdot") >= min_dot)
    )


# ---------------------------------------------------------------------------
# DuckDB oracles: the identical integer spec, iterations unrolled as CTEs
# ---------------------------------------------------------------------------

def _sql_quant(table: str, vec_col: str, id_col: str) -> str:
    return (
        f"q AS (SELECT {id_col} AS vec_id, "
        f"list_transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT} + 0.5) AS BIGINT)) AS qv "
        f"FROM {table})"
    )


def _sql_kmeans_ctes(k: int, iters: int, table: str, vec_col: str, id_col: str) -> str:
    """CTE chain: q, c0 (init), a1/c1 ... a{iters}/c{iters}; final
    membership CTE is a{iters}, final centroids c{iters}."""
    parts = [_sql_quant(table, vec_col, id_col)]
    parts.append(
        f"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, qv AS cv "
        f"FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT {k}))"
    )
    dist = (
        "list_sum(list_transform(range(1, len(qv) + 1), "
        "i -> (qv[i] - cv[i]) * (qv[i] - cv[i])))"
    )
    for it in range(1, iters + 1):
        prev_c = f"c{it - 1}"
        parts.append(
            f"a{it} AS (SELECT vec_id, qv, cid FROM ("
            f"SELECT q.vec_id, q.qv, {prev_c}.cid, "
            f"row_number() OVER (PARTITION BY q.vec_id ORDER BY {dist}, {prev_c}.cid) AS rn "
            f"FROM q CROSS JOIN {prev_c}) WHERE rn = 1)"
        )
        parts.append(
            f"c{it} AS (SELECT cid, list(m ORDER BY pos) AS cv FROM ("
            f"SELECT cid, pos, CAST(sum(v) // count(*) AS BIGINT) AS m FROM ("
            f"SELECT cid, unnest(qv) AS v, unnest(range(1, len(qv) + 1)) AS pos FROM a{it}"
            f") GROUP BY cid, pos) GROUP BY cid)"
        )
    return ",\n".join(parts)


def kmeans_summary_sql(
    k: int = 8,
    iters: int = 2,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    ctes = _sql_kmeans_ctes(k, iters, table, vec_col, id_col)
    return f"""
WITH {ctes}
SELECT a.cid, count(*) AS n_members, min(a.vec_id) AS min_member,
       CAST(any_value(cs.s) AS BIGINT) AS centroid_sum,
       CAST(any_value(cs.l1) AS BIGINT) AS centroid_l1
FROM a{iters} a
JOIN (SELECT cid, list_sum(cv) AS s,
             list_sum(list_transform(cv, x -> abs(x))) AS l1
      FROM c{iters} GROUP BY cid, cv) cs USING (cid)
GROUP BY a.cid
"""


def semdedup_pairs_sql(
    k: int = 8,
    iters: int = 2,
    min_dot: int = 950_000_000_000,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    ctes = _sql_kmeans_ctes(k, iters, table, vec_col, id_col)
    return f"""
WITH {ctes}
SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
            i -> a.qv[i] * b.qv[i])) AS BIGINT) AS qdot
FROM a{iters} a JOIN a{iters} b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, len(a.qv) + 1),
      i -> a.qv[i] * b.qv[i])) >= {min_dot}
"""
