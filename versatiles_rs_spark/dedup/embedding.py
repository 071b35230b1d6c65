"""Embedding-cosine near-duplicate detection + LSH-bucketed ANN scale path.

- ``embedding_neardup_pairs``: random-hyperplane LSH (deterministic seeded
  numpy hyperplanes broadcast to executors) buckets vectors by sign pattern;
  pairs within a bucket are verified with the exact integer-quantized dot
  product (the same quantization as queries.q_ann_topk, so results are
  hash-stable across engines).

- ``ann_lsh_topk``: the scale path for similarity search — probe the query's
  bucket (plus multi-probe neighbors at Hamming distance 1), exact-score only
  the candidates. Brute force (queries.q_ann_topk) is the baseline/oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


_BUCKET_SCHEMA = StructType(
    [StructField("vec_id", LongType()), StructField("bucket", IntegerType())]
)


def _bucket_df(vectors: DataFrame, planes: np.ndarray, id_col: str, vec_col: str) -> DataFrame:
    bc = vectors.sparkSession.sparkContext.broadcast(planes)

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        for pdf in it:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (N, dim)
            signs = (m @ pl.T) > 0  # (N, planes)
            bucket = np.zeros(len(pdf), dtype=np.int64)
            for b in range(pl.shape[0]):
                bucket |= signs[:, b].astype(np.int64) << b
            yield pd.DataFrame({"vec_id": pdf[id_col].values, "bucket": bucket.astype(np.int32)})

    return vectors.select(id_col, vec_col).mapInPandas(assign, _BUCKET_SCHEMA)


def _quantized(vec_col: str):
    return F.transform(vec_col, lambda v: F.round(v * 1e6).cast("bigint"))


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    n_planes: int = 12,
    min_dot: int = 950_000_000_000,  # cosine ~0.95 for unit vectors at 1e6 quant
    max_bucket: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs (id_a < id_b, dot >= min_dot) via sign-LSH buckets."""
    sample = vectors.select(vec_col).first()
    dim = len(sample[0])
    buckets = _bucket_df(vectors, _hyperplanes(dim, n_planes), id_col, vec_col)
    qv = vectors.select(F.col(id_col).alias("vec_id"), _quantized(vec_col).alias("qv"))
    member = buckets.join(qv, "vec_id")
    grouped = (
        member.groupBy("bucket")
        .agg(F.slice(F.sort_array(F.collect_list(F.struct("vec_id", "qv"))), 1, max_bucket).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (a, i) -> transform(slice(ms, i + 2, size(ms)), b -> "
                "struct(a.vec_id as id_a, b.vec_id as id_b, a.qv as qa, b.qv as qb))))"
            )
        ).alias("p")
    ).select("p.*")
    return (
        pairs.withColumn("dot", _dot("qa", "qb"))
        .filter(F.col("dot") >= min_dot)
        .select("id_a", "id_b", "dot")
        .distinct()
    )


def ann_lsh_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 8,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH (the IVF/LSH scale path).

    L independent tables of ``n_planes`` hyperplanes each; per table, probe
    the query's bucket plus all Hamming-1 neighbors. Candidates from any
    table are union'd and exact-scored with the quantized dot product. The
    fraction of the table scanned is ~L * (n_probes / 2^n_planes) instead of
    1.0 — tune (n_planes, n_tables) for the recall/cost point.
    Returns (qid, vid, dot, rank).
    """
    spark = vectors.sparkSession
    qv = vectors.select(F.col(id_col).alias("vec_id"), _quantized(vec_col).alias("qv"))

    # ONE bounded collect: the query vectors themselves (query_ids is a
    # driver-side list). Round-2 shape ran n_tables separate bucket passes
    # over the whole table plus n_tables driver collects; now all tables'
    # hyperplanes are stacked into a single (T*P, dim) matrix so bucketing
    # is one matmul in one mapInPandas pass, and query buckets are computed
    # driver-side from the collected query vectors (the IVF path's shape).
    qrows = vectors.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    if not qrows:
        raise ValueError("ann_lsh_topk: no query_ids present in vectors")
    dim = len(qrows[0][vec_col])
    stacked = np.vstack(
        [_hyperplanes(dim, n_planes, seed=42 + 1000 * t) for t in range(n_tables)]
    )

    def codes_of(m: np.ndarray) -> np.ndarray:
        """(N, dim) -> (N, n_tables) int32 bucket codes in one matmul."""
        signs = (m @ stacked.T) > 0  # (N, T*P)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        return (
            (signs.reshape(m.shape[0], n_tables, n_planes) * weights).sum(axis=2)
        ).astype(np.int32)

    qm = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qcodes = codes_of(qm)
    probe_rows = []
    for qi, r in enumerate(qrows):
        for t in range(n_tables):
            probes = {int(qcodes[qi, t])}
            for _ in range(probe_hamming):  # expand to Hamming <= probe_hamming
                probes |= {b ^ (1 << i) for b in probes for i in range(n_planes)}
            probe_rows.extend((int(r[id_col]), t, pb) for pb in probes)
    probes_df = spark.createDataFrame(
        pd.DataFrame(probe_rows, columns=["qid", "table", "bucket"])
    )

    bc = spark.sparkContext.broadcast(stacked)
    multi_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("table", IntegerType()),
            StructField("bucket", IntegerType()),
        ]
    )

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        w = 1 << np.arange(n_planes, dtype=np.int64)
        for pdf in it:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            signs = (m @ pl.T) > 0
            codes = (signs.reshape(len(pdf), n_tables, n_planes) * w).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf[id_col].values, n_tables),
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), len(pdf)),
                    "bucket": codes.astype(np.int32).ravel(),
                }
            )

    buckets = vectors.select(id_col, vec_col).mapInPandas(assign, multi_schema)
    cand = (
        buckets.join(F.broadcast(probes_df), ["table", "bucket"])
        .select("qid", F.col("vec_id").alias("vid"))
        .filter(F.col("qid") != F.col("vid"))
        .distinct()
    )

    q_qv = qv.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("q_qv")
    )
    scored = (
        cand.join(F.broadcast(q_qv), "qid")
        .join(qv.withColumnRenamed("vec_id", "vid"), "vid")
        .select("qid", "vid", _dot("q_qv", "qv").alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 10) -> np.ndarray:
    """Deterministic k-means for the IVF coarse quantizer: init = first k
    sample rows (sample order is deterministic), Lloyd iterations in numpy.
    Runs on the driver over a bounded sample — the classic IVF train step."""
    centroids = sample[:k].copy()
    for _ in range(iters):
        sims = sample @ centroids.T  # cosine on unit-norm inputs
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


def ann_ivf_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the k-means-bucketed scale
    path next to the sign-LSH one (ann_lsh_topk).

    Train: deterministic k-means over a bounded driver-side sample.
    Assign: one mapInPandas pass scores every vector against the broadcast
    centroids (the inverted lists are just a cell_id column — at 100 TB this
    is the partition/bucket key, and only nprobe/n_cells of the table is
    scanned per query). Probe: each query's nprobe nearest cells are
    exact-scored with the integer-quantized dot product.
    Returns (qid, vid, dot, rank) like ann_lsh_topk/q_ann_topk.
    """
    spark = vectors.sparkSession
    sample_rows = (
        vectors.select(vec_col).limit(train_sample).toPandas()[vec_col].tolist()
    )
    sample = np.array(sample_rows, dtype=np.float64)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    sample = sample / np.where(norms == 0, 1.0, norms)
    centroids = _kmeans_fit(sample, min(n_cells, len(sample)))
    bc = spark.sparkContext.broadcast(centroids)

    cell_schema = StructType(
        [StructField("vec_id", LongType()), StructField("cell", IntegerType())]
    )

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in it:
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nm = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(nm == 0, 1.0, nm)
            cell = np.argmax(m @ cents.T, axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col].values, "cell": cell})

    cells = vectors.select(id_col, vec_col).mapInPandas(assign, cell_schema)
    qv = vectors.select(F.col(id_col).alias("vec_id"), _quantized(vec_col).alias("qv"))
    member = cells.join(qv, "vec_id")

    # per query: rank centroids, probe top nprobe cells
    qrows = vectors.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).collect()
    probe_rows = []
    for r in qrows:
        v = np.asarray(r[vec_col], dtype=np.float64)
        n = np.linalg.norm(v)
        v = v / (n if n else 1.0)
        order = np.argsort(-(centroids @ v))[:nprobe]
        for c in order:
            probe_rows.append((int(r[id_col]), int(c)))
    probes = spark.createDataFrame(pd.DataFrame(probe_rows, columns=["qid", "cell"]))

    cand = member.join(F.broadcast(probes), "cell").filter(
        F.col("qid") != F.col("vec_id")
    )
    q_qv = qv.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("q_qv")
    )
    scored = cand.join(F.broadcast(q_qv), "qid").select(
        "qid", F.col("vec_id").alias("vid"), _dot("q_qv", "qv").alias("dot")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
