"""IVF-PQ approximate nearest neighbor — the compressed-index scale path.

Completes the ANN family (brute force -> sign-LSH -> IVF -> IVF-PQ): at
10^12 vectors even the inverted lists don't fit raw, so FAISS-style
product quantization compresses each vector to ``m_sub`` one-byte codes
(64-dim float32 256 B -> 8 B, 32x) and candidate scoring runs on the
codes via asymmetric distance computation (ADC: per-query lookup tables,
one table row per subspace), never touching the raw vectors until the
final exact refine of a small pool.

Stages (all deterministic):

1. TRAIN (driver, bounded sample): coarse k-means centroids (reused from
   the IVF path) + per-subspace k-means codebooks.
2. ENCODE (one mapInPandas over the corpus): cell id + PQ codes per
   vector — this compressed table IS the index; cell is the partition
   key at scale.
3. PROBE: per query, ADC lookup tables broadcast; candidates in the
   query's ``nprobe`` nearest cells are scored by ``m_sub`` table
   lookups (numpy gather, no dot products).
4. REFINE: the top ``refine*k`` ADC pool joins back to the raw vectors
   for an exact integer-quantized rescore, so the returned ranking uses
   the same dot product as the brute-force oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from versatiles_rs_spark.dedup.embedding import _dot, _kmeans_fit, _quantized


def pq_train_codebooks(sample: np.ndarray, m_sub: int, n_codes: int) -> np.ndarray:
    """Per-subspace codebooks, shape (m_sub, n_codes, dim/m_sub) — plain
    k-means per subspace (deterministic init = first rows, like the IVF
    coarse quantizer)."""
    n, dim = sample.shape
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d_sub = dim // m_sub
    books = np.zeros((m_sub, n_codes, d_sub))
    for s in range(m_sub):
        sub = sample[:, s * d_sub : (s + 1) * d_sub]
        cents = sub[: min(n_codes, len(sub))].copy()
        for _ in range(10):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                m = assign == c
                if m.any():
                    cents[c] = sub[m].mean(axis=0)
        books[s, : len(cents)] = cents
    return books


def pq_encode_codes(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m_sub) uint8-ish code matrix (nearest codeword per
    subspace, squared-L2)."""
    m_sub, n_codes, d_sub = books.shape
    out = np.zeros((len(vecs), m_sub), dtype=np.int32)
    for s in range(m_sub):
        sub = vecs[:, s * d_sub : (s + 1) * d_sub]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        out[:, s] = np.argmin(d2, axis=1)
    return out


def ann_ivfpq_topk(
    vectors: DataFrame,
    query_ids: list[int],
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 6,
    m_sub: int = 8,
    n_codes: int = 16,
    refine: int = 8,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ top-k: (qid, vid, dot, rank) with the exact integer dot on
    the refined pool (same output contract as the other ANN paths)."""
    spark = vectors.sparkSession
    sample = np.array(
        vectors.select(vec_col).limit(train_sample).toPandas()[vec_col].tolist(),
        dtype=np.float64,
    )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    unit = sample / np.where(norms == 0, 1.0, norms)
    cents = _kmeans_fit(unit, min(n_cells, len(unit)))
    books = pq_train_codebooks(sample, m_sub, n_codes)
    bc = spark.sparkContext.broadcast((cents, books))

    enc_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cell", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cc, bb = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nm = np.linalg.norm(m, axis=1, keepdims=True)
            cell = np.argmax((m / np.where(nm == 0, 1.0, nm)) @ cc.T, axis=1)
            codes = pq_encode_codes(m, bb)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].values,
                    "cell": cell.astype(np.int32),
                    "codes": list(codes),
                }
            )

    index = vectors.select(id_col, vec_col).mapInPandas(encode, enc_schema)

    # bounded: the query vectors
    qrows = (
        vectors.where(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .toPandas()
    )
    qm = np.array(qrows[vec_col].tolist(), dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    q_unit = qm / np.where(qn == 0, 1.0, qn)
    cell_rank = np.argsort(-(q_unit @ cents.T), axis=1)[:, :nprobe]
    probes = pd.DataFrame(
        [
            (int(qid), int(c))
            for qid, cells in zip(qrows[id_col], cell_rank)
            for c in cells
        ],
        columns=["qid", "cell"],
    )
    probes_df = spark.createDataFrame(probes)
    # ADC lookup tables: lut[q, sub, code] = q_sub . codeword
    m_sub_, n_codes_, d_sub = books.shape
    lut = np.einsum(
        "qsd,scd->qsc", qm.reshape(len(qm), m_sub_, d_sub), books
    )  # (n_q, m_sub, n_codes)
    qid_order = {int(q): i for i, q in enumerate(qrows[id_col])}
    bc_lut = spark.sparkContext.broadcast((lut, qid_order))

    adc_schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("vid", LongType()),
            StructField("adc", LongType()),
        ]
    )

    def adc_score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lut_, order = bc_lut.value
        subs = np.arange(lut_.shape[1])
        for pdf in it:
            if pdf.empty:
                continue
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            qidx = pdf["qid"].map(order).values.astype(np.int64)
            scores = lut_[qidx[:, None], subs[None, :], codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].values,
                    "vid": pdf["vec_id"].values,
                    # integer-quantized ADC keeps the downstream ordering
                    # deterministic across partitionings
                    "adc": np.round(scores * 1e6).astype(np.int64),
                }
            )

    cand = (
        index.join(F.broadcast(probes_df), "cell")
        .where(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", "codes")
    )
    adc = cand.mapInPandas(adc_score, adc_schema)
    w = Window.partitionBy("qid").orderBy(F.desc("adc"), F.asc("vid"))
    pool = adc.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= refine * k
    )

    # exact refine with the same integer dot the brute-force oracle uses
    qv = vectors.select(F.col(id_col).alias("vec_id"), _quantized(vec_col).alias("qv"))
    q_qv = qv.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("q_qv")
    )
    exact = (
        pool.select("qid", "vid")
        .join(F.broadcast(q_qv), "qid")
        .join(qv.withColumnRenamed("vec_id", "vid"), "vid")
        .select("qid", "vid", _dot("q_qv", "qv").alias("dot"))
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vid"))
    return exact.withColumn("rank", F.row_number().over(w2)).where(F.col("rank") <= k)


def knn_graph(
    vectors: DataFrame,
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 6,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN GRAPH: top-k cosine neighbors for EVERY vector (the structure
    behind embedding dedup clusters, graph-based label propagation, and
    retrieval eval). Unlike the query-set ANN paths, nothing is collected
    driver-side except the centroid training sample:

    - every vector lands in its ONE nearest cell (index side),
    - every vector PROBES its ``nprobe`` nearest cells (query side),
    - candidates are the cell-local equi-join of probe x member (the only
      join key is the cell id — at corpus scale this is the partition key,
      so candidate generation is co-located),
    - exact integer-quantized dots + per-source top-k window.

    Returns (qid, vid, dot, rank), rank 1..k per qid.
    """
    import numpy as np

    spark = vectors.sparkSession
    sample = np.array(
        vectors.select(vec_col).limit(train_sample).toPandas()[vec_col].tolist(),
        dtype=np.float64,
    )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    cents = _kmeans_fit(sample / np.where(norms == 0, 1.0, norms), min(n_cells, len(sample)))
    bc = spark.sparkContext.broadcast(cents)

    assign_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("cell", IntegerType()),
            StructField("side", IntegerType()),  # 0 = member, 1 = probe
        ]
    )

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cc = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nm = np.linalg.norm(m, axis=1, keepdims=True)
            sims = (m / np.where(nm == 0, 1.0, nm)) @ cc.T
            order = np.argsort(-sims, axis=1)
            ids = pdf[id_col].values
            member = pd.DataFrame(
                {"vec_id": ids, "cell": order[:, 0].astype(np.int32), "side": 0}
            )
            np_probe = min(order.shape[1], max(1, int(nprobe)))
            probe = pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, np_probe),
                    "cell": order[:, :np_probe].astype(np.int32).ravel(),
                    "side": 1,
                }
            )
            yield pd.concat([member, probe], ignore_index=True)

    both = vectors.select(id_col, vec_col).mapInPandas(assign, assign_schema)
    member = both.where(F.col("side") == 0).select(F.col("vec_id").alias("vid"), "cell")
    probe = both.where(F.col("side") == 1).select(F.col("vec_id").alias("qid"), "cell")
    cand = (
        probe.join(member, "cell")
        .where(F.col("qid") != F.col("vid"))
        .select("qid", "vid")
        .distinct()
    )
    qv = vectors.select(F.col(id_col).alias("vec_id"), _quantized(vec_col).alias("qv"))
    scored = (
        cand.join(qv.withColumnRenamed("vec_id", "qid").withColumnRenamed("qv", "q_qv"), "qid")
        .join(qv.withColumnRenamed("vec_id", "vid"), "vid")
        .select("qid", "vid", _dot("q_qv", "qv").alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vid"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
