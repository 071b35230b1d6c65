"""Sequence packing: assign curated documents to fixed-length training
sequences (the concat-and-chunk step every LLM pretraining pipeline runs
between curation and tokenized shards).

GPT-style packing concatenates documents in a deterministic order and
slices the token stream into L-token sequences; a document may span a
sequence boundary. The distributed formulation packs PER SHARD — shards
are the output-file unit, pack independently, and each one's token
stream is a windowed cumulative sum:

    start(d) = sum of n_tok over earlier docs in the shard
    first_seq(d) = floor(start / L)
    n_seqs(d)   = floor((start + n_tok - 1) / L) - first_seq + 1

Scale shape: ONE shuffle (hash by shard) + an in-partition sort feeding
the running-sum window — no global sort ever materializes, which is the
difference between "packs 100 TB" and "sorts 100 TB". Shard count is
chosen so a shard fits an output file (the same parallelism unit as
WARC archives in sources/warc.py). Everything is integer arithmetic —
exact on any engine.

Token counts use the whitespace tokenization shared with the
`token_count` query; swap in the BPE encoder (pages/bpe.py) upstream
for exact token budgets.

No reference counterpart (versatiles-rs is a tile engine); extends the
§2.13 training-data layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEQ_LEN = 512  # tokens per packed training sequence
N_SHARDS = 8


def _ntok_expr(text_col: str) -> str:
    return f"size(filter(split({text_col}, ' '), t -> t <> ''))"


def _ntok_sql(text_col: str) -> str:
    return f"len(list_filter(string_split({text_col}, ' '), t -> t <> ''))"


def pack_sequences(docs: DataFrame, seq_len: int = SEQ_LEN,
                   n_shards: int = N_SHARDS, doc_id: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-doc packing assignment: (doc_id, shard, n_tok, start_off,
    first_seq, n_seqs). Deterministic: shard = pmod(doc_id, n_shards),
    order within shard = doc_id asc."""
    d = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.expr(f"(({doc_id} % {n_shards}) + {n_shards}) % {n_shards}")
        .cast("bigint").alias("shard"),
        F.expr(_ntok_expr(text_col)).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_end", F.sum("n_tok").over(w))
    return d.select(
        "doc_id", "shard", "n_tok",
        (F.col("_end") - F.col("n_tok")).alias("start_off"),
        F.expr(f"cast(floor((_end - n_tok) / {seq_len}) as bigint)")
        .alias("first_seq"),
        F.expr(
            f"cast(if(n_tok = 0, 0, "
            f"floor((_end - 1) / {seq_len})"
            f" - floor((_end - n_tok) / {seq_len}) + 1) as bigint)"
        ).alias("n_seqs"),
    )


def pack_sequences_sql(table: str = "documents", seq_len: int = SEQ_LEN,
                       n_shards: int = N_SHARDS, doc_id: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB twin of pack_sequences."""
    return f"""
WITH d AS (
  SELECT {doc_id} AS doc_id,
         CAST((({doc_id} % {n_shards}) + {n_shards}) % {n_shards} AS BIGINT)
           AS shard,
         CAST({_ntok_sql(text_col)} AS BIGINT) AS n_tok
  FROM {table}
),
c AS (
  SELECT doc_id, shard, n_tok,
         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS e
  FROM d
)
SELECT doc_id, shard, n_tok,
       e - n_tok AS start_off,
       CAST(floor((e - n_tok) / {seq_len}) AS BIGINT) AS first_seq,
       CAST(CASE WHEN n_tok = 0 THEN 0
            ELSE floor((e - 1) / {seq_len})
                 - floor((e - n_tok) / {seq_len}) + 1 END AS BIGINT)
         AS n_seqs
FROM c
"""
