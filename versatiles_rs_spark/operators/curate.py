"""Corpus-curation building blocks shared by jobs/curate_job.py and
jobs/pipeline_job.py: input-shape dispatch, the per-row flag projection,
and the survivor selection.

Kept job-agnostic so the funnel semantics exist in exactly one place —
the flag expressions are the same shared Column pieces the oracle-checked
`filter_funnel` query uses (pages/quality_filters.py)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.quality_filters import (
    _c4_cols,
    _gopher_cols,
    _with_decorated,
    normalize_text,
)

_FLAG_COLS = ("_c4", "_g", "_nh", "_surv")


def load_corpus(spark: SparkSession, path: str, keep_geo: bool = False) -> DataFrame:
    """-> DataFrame(doc_id, text, lang[, url][, lon, lat]) from documents
    parquet, pages parquet (url/html), or a directory of WARC archives."""
    if not path.endswith(".parquet") and any(
        n.endswith((".warc", ".warc.gz")) for n in _listing(path)
    ):
        from versatiles_rs_spark.pages.extract import with_extracted_text
        from versatiles_rs_spark.queries import _LANG_PRED_EXPR
        from versatiles_rs_spark.sources.warc import read_warc

        pages = with_extracted_text(read_warc(spark, path))
        geo = ["lon", "lat"] if keep_geo else []
        return pages.select(
            F.xxhash64("url").alias("doc_id"),
            F.col("extracted_text").alias("text"),
            F.expr(_LANG_PRED_EXPR.replace("text", "extracted_text")).alias("lang"),
            "url",
            *geo,
        )
    src = spark.read.parquet(path)
    cols = {f.name for f in src.schema.fields}
    if {"url", "html"} <= cols:
        from versatiles_rs_spark.pages.extract import with_extracted_text

        pages = with_extracted_text(src)
        geo = ["lon", "lat"] if keep_geo else []
        out = pages.select(
            (F.xxhash64("url") if "doc_id" not in cols else F.col("doc_id")).alias("doc_id"),
            F.col("extracted_text").alias("text"),
            *(["lang"] if "lang" in cols else []),
            "url",
            *geo,
        )
        if "lang" not in cols:
            from versatiles_rs_spark.queries import _LANG_PRED_EXPR

            out = out.withColumn("lang", F.expr(_LANG_PRED_EXPR))
        return out
    if "lang" not in cols:
        src = src.withColumn("lang", F.lit("und"))
    if keep_geo:
        from versatiles_rs_spark.pages.generator import lat_expr, lon_expr

        src = src.withColumn("lon", lon_expr(F.col("doc_id"))).withColumn(
            "lat", lat_expr(F.col("doc_id"))
        )
        return src.select("doc_id", "text", "lang", "lon", "lat")
    return src.select("doc_id", "text", "lang")


def _listing(path: str) -> list[str]:
    try:
        return os.listdir(path)
    except (NotADirectoryError, FileNotFoundError):
        return []


def curation_flags(
    corpus: DataFrame,
    skip_c4: bool = False,
    skip_gopher: bool = False,
    skip_dedup: bool = False,
    normalizer: str = "column",
) -> tuple[DataFrame, list]:
    """ONE per-row projection computing every funnel flag plus the dedup
    window; returns (flagged_df, funnel_agg_columns). The dedup keeper is
    the min doc_id among C4+Gopher survivors per normalized-text group —
    the same order the oracle-checked filter_funnel applies.

    normalizer: "column" (the oracle-shared JVM rule chain) or "pandas"
    (the Arrow-batched twin — same output, ~7x faster on string-bandwidth-
    bound boxes; see quality_filters.normalize_text_pandas)."""
    d = _with_decorated(corpus, "doc_id", "text")
    c4 = F.lit(True) if skip_c4 else _c4_cols()["keep"]
    gopher = F.lit(True) if skip_gopher else _gopher_cols()["keep"]
    if normalizer == "pandas":
        from versatiles_rs_spark.pages.quality_filters import normalize_text_pandas

        norm = normalize_text_pandas()(F.col("text"))
    else:
        norm = F.expr(normalize_text("text"))
    d = d.select(
        *[c for c in corpus.columns],
        c4.alias("_c4"),
        gopher.alias("_g"),
        F.md5(norm).alias("_nh"),
    )
    if skip_dedup:
        d = d.withColumn("_surv", F.col("_c4") & F.col("_g"))
    else:
        keeper = F.min(F.when(F.col("_c4") & F.col("_g"), F.col("doc_id"))).over(
            Window.partitionBy("_nh")
        )
        d = d.withColumn(
            "_surv", F.col("_c4") & F.col("_g") & (F.col("doc_id") == keeper)
        )
    funnel_aggs = [
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.col("_c4").cast("long")).alias("n_c4"),
        F.sum((F.col("_c4") & F.col("_g")).cast("long")).alias("n_c4_gopher"),
        F.sum(F.col("_surv").cast("long")).alias("n_deduped"),
    ]
    return d, funnel_aggs


def curation_survivors(flagged: DataFrame) -> DataFrame:
    return flagged.where("_surv").drop(*_FLAG_COLS)


def neardup_stage(survivors: DataFrame, threshold: float = 0.5):
    """MinHash-LSH near-dup stage over the dedup survivors: drop set is
    O(duplicates), computed ONCE and localCheckpointed (so resumable
    key-bucket batches don't re-run the LSH cascade), broadcast back as
    an anti-join — the corpus is never shuffled a second time.
    Returns (survivors', n_dropped)."""
    from pyspark.sql.functions import broadcast

    from versatiles_rs_spark.pages.quality_filters import neardup_drop_ids

    drops = neardup_drop_ids(
        survivors.select("doc_id", "text"), threshold=threshold
    ).localCheckpoint()
    n_dropped = drops.count()
    return survivors.join(broadcast(drops), "doc_id", "left_anti"), n_dropped


def classifier_stage(flagged: DataFrame, survivors: DataFrame) -> DataFrame:
    """Learned quality gate (pages/classifier.py): train the hashed NB
    on the 25% seed labeled by the C4 flag already computed in the flag
    projection (heuristic distillation), then drop survivors the model
    predicts as failures. Training is a bounded (<= 2*m rows) collect;
    the gate itself is a zero-shuffle inline predicate."""
    from versatiles_rs_spark.pages.classifier import nb_keep_expr, train_nb
    from versatiles_rs_spark.pages.quality_filters import decorated_lines

    page = f"array_join({decorated_lines('doc_id', 'text')}, ' ')"
    seed = (
        flagged.where("doc_id % 4 = 0")
        .select(F.col("_c4").alias("label"), F.expr(page).alias("text"))
    )
    model = train_nb(seed)
    return survivors.where(F.expr(nb_keep_expr(model, f"({page})")))
