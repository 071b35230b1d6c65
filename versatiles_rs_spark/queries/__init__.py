"""Driver-facing query registry: Spark implementations + DuckDB oracle SQL.

Each entry implements one operator family from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable, with a matching ANSI-SQL oracle that
DuckDB runs on the same parquet views. Column names/aliases match exactly;
float outputs are rounded or integer-quantized so value hashes are stable
across engines.

Round 5 split the single 3k-line module by domain (VERDICT r4 #9): the
q_*/O_* definitions live in tiles/spatial/text/dedup (+ _shared), and this
package __init__ remains the aggregation point owning QUERIES/ORACLES in
driver-sweep order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from versatiles_rs_spark.queries._shared import (  # noqa: F401
    LAT_SQL,
    LON_SQL,
    _docs_geo,
    _events_geo,
    _tile_sql,
)
from versatiles_rs_spark.queries.dedup import *  # noqa: F401,F403
from versatiles_rs_spark.queries.spatial import *  # noqa: F401,F403
from versatiles_rs_spark.queries.text import *  # noqa: F401,F403
from versatiles_rs_spark.queries.text import _LANG_PRED_EXPR  # noqa: F401  (jobs/convert_job, operators/curate)
from versatiles_rs_spark.queries.tiles import *  # noqa: F401,F403
from versatiles_rs_spark.queries.tiles import _PYR_ZMAX  # noqa: F401  (tests/test_quality_filters)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "filter_funnel_neardup": q_filter_funnel_neardup,
    "polygon_tiles": q_polygon_tiles,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "bpe_pair_counts": q_bpe_pair_counts,
    "c4_filter": q_c4_filter,
    "crawl_schedule": q_crawl_schedule,
    "dedup_clusters": q_dedup_clusters,
    "domain_stats": q_domain_stats,
    "dup_ngram_stats": q_dup_ngram_stats,
    "filter_funnel": q_filter_funnel,
    "gopher_filter": q_gopher_filter,
    "kmeans_clusters": q_kmeans_clusters,
    "knn_graph": q_knn_graph,
    "lm_perplexity": q_lm_perplexity,
    "normalized_dedup": q_normalized_dedup,
    "pyramid_gaps": q_pyramid_gaps,
    "quality_deciles": q_quality_deciles,
    "robots_filter": q_robots_filter,
    "semdedup_pairs": q_semdedup_pairs,
    "sessionize": q_sessionize,
    "tile_anomaly": q_tile_anomaly,
    "tile_diff": q_tile_diff,
    "winnow_fingerprints": q_winnow_fingerprints,
    "tile_assign_counts": q_tile_assign_counts,
    "events_tile_counts": q_events_tile_counts,
    "zoom_stats": q_zoom_stats,
    "drop_rate_thin": q_drop_rate_thin,
    "min_distance_cells": q_min_distance_cells,
    "allowlist_semijoin": q_allowlist_semijoin,
    "update_properties_join": q_update_properties_join,
    "probe_topk": q_probe_topk,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "dedup_exact": q_dedup_exact,
    "ann_topk": q_ann_topk,
    "tile_render_summary": q_tile_render_summary,
    "container_roundtrip": q_container_roundtrip,
    "pip_join_docs": q_pip_join_docs,
    "knn": q_knn,
    "pip_join_cells": q_pip_join_cells,
    "stacked_coalesce": q_stacked_coalesce,
    "merged_vector_counts": q_merged_vector_counts,
    "filter_features_en": q_filter_features_en,
    "minhash_neardup": q_minhash_neardup,
    "simhash_neardup": q_simhash_neardup,
    "embedding_neardup": q_embedding_neardup,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ngram_jaccard": q_ngram_jaccard,
    "doc_fingerprint": q_doc_fingerprint,
    "token_count_bpe": q_token_count_bpe,
    "doc_fingerprint_rolling": q_doc_fingerprint_rolling,
    "windowed_events": q_windowed_events,
    "coord_set_ops": q_coord_set_ops,
    "sort_index_key": q_sort_index_key,
    "salted_tile_stats": q_salted_tile_stats,
    "shortbread_layers": q_shortbread_layers,
    "decontaminate": q_decontaminate,
    "quality_sample": q_quality_sample,
    "s2_face_ij": q_s2_face_ij,
    "hex_cell_stats": q_hex_cell_stats,
    "html_extract": q_html_extract,
    "url_canonical": q_url_canonical,
    "pii_scrub": q_pii_scrub,
    "paragraph_dedup": q_paragraph_dedup,
    "link_pagerank": q_link_pagerank,
    "repetition_stats": q_repetition_stats,
    "warc_roundtrip": q_warc_roundtrip,
    "stratified_sample": q_stratified_sample,
    "vocab_topk": q_vocab_topk,
    "bm25_topk": q_bm25_topk,
    "word_pmi": q_word_pmi,
    "bpe_merges": q_bpe_merges,
}

ORACLES: dict[str, str] = {
    "tile_assign_counts": O_TILE_ASSIGN_COUNTS,
    "events_tile_counts": O_EVENTS_TILE_COUNTS,
    "zoom_stats": O_ZOOM_STATS,
    "drop_rate_thin": O_DROP_RATE_THIN,
    "min_distance_cells": O_MIN_DISTANCE_CELLS,
    "allowlist_semijoin": O_ALLOWLIST_SEMIJOIN,
    "update_properties_join": O_UPDATE_PROPERTIES_JOIN,
    "probe_topk": O_PROBE_TOPK,
    "token_count": O_TOKEN_COUNT,
    "quality_score": O_QUALITY_SCORE,
    "lang_id": O_LANG_ID,
    "dedup_exact": O_DEDUP_EXACT,
    "ann_topk": O_ANN_TOPK,
    "tile_render_summary": O_TILE_RENDER_SUMMARY,
    "container_roundtrip": O_CONTAINER_ROUNDTRIP,
    "pip_join_docs": O_PIP_JOIN_DOCS,
    "knn": O_KNN,
    "pip_join_cells": O_PIP_JOIN_DOCS,
    "stacked_coalesce": O_STACKED_COALESCE,
    "merged_vector_counts": O_MERGED_VECTOR_COUNTS,
    "filter_features_en": O_FILTER_FEATURES_EN,
    "minhash_neardup": O_MINHASH_NEARDUP,
    "simhash_neardup": O_SIMHASH_NEARDUP,
    "embedding_neardup": O_EMBEDDING_NEARDUP,
    "ann_lsh_topk": O_ANN_LSH_TOPK,
    "ann_ivf_topk": O_ANN_LSH_TOPK,
    "ngram_jaccard": O_NGRAM_JACCARD,
    "doc_fingerprint": O_DOC_FINGERPRINT,
    "token_count_bpe": O_TOKEN_COUNT_BPE,
    "doc_fingerprint_rolling": O_DOC_FINGERPRINT_ROLLING,
    "windowed_events": O_WINDOWED_EVENTS,
    "coord_set_ops": O_COORD_SET_OPS,
    "sort_index_key": O_SORT_INDEX_KEY,
    "salted_tile_stats": O_SALTED_TILE_STATS,
    "shortbread_layers": O_SHORTBREAD_LAYERS,
    "decontaminate": O_DECONTAMINATE,
    "quality_sample": O_QUALITY_SAMPLE,
    "s2_face_ij": O_S2_FACE_IJ,
    "hex_cell_stats": O_HEX_CELL_STATS,
    "html_extract": O_HTML_EXTRACT,
    "url_canonical": O_URL_CANONICAL,
    "pii_scrub": O_PII_SCRUB,
    "paragraph_dedup": O_PARAGRAPH_DEDUP,
    "link_pagerank": O_LINK_PAGERANK,
    "repetition_stats": O_REPETITION_STATS,
    "warc_roundtrip": O_WARC_ROUNDTRIP,
    "stratified_sample": O_STRATIFIED_SAMPLE,
    "vocab_topk": O_VOCAB_TOPK,
    "bm25_topk": O_BM25_TOPK,
    "sessionize": O_SESSIONIZE,
    "robots_filter": O_ROBOTS_FILTER,
    "lm_perplexity": O_LM_PERPLEXITY,
    "ann_ivfpq_topk": O_ANN_LSH_TOPK,
    "filter_funnel_neardup": O_FILTER_FUNNEL_NEARDUP,
    "polygon_tiles": O_POLYGON_TILES,
    "tile_diff": O_TILE_DIFF,
    "dedup_clusters": O_DEDUP_CLUSTERS,
    "tile_anomaly": O_TILE_ANOMALY,
    "word_pmi": O_WORD_PMI,
    "quality_deciles": O_QUALITY_DECILES,
    "knn_graph": O_KNN_GRAPH,
    "bpe_pair_counts": O_BPE_PAIR_COUNTS,
    "c4_filter": O_C4_FILTER,
    "gopher_filter": O_GOPHER_FILTER,
    "normalized_dedup": O_NORMALIZED_DEDUP,
    "dup_ngram_stats": O_DUP_NGRAM_STATS,
    "winnow_fingerprints": O_WINNOW_FINGERPRINTS,
    "pyramid_gaps": O_PYRAMID_GAPS,
    "filter_funnel": O_FILTER_FUNNEL,
    "kmeans_clusters": O_KMEANS_CLUSTERS,
    "semdedup_pairs": O_SEMDEDUP_PAIRS,
    "domain_stats": O_DOMAIN_STATS,
    "crawl_schedule": O_CRAWL_SCHEDULE,
    # bpe_merges: intentionally no oracle — sequential argmax/rewrite is
    # not SQL-expressible; validated merge-for-merge vs an independent
    # reference in tests/test_bpe.py (driver records rows-only).
}
