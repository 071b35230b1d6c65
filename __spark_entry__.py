"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full convert pipeline (pages -> MVT tile pyramid) at
    sf0.001, returning per-zoom probe statistics."""
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.operators.probe import zoom_stats
    from versatiles_rs_spark.pages import synth_pages, with_extracted_text

    pages_geo = with_extracted_text(synth_pages(spark, "/root/testdata/sf0.001"))
    tiles = convert_pages_to_tiles(pages_geo, min_zoom=0, max_zoom=8, keep_ratio=0.9)
    return zoom_stats(tiles)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from versatiles_rs_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from versatiles_rs_spark.queries import ORACLES

    return dict(ORACLES)
