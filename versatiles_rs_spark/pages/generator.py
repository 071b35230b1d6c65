"""Deterministic synthetic Common-Crawl-style pages table.

BASELINE.json input_hint mandates the input shape
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.
This module synthesizes it *deterministically* from the driver-provided
``documents`` parquet (seed=42, read-only) so every run — Spark or the DuckDB
oracle — derives identical rows with pure column arithmetic (no RNG state).

Derivations (all SQL-expressible, used verbatim in oracle queries):

- ``url``      = 'https://' || source || '.example.com/doc/' || doc_id
- ``warc_ts``  = TIMESTAMP '2024-01-01 00:00:00' + doc_id seconds
- ``lon``      = (doc_id * 2654435761 % 360000000) / 1e6 - 180.0
- ``lat``      = (doc_id * 2246822519 % 170000000) / 1e6 - 85.0
- ``html``     = encode of a fixed template embedding lon/lat (as exact
  micro-degree integers) and the document text
- ``text``     = documents.text (golden for the byte-identity check)

The multiplier constants are Knuth's 2^32/phi (2654435761) and xxHash prime2
(2246822519) — both < 2^32 so doc_id*const stays well inside int64 for any
realistic doc count (no overflow under ANSI SQL or DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LON_MULT = 2654435761
LAT_MULT = 2246822519

HTML_PREFIX = '<html><head><meta name="geo" content="'
HTML_MID = '"></head><body>'
HTML_SUFFIX = "</body></html>"


def lon_expr(doc_id):
    """Deterministic longitude in [-180, 180) — exact integer µdeg / 1e6."""
    return ((doc_id * F.lit(LON_MULT)) % F.lit(360000000)).cast("double") / F.lit(1000000.0) - F.lit(180.0)


def lat_expr(doc_id):
    """Deterministic latitude in [-85, 85)."""
    return ((doc_id * F.lit(LAT_MULT)) % F.lit(170000000)).cast("double") / F.lit(1000000.0) - F.lit(85.0)


# The same derivations as ANSI SQL fragments, for DuckDB oracle queries.
LON_SQL = "((doc_id * 2654435761) % 360000000) / 1000000.0 - 180.0"
LAT_SQL = "((doc_id * 2246822519) % 170000000) / 1000000.0 - 85.0"


def synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet -> pages(url, warc_ts, html, text, lang).

    Pure Column expressions (concat/encode) — no Python in the row path, so
    this synthesizer itself scales to 10^12 rows.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lon_udeg = (F.col("doc_id") * F.lit(LON_MULT)) % F.lit(360000000)
    lat_udeg = (F.col("doc_id") * F.lit(LAT_MULT)) % F.lit(170000000)
    html_str = F.concat(
        F.lit(HTML_PREFIX),
        lon_udeg.cast("string"),
        F.lit(","),
        lat_udeg.cast("string"),
        F.lit(HTML_MID),
        F.col("text"),
        F.lit(HTML_SUFFIX),
    )
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), F.col("doc_id").cast("string")).alias("url"),
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),  # kept as lineage key; drop with .drop("doc_id") for the pure input shape
    )
