"""Shared cross-engine SQL fragments and table loaders for the query registry.

Shared derivations (pages/generator.py): lon/lat come from pure integer
arithmetic on doc_id / event_id, so both engines compute identical doubles.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.generator import lat_expr, lon_expr

LON_SQL = "(({id} * 2654435761) % 360000000) / 1000000.0 - 180.0"
LAT_SQL = "(({id} * 2246822519) % 170000000) / 1000000.0 - 85.0"


def _tile_sql(axis: str, z: str = "z") -> str:
    """floor(clamp(...)) tile index formula (tile_coord.rs:139-146)."""
    if axis == "x":
        frac = f"pow(2.0,{z})*(lon/360.0+0.5)"
    else:
        frac = f"pow(2.0,{z})*(0.5-0.5*ln(tan(lat*pi()/360.0+pi()/4.0))/pi())"
    return f"CAST(floor(least(greatest({frac},0.0),pow(2.0,{z})-1.0)) AS BIGINT)"


def _docs_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.withColumn("lon", lon_expr(F.col("doc_id"))).withColumn("lat", lat_expr(F.col("doc_id")))


def _events_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn("lon", lon_expr(F.col("event_id"))).withColumn("lat", lat_expr(F.col("event_id")))




# shared cross-domain SQL fragments (used by both text and dedup modules)
_TOKEN_COUNT_EXPR = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END"
)

_BPE_RX = "[0-9A-Za-z_]+|[^0-9A-Za-z_ ]"
