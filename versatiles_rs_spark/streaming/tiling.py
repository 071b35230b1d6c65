"""Structured Streaming variants of the tiling operators.

The reference has no unbounded-stream concepts (SURVEY.md §2.11) — its
TileStream is a bounded pull stream — so batch DataFrames match capability.
These streaming forms are the *incremental recompute* extension: a live feed
of points (e.g. a crawl frontier) maintains per-tile aggregates with
watermarked event-time windows. The same Column-math geocode is reused
verbatim — the logical plan is identical to the batch path, only the sink
mode differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from versatiles_rs_spark.tile_math.coords import lonlat_to_tile_cols


def streaming_tile_counts(
    points_stream: DataFrame,
    zoom: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Running count of points per tile (complete/update mode aggregate)."""
    x, y = lonlat_to_tile_cols(F.col(lon_col), F.col(lat_col), zoom)
    return (
        points_stream.withColumn("x", x)
        .withColumn("y", y)
        .groupBy("x", "y")
        .agg(F.count("*").alias("n"))
    )


def streaming_windowed_tile_stats(
    points_stream: DataFrame,
    zoom: int,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    lon_col: str = "lon",
    lat_col: str = "lat",
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling-window per-tile stats with late-data handling: watermark
    bounds state so the aggregation runs indefinitely (append mode)."""
    x, y = lonlat_to_tile_cols(F.col(lon_col), F.col(lat_col), zoom)
    keyed = (
        points_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("x", x)
        .withColumn("y", y)
    )
    aggs = [F.count("*").alias("n")]
    if value_col:
        aggs.append(F.round(F.avg(value_col), 6).alias("avg_value"))
    out_cols = [F.col("w.start").alias("window_start"), F.col("x"), F.col("y"), F.col("n")]
    if value_col:
        out_cols.append(F.col("avg_value"))
    return keyed.groupBy(F.window(ts_col, window).alias("w"), "x", "y").agg(*aggs).select(*out_cols)
