"""Probe — scan/validate/statistics over a tiles DataFrame.

Mirrors `versatiles probe` (versatiles/src/tools/probe.rs:35-204):
per-zoom count / sum(size) / avg / max, top-k biggest tiles, and the
TileContents depth = MVT validation + per-layer byte breakdown.
All plain hash aggregations — map-side combinable, one shuffle each.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def zoom_stats(tiles: DataFrame) -> DataFrame:
    """probe.rs:153-204: per-zoom tile count + byte stats."""
    return (
        tiles.select("z", F.length("tile").alias("size"))
        .groupBy("z")
        .agg(
            F.count("*").alias("tile_count"),
            F.sum("size").alias("total_bytes"),
            F.round(F.avg("size"), 6).alias("avg_bytes"),
            F.max("size").alias("max_bytes"),
        )
        .orderBy("z")
    )


def top_k_tiles(tiles: DataFrame, k: int = 10) -> DataFrame:
    """probe.rs:192-204: top-k biggest tiles; deterministic tie-break on
    (size desc, z, x, y)."""
    sized = tiles.select("z", "x", "y", F.length("tile").alias("size"))
    return sized.orderBy(F.desc("size"), "z", "x", "y").limit(k)


def top_k_per_zoom(tiles: DataFrame, k: int = 10) -> DataFrame:
    """Window variant: top-k per zoom (rank over partitioned window)."""
    sized = tiles.select("z", "x", "y", F.length("tile").alias("size"))
    w = Window.partitionBy("z").orderBy(F.desc("size"), "x", "y")
    return sized.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sample_windows(tiles: DataFrame, window_size: int = 8, keep_ratio: float = 0.1) -> DataFrame:
    """Windowed sampling for probe depths (tools/tile_sampling.rs:1-6):
    keep contiguous ``window_size`` x ``window_size`` squares of tiles so
    remote range requests coalesce; windows chosen by a stable hash of the
    window coordinate (deterministic sample). Parity with the reference's
    "always at least 1" rule: the min-hash window of every zoom survives
    even when the ratio rounds the level to zero windows."""
    from pyspark.sql.window import Window

    wx = F.shiftright(F.col("x"), int(window_size).bit_length() - 1)
    wy = F.shiftright(F.col("y"), int(window_size).bit_length() - 1)
    u = (F.abs(F.hash(F.col("z"), wx, wy)) % F.lit(1_000_000)).cast("double") / F.lit(1_000_000.0)
    zmin = F.min(u).over(Window.partitionBy("z"))
    return (
        tiles.withColumn("_u", u)
        .withColumn("_zmin", zmin)
        .filter((F.col("_u") < F.lit(keep_ratio)) | (F.col("_u") == F.col("_zmin")))
        .drop("_u", "_zmin")
    )


_VALIDATE_SCHEMA = StructType(
    [
        StructField("z", IntegerType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("n_issues", IntegerType()),
        StructField("issues", StringType()),
    ]
)


def validate_tiles(tiles: DataFrame) -> DataFrame:
    """TileContents probe depth: decompress + MVT conformance per tile
    (vector_tile/validator.rs:120). Arrow-batched."""
    from versatiles_rs_spark.functions.compression import decompress
    from versatiles_rs_spark.functions.mvt import validate_tile

    def check(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            issues = []
            for blob, codec in zip(pdf["tile"], pdf["compression"]):
                raw = decompress(bytes(blob), codec)
                issues.append(validate_tile(raw))
            yield pd.DataFrame(
                {
                    "z": pdf["z"].astype("int32"),
                    "x": pdf["x"],
                    "y": pdf["y"],
                    "n_issues": [len(i) for i in issues],
                    "issues": ["; ".join(i) for i in issues],
                }
            )

    return tiles.select("z", "x", "y", "tile", "compression").mapInPandas(check, _VALIDATE_SCHEMA)


_BREAKDOWN_SCHEMA = StructType(
    [
        StructField("z", IntegerType()),
        StructField("layer", StringType()),
        StructField("n_features", LongType()),
        StructField("geometry_bytes", LongType()),
        StructField("prop_bytes", LongType()),
    ]
)


def layer_breakdown(tiles: DataFrame) -> DataFrame:
    """tile_breakdown.rs analog: per zoom x layer byte/feature breakdown."""
    from versatiles_rs_spark.functions.compression import decompress
    from versatiles_rs_spark.functions.mvt import decode_tile, encode_geometry

    def breakdown(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for z, blob, codec in zip(pdf["z"], pdf["tile"], pdf["compression"]):
                raw = decompress(bytes(blob), codec)
                for name, layer in decode_tile(raw).items():
                    geom_b = sum(
                        len(encode_geometry(f.geom_type, f.rings)) for f in layer["features"]
                    )
                    prop_b = sum(len(f.props) * 2 for f in layer["features"])
                    rows.append((int(z), name, len(layer["features"]), geom_b, prop_b))
            yield pd.DataFrame(rows, columns=["z", "layer", "n_features", "geometry_bytes", "prop_bytes"])

    per_tile = tiles.select("z", "tile", "compression").mapInPandas(breakdown, _BREAKDOWN_SCHEMA)
    return (
        per_tile.groupBy("z", "layer")
        .agg(
            F.sum("n_features").alias("n_features"),
            F.sum("geometry_bytes").alias("geometry_bytes"),
            F.sum("prop_bytes").alias("prop_bytes"),
        )
        .orderBy("z", "layer")
    )
