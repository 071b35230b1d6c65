"""Tile-table diff — incremental-update verification.

After a re-render (new data, new code, a resumed job) the operational
question is "what changed": ``tile_diff`` full-outer-joins two tile
tables on the coordinate key and classifies every coordinate as
``same`` / ``changed`` / ``added`` / ``removed`` by content hash. One
shuffle per side on the natural (z,x,y) key; the md5 is computed before
the join so only 16-byte digests shuffle, never tile payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["z", "x", "y"]


def tile_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(z, x, y, status) for every coordinate present in either table."""
    a = old.select(*KEY, F.md5(F.col("tile")).alias("h_old"))
    b = new.select(*KEY, F.md5(F.col("tile")).alias("h_new"))
    j = a.join(b, KEY, "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") == F.col("h_new"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*KEY, status.alias("status"))


def tile_diff_summary(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-zoom counts by status — the operator's dashboard row."""
    return (
        tile_diff(old, new)
        .groupBy("z", "status")
        .agg(F.count("*").alias("n"))
    )
