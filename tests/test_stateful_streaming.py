"""applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.streaming.stateful import streaming_stateful_tile_stats


def test_stateful_tile_stats_accumulates_across_batches(spark, tmp_path, sf_dir):
    from versatiles_rs_spark.queries import _events_geo

    ev = _events_geo(spark, sf_dir).select("lon", "lat", "user_id", "value").limit(2000).cache()
    src = str(tmp_path / "stateful_src")
    # two files -> can arrive as separate micro-batches; state must accumulate
    ev.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_stateful_tile_stats(stream, zoom=2)
        .writeStream.format("memory")
        .queryName("stateful_tiles")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select x, y, max(n_events) as n_events, max(n_users_approx) as nu "
            "from stateful_tiles group by x, y"
        ).toPandas()
    finally:
        q.stop()

    # final accumulated counts == batch groupBy
    from versatiles_rs_spark.tile_math.coords import lonlat_to_tile_cols

    x, y = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), 2)
    want = (
        ev.withColumn("x", x).withColumn("y", y)
        .groupBy("x", "y").agg(F.count("*").alias("n_events"))
        .toPandas()
    )
    g = got.set_index(["x", "y"])["n_events"].sort_index()
    w = want.set_index(["x", "y"])["n_events"].sort_index()
    pd.testing.assert_series_equal(g, w, check_names=False)
    assert (got["nu"] >= 1).all() and (got["nu"] <= 64).all()
