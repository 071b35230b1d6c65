from versatiles_rs_spark.streaming.tiling import (  # noqa: F401
    streaming_tile_counts,
    streaming_windowed_tile_stats,
)
