from versatiles_rs_spark.sources.readers import (  # noqa: F401
    from_color,
    from_csv,
    from_debug,
    from_directory,
    from_tile,
    read_tile_table,
)
from versatiles_rs_spark.sources.tilejson import TileJson  # noqa: F401
