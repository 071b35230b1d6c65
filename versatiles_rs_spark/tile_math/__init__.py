from versatiles_rs_spark.tile_math.coords import (  # noqa: F401
    MAX_ZOOM_LEVEL,
    coord_to_geo_np,
    lonlat_to_tile_cols,
    lonlat_to_tile_np,
    mercator_fwd_np,
    mercator_inv_np,
    sort_index_col,
    sort_index_np,
    tile_geo_bbox_np,
    tile_mercator_bbox_np,
)
from versatiles_rs_spark.tile_math.hilbert import (  # noqa: F401
    hilbert_index_np,
    hilbert_to_coord_np,
    quadkey_np,
    splitmix64_np,
    splitmix64_unit_np,
    zorder_index_np,
)
