"""Multi-source tile combination: from_stacked and from_merged_vector.

- ``from_stacked`` (read/from_stacked.rs:1-16): N same-format sources,
  winner-takes-first per coordinate (no blending). Spark: union with a
  source rank + one ``row_number() over (partition by z,x,y order by rank)``
  — a single shuffle, no join tree.

- ``from_merged_vector`` (read/from_merged_vector.rs:63-199): N vector
  sources full-outer joined on coordinate, same-named layers' features
  concatenated in source order. Spark: union with rank + grouped_tile_map
  merging blobs per coordinate (the co-group).

- ``from_stacked_raster`` (read/from_stacked_raster.rs): alpha-composite in
  source order (first on top) via functions.raster.overlay.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import compress, decompress
from versatiles_rs_spark.functions.mvt import MvtFeature, decode_tile, encode_tile
from versatiles_rs_spark.functions.raster import overlay, png_decode, png_encode
from versatiles_rs_spark.operators.convert import TILE_SCHEMA, grouped_tile_map


def _ranked_union(sources: list[DataFrame]) -> DataFrame:
    parts = [df.withColumn("src_rank", F.lit(i)) for i, df in enumerate(sources)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def from_stacked(sources: list[DataFrame]) -> DataFrame:
    """Coalesce/first-non-null per coord: earliest source wins."""
    u = _ranked_union(sources)
    w = Window.partitionBy("z", "x", "y").orderBy(F.asc("src_rank"))
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "src_rank")
    )


def from_merged_vector(sources: list[DataFrame], compression: str = "gzip") -> DataFrame:
    """Merge MVT sources per coordinate: concat features of same-named
    layers in source order (merge_vector_tiles, from_merged_vector.rs:63)."""
    u = _ranked_union(sources).select(
        "z", "x", "y", "compression", "tile", "src_rank"
    )

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (z, x, y), idx in pdf.groupby(["z", "x", "y"], sort=False).indices.items():
            sub = pdf.iloc[idx].sort_values("src_rank", kind="stable")
            layers: dict[str, list[MvtFeature]] = {}
            n = 0
            extent = None
            for _, r in sub.iterrows():
                decoded = decode_tile(decompress(bytes(r["tile"]), r["compression"]))
                for name, layer in decoded.items():
                    if extent is None:
                        extent = layer["extent"]
                    elif layer["extent"] != extent:
                        raise ValueError(
                            f"extent mismatch in layer {name!r} at {(z, x, y)}"
                        )  # from_merged_vector.rs errors on extent mismatch
                    layers.setdefault(name, []).extend(layer["features"])
                    n += len(layer["features"])
            blob = compress(encode_tile(layers), compression)
            rows.append((int(z), int(x), int(y), "mvt", compression, blob, n))
        return pd.DataFrame(
            rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
        )

    return grouped_tile_map(u, body, TILE_SCHEMA)


def from_stacked_raster(sources: list[DataFrame], compression: str = "none") -> DataFrame:
    """Alpha-composite raster sources per coordinate, first source on top
    (from_stacked_raster.rs:100-171; pixel math operation.rs:84)."""
    u = _ranked_union(sources).select("z", "x", "y", "compression", "tile", "src_rank")

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (z, x, y), idx in pdf.groupby(["z", "x", "y"], sort=False).indices.items():
            # compose bottom-up: iterate sources last -> first, overlaying
            sub = pdf.iloc[idx].sort_values("src_rank", ascending=False, kind="stable")
            img = None
            for _, r in sub.iterrows():
                cur = png_decode(decompress(bytes(r["tile"]), r["compression"]))
                img = cur if img is None else overlay(img, cur)
            blob = compress(png_encode(img), compression)
            rows.append((int(z), int(x), int(y), "png", compression, blob, 0))
        return pd.DataFrame(
            rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
        )

    return grouped_tile_map(u, body, TILE_SCHEMA)
