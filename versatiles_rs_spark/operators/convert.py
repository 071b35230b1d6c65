"""The convert pipeline — pages -> z0..maxz MVT tile pyramid.

Spark-first re-expression of `versatiles convert` + `from_csv`/`from_geo`
(versatiles_pipeline/src/operations/read/from_csv.rs:36, SURVEY.md §3.1):

1. geocode pages (pure Column math — lonlat_to_tile_cols),
2. explode each point to one row per zoom level (the candidate-tile flat-map
   replaces the reference's per-tile R-tree probe direction, SURVEY.md §2.6),
3. point-reduce with the deterministic drop_rate hash (reduce_points.rs:60),
4. groupBy(z,x,y) -> applyInPandas rendering deterministic MVT point tiles
   (quantize to 4096 grid, dictionary-encoded props, gzip)
   — feature_import/tile_render.rs:27-64 semantics,
5. append hilbert clustering key for locality-preserving writes.

Scale notes: steps 1-3 are shuffle-free and whole-stage-codegen'd; the only
shuffle is the groupBy(z,x,y) in step 4 (hash-partitioned, AQE-skew-split for
hot urban tiles). The zoom explosion multiplies rows by (maxz-minz+1) but the
drop_rate filter is applied *before* the shuffle, so the shuffled volume is
sum_z keep_ratio^(maxz-z) * N ≈ N/(1-keep_ratio) rather than 15N.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from versatiles_rs_spark.functions.compression import GZIP, compress
from versatiles_rs_spark.functions.mvt import (
    GEOM_POINT,
    TILE_EXTENT,
    MvtFeature,
    encode_tile,
)
from versatiles_rs_spark.operators.reduce_points import drop_rate_keep
from versatiles_rs_spark.tile_math.coords import lonlat_to_tile_cols

TILE_SCHEMA = StructType(
    [
        StructField("z", IntegerType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("format", StringType()),
        StructField("compression", StringType()),
        StructField("tile", BinaryType()),
        StructField("n_features", LongType()),
    ]
)


def assign_tiles(
    points: DataFrame,
    min_zoom: int = 0,
    max_zoom: int = 14,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """One row per (point, zoom) with tile coords. Pure Column math."""
    z = F.explode(F.sequence(F.lit(min_zoom), F.lit(max_zoom))).alias("z")
    df = points.select("*", z)
    x, y = lonlat_to_tile_cols(F.col(lon_col), F.col(lat_col), F.col("z"))
    return df.withColumn("x", x).withColumn("y", y)


def _render_point_tiles(
    layer_name: str,
    props_cols: list[str],
    compression: str,
) -> callable:
    """Build the applyInPandas group renderer. One group == one tile."""

    def render(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        zoom = float(2**z)
        # fractional tile coords -> local 4096 grid (tile_render.rs:167)
        xf = zoom * (pdf["lon"].values / 360.0 + 0.5)
        with np.errstate(divide="ignore"):
            yf = zoom * (
                0.5 - 0.5 * np.log(np.tan(pdf["lat"].values * np.pi / 360.0 + np.pi / 4.0)) / np.pi
            )
        gx = np.clip(np.floor((xf - x) * TILE_EXTENT), 0, TILE_EXTENT - 1).astype(np.int64)
        gy = np.clip(np.floor((yf - y) * TILE_EXTENT), 0, TILE_EXTENT - 1).astype(np.int64)
        ids = pdf["doc_id"].values
        order = np.argsort(ids, kind="stable")  # deterministic feature order
        feats = [
            MvtFeature(
                geom_type=GEOM_POINT,
                rings=[[(int(gx[i]), int(gy[i]))]],
                props={c: pdf[c].values[i] for c in props_cols},
                fid=int(ids[i]),
            )
            for i in order
        ]
        blob = encode_tile({layer_name: feats})
        blob = compress(blob, compression)
        return pd.DataFrame(
            {
                "z": [z],
                "x": [x],
                "y": [y],
                "format": ["mvt"],
                "compression": [compression],
                "tile": [blob],
                "n_features": [len(feats)],
            }
        )

    return render


def render_point_tiles(
    assigned: DataFrame,
    layer_name: str = "pages",
    props_cols: list[str] | None = None,
    compression: str = GZIP,
) -> DataFrame:
    """groupBy(z,x,y) -> MVT point tiles. The pipeline's single shuffle."""
    props_cols = props_cols if props_cols is not None else ["lang"]
    cols = ["z", "x", "y", "lon", "lat", "doc_id", *props_cols]
    renderer = _render_point_tiles(layer_name, props_cols, compression)
    return (
        assigned.select(*dict.fromkeys(cols))
        .groupBy("z", "x", "y")
        .applyInPandas(renderer, schema=TILE_SCHEMA)
    )


def convert_pages_to_tiles(
    pages_geo: DataFrame,
    min_zoom: int = 0,
    max_zoom: int = 14,
    keep_ratio: float = 1.0,
    layer_name: str = "pages",
    compression: str = GZIP,
    hash_flavor: str = "splitmix",
) -> DataFrame:
    """Full convert: geocoded pages -> tile pyramid DataFrame."""
    assigned = assign_tiles(pages_geo, min_zoom, max_zoom)
    reduced = drop_rate_keep(assigned, "doc_id", "z", max_zoom, keep_ratio, hash_flavor)
    return render_point_tiles(reduced, layer_name, compression=compression)


def with_hilbert_key(tiles: DataFrame) -> DataFrame:
    """Append the 64-bit Hilbert clustering key (tile_hilbert_index.rs:85)
    via a vectorized iterator-UDF; used to sort tile writes for locality."""
    from versatiles_rs_spark.tile_math.hilbert import hilbert_index_np

    out_schema = StructType(list(tiles.schema.fields) + [StructField("hilbert_id", LongType())])

    def add_key(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            hk = np.empty(len(pdf), dtype=np.int64)
            for z in np.unique(pdf["z"].values):
                m = pdf["z"].values == z
                hk[m] = hilbert_index_np(int(z), pdf["x"].values[m], pdf["y"].values[m])
            out["hilbert_id"] = hk
            yield out

    return tiles.mapInPandas(add_key, schema=out_schema)


def write_tiles(tiles: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Sink: parquet partitioned by z, hilbert-clustered within partitions —
    the Iceberg-table equivalent of the versatiles block layout
    (container/versatiles/writer.rs:207 traversal ordering)."""
    (
        with_hilbert_key(tiles)
        .repartitionByRange("z", "hilbert_id")
        .sortWithinPartitions("z", "hilbert_id")
        .write.mode(mode)
        .partitionBy("z")
        .parquet(path)
    )
