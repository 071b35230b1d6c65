"""Read operators (VPL read-op registry analog, SURVEY.md §2.1).

Container formats collapse in the Spark world: the tiles *table* (parquet /
Iceberg, partitioned by z, hilbert-clustered) replaces
.versatiles/.mbtiles/.pmtiles; foreign-container ingest is a one-time
conversion outside this engine. What remains as first-class sources:

- ``read_tile_table``   : the container reader (from_container analog)
- ``from_directory``    : z/x/y.ext file trees via binaryFile + path regex
  (container/directory/reader.rs, tar/reader.rs)
- ``from_csv``          : lon/lat CSV -> point tile pyramid (from_csv.rs:36)
- ``from_color``        : solid-color synthesized tiles (from_color.rs)
- ``from_tile``         : one blob replicated to every coord (from_tile.rs)
- ``from_debug``        : tiles that display their own coordinate
  (from_debug/vector.rs)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.mvt import GEOM_POINT, MvtFeature, encode_tile
from versatiles_rs_spark.functions.raster import png_encode


def read_tile_table(spark: SparkSession, path: str) -> DataFrame:
    """Open the engine's tile table (partition pruning on z comes free)."""
    return spark.read.parquet(path)


def from_directory(spark: SparkSession, root: str, ext: str = "png") -> DataFrame:
    """Enumerate <root>/z/x/y.<ext> files as tile rows. The binaryFile source
    lists and reads in parallel; coordinates parse from the path — the
    directory/tar reader equivalent."""
    df = spark.read.format("binaryFile").load(f"{root}/*/*/*.{ext}")
    rx = r"^.*/(\d+)/(\d+)/(\d+)\.\w+$"
    return df.select(
        F.regexp_extract("path", rx, 1).cast("int").alias("z"),
        F.regexp_extract("path", rx, 2).cast("bigint").alias("x"),
        F.regexp_extract("path", rx, 3).cast("bigint").alias("y"),
        F.lit(ext).alias("format"),
        F.lit("none").alias("compression"),
        F.col("content").alias("tile"),
        F.lit(0).cast("bigint").alias("n_features"),
    )


def write_directory(tiles: DataFrame, root: str) -> None:
    """Directory-writer analog: one file per tile under z/x/y.<format>.
    Executed per partition (no driver collect)."""

    def dump(rows):
        import os

        for r in rows:
            d = os.path.join(root, str(r["z"]), str(r["x"]))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, f"{r['y']}.{r['format']}"), "wb") as f:
                f.write(bytes(r["tile"]))

    tiles.foreachPartition(dump)


def from_csv(
    spark: SparkSession,
    path: str,
    lon_col: str = "longitude",
    lat_col: str = "latitude",
    id_col: str | None = None,
    min_zoom: int = 0,
    max_zoom: int = 14,
    layer_name: str = "points",
    props_cols: list[str] | None = None,
    keep_ratio: float = 1.0,
) -> DataFrame:
    """CSV with lon/lat columns -> MVT point tile pyramid (from_csv.rs:36
    semantics: auto zoom <= 14, point thinning via drop_rate)."""
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles

    df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    did = F.col(id_col) if id_col else F.monotonically_increasing_id()
    props = props_cols or []
    pts = df.select(
        did.cast("bigint").alias("doc_id"),
        F.col(lon_col).cast("double").alias("lon"),
        F.col(lat_col).cast("double").alias("lat"),
        *[F.col(c).cast("string").alias(c) for c in props],
    )
    return convert_pages_to_tiles(
        pts, min_zoom, max_zoom, keep_ratio=keep_ratio, layer_name=layer_name,
        props_cols=props,
    )


def _coords_df(spark: SparkSession, min_zoom: int, max_zoom: int) -> DataFrame:
    """All (z, x, y) of a full pyramid as a DataFrame — generated
    distributed (sequence+explode), not on the driver."""
    zs = spark.range(min_zoom, max_zoom + 1).select(F.col("id").cast("int").alias("z"))
    side = F.pow(F.lit(2.0), F.col("z").cast("double")).cast("bigint")
    xs = zs.select("z", F.explode(F.sequence(F.lit(0).cast("bigint"), side - 1)).alias("x"))
    return xs.select("z", "x", F.explode(F.sequence(F.lit(0).cast("bigint"), side - 1)).alias("y"))


def from_color(
    spark: SparkSession,
    rgba: tuple[int, int, int, int],
    min_zoom: int = 0,
    max_zoom: int = 4,
    size: int = 256,
) -> DataFrame:
    """Solid-color tiles for every coord (from_color.rs): one PNG encoded
    once, cross-joined to the coordinate range."""
    import numpy as np

    img = np.empty((size, size, 4), np.uint8)
    img[:, :] = rgba
    blob = png_encode(img)
    return _coords_df(spark, min_zoom, max_zoom).select(
        "z", "x", "y",
        F.lit("png").alias("format"),
        F.lit("none").alias("compression"),
        F.lit(bytearray(blob)).alias("tile"),
        F.lit(0).cast("bigint").alias("n_features"),
    )


def from_tile(
    spark: SparkSession, blob: bytes, fmt: str, min_zoom: int = 0, max_zoom: int = 4
) -> DataFrame:
    """One tile blob replicated across the pyramid (from_tile.rs)."""
    return _coords_df(spark, min_zoom, max_zoom).select(
        "z", "x", "y",
        F.lit(fmt).alias("format"),
        F.lit("none").alias("compression"),
        F.lit(bytearray(blob)).alias("tile"),
        F.lit(0).cast("bigint").alias("n_features"),
    )


def from_debug(spark: SparkSession, min_zoom: int = 0, max_zoom: int = 4) -> DataFrame:
    """Vector debug tiles: each tile carries one feature whose props are its
    own coordinate (from_debug/vector.rs)."""
    from collections.abc import Iterator

    import pandas as pd

    from versatiles_rs_spark.operators.convert import TILE_SCHEMA

    def render(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                f = MvtFeature(
                    GEOM_POINT,
                    [[(2048, 2048)]],
                    {"z": int(r["z"]), "x": int(r["x"]), "y": int(r["y"])},
                    fid=0,
                )
                blob = encode_tile({"debug": [f]})
                rows.append((int(r["z"]), int(r["x"]), int(r["y"]), "mvt", "none", blob, 1))
            yield pd.DataFrame(
                rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
            )

    return _coords_df(spark, min_zoom, max_zoom).mapInPandas(render, TILE_SCHEMA)
