from versatiles_rs_spark.sources.readers import (  # noqa: F401
    from_color,
    from_csv,
    from_debug,
    from_directory,
    from_tile,
    read_tile_table,
)
from versatiles_rs_spark.sources.tilejson import TileJson  # noqa: F401


def read_container(spark, path: str):
    """Dispatch a container path by extension — the container_registry.rs:85
    analog: .mbtiles / .pmtiles / .versatiles / parquet tile table /
    tile directory."""
    low = path.lower()
    if low.endswith(".mbtiles"):
        from versatiles_rs_spark.sources.mbtiles import read_mbtiles

        return read_mbtiles(spark, path)
    if low.endswith(".pmtiles"):
        from versatiles_rs_spark.sources.pmtiles import read_pmtiles

        return read_pmtiles(spark, path)
    if low.endswith(".versatiles"):
        from versatiles_rs_spark.sources.versatiles_file import read_versatiles

        return read_versatiles(spark, path)
    if low.endswith((".tar", ".tar.gz", ".tgz", ".tar.br")):
        from versatiles_rs_spark.sources.tar_reader import read_tar

        return read_tar(spark, path)
    return read_tile_table(spark, path)


def normalize_tile_compression(tiles, codec: str):
    """Recompress every tile to one transport codec — container formats
    declare a single file-wide compression, but the convert pipeline's
    ``optimize`` mode picks per-tile codecs."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark.operators.raster_ops import raster_format

    mixed = tiles.select("compression").distinct().count() > 1
    if not mixed and tiles.filter(F.col("compression") != codec).limit(1).count() == 0:
        return tiles
    return raster_format(tiles, None, default=codec)


def write_container(tiles, path: str, metadata: dict | None = None) -> dict:
    """Dispatch a container export by extension (mbtiles/pmtiles/versatiles);
    any other path writes the parquet tile table. Mixed per-tile compression
    is normalized first (gzip for vector tiles, uncompressed otherwise)."""
    low = path.lower()
    if low.endswith((".mbtiles", ".pmtiles", ".versatiles")):
        first = tiles.select("format").first()
        if first is not None:
            codec = "gzip" if first["format"] == "mvt" else "none"
            tiles = normalize_tile_compression(tiles, codec)
    if low.endswith(".mbtiles"):
        from versatiles_rs_spark.sources.mbtiles import write_mbtiles

        return write_mbtiles(tiles, path, metadata=metadata)
    if low.endswith(".pmtiles"):
        from versatiles_rs_spark.sources.pmtiles import write_pmtiles

        return write_pmtiles(tiles, path, metadata=metadata)
    if low.endswith(".versatiles"):
        from versatiles_rs_spark.sources.versatiles_file import write_versatiles

        return write_versatiles(tiles, path, tilejson=metadata)
    if low.endswith((".tar", ".tar.gz", ".tgz", ".tar.br")):
        from versatiles_rs_spark.sources.tar_reader import write_tar

        return write_tar(tiles, path)
    tiles.write.mode("overwrite").partitionBy("z").parquet(path)
    return {"tiles": -1, "format": "parquet"}


def container_tilejson(path: str) -> dict:
    """Container-dispatched TileJSON metadata — the per-source
    ``/tiles/{id}/tiles.json`` payload of the reference server
    (versatiles/src/server/sources). mbtiles merges its metadata table;
    pmtiles merges the header-derived fields with the JSON metadata blob;
    versatiles returns the embedded (compressed) TileJSON."""
    low = path.lower()
    if low.endswith(".mbtiles"):
        from versatiles_rs_spark.sources.mbtiles import mbtiles_tilejson

        return mbtiles_tilejson(path)
    if low.endswith(".pmtiles"):
        import json as _json

        from versatiles_rs_spark.sources.pmtiles import (
            _internal_decompress,
            read_pmtiles_header,
        )

        head = read_pmtiles_header(path)
        tj: dict = {"tilejson": "3.0.0"}
        moff, mlen = head["meta"]
        if mlen:
            from versatiles_rs_spark.sources.ranged_io import open_ranged

            with open_ranged(path) as f:
                f.seek(moff)
                blob = _internal_decompress(f.read(mlen), head["internal_compression"])
            try:
                tj.update(_json.loads(blob.decode("utf-8")))
            except ValueError:
                pass
        tj.setdefault("format", head["tile_type"])
        tj.setdefault("minzoom", int(head["zoom_min"]))
        tj.setdefault("maxzoom", int(head["zoom_max"]))
        tj.setdefault("bounds", head["bbox"])
        return tj
    if low.endswith(".versatiles"):
        from versatiles_rs_spark.sources.versatiles_file import read_versatiles_header

        head = read_versatiles_header(path)
        tj = dict(head.get("tilejson") or {"tilejson": "3.0.0"})
        tj.setdefault("format", head.get("format"))
        return tj
    raise ValueError(f"TileJSON needs a binary container, got {path!r}")


def lookup_tile(path: str, z: int, x: int, y: int,
                accepted: list[str] | None = None):
    """Container-dispatched point lookup — the `versatiles serve` tile
    handler analog: O(1)/O(log n) index seeks, never a scan, no Spark
    session needed. Returns (tile_bytes, compression) or None; ``accepted``
    applies optimize_compression (Accept-Encoding semantics)."""
    low = path.lower()
    if low.endswith(".mbtiles"):
        from versatiles_rs_spark.sources.mbtiles import lookup_tile as lk
    elif low.endswith(".pmtiles"):
        from versatiles_rs_spark.sources.pmtiles import lookup_tile as lk
    elif low.endswith(".versatiles"):
        from versatiles_rs_spark.sources.versatiles_file import lookup_tile as lk
    else:
        raise ValueError(f"point lookup needs a binary container, got {path!r}")
    return lk(path, z, x, y, accepted=accepted)
