#!/usr/bin/env python
"""Cluster entry point: resumable pages -> tile-pyramid conversion.

Submit (the north-rule deployment shape):

    python scripts/build_pyfiles.py   # -> dist/versatiles_rs_spark.zip
    spark-submit \\
        --py-files dist/versatiles_rs_spark.zip \\
        jobs/convert_job.py \\
        --input /data/pages_parquet --output /data/tiles_table \\
        --min-zoom 0 --max-zoom 14 --keep-ratio 0.7

On a cluster, omit ``--master``; spark-submit supplies it. The job is
resumable: re-submitting after a kill skips every batch already committed
to the output table's manifest (lineage.py protocol).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input",
        required=True,
        help="pages parquet (url, warc_ts, html, text, lang), documents "
        "parquet, or a directory/glob of .warc/.warc.gz archives",
    )
    ap.add_argument("--output", required=True, help="tile table root")
    ap.add_argument("--min-zoom", type=int, default=0)
    ap.add_argument("--max-zoom", type=int, default=14)
    ap.add_argument("--keep-ratio", type=float, default=1.0)
    ap.add_argument("--layer", default="pages")
    ap.add_argument("--compression", default="optimize")
    ap.add_argument("--block-bits", type=int, default=6)
    ap.add_argument(
        "--bbox", default=None, metavar="lon_min,lat_min,lon_max,lat_max",
        help="keep only tiles intersecting this box (convert.rs --bbox)",
    )
    ap.add_argument(
        "--bbox-border", type=int, default=0,
        help="extra tiles around the bbox per zoom (convert.rs --bbox-border)",
    )
    ap.add_argument("--flip-y", action="store_true", help="TMS vertical flip of output coords")
    ap.add_argument("--swap-xy", action="store_true", help="swap output rows and columns")
    ap.add_argument(
        "--tile-format", default=None, metavar="format[,quality]",
        help="re-encode raster tiles, e.g. 'jpg,80' (convert.rs --tile-format; "
        "raster containers only)",
    )
    ap.add_argument(
        "--export",
        default=None,
        help="optional servable container artifact written AFTER the resumable "
        "tile table commits: path ending .mbtiles / .pmtiles / .versatiles / "
        ".tar / .tar.gz / .tar.br",
    )
    ap.add_argument("--master", default=None, help="local[N] for testing; omit under spark-submit")
    args = ap.parse_args()

    from versatiles_rs_spark.lineage import convert_resumable, lineage_table
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.pages.extract import with_extracted_text
    from versatiles_rs_spark.session import get_spark

    spark = get_spark(app_name="versatiles-convert", master=args.master)
    import glob
    import os

    is_container = args.input.lower().endswith(
        (".mbtiles", ".pmtiles", ".versatiles", ".tar", ".tar.gz", ".tgz", ".tar.br")
    )
    is_warc = not is_container and (
        ".warc" in os.path.basename(args.input)
        or (os.path.isdir(args.input) and bool(glob.glob(os.path.join(args.input, "*.warc*"))))
    )
    if is_container:
        # container -> container conversion (the reference convert's primary
        # mode): the tile table IS the intermediate; the pages path is skipped
        from versatiles_rs_spark.sources import read_container

        src = None
    elif is_warc:
        # raw Common-Crawl archives: one task per .warc.gz, straight into
        # the same pages path (url, warc_ts, html)
        from versatiles_rs_spark.sources.warc import read_warc

        src = read_warc(spark, args.input)
    else:
        src = spark.read.parquet(args.input)
    if is_container:
        from pyspark.sql import functions as F

        tiles = read_container(spark, args.input).filter(
            (F.col("z") >= args.min_zoom) & (F.col("z") <= args.max_zoom)
        )
        return _finish(spark, args, tiles)

    cols = {f.name for f in src.schema.fields}
    if {"url", "html"} <= cols:
        from pyspark.sql import functions as F

        pages_geo = with_extracted_text(src)
        if "doc_id" not in cols:
            pages_geo = pages_geo.withColumn("doc_id", F.xxhash64("url"))
        if "lang" not in cols:
            # raw WARC archives carry no lang column: run the marker-token
            # heuristic over the extracted text (pure CASE expr, codegen)
            from versatiles_rs_spark.queries import _LANG_PRED_EXPR

            pages_geo = pages_geo.withColumn(
                "lang", F.expr(_LANG_PRED_EXPR.replace("text", "extracted_text"))
            )
    else:  # documents-shaped input: synthesize deterministic geo
        from pyspark.sql import functions as F

        from versatiles_rs_spark.pages.generator import lat_expr, lon_expr

        pages_geo = src.withColumn("lon", lon_expr(F.col("doc_id"))).withColumn(
            "lat", lat_expr(F.col("doc_id"))
        )

    tiles = convert_pages_to_tiles(
        pages_geo,
        min_zoom=args.min_zoom,
        max_zoom=args.max_zoom,
        keep_ratio=args.keep_ratio,
        layer_name=args.layer,
        compression=args.compression,
    )
    return _finish(spark, args, tiles)


def _finish(spark, args, tiles) -> int:
    """Shared tail: optional bbox / flip / swap / tile-format transforms,
    resumable write, optional container export."""
    from versatiles_rs_spark.lineage import convert_resumable, lineage_table
    from versatiles_rs_spark.operators.convert import (
        filter_tiles_bbox,
        flip_tiles_y,
        swap_tiles_xy,
    )

    if args.bbox:
        box = tuple(float(v) for v in args.bbox.split(","))
        if len(box) != 4:
            raise SystemExit("--bbox needs lon_min,lat_min,lon_max,lat_max")
        tiles = filter_tiles_bbox(tiles, box, border=args.bbox_border)
    if args.flip_y:
        tiles = flip_tiles_y(tiles)
    if args.swap_xy:
        tiles = swap_tiles_xy(tiles)
    if args.tile_format:
        from versatiles_rs_spark.operators.raster_ops import raster_image_format

        parts = args.tile_format.split(",")
        tiles = raster_image_format(
            tiles, fmt=parts[0].lower(),
            quality=int(parts[1]) if len(parts) > 1 else 85,
        )
    records = convert_resumable(tiles, args.output, args.min_zoom, args.max_zoom, args.block_bits)
    summary = {
        "batches_run": len(records),
        "rows": int(sum(r["row_count"] for r in records)),
        "bytes": int(sum(r["bytes"] for r in records)),
    }
    try:
        lt = lineage_table(spark, args.output)
        summary["batches_total"] = lt.count()
    except Exception:
        pass
    if args.export:
        # final single-node assembly of a servable container (like the
        # reference's writer stage) from the committed tile table
        from versatiles_rs_spark.lineage import read_tiles
        from versatiles_rs_spark.sources import write_container

        committed = read_tiles(spark, args.output)
        summary["export"] = {"path": args.export, **write_container(committed, args.export)}
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
