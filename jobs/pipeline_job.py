#!/usr/bin/env python
"""Cluster entry point: the full north-star chain in one submission —

    crawl (WARC / pages / documents)
      -> curation funnel (C4 + Gopher + normalized dedup)   [resumable]
      -> geocode -> z0..Z tile pyramid                      [resumable]
      -> per-zoom probe statistics

Both heavy stages commit through the Iceberg-shaped lineage protocol, so
a killed job re-submitted with the same arguments resumes from the last
committed batch of WHICHEVER stage it died in: curated-corpus buckets
first, then tile batches. Stage outputs live under --workdir:

    <workdir>/curated/    keyed-resumable corpus table (+ lineage)
    <workdir>/tiles/      tile-batch-resumable pyramid table (+ lineage)

Submit:

    spark-submit --py-files dist/versatiles_rs_spark.zip \\
        jobs/pipeline_job.py --input /data/crawl_warc \\
        --workdir /data/run1 --max-zoom 14 --sample 0.9

Prints ONE JSON line: funnel metrics + tile-batch accounting + per-zoom
stats — the end-to-end evidence the north rule asks every stage to emit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--min-zoom", type=int, default=0)
    ap.add_argument("--max-zoom", type=int, default=8)
    ap.add_argument("--keep-ratio", type=float, default=1.0)
    ap.add_argument("--sample", type=float, default=1.0)
    ap.add_argument("--curate-buckets", type=int, default=8)
    ap.add_argument("--block-bits", type=int, default=6)
    ap.add_argument("--skip-c4", action="store_true")
    ap.add_argument("--skip-gopher", action="store_true")
    ap.add_argument("--skip-dedup", action="store_true")
    ap.add_argument("--normalizer", choices=["column", "pandas"], default="column")
    ap.add_argument("--neardup", choices=["none", "minhash"], default="none",
                    help="MinHash-LSH near-dup stage after normalized dedup "
                    "(same semantics as curate_job --neardup)")
    ap.add_argument("--neardup-threshold", type=float, default=0.5)
    ap.add_argument("--classifier", choices=["none", "nb"], default="none",
                    help="learned NB quality gate after dedup/near-dup "
                    "(same semantics as curate_job --classifier)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()
    if args.classifier == "nb" and args.skip_c4:
        print("--classifier nb trains on the C4 flag; "
              "it cannot combine with --skip-c4", file=sys.stderr)
        return 2

    from pyspark.sql import functions as F

    from versatiles_rs_spark.lineage import (
        convert_resumable,
        keyed_resumable,
        read_manifest,
        read_tiles,
    )
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.operators.curate import (
        curation_flags,
        curation_survivors,
        load_corpus,
    )
    from versatiles_rs_spark.operators.probe import zoom_stats
    from versatiles_rs_spark.pages.sampling import stratified_sample
    from versatiles_rs_spark.session import get_spark

    spark = get_spark(
        app_name="versatiles-pipeline",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    curated_tbl = os.path.join(args.workdir, "curated")
    tiles_tbl = os.path.join(args.workdir, "tiles")

    # ---- stage 1: curation (keyed-resumable) --------------------------
    corpus = load_corpus(spark, args.input, keep_geo=True)
    d, funnel_aggs = curation_flags(
        corpus,
        skip_c4=args.skip_c4,
        skip_gopher=args.skip_gopher,
        skip_dedup=args.skip_dedup,
        normalizer=args.normalizer,
    )
    survivors = curation_survivors(d)
    n_neardup_dropped = None
    if args.neardup != "none":
        from versatiles_rs_spark.operators.curate import neardup_stage

        survivors, n_neardup_dropped = neardup_stage(
            survivors, threshold=args.neardup_threshold
        )
    n_classifier = None
    if args.classifier == "nb":
        from versatiles_rs_spark.operators.curate import classifier_stage

        survivors = classifier_stage(d, survivors)
        n_classifier = survivors.count()
    if args.sample < 1.0:
        survivors = stratified_sample(
            survivors.withColumn("stratum", F.col("lang")),
            {},
            default_fraction=args.sample,
            key_col="doc_id",
            stratum_col="stratum",
        ).drop("stratum")
    curate_records = keyed_resumable(
        survivors, curated_tbl, n_buckets=args.curate_buckets
    )
    funnel = {k: int(v) for k, v in d.agg(*funnel_aggs).first().asDict().items()}
    if n_neardup_dropped is not None:
        funnel["n_neardup"] = funnel["n_deduped"] - n_neardup_dropped
    if n_classifier is not None:
        funnel["n_classifier"] = n_classifier
    curated_manifest = read_manifest(curated_tbl)
    n_curated = int(
        sum(b["row_count"] for b in curated_manifest["batches"].values())
    )

    # ---- stage 2: geocode + pyramid (tile-batch-resumable) ------------
    curated = read_tiles(spark, curated_tbl)
    tiles = convert_pages_to_tiles(
        curated, args.min_zoom, args.max_zoom, keep_ratio=args.keep_ratio
    )
    tile_records = convert_resumable(
        tiles, tiles_tbl, args.min_zoom, args.max_zoom, args.block_bits
    )
    tiles_manifest = read_manifest(tiles_tbl)
    n_tiles = int(sum(b["row_count"] for b in tiles_manifest["batches"].values()))

    # ---- stage 3: probe stats over the committed pyramid --------------
    stats = [
        {k: (int(v) if v is not None else None) for k, v in r.asDict().items()}
        for r in zoom_stats(read_tiles(spark, tiles_tbl)).orderBy("z").collect()
    ]

    print(json.dumps({
        "metric": "pipeline",
        "funnel": funnel,
        "curate_batches_run": len(curate_records),
        "n_curated": n_curated,
        "tile_batches_run": len(tile_records),
        "n_tiles": n_tiles,
        "zoom_stats": stats,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
