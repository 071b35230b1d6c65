#!/usr/bin/env python
"""Cluster entry point: corpus curation (quality filters -> dedup -> sample).

The training-data counterpart to convert_job: runs the curation funnel
(C4 line/page rules -> Gopher quality signals -> normalized exact dedup ->
optional deterministic stratified sample) over a web-text corpus and
writes the surviving documents plus the per-stage funnel metrics.

Submit:

    python scripts/build_pyfiles.py   # -> dist/versatiles_rs_spark.zip
    spark-submit --py-files dist/versatiles_rs_spark.zip \\
        jobs/curate_job.py \\
        --input /data/pages_parquet --output /data/curated \\
        --sample 0.8 --stratify-by lang

Input shapes (same dispatch as convert_job): documents parquet
(doc_id, text, ...), pages parquet (url, warc_ts, html, text, lang), or
a directory of .warc/.warc.gz archives (text extracted on the fly).

Scale shape: ONE corpus pass. Every filter flag is per-row column math
(zero shuffles); the dedup adds the one window shuffle any dedup needs;
funnel metrics are collected with DataFrame.observe DURING the output
write (no second aggregation job) — the lineage-module metrics pattern.
With --resumable N the output commits through the lineage protocol in
key-hash batches instead (kill-resume + time travel), and the funnel
metrics come from one dedicated aggregate.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True, help="curated corpus parquet dir")
    ap.add_argument("--sample", type=float, default=1.0,
                    help="deterministic keep fraction applied after dedup")
    ap.add_argument("--stratify-by", default="lang",
                    help="stratum column for the sample stage")
    ap.add_argument("--skip-c4", action="store_true")
    ap.add_argument("--skip-gopher", action="store_true")
    ap.add_argument("--skip-dedup", action="store_true")
    ap.add_argument("--normalizer", choices=["column", "pandas"], default="column",
                    help="dedup normalization path: the oracle-shared JVM rule "
                    "chain or the Arrow-batched twin (identical output, faster "
                    "on string-bandwidth-bound hosts)")
    ap.add_argument("--neardup", choices=["none", "minhash"], default="none",
                    help="near-duplicate stage after normalized dedup: "
                    "MinHash-LSH banded pairs, exact-Jaccard verified, "
                    "connected-component clusters, min-doc_id keeper (the "
                    "oracle-checked filter_funnel_neardup semantics)")
    ap.add_argument("--neardup-threshold", type=float, default=0.5,
                    help="exact-Jaccard verify threshold for --neardup")
    ap.add_argument("--classifier", choices=["none", "nb"], default="none",
                    help="learned quality gate after dedup/near-dup: train "
                    "the hashed NB on the 25%% seed labeled by the C4 flag "
                    "(heuristic distillation, pages/classifier.py), drop "
                    "survivors the model predicts as failures. Training "
                    "shuffles <= 2*m bounded rows; the drop itself is a "
                    "zero-shuffle inline predicate")
    ap.add_argument(
        "--resumable", type=int, default=0, metavar="N_BUCKETS",
        help="commit the curated corpus through the lineage protocol in "
        "N_BUCKETS key-hash batches; a re-submitted job skips committed "
        "buckets (kill-resume, time travel, metadata pruning). Each bucket "
        "re-evaluates the filter plan — at scale, trade bucket count "
        "(resume granularity) against scan amplification.",
    )
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()
    if args.classifier == "nb" and args.skip_c4:
        print("--classifier nb trains on the C4 flag; "
              "it cannot combine with --skip-c4", file=sys.stderr)
        return 2

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from versatiles_rs_spark.operators.curate import (
        curation_flags,
        curation_survivors,
        load_corpus,
    )
    from versatiles_rs_spark.pages.sampling import stratified_sample
    from versatiles_rs_spark.session import get_spark

    spark = get_spark(
        app_name="versatiles-curate",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )
    corpus = load_corpus(spark, args.input)
    d, funnel_aggs = curation_flags(
        corpus,
        skip_c4=args.skip_c4,
        skip_gopher=args.skip_gopher,
        skip_dedup=args.skip_dedup,
        normalizer=args.normalizer,
    )
    if not args.resumable:
        obs = Observation("funnel")
        d = d.observe(obs, *funnel_aggs)
    survivors = curation_survivors(d)
    n_neardup_dropped = 0
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
            survivors.withColumn("stratum", F.col(args.stratify_by)),
            {},
            default_fraction=args.sample,
            stratum_col="stratum",
            key_col="doc_id",
        ).drop("stratum")

    if args.resumable:
        from versatiles_rs_spark.lineage import keyed_resumable, read_manifest

        records = keyed_resumable(survivors, args.output, n_buckets=args.resumable)
        manifest = read_manifest(args.output)
        # observe() reports only the first action's run, so under the
        # multi-batch protocol the funnel counts come from one dedicated agg
        metrics = {k: int(v) for k, v in d.agg(*funnel_aggs).first().asDict().items()}
        metrics["batches_run"] = len(records)
        metrics["n_written"] = int(
            sum(b["row_count"] for b in manifest["batches"].values())
        )
    else:
        survivors.write.mode("overwrite").parquet(args.output)
        out_n = spark.read.parquet(args.output).count()
        metrics = dict(obs.get)
        metrics["n_written"] = int(out_n)
    if args.neardup != "none":
        metrics["n_neardup"] = int(metrics["n_deduped"]) - n_neardup_dropped
    if n_classifier is not None:
        metrics["n_classifier"] = n_classifier
    print(json.dumps({"metric": "curate", **{k: int(v) for k, v in metrics.items()}}))
    with open(f"{args.output.rstrip('/')}/_funnel_metrics.json", "w") as fh:
        json.dump({k: int(v) for k, v in metrics.items()}, fh)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
