#!/usr/bin/env python
"""Container inspection — the `versatiles probe` analog.

    python jobs/probe_job.py --container tiles.pmtiles [--deep] [--master local[8]]

Prints ONE JSON object: zoom range, per-zoom tile counts and byte stats
(probe.zoom_stats — the reference's scan-depth "tiles" level), plus with
``--deep`` the per-layer byte breakdown of a sampled zoom (the
"tile-contents" depth, which must decode tiles)."""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--container", required=True)
    ap.add_argument("--deep", action="store_true", help="decode tiles for per-layer byte breakdown")
    ap.add_argument(
        "--sample", type=float, default=None, metavar="PERCENT",
        help="decode only ~PERCENT%% of tiles for --deep, chosen by "
        "deterministic window sampling (probe -ddd --sample / "
        "tile_sampling.rs: contiguous square windows so container reads "
        "coalesce into ranged requests)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.sample is not None and not (0.0 < args.sample <= 100.0):
        ap.error(f"--sample must be in (0, 100], got {args.sample}")

    from versatiles_rs_spark.operators.probe import (
        layer_breakdown,
        sample_windows,
        zoom_stats,
    )
    from versatiles_rs_spark.session import get_spark
    from versatiles_rs_spark.sources import read_container

    spark = get_spark(app_name="versatiles-probe", master=args.master)
    tiles = read_container(spark, args.container)
    stats = [r.asDict() for r in zoom_stats(tiles).collect()]
    out = {
        "container": args.container,
        "zooms": sorted(int(s["z"]) for s in stats),
        "n_tiles": int(sum(s["tile_count"] for s in stats)),
        "total_bytes": int(sum(s["total_bytes"] for s in stats)),
        "per_zoom": sorted(stats, key=lambda s: s["z"]),
    }
    if args.deep:
        zmax = max(out["zooms"])
        deep_tiles = tiles.where(f"z = {zmax}")
        if args.sample is not None:
            deep_tiles = sample_windows(deep_tiles, keep_ratio=args.sample / 100.0)
            out["sample_percent"] = args.sample
        out["layer_breakdown"] = [
            r.asDict() for r in layer_breakdown(deep_tiles).collect()
        ]
    print(json.dumps(out, default=str))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
