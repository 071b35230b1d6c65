#!/usr/bin/env python
"""Mosaic assembly CLI — the `versatiles mosaic assemble` analog
(mosaic_tools/assemble/mod.rs).

    python jobs/mosaic_job.py --input top.mbtiles --input base.pmtiles \
        --output merged.versatiles [--compression gzip] [--master local[8]]

Inputs are ordered TOP priority first; coordinates whose topmost
contribution is opaque forward bytes untouched (no decode/re-encode),
translucent stacks alpha-composite bottom-up (operators/mosaic.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", action="append", required=True,
        help="input container, repeatable; FIRST = top of the stack",
    )
    ap.add_argument("--output", required=True, help="output container path")
    ap.add_argument("--compression", default="none", help="output transport codec")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if len(args.input) < 2:
        ap.error("mosaic needs at least two --input containers")

    from versatiles_rs_spark.operators.mosaic import mosaic_assemble
    from versatiles_rs_spark.session import get_spark

    spark = get_spark(app_name="versatiles-mosaic", master=args.master)
    res = mosaic_assemble(spark, args.input, args.output, compression=args.compression)
    print(json.dumps({"inputs": args.input, "output": args.output, **res}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
