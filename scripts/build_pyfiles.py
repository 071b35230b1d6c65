#!/usr/bin/env python
"""Package versatiles_rs_spark into dist/versatiles_rs_spark.zip for
``spark-submit --py-files``."""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "versatiles_rs_spark.zip")
    pkg = os.path.join(ROOT, "versatiles_rs_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    print(out)
    return out


if __name__ == "__main__":
    main()
