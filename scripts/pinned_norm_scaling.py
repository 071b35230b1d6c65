#!/usr/bin/env python
"""Round-5 pinned-core experiment for the regex-normalization scaling
ceiling (VERDICT r4 item 5).

Round 4 measured the dedup stage's two-regex normalization FLAT in
thread count (local[1] ~ local[8] ~ local[32] wall on 320k docs) and
attributed it to a string/allocation bandwidth ceiling on these shared
vCPUs. This script adds the attribution test that was missing: the same
isolated stage run under `taskset` pinning (JVM + Python workers
restricted to N exclusive-to-this-process vCPUs) vs unpinned, plus a
no-Spark pandas-regex multiprocessing control under the same pinning.
Pinning removes scheduler migration and self-interference between the
JVM's N task threads / GC threads and the host's other 24 vCPUs; it
cannot evict noisy neighbors (no sandbox can), which stays the honest
caveat.

Usage: python scripts/pinned_norm_scaling.py [--replicate 64] [--passes 2]
Appends a section to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SPARK_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from versatiles_rs_spark.session import get_spark
from pyspark.sql import functions as F
from versatiles_rs_spark.pages.quality_filters import normalize_text
spark = get_spark(app_name="norm-pin", master="local[{cpus}]",
                  shuffle_partitions={parts})
docs = spark.read.parquet({sf_dir!r} + "/documents.parquet").select("doc_id", "text")
r = F.explode(F.sequence(F.lit(0), F.lit({replicate} - 1))).alias("r")
docs = docs.select("doc_id", "text", r).select(
    (F.col("doc_id") * {replicate} + F.col("r")).alias("doc_id"), "text")
docs = docs.repartition({parts}).persist()
docs.count()  # materialize input so ONLY the regex stage is timed
t0 = time.time()
n = docs.select(F.md5(F.expr(normalize_text("text"))).alias("h")).agg(
    F.count(F.col("h"))).first()[0]
print("ELAPSED", time.time() - t0, n)
spark.stop()
"""

_MP_CHILD = r"""
import sys, time
import pandas as pd, pyarrow.parquet as pq
import multiprocessing as mp

def work(texts):
    s = pd.Series(texts)
    out = s.str.lower().str.replace(r"[^0-9a-z ]", "", regex=True)
    return out.str.replace(r" +", " ", regex=True).str.strip().str.len().sum()

if __name__ == "__main__":
    sf_dir, replicate, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    texts = pq.read_table(sf_dir + "/documents.parquet", columns=["text"])["text"].to_pylist()
    texts = texts * replicate
    chunks = [texts[i::nproc * 4] for i in range(nproc * 4)]
    with mp.Pool(nproc) as pool:
        pool.map(work, chunks[:nproc])  # warm the pool
        t0 = time.time()
        total = sum(pool.map(work, chunks))
        print("ELAPSED", time.time() - t0, total)
"""


def _run(cmd: list[str]) -> float:
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         env=dict(os.environ, PYTHONPATH=REPO), timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    for line in out.stdout.splitlines():
        if line.startswith("ELAPSED"):
            return float(line.split()[1])
    raise RuntimeError(f"no ELAPSED line in: {out.stdout[-500:]}")


def spark_run(cpus: int, pin: str | None, sf_dir: str, replicate: int) -> float:
    code = _SPARK_CHILD.format(repo=REPO, cpus=cpus, parts=max(cpus * 2, 8),
                               sf_dir=sf_dir, replicate=replicate)
    cmd = [sys.executable, "-c", code]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    return _run(cmd)


def mp_run(nproc: int, pin: str | None, sf_dir: str, replicate: int) -> float:
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_MP_CHILD)
        path = f.name
    cmd = [sys.executable, path, sf_dir, str(replicate), str(nproc)]
    if pin:
        cmd = ["taskset", "-c", pin] + cmd
    try:
        return _run(cmd)
    finally:
        os.unlink(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=64)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-append", action="store_true")
    args = ap.parse_args()

    # (label, runner, n, pin): pin "0-7" = 8 exclusive-to-us vCPUs
    cells = [
        ("spark8_unpinned", "spark", 8, None),
        ("spark8_pinned", "spark", 8, "0-7"),
        ("spark32_unpinned", "spark", 32, None),
        ("mp8_unpinned", "mp", 8, None),
        ("mp8_pinned", "mp", 8, "0-7"),
        ("mp32_unpinned", "mp", 32, None),
    ]
    samples: dict[str, list[float]] = {k: [] for k, *_ in cells}
    for p in range(args.passes):
        for label, kind, n, pin in cells:
            fn = spark_run if kind == "spark" else mp_run
            dt = fn(n, pin, args.sf_dir, args.replicate)
            samples[label].append(round(dt, 2))
            print(f"pass {p} {label}: {dt:.2f}s", file=sys.stderr)

    best = {k: min(v) for k, v in samples.items()}
    summary = {
        "metric": "pinned_norm_scaling",
        "samples": samples,
        "best": best,
        "pin_effect_spark8": round(best["spark8_pinned"] / best["spark8_unpinned"], 3),
        "pin_effect_mp8": round(best["mp8_pinned"] / best["mp8_unpinned"], 3),
        "spark_8to32": round(best["spark8_unpinned"] / best["spark32_unpinned"] / 4, 3),
        "mp_8to32": round(best["mp8_unpinned"] / best["mp32_unpinned"] / 4, 3),
    }
    if not args.no_append:
        lines = [
            "",
            "## Pinned-core regex-normalization evidence (round 5, "
            "`scripts/pinned_norm_scaling.py`)",
            "",
            f"Isolated dedup-stage normalization (two regexp_replace + md5 "
            f"agg) on {args.replicate}x-replicated sf{args.sf_dir.rstrip('/').split('sf')[-1]} "
            f"documents; `taskset -c 0-7` pins the whole process tree "
            f"(JVM task+GC threads and Python workers) to 8 vCPUs that no "
            f"other thread of OURS touches. Per-pass seconds:",
            "",
            "| cell | passes | best |",
            "|---|---|---|",
        ]
        for k, v in samples.items():
            lines.append(f"| {k} | {', '.join(f'{x:.2f}' for x in v)} | {min(v):.2f} |")
        lines += [
            "",
            f"Pinning effect at 8 cores: Spark {summary['pin_effect_spark8']}x, "
            f"no-Spark pandas control {summary['pin_effect_mp8']}x "
            f"(1.0 = no change; <1 = pinning helps). 8->32 efficiency: "
            f"Spark {summary['spark_8to32']}, control {summary['mp_8to32']}. "
            f"JVM-vs-control wall ratio at 8 cores: "
            f"{round(best['spark8_unpinned'] / best['mp8_unpinned'], 1)}x.",
            "",
            "(Interpretation template — see the round-5 section committed "
            "above for the measured reading: pinning ~no-op rules out "
            "migration; the control doing identical regex work ~20x faster "
            "and scaling near the hardware ceiling localizes the flat term "
            "INSIDE the JVM regex/allocation path, making the pandas twin "
            "the structural fix rather than a box-specific workaround.)",
        ]
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
            fh.write("\n".join(lines) + "\n")
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
