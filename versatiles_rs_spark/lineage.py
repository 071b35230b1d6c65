"""Checkpointed tile writes with per-partition lineage — the resumability
contract (BASELINE.json: "per-partition lineage + row-count/byte metrics
committed ... per tile-batch snapshot; killed job resumes from last
committed snapshot").

Iceberg's catalog is not available in this container, so the same protocol
is implemented over plain parquet with an atomically-committed manifest:

    <table>/data/batch=<batch_id>/...parquet      tile rows of one batch
    <table>/_lineage/batch=<batch_id>.json        per-partition metrics
    <table>/_manifest.json                        list of committed batches
                                                  (written via tmp+rename)

A batch = one work partition of the tile pyramid (z, x_block, y_block
ranges — FIXTURES.md §7 schema). ``resume_plan`` diffs desired batches
against the manifest so a restarted driver re-runs only missing batches;
``read_tiles`` reads exactly the committed set. On a real deployment each
batch write + lineage append is one Iceberg transaction; this module keeps
that commit protocol (data first, manifest last, rename-atomic) without the
catalog.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TileBatch:
    """One resumable work unit: a zoom + tile-coordinate block."""

    z: int
    x_block: int
    y_block: int
    block_bits: int = 6  # 64x64-tile blocks, versatiles block model analog

    @property
    def batch_id(self) -> str:
        return f"z{self.z}_x{self.x_block}_y{self.y_block}"


def plan_batches(min_zoom: int, max_zoom: int, block_bits: int = 6) -> list[TileBatch]:
    """All batches of a pyramid: at zoom z there are ceil(2^z / 2^bits)^2
    blocks (1 block per zoom until 2^z > block size)."""
    out = []
    for z in range(min_zoom, max_zoom + 1):
        nblocks = max(1, 1 << max(0, z - block_bits))
        for bx in range(nblocks):
            for by in range(nblocks):
                out.append(TileBatch(z, bx, by, block_bits))
    return out


def _manifest_path(table: str) -> str:
    return os.path.join(table, "_manifest.json")


def read_manifest(table: str) -> dict:
    p = _manifest_path(table)
    if not os.path.exists(p):
        return {"batches": {}}
    with open(p) as f:
        return json.load(f)


def _commit_manifest(table: str, manifest: dict) -> None:
    tmp = _manifest_path(table) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(table))  # atomic rename = the commit


def resume_plan(table: str, batches: list[TileBatch]) -> list[TileBatch]:
    """Batches still to do: desired minus committed."""
    done = set(read_manifest(table)["batches"])
    return [b for b in batches if b.batch_id not in done]


def write_batch(table: str, batch: TileBatch, tiles: DataFrame) -> dict:
    """Write one batch's tiles + lineage, then commit it to the manifest.

    The tiles DataFrame is filtered to the batch's coordinate block here, so
    callers can pass the whole-pyramid plan and rely on partition pruning.
    Returns the lineage record."""
    shift = batch.block_bits
    part = tiles.filter(
        (F.col("z") == batch.z)
        & (F.shiftright("x", shift) == batch.x_block)
        & (F.shiftright("y", shift) == batch.y_block)
    )
    data_dir = os.path.join(table, "data", f"batch={batch.batch_id}")
    part.write.mode("overwrite").parquet(data_dir)

    spark = tiles.sparkSession
    stats = (
        spark.read.parquet(data_dir)
        .agg(
            F.count("*").alias("row_count"),
            F.coalesce(F.sum(F.length("tile")), F.lit(0)).alias("bytes"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
        .collect()[0]
        .asDict()
    )
    lineage = {
        "batch_id": batch.batch_id,
        "z": batch.z,
        "x_block": batch.x_block,
        "y_block": batch.y_block,
        **{k: (int(v) if v is not None else None) for k, v in stats.items()},
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(os.path.join(table, "_lineage"), exist_ok=True)
    with open(os.path.join(table, "_lineage", f"batch={batch.batch_id}.json"), "w") as f:
        json.dump(lineage, f, indent=1, sort_keys=True)

    manifest = read_manifest(table)
    manifest["batches"][batch.batch_id] = {
        "row_count": lineage["row_count"],
        "bytes": lineage["bytes"],
        "committed_at": lineage["committed_at"],
    }
    _commit_manifest(table, manifest)
    return lineage


def convert_resumable(
    tiles: DataFrame,
    table: str,
    min_zoom: int,
    max_zoom: int,
    block_bits: int = 6,
) -> list[dict]:
    """Run (or resume) a whole-pyramid write batch-by-batch. Re-invoking
    after a kill skips every committed batch."""
    os.makedirs(table, exist_ok=True)
    todo = resume_plan(table, plan_batches(min_zoom, max_zoom, block_bits))
    return [write_batch(table, b, tiles) for b in todo]


def read_tiles(spark: SparkSession, table: str) -> DataFrame:
    """Read exactly the committed batches (uncommitted data dirs from a
    crashed writer are invisible)."""
    manifest = read_manifest(table)
    dirs = [
        os.path.join(table, "data", f"batch={bid}")
        for bid, meta in manifest["batches"].items()
        if meta["row_count"] > 0
    ]
    if not dirs:
        raise ValueError(f"no committed batches in {table}")
    return spark.read.parquet(*dirs)


def lineage_table(spark: SparkSession, table: str) -> DataFrame:
    """The FIXTURES.md §7 lineage table as a DataFrame."""
    d = os.path.join(table, "_lineage")
    return spark.read.option("multiLine", "true").json(f"{d}/batch=*.json")
