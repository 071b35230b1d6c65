"""Checkpointed tile writes with per-partition lineage — the resumability
contract (BASELINE.json: "per-partition lineage + row-count/byte metrics
committed ... per tile-batch snapshot; killed job resumes from last
committed snapshot").

Iceberg's catalog is not available in this container, so the same table
format *shape* is implemented over plain parquet — snapshot log, manifest
of data files with per-file statistics, atomic commit pointer:

    <table>/data/batch=<batch_id>/*.parquet   tile rows of one batch
    <table>/_lineage/batch=<batch_id>.json    per-batch + per-FILE metrics
    <table>/_snapshots/v<N>.json              snapshot N: parent pointer,
                                              operation summary, data-file
                                              manifest (path, rows, bytes,
                                              z/x/y bounds per file)
    <table>/_manifest.json                    commit pointer: committed
                                              batches + current snapshot id
                                              (written via tmp+rename)

The protocol mirrors Iceberg's commit semantics: data files first, then
the immutable snapshot file, then the single atomic pointer swap — a
writer killed at any step leaves the table readable at its previous
snapshot, and orphaned data/snapshot files are invisible. Each batch
commit = one snapshot, so ``read_tiles(..., as_of=N)`` time-travels to any
earlier state, and ``plan_files`` prunes data files from manifest-recorded
z/x/y bounds WITHOUT opening them (Iceberg-style metadata pruning — at
100 TB the driver plans from kilobytes of manifests, never from the data).

Batch stats ride on ``DataFrame.observe``: the counters are collected by
the SAME Spark job that writes the files (no read-back aggregation job),
and per-file stats come from the parquet footers (pyarrow metadata, no
row reads).

Concurrency contract: SINGLE WRITER (the Spark driver is the committer,
exactly like the reference's one convert process) — the manifest swap is
a read-modify-rename, so two concurrent writers could drop each other's
batch entry. Multi-writer needs a compare-and-swap on the manifest (a
conditional put on object stores); readers are always safe at any
committed snapshot.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
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
        return {"batches": {}, "current_snapshot": 0}
    with open(p) as f:
        m = json.load(f)
    m.setdefault("current_snapshot", len(m["batches"]))
    return m


def _commit_manifest(table: str, manifest: dict) -> None:
    tmp = _manifest_path(table) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(table))  # atomic rename = the commit


def resume_plan(table: str, batches: list[TileBatch]) -> list[TileBatch]:
    """Batches still to do: desired minus committed."""
    done = set(read_manifest(table)["batches"])
    return [b for b in batches if b.batch_id not in done]


def _file_stats(data_dir: str) -> list[dict]:
    """Per-data-file statistics straight from the parquet footers: row
    count, on-disk size, and z/x/y min/max — the manifest entries pruning
    plans from. No row is read."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(data_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(data_dir, name)
        md = pq.ParquetFile(path).metadata
        bounds: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                cname = col.path_in_schema
                if cname in ("z", "x", "y") and col.statistics is not None:
                    lo, hi = col.statistics.min, col.statistics.max
                    if cname in bounds:
                        bounds[cname] = [min(bounds[cname][0], lo), max(bounds[cname][1], hi)]
                    else:
                        bounds[cname] = [lo, hi]
        out.append(
            {
                "path": path,
                "rows": md.num_rows,
                "file_bytes": os.path.getsize(path),
                **{f"{c}_min": bounds[c][0] for c in bounds},
                **{f"{c}_max": bounds[c][1] for c in bounds},
            }
        )
    return out


def _read_snapshot(table: str, sid: int) -> dict:
    with open(os.path.join(table, "_snapshots", f"v{sid}.json")) as f:
        return json.load(f)


def write_batch(table: str, batch: TileBatch, tiles: DataFrame) -> dict:
    """Write one batch's tiles, then commit data files + lineage + a new
    snapshot, then swap the manifest pointer (in that order — a kill at
    any point leaves the previous snapshot intact).

    The tiles DataFrame is filtered to the batch's coordinate block here,
    so callers can pass the whole-pyramid plan and rely on partition
    pruning. Batch metrics are observed DURING the write job (no read-back
    aggregation); per-file metrics come from the parquet footers.
    Returns the lineage record."""
    shift = batch.block_bits
    obs = Observation()
    part = tiles.filter(
        (F.col("z") == batch.z)
        & (F.shiftright("x", shift) == batch.x_block)
        & (F.shiftright("y", shift) == batch.y_block)
    ).observe(
        obs,
        F.count(F.lit(1)).alias("row_count"),
        F.coalesce(F.sum(F.length("tile")), F.lit(0)).alias("bytes"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )
    data_dir = os.path.join(table, "data", f"batch={batch.batch_id}")
    part.write.mode("overwrite").parquet(data_dir)
    stats = obs.get
    return _commit_batch(
        table,
        batch.batch_id,
        data_dir,
        stats,
        extra_lineage={"z": batch.z, "x_block": batch.x_block, "y_block": batch.y_block},
    )


def _commit_batch(
    table: str,
    batch_id: str,
    data_dir: str,
    stats: dict,
    extra_lineage: dict | None = None,
) -> dict:
    """The shared commit tail: data files -> lineage record -> snapshot ->
    atomic manifest swap (a kill at any point leaves the previous snapshot
    intact). Used by the tile-batch writer and the key-batch writer."""
    files = _file_stats(data_dir)
    lineage = {
        "batch_id": batch_id,
        **(extra_lineage or {}),
        **{k: (int(v) if v is not None else None) for k, v in stats.items()},
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "n_files": len(files),
        "files": files,
    }
    os.makedirs(os.path.join(table, "_lineage"), exist_ok=True)
    with open(os.path.join(table, "_lineage", f"batch={batch_id}.json"), "w") as f:
        json.dump(lineage, f, indent=1, sort_keys=True)

    manifest = read_manifest(table)
    parent = manifest["current_snapshot"]
    sid = parent + 1
    snapshot = {
        "snapshot_id": sid,
        "parent_id": parent if parent > 0 else None,
        "operation": "append",
        "batch_id": batch_id,
        "committed_at": lineage["committed_at"],
        "summary": {
            "added_rows": lineage["row_count"],
            "added_tile_bytes": lineage["bytes"],
            "added_files": len(files),
        },
        "files": files,
        "removed": [],
    }
    os.makedirs(os.path.join(table, "_snapshots"), exist_ok=True)
    snap_tmp = os.path.join(table, "_snapshots", f"v{sid}.json.tmp")
    with open(snap_tmp, "w") as f:
        json.dump(snapshot, f, indent=1, sort_keys=True)
    os.replace(snap_tmp, os.path.join(table, "_snapshots", f"v{sid}.json"))

    manifest["batches"][batch_id] = {
        "row_count": lineage["row_count"],
        "bytes": lineage["bytes"],
        "committed_at": lineage["committed_at"],
        "snapshot_id": sid,
    }
    manifest["current_snapshot"] = sid
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


@dataclass(frozen=True)
class KeyBatch:
    """One resumable work unit of a keyed (non-tile) table: a stable hash
    bucket of the key column — the doc-corpus analog of TileBatch."""

    bucket: int
    n_buckets: int

    @property
    def batch_id(self) -> str:
        return f"k{self.bucket}of{self.n_buckets}"


def plan_key_batches(n_buckets: int) -> list[KeyBatch]:
    return [KeyBatch(b, n_buckets) for b in range(n_buckets)]


def write_key_batch(
    table: str,
    batch: KeyBatch,
    df: DataFrame,
    key_col: str = "doc_id",
    bytes_col: str = "text",
) -> dict:
    """Write one hash bucket of a keyed table with the same commit
    protocol as write_batch: bucket = pmod(xxhash64(key), n) is stable
    across runs, so a resumed job re-derives identical buckets."""
    obs = Observation()
    part = df.filter(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(batch.n_buckets)) == batch.bucket
    ).observe(
        obs,
        F.count(F.lit(1)).alias("row_count"),
        F.coalesce(F.sum(F.length(bytes_col)), F.lit(0)).alias("bytes"),
    )
    data_dir = os.path.join(table, "data", f"batch={batch.batch_id}")
    part.write.mode("overwrite").parquet(data_dir)
    return _commit_batch(
        table,
        batch.batch_id,
        data_dir,
        obs.get,
        extra_lineage={"bucket": batch.bucket, "n_buckets": batch.n_buckets},
    )


def keyed_resumable(
    df: DataFrame,
    table: str,
    n_buckets: int = 16,
    key_col: str = "doc_id",
    bytes_col: str = "text",
) -> list[dict]:
    """Run (or resume) a keyed-table write bucket-by-bucket — the
    curation-pipeline counterpart of convert_resumable. Refuses to resume
    a table committed with a different bucket count (the bucket->batch
    mapping would no longer line up and rows would duplicate)."""
    os.makedirs(table, exist_ok=True)
    done = set(read_manifest(table)["batches"])
    stale = {b for b in done if b.startswith("k") and not b.endswith(f"of{n_buckets}")}
    if stale:
        raise ValueError(
            f"{table} has batches {sorted(stale)} from a different n_buckets; "
            f"resume must reuse the original bucket count"
        )
    todo = resume_plan(table, plan_key_batches(n_buckets))
    return [write_key_batch(table, b, df, key_col, bytes_col) for b in todo]


def plan_files(
    table: str,
    as_of: int | None = None,
    z: tuple[int, int] | None = None,
    x: tuple[int, int] | None = None,
    y: tuple[int, int] | None = None,
) -> list[dict]:
    """Data files of snapshot ``as_of`` (default: current), pruned by the
    manifest-recorded per-file z/x/y bounds. Metadata-only: the plan is
    built from kilobytes of JSON, no parquet footer or row is touched."""
    manifest = read_manifest(table)
    current = manifest["current_snapshot"]
    sid = current if as_of is None else as_of
    if sid > current:
        raise ValueError(f"snapshot {sid} does not exist (current is {current})")
    min_snap = manifest.get("min_snapshot", 1)
    if as_of is not None and sid < min_snap and sid != current:
        raise ValueError(
            f"snapshot {sid} expired (oldest retained is {min_snap}); "
            "its data files may have been garbage-collected"
        )
    files_by_path: dict[str, dict] = {}
    for s in range(1, sid + 1):
        snap = _read_snapshot(table, s)
        for path in snap.get("removed", []):
            files_by_path.pop(path, None)
        for f in snap["files"]:
            files_by_path[f["path"]] = f
    files = list(files_by_path.values())

    def keep(f: dict) -> bool:
        for name, rng in (("z", z), ("x", x), ("y", y)):
            if rng is None:
                continue
            lo, hi = f.get(f"{name}_min"), f.get(f"{name}_max")
            if lo is None or hi < rng[0] or lo > rng[1]:
                return False
        return True

    return [f for f in files if f["rows"] > 0 and keep(f)]


def read_tiles(
    spark: SparkSession,
    table: str,
    as_of: int | None = None,
    z: tuple[int, int] | None = None,
    x: tuple[int, int] | None = None,
    y: tuple[int, int] | None = None,
) -> DataFrame:
    """Read exactly the committed files (uncommitted data from a crashed
    writer is invisible). ``as_of`` time-travels to an earlier snapshot;
    z/x/y ranges prune files from manifest stats before Spark opens any."""
    files = plan_files(table, as_of=as_of, z=z, x=x, y=y)
    if not files:
        raise ValueError(f"no committed data in {table} for the requested slice")
    # mergeSchema: after an ADD-COLUMN merge commit, untouched buckets
    # keep their original files — the union schema applies, old rows NULL
    return spark.read.option("mergeSchema", "true").parquet(*[f["path"] for f in files])


def compact_batch(
    spark: SparkSession, table: str, batch_id: str, target_files: int = 1
) -> dict:
    """Rewrite one batch's data files into ``target_files`` larger ones and
    commit the rewrite as a REPLACE snapshot (Iceberg's rewrite_data_files
    analog). Readers at the current snapshot see the compacted files;
    earlier snapshots still see the originals until they are expired —
    the commit order (write data, write snapshot, swap pointer) keeps a
    crash at any step readable."""
    manifest = read_manifest(table)
    if batch_id not in manifest["batches"]:
        raise ValueError(f"unknown batch {batch_id!r}")
    current_files = {f["path"]: f for f in plan_files(table)}

    def _belongs(path: str) -> bool:
        # Match on a whole directory component: batch=b1 must not sweep
        # batch=b10 (prefix collision), but batch=b1_r<sid> rewrite dirs
        # produced by earlier compactions of this SAME batch do belong.
        for part in path.split(os.sep):
            if part == f"batch={batch_id}" or part.startswith(f"batch={batch_id}_r"):
                return True
        return False

    old = [f for f in current_files.values() if _belongs(f["path"])]
    if not old:
        raise ValueError(f"batch {batch_id!r} has no live files")
    sid = manifest["current_snapshot"] + 1
    out_dir = os.path.join(table, "data", f"batch={batch_id}_r{sid}")
    df = spark.read.parquet(*[f["path"] for f in old])
    df.coalesce(target_files).write.mode("overwrite").parquet(out_dir)
    files = _file_stats(out_dir)
    snapshot = {
        "snapshot_id": sid,
        "parent_id": manifest["current_snapshot"],
        "operation": "replace",
        "batch_id": batch_id,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "summary": {
            "added_rows": sum(f["rows"] for f in files),
            "added_tile_bytes": 0,
            "added_files": len(files),
            "removed_files": len(old),
        },
        "files": files,
        "removed": [f["path"] for f in old],
    }
    snap_tmp = os.path.join(table, "_snapshots", f"v{sid}.json.tmp")
    with open(snap_tmp, "w") as f:
        json.dump(snapshot, f, indent=1, sort_keys=True)
    os.replace(snap_tmp, os.path.join(table, "_snapshots", f"v{sid}.json"))
    manifest["current_snapshot"] = sid
    _commit_manifest(table, manifest)
    return {"snapshot_id": sid, "files_before": len(old), "files_after": len(files)}


def expire_snapshots(table: str, keep_last: int = 1) -> dict:
    """Garbage-collect history: keep the last ``keep_last`` snapshots
    readable, physically delete data files only referenced by older ones
    (files added then removed before the retention horizon). Snapshot
    JSONs are kept — they are kilobytes and the add/remove replay needs
    them — but expired ``as_of`` reads fail fast via ``min_snapshot``."""
    manifest = read_manifest(table)
    current = manifest["current_snapshot"]
    horizon = max(1, current - keep_last + 1)
    old_min = manifest.get("min_snapshot", 1)
    if horizon <= old_min:
        return {"deleted_files": 0, "min_snapshot": old_min}
    # replay up to the horizon: anything removed by then is dead in every
    # retained snapshot
    added: dict[str, int] = {}
    dead: list[str] = []
    for s in range(1, horizon + 1):
        snap = _read_snapshot(table, s)
        for path in snap.get("removed", []):
            if path in added:
                dead.append(path)
                del added[path]
        for f in snap["files"]:
            added[f["path"]] = s
    deleted = 0
    for path in dead:
        if os.path.exists(path):
            os.remove(path)
            deleted += 1
    manifest["min_snapshot"] = horizon
    _commit_manifest(table, manifest)
    return {"deleted_files": deleted, "min_snapshot": horizon}


def snapshots_table(spark: SparkSession, table: str) -> DataFrame:
    """Snapshot history (id, parent, operation, summary) as a DataFrame —
    the Iceberg ``.snapshots`` metadata-table analog."""
    current = read_manifest(table)["current_snapshot"]
    rows = []
    for s in range(1, current + 1):
        snap = _read_snapshot(table, s)
        rows.append(
            (
                snap["snapshot_id"],
                snap["parent_id"],
                snap["operation"],
                snap["batch_id"],
                snap["committed_at"],
                snap["summary"]["added_rows"],
                snap["summary"]["added_tile_bytes"],
                snap["summary"]["added_files"],
            )
        )
    return spark.createDataFrame(
        rows,
        "snapshot_id long, parent_id long, operation string, batch_id string, "
        "committed_at string, added_rows long, added_tile_bytes long, added_files long",
    )


def lineage_table(spark: SparkSession, table: str) -> DataFrame:
    """The FIXTURES.md §7 lineage table as a DataFrame."""
    d = os.path.join(table, "_lineage")
    return spark.read.option("multiLine", "true").json(f"{d}/batch=*.json")


def merge_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    key_col: str = "doc_id",
    deletes: DataFrame | None = None,
) -> dict:
    """Copy-on-write MERGE (Iceberg ``MERGE INTO`` analog) on a keyed
    table written by ``keyed_resumable``: update rows replace same-key
    rows, new keys append, ``deletes`` keys disappear — in ONE commit.

    Scale shape: only the hash buckets that contain touched keys are
    rewritten (bucket = the file-group unit, exactly the granularity the
    resumable writer committed); untouched buckets keep their files, so
    a 100 TB table absorbs a small merge by rewriting |touched buckets|,
    not the table. The touched-bucket set is a bounded collect
    (<= n_buckets rows). Commit = data files first, one immutable
    "merge" snapshot listing added+removed files, then the atomic
    pointer swap — crash anywhere leaves the previous snapshot readable
    and the half-written rewrite dirs invisible.

    ``updates`` must be key-unique (checked — a multi-matching MERGE is
    ambiguous, the same error Iceberg raises).
    """
    manifest = read_manifest(table)
    keyed = [b for b in manifest["batches"] if b.startswith("k")]
    if not keyed:
        raise ValueError(f"{table} has no keyed batches to merge into")
    n_buckets = int(keyed[0].split("of")[1])

    n_upd, n_keys = updates.select(
        F.count(F.lit(1)), F.count_distinct(F.col(key_col))
    ).first()
    if n_upd != n_keys:
        raise ValueError(f"updates not key-unique: {n_upd} rows, {n_keys} keys")

    bucket_of = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    touched_keys = updates.select(key_col)
    if deletes is not None:
        touched_keys = touched_keys.unionByName(deletes.select(key_col))
    touched = sorted(
        r[0] for r in touched_keys.select(bucket_of.alias("b")).distinct().collect()
    )

    current_files = plan_files(table)

    def _bucket_files(b: int) -> list[dict]:
        bid = f"k{b}of{n_buckets}"
        out = []
        for f in current_files:
            for part in f["path"].split(os.sep):
                if (
                    part == f"batch={bid}"
                    or part.startswith(f"batch={bid}_r")
                    or part.startswith(f"batch={bid}_m")
                ):
                    out.append(f)
                    break
        return out

    sid = manifest["current_snapshot"] + 1
    added, removed, out_rows = [], [], 0
    for b in touched:
        old = _bucket_files(b)
        upd_b = updates.filter(bucket_of == b)
        if old:
            old_df = spark.read.parquet(*[f["path"] for f in old])
            keep = old_df.join(
                F.broadcast(touched_keys.filter(bucket_of == b).distinct()),
                on=key_col,
                how="left_anti",
            )
            # allowMissingColumns = Iceberg-style ADD-COLUMN schema
            # evolution: updates may carry new columns (old rows get
            # NULL), and must still carry every old column.
            missing = set(old_df.columns) - set(upd_b.columns)
            if missing:
                raise ValueError(f"updates missing table columns {sorted(missing)}")
            merged = keep.unionByName(upd_b, allowMissingColumns=True)
        else:
            merged = upd_b
        out_dir = os.path.join(table, "data", f"batch=k{b}of{n_buckets}_m{sid}")
        merged.write.mode("overwrite").parquet(out_dir)
        files = _file_stats(out_dir)
        added.extend(files)
        removed.extend(f["path"] for f in old)
        out_rows += sum(f["rows"] for f in files)

    snapshot = {
        "snapshot_id": sid,
        "parent_id": manifest["current_snapshot"],
        "operation": "merge",
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "summary": {
            "added_rows": out_rows,
            "added_tile_bytes": 0,
            "added_files": len(added),
            "removed_files": len(removed),
            "touched_buckets": touched,
        },
        "files": added,
        "removed": removed,
    }
    snap_tmp = os.path.join(table, "_snapshots", f"v{sid}.json.tmp")
    with open(snap_tmp, "w") as f:
        json.dump(snapshot, f, indent=1, sort_keys=True)
    os.replace(snap_tmp, os.path.join(table, "_snapshots", f"v{sid}.json"))
    manifest["current_snapshot"] = sid
    _commit_manifest(table, manifest)
    return {
        "snapshot_id": sid,
        "touched_buckets": touched,
        "rewritten_files": len(removed),
    }


def read_keyed(
    spark: SparkSession,
    table: str,
    keys: list,
    key_col: str = "doc_id",
    as_of: int | None = None,
) -> DataFrame:
    """Point lookups on a keyed table: read ONLY the hash buckets that
    can contain the requested keys (the doc-corpus analog of the
    containers' O(1) tile lookup — at 100 TB a 5-doc fetch opens
    |distinct buckets| <= 5 directories, never scans the corpus).

    Bucket ids are re-derived with the same xxhash64 the writer used
    (computed through Spark so the hash is bit-identical), then
    plan_files output is filtered to those buckets and the usual
    key filter applies on top.
    """
    manifest = read_manifest(table)
    keyed = [b for b in manifest["batches"] if b.startswith("k")]
    if not keyed:
        raise ValueError(f"{table} has no keyed batches")
    n_buckets = int(keyed[0].split("of")[1])
    kdf = spark.createDataFrame([(k,) for k in keys], f"{key_col} bigint")
    buckets = {
        r[0]
        for r in kdf.select(
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
        ).collect()
    }

    def _belongs(path: str, b: int) -> bool:
        bid = f"k{b}of{n_buckets}"
        for part in path.split(os.sep):
            if part == f"batch={bid}" or part.startswith((f"batch={bid}_r", f"batch={bid}_m")):
                return True
        return False

    files = [
        f
        for f in plan_files(table, as_of=as_of)
        if any(_belongs(f["path"], b) for b in buckets)
    ]
    if not files:
        raise ValueError(f"no committed data in {table} for those keys")
    df = spark.read.option("mergeSchema", "true").parquet(*[f["path"] for f in files])
    return df.join(F.broadcast(kdf), on=key_col, how="inner")


def snapshot_diff(
    spark: SparkSession,
    table: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """What changed between two snapshots of a keyed table:
    (key, change) with change in {inserted, deleted, updated}.
    Reads both snapshots' live file sets (metadata-only planning) and
    diffs relationally — full-row hash comparison for 'updated'."""
    a = read_tiles(spark, table, as_of=from_snapshot)
    b = read_tiles(spark, table, as_of=to_snapshot)
    common = [c for c in a.columns if c in b.columns]
    fp = lambda df: df.select(  # noqa: E731
        key_col, F.md5(F.to_json(F.struct(*[F.col(c) for c in common]))).alias("fp")
    )
    fa, fb = fp(a), fp(b)
    j = fa.alias("a").join(fb.alias("b"), on=key_col, how="full_outer")
    change = (
        F.when(F.col("a.fp").isNull(), F.lit("inserted"))
        .when(F.col("b.fp").isNull(), F.lit("deleted"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("updated"))
    )
    return j.select(key_col, change.alias("change")).filter(F.col("change").isNotNull())
