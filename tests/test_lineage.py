"""Resumable checkpointed writes: kill-and-resume, manifest atomicity."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.lineage import (
    convert_resumable,
    lineage_table,
    plan_batches,
    read_manifest,
    read_tiles,
    resume_plan,
    write_batch,
)
from versatiles_rs_spark.operators.convert import assign_tiles, render_point_tiles
from versatiles_rs_spark.queries import _docs_geo

MAXZ = 4


@pytest.fixture()
def tiles(spark, sf_dir):
    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    return render_point_tiles(assign_tiles(geo, 0, MAXZ)).cache()


def test_plan_batches_counts():
    bs = plan_batches(0, 7, block_bits=6)
    # z0..6 -> 1 block each; z7 -> 4 blocks
    assert len(bs) == 7 + 4
    assert len({b.batch_id for b in bs}) == len(bs)


def test_full_write_then_read(tiles, tmp_path):
    table = str(tmp_path / "tiles_tbl")
    recs = convert_resumable(tiles, table, 0, MAXZ)
    assert len(recs) == MAXZ + 1
    back = read_tiles(tiles.sparkSession, table)
    assert back.count() == tiles.count()
    # re-running does nothing (all batches committed)
    again = convert_resumable(tiles, table, 0, MAXZ)
    assert again == []


def test_kill_and_resume(tiles, tmp_path):
    table = str(tmp_path / "tiles_tbl2")
    os.makedirs(table)
    batches = plan_batches(0, MAXZ)
    # simulate a killed job: only the first two batches committed
    for b in batches[:2]:
        write_batch(table, b, tiles)
    assert len(read_manifest(table)["batches"]) == 2
    todo = resume_plan(table, batches)
    assert [b.batch_id for b in todo] == [b.batch_id for b in batches[2:]]
    # resume completes the remainder, nothing re-done
    recs = convert_resumable(tiles, table, 0, MAXZ)
    assert len(recs) == len(batches) - 2
    assert read_tiles(tiles.sparkSession, table).count() == tiles.count()


def test_uncommitted_data_invisible(tiles, tmp_path):
    table = str(tmp_path / "tiles_tbl3")
    os.makedirs(table)
    batches = plan_batches(0, MAXZ)
    write_batch(table, batches[0], tiles)
    # a crashed writer left data without a manifest entry
    orphan = tiles.filter("z = 3")
    orphan.write.parquet(os.path.join(table, "data", "batch=z3_x0_y0"))
    back = read_tiles(tiles.sparkSession, table)
    assert back.filter("z = 3").count() == 0
    assert back.count() == tiles.filter("z = 0").count()


def test_lineage_metrics_match_data(tiles, tmp_path, spark):
    table = str(tmp_path / "tiles_tbl4")
    convert_resumable(tiles, table, 0, MAXZ)
    lt = lineage_table(spark, table)
    got = {r["batch_id"]: r for r in lt.collect()}
    for z in range(MAXZ + 1):
        rec = got[f"z{z}_x0_y0"]
        want_rows = tiles.filter(f"z = {z}").count()
        want_bytes = tiles.filter(f"z = {z}").agg(F.sum(F.length("tile"))).collect()[0][0]
        assert rec["row_count"] == want_rows
        assert rec["bytes"] == want_bytes
    # manifest JSON is valid and matches
    m = read_manifest(table)
    assert set(m["batches"]) == set(got)
    json.dumps(m)  # serializable


def test_snapshot_history_and_time_travel(tiles, tmp_path, spark):
    """Each batch commit is one snapshot; as_of reads reproduce every
    intermediate state exactly (Iceberg time-travel semantics)."""
    from versatiles_rs_spark.lineage import snapshots_table

    table = str(tmp_path / "tiles_tbl5")
    convert_resumable(tiles, table, 0, MAXZ)
    snaps = snapshots_table(spark, table).orderBy("snapshot_id").collect()
    assert [s["snapshot_id"] for s in snaps] == list(range(1, MAXZ + 2))
    assert [s["parent_id"] for s in snaps] == [None] + list(range(1, MAXZ + 1))
    assert all(s["operation"] == "append" for s in snaps)

    # as_of=k sees exactly zooms 0..k-1 (batches commit in zoom order)
    for k in range(1, MAXZ + 2):
        got = read_tiles(spark, table, as_of=k)
        assert got.count() == tiles.filter(f"z < {k}").count()
        assert got.agg(F.max("z")).collect()[0][0] == k - 1
    # current == last snapshot
    assert read_tiles(spark, table).count() == tiles.count()


def test_manifest_file_pruning(tiles, tmp_path, spark):
    """plan_files prunes by manifest-recorded z/x/y bounds without opening
    parquet; the pruned read equals the filtered full read."""
    from versatiles_rs_spark.lineage import plan_files

    table = str(tmp_path / "tiles_tbl6")
    convert_resumable(tiles, table, 0, MAXZ)
    all_files = plan_files(table)
    z2 = plan_files(table, z=(2, 2))
    assert 0 < len(z2) < len(all_files)
    got = read_tiles(spark, table, z=(2, 2))
    # file-level pruning is a superset guarantee; exact after the filter
    assert got.filter("z = 2").count() == tiles.filter("z = 2").count()
    assert got.count() == sum(f["rows"] for f in z2)

    # spatial slice: x range at the deepest zoom
    xs = plan_files(table, z=(MAXZ, MAXZ), x=(0, 3))
    assert all(f["x_min"] <= 3 for f in xs)


def test_per_file_stats_sum_to_batch(tiles, tmp_path, spark):
    """Footer-derived per-file rows sum to the observed batch row_count,
    and recorded bounds cover the data."""
    table = str(tmp_path / "tiles_tbl7")
    recs = convert_resumable(tiles, table, 0, MAXZ)
    for rec in recs:
        assert sum(f["rows"] for f in rec["files"]) == rec["row_count"]
        assert rec["n_files"] == len(rec["files"])
        for f in rec["files"]:
            assert f["file_bytes"] > 0
        if rec["row_count"] > 0:
            z = rec["z"]
            lo = min(f["x_min"] for f in rec["files"] if "x_min" in f)
            hi = max(f["x_max"] for f in rec["files"] if "x_max" in f)
            want = tiles.filter(f"z = {z}").agg(F.min("x"), F.max("x")).collect()[0]
            assert (lo, hi) == (want[0], want[1])


def test_commit_pointer_protects_partial_snapshot(tiles, tmp_path, spark):
    """A snapshot file without a manifest pointer swap (writer killed
    between the two steps) is invisible to reads."""
    import json as _json
    import os as _os

    table = str(tmp_path / "tiles_tbl8")
    batches = plan_batches(0, MAXZ)
    _os.makedirs(table)
    write_batch(table, batches[0], tiles)
    write_batch(table, batches[1], tiles)
    # hand-roll the orphan: copy snapshot v2 to v3 (as if written pre-crash)
    snap = _json.load(open(_os.path.join(table, "_snapshots", "v2.json")))
    snap["snapshot_id"] = 3
    _json.dump(snap, open(_os.path.join(table, "_snapshots", "v3.json"), "w"))
    assert read_manifest(table)["current_snapshot"] == 2
    assert read_tiles(spark, table).count() == tiles.filter("z <= 1").count()


def test_compact_and_expire(tiles, tmp_path, spark):
    """Compaction rewrites a batch's files as a REPLACE snapshot; expiry
    GCs the replaced files and fences expired time travel."""
    import glob as _glob

    from versatiles_rs_spark.lineage import (
        compact_batch,
        expire_snapshots,
        plan_files,
        snapshots_table,
    )

    table = str(tmp_path / "tiles_tbl9")
    convert_resumable(tiles, table, 0, MAXZ)
    pre = read_tiles(spark, table)
    want_rows = pre.count()
    deep = f"z{MAXZ}_x0_y0"
    before = [f for f in plan_files(table) if f"batch={deep}" in f["path"]]
    assert len(before) > 1  # multiple shuffle-partition files to compact

    res = compact_batch(spark, table, deep)
    assert res["files_after"] == 1 and res["files_before"] == len(before)
    # current read identical rows; batch membership unchanged
    post = read_tiles(spark, table)
    assert post.count() == want_rows
    assert post.filter(f"z = {MAXZ}").count() == tiles.filter(f"z = {MAXZ}").count()
    # time travel to the pre-compaction snapshot still sees the old files
    pre_sid = res["snapshot_id"] - 1
    assert read_tiles(spark, table, as_of=pre_sid).count() == want_rows
    ops = {r["snapshot_id"]: r["operation"] for r in snapshots_table(spark, table).collect()}
    assert ops[res["snapshot_id"]] == "replace"

    # expiry: keep only the newest snapshot -> replaced files deleted
    old_paths = [f["path"] for f in before]
    assert all(os.path.exists(p) for p in old_paths)
    gc = expire_snapshots(table, keep_last=1)
    assert gc["deleted_files"] == len(old_paths)
    assert not any(os.path.exists(p) for p in old_paths)
    # current read unaffected; expired as_of fails fast
    assert read_tiles(spark, table).count() == want_rows
    with pytest.raises(ValueError, match="expired"):
        read_tiles(spark, table, as_of=pre_sid)
    # resume contract untouched: nothing to re-run
    assert convert_resumable(tiles, table, 0, MAXZ) == []


def test_compact_batch_prefix_collision(tiles, tmp_path, spark):
    """compact_batch('z10_x0_y1') must not sweep files of the
    prefix-colliding batch 'z10_x0_y10' into its rewrite — membership is
    matched on whole path components, not substrings."""
    from versatiles_rs_spark.lineage import TileBatch, compact_batch, plan_files

    table = str(tmp_path / "tiles_collide")
    t10 = tiles.withColumn("z", F.lit(10))
    # by=1 block covers y 64..127; by=10 covers y 640..703 (block_bits=6)
    b_short = TileBatch(10, 0, 1)
    b_long = TileBatch(10, 0, 10)
    write_batch(table, b_short, t10.withColumn("y", F.col("y") % 64 + 64))
    write_batch(table, b_long, t10.withColumn("y", F.col("y") % 64 + 640))
    assert b_long.batch_id.startswith(b_short.batch_id)  # the collision

    files_long_before = {
        f["path"] for f in plan_files(table) if "batch=z10_x0_y10" in f["path"]
    }
    assert files_long_before

    res = compact_batch(spark, table, b_short.batch_id)
    # the long batch's files survive untouched and stay live
    files_long_after = {
        f["path"] for f in plan_files(table) if "batch=z10_x0_y10" in f["path"]
    }
    assert files_long_after == files_long_before
    # the REPLACE snapshot removed only the short batch's files
    from versatiles_rs_spark.lineage import _read_snapshot

    snap = _read_snapshot(table, res["snapshot_id"])
    assert all("batch=z10_x0_y10" not in p for p in snap["removed"])
    # row counts preserved on the current snapshot
    total = read_tiles(spark, table).count()
    assert total == t10.count() * 2


def test_compact_batch_recompaction_sweeps_own_rewrites(tiles, tmp_path, spark):
    """Compacting the same batch twice treats the first rewrite's
    batch=<id>_r<sid> directory as part of the batch (it IS this batch's
    data), so the second REPLACE removes it."""
    from versatiles_rs_spark.lineage import TileBatch, compact_batch, plan_files

    table = str(tmp_path / "tiles_recompact")
    b = TileBatch(3, 0, 0)
    write_batch(table, b, tiles.filter("z = 3").repartition(4))
    n = read_tiles(spark, table).count()
    assert n > 0

    r1 = compact_batch(spark, table, b.batch_id)
    r2 = compact_batch(spark, table, b.batch_id)
    assert r2["files_before"] == r1["files_after"]
    assert read_tiles(spark, table).count() == n


def test_merge_upsert_copy_on_write(tmp_path, spark, sf_dir):
    """MERGE: updates replace, new keys append, deletes disappear — in
    one snapshot — and only buckets containing touched keys are
    rewritten (untouched buckets keep their exact file paths)."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark.lineage import (
        keyed_resumable,
        merge_upsert,
        plan_files,
        read_tiles,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 200")
    )
    table = str(tmp_path / "docs_keyed")
    keyed_resumable(docs, table, n_buckets=4, key_col="doc_id")
    before = {f["path"] for f in plan_files(table)}
    pre_sid = None

    updates = (
        docs.filter("doc_id IN (3, 7)")
        .withColumn("text", F.concat(F.col("text"), F.lit(" EDITED")))
        .unionByName(
            spark.createDataFrame([(100000, "brand new doc")], "doc_id bigint, text string")
        )
    )
    deletes = docs.filter("doc_id = 11").select("doc_id")
    res = merge_upsert(spark, table, updates, key_col="doc_id", deletes=deletes)
    pre_sid = res["snapshot_id"] - 1

    got = {r["doc_id"]: r["text"] for r in read_tiles(spark, table).collect()}
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    want[3] += " EDITED"
    want[7] += " EDITED"
    want[100000] = "brand new doc"
    del want[11]
    assert got == want

    # copy-on-write granularity: untouched buckets keep their files
    touched = set(res["touched_buckets"])
    assert touched < set(range(4))  # some bucket untouched in this fixture
    after = {f["path"] for f in plan_files(table)}
    untouched_before = {
        p for p in before
        if not any(f"batch=k{b}of4" in p for b in touched)
    }
    assert untouched_before <= after

    # time travel: the pre-merge snapshot still shows the original rows
    old = {r["doc_id"]: r["text"] for r in read_tiles(spark, table, as_of=pre_sid).collect()}
    assert old == {r["doc_id"]: r["text"] for r in docs.collect()}

    # multi-matching updates are refused
    dup = updates.unionByName(updates)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key-unique"):
        merge_upsert(spark, table, dup)


def test_merge_upsert_schema_evolution(tmp_path, spark, sf_dir):
    """ADD-COLUMN evolution through MERGE: updates carry a new column;
    touched buckets rewrite with it, untouched buckets keep old files,
    and reads merge schemas (old rows NULL in the new column). Updates
    missing an existing column are refused."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from versatiles_rs_spark.lineage import keyed_resumable, merge_upsert, read_tiles

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 100")
    )
    table = str(tmp_path / "docs_evolve")
    keyed_resumable(docs, table, n_buckets=4, key_col="doc_id")

    updates = docs.filter("doc_id = 3").withColumn("quality", F.lit(0.9))
    res = merge_upsert(spark, table, updates, key_col="doc_id")
    assert set(res["touched_buckets"]) < set(range(4))

    got = read_tiles(spark, table)
    assert "quality" in got.columns
    rows = {r["doc_id"]: r["quality"] for r in got.collect()}
    assert rows[3] == 0.9
    assert all(v is None for k, v in rows.items() if k != 3)

    with _pytest.raises(ValueError, match="missing table columns"):
        merge_upsert(spark, table, updates.drop("text"))


def test_read_keyed_point_lookup_and_snapshot_diff(tmp_path, spark, sf_dir):
    """Point lookups open only the buckets containing the requested keys;
    snapshot_diff classifies a merge's inserts/updates/deletes."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark.lineage import (
        keyed_resumable,
        merge_upsert,
        plan_files,
        read_keyed,
        snapshot_diff,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 100")
    )
    table = str(tmp_path / "docs_lookup")
    keyed_resumable(docs, table, n_buckets=8, key_col="doc_id")
    pre = len(plan_files(table))

    got = {r["doc_id"] for r in read_keyed(spark, table, [3, 17]).collect()}
    assert got == {3, 17}
    # the lookup plans strictly fewer files than the full table
    kdf_buckets = {
        r[0] for r in spark.createDataFrame([(3,), (17,)], "doc_id bigint")
        .select(F.pmod(F.xxhash64("doc_id"), F.lit(8))).collect()
    }
    assert len(kdf_buckets) <= 2 and len(kdf_buckets) < pre

    updates = (
        docs.filter("doc_id = 5")
        .withColumn("text", F.lit("changed"))
        .unionByName(spark.createDataFrame([(777, "new")], "doc_id bigint, text string"))
    )
    res = merge_upsert(
        spark, table, updates, key_col="doc_id",
        deletes=docs.filter("doc_id = 9").select("doc_id"),
    )
    diff = {
        r["doc_id"]: r["change"]
        for r in snapshot_diff(spark, table, res["snapshot_id"] - 1).collect()
    }
    assert diff == {5: "updated", 777: "inserted", 9: "deleted"}
