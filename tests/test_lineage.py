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
