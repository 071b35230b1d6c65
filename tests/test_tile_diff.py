"""Tile-table diff (operators/tile_diff.py)."""

import pandas as pd

from versatiles_rs_spark.operators.tile_diff import tile_diff, tile_diff_summary


def _tiles(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "x", "y", "tile"])
    )


def test_diff_statuses(spark):
    old = _tiles(spark, [(0, 0, 0, b"a"), (1, 0, 0, b"b"), (1, 1, 0, b"c")])
    new = _tiles(spark, [(0, 0, 0, b"a"), (1, 0, 0, b"B"), (1, 0, 1, b"d")])
    got = {(r["z"], r["x"], r["y"]): r["status"] for r in tile_diff(old, new).collect()}
    assert got == {
        (0, 0, 0): "same",
        (1, 0, 0): "changed",
        (1, 1, 0): "removed",
        (1, 0, 1): "added",
    }
    summary = {(r["z"], r["status"]): r["n"] for r in tile_diff_summary(old, new).collect()}
    assert summary == {(0, "same"): 1, (1, "changed"): 1, (1, "removed"): 1, (1, "added"): 1}


def test_diff_shuffles_digests_not_payloads(spark):
    """The md5 projection happens below the join — the join operates on
    digests and coordinates only, never on the tile binary."""
    from pyspark.sql import functions as F

    mk = lambda: spark.range(10).select(
        F.lit(0).alias("z"), F.col("id").alias("x"), F.lit(0).alias("y"),
        F.encode(F.concat(F.lit("blob"), F.col("id").cast("string")), "UTF-8").alias("tile"),
    )
    plan = tile_diff(mk(), mk())._jdf.queryExecution().optimizedPlan().toString()
    assert "md5" in plan
    join_line = next(ln for ln in plan.splitlines() if "Join FullOuter" in ln)
    assert "tile" not in join_line  # join keys are coordinates only
    # each join input projects (z, x, y, digest) — tile appears only inside
    # the md5 expressions, one per side
    assert plan.count("md5(") == 2
