"""Round-6 session-3 focused tests: static one-job loop rounds.

watershed_basins/bfs_hops gained an opt-in ``rows_hint`` and
flow_accumulation an opt-in ``static_rounds`` that run the iterative
rounds under AQE-off static plans with a data-size-derived shuffle
partition count (operators/iterconf.py).  These tests assert (a) the
static path computes the SAME fixpoint as the default path on
multi-round inputs, and (b) the session conf is restored afterwards —
including when the loop body raises.
"""

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.operators.iterconf import (
    static_loop_partitions,
    static_round_conf,
)
from versatiles_rs_spark.pages.links import bfs_hops


def _conf_snapshot(spark):
    return (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )


def test_static_loop_partitions_scales_with_rows(spark):
    p = spark.sparkContext.defaultParallelism
    assert static_loop_partitions(spark, 1) == 1
    assert static_loop_partitions(spark, 499_999) == 1
    assert static_loop_partitions(spark, 2_000_000) == min(4 * p, 5)
    # the parallelism cap binds at huge n
    assert static_loop_partitions(spark, 10**12) == max(4 * p, 4)


def test_static_round_conf_restores_on_error(spark):
    before = _conf_snapshot(spark)
    with pytest.raises(RuntimeError):
        with static_round_conf(spark, 10):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
            raise RuntimeError("boom")
    assert _conf_snapshot(spark) == before


def test_bfs_hops_static_matches_default_multi_round(spark):
    # 12-node path graph + a shortcut: forces multi-round expansion and
    # a revisit (node 6 reachable at hop 6 via the path, hop 1 via the
    # shortcut — min wins).
    rows = [(i, i + 1) for i in range(11)] + [(0, 6)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    before = _conf_snapshot(spark)
    base = {
        (r["node"], r["hops"])
        for r in bfs_hops(edges, seeds, max_hops=8).collect()
    }
    hinted = {
        (r["node"], r["hops"])
        for r in bfs_hops(edges, seeds, max_hops=8, rows_hint=12).collect()
    }
    assert hinted == base
    assert (0, 0) in base and (6, 1) in base and (11, 6) in base
    assert _conf_snapshot(spark) == before


def test_sssp_static_matches_default_late_improvement(spark):
    from versatiles_rs_spark.pages.links import sssp_costs

    # expensive direct edge vs a long cheap path: the improvement for
    # node 9 lands several rounds in, exercising the static rounds past
    # a single materialization at both strides.
    rows = [(0, 9, 100)] + [(i, i + 1, 1) for i in range(9)]
    edges = spark.createDataFrame(rows, "src long, dst long, wgt long")
    seeds = spark.createDataFrame([(0,)], "node long")
    before = _conf_snapshot(spark)
    base = {
        (r["node"], r["cost"])
        for r in sssp_costs(edges, seeds, stride=4).collect()
    }
    for stride in (1, 4):
        static = {
            (r["node"], r["cost"])
            for r in sssp_costs(edges, seeds, stride=stride, rows_hint=10).collect()
        }
        assert static == base
    assert (9, 9) in base  # the cheap path wins over the direct 100-edge
    assert _conf_snapshot(spark) == before


def test_watershed_static_matches_default(spark):
    from versatiles_rs_spark.operators.map_algebra import watershed_basins

    # pointer chains long enough for 2+ doubling rounds at 3 steps/round
    n = 40
    rows = [(i, min(i + 1, n - 1)) for i in range(n)]  # chain into sink n-1
    rows += [(100 + i, 100 + min(i + 1, 20)) for i in range(21)]  # 2nd basin
    edges = spark.createDataFrame(rows, "pid long, rep long")
    before = _conf_snapshot(spark)
    base = {(r["pid"], r["rep"]) for r in watershed_basins(edges).collect()}
    hinted = {
        (r["pid"], r["rep"])
        for r in watershed_basins(edges, rows_hint=len(rows)).collect()
    }
    assert hinted == base
    assert all(rep in (n - 1, 120) for _, rep in base)
    assert _conf_snapshot(spark) == before


def test_flow_accumulation_static_matches_default(spark):
    from versatiles_rs_spark.operators.map_algebra import flow_accumulation

    # Y-shaped drainage: two branches of 6 merging into a trunk of 8 —
    # path lengths force 3+ doubling rounds.
    trunk = [(200 + i, 200 + i + 1) for i in range(8)] + [(208, 208)]
    br_a = [(10 + i, 10 + i + 1) for i in range(5)] + [(15, 200)]
    br_b = [(30 + i, 30 + i + 1) for i in range(5)] + [(35, 200)]
    edges = spark.createDataFrame(trunk + br_a + br_b, "pid long, rep long")
    before = _conf_snapshot(spark)
    base = {(r["pid"], r["acc"]) for r in flow_accumulation(edges).collect()}
    static = {
        (r["pid"], r["acc"])
        for r in flow_accumulation(edges, static_rounds=True).collect()
    }
    assert static == base
    # sink accumulates every pixel
    assert (208, len(trunk + br_a + br_b)) in base
    assert _conf_snapshot(spark) == before
