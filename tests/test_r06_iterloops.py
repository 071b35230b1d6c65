"""Round-6 focused tests: one-exchange iterative rounds.

connected_components / bfs_hops / sssp_costs were restructured this
round (union-tagged merge + single groupBy per round instead of
propagate + join-to-compare + join-to-merge), and hypertable_rollup
went from per-level union branches to a single explode + groupBy pass.
The bench/oracle fixtures converge in 1-2 rounds, so these tests force
MULTI-round convergence (long chains, late improvements, checkpoint
cadence boundaries) and assert the exact fixpoints.
"""

import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.dedup.clusters import connected_components
from versatiles_rs_spark.pages.links import bfs_hops, sssp_costs


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_cc_long_chain_multi_round(spark):
    # A 17-node path: min-label needs several propagation rounds and
    # crosses the checkpoint_every cadence boundary.
    edges = _df(spark, [(i, i + 1) for i in range(16)], "id_a long, id_b long")
    out = connected_components(edges, checkpoint_every=2)
    got = {r["node"]: r["cluster"] for r in out.collect()}
    assert got == {i: 0 for i in range(17)}


def test_cc_two_components_and_singleton_edge(spark):
    edges = _df(
        spark,
        [(5, 6), (6, 7), (20, 21), (21, 22), (22, 20), (9, 9)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["cluster"] for r in connected_components(edges).collect()}
    assert got == {5: 5, 6: 5, 7: 5, 20: 20, 21: 20, 22: 20, 9: 9}


def test_bfs_chain_and_diamond_min_hops(spark):
    # Chain 0->1->...->6 plus a shortcut 0->4: node 4 must keep hop 1
    # (the merged-min rule), nodes past the cap must be absent.
    edges = _df(
        spark,
        [(i, i + 1) for i in range(6)] + [(0, 4)],
        "src long, dst long",
    )
    seeds = _df(spark, [(0,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 2, 6: 3}


def test_bfs_revisit_keeps_first_level(spark):
    # A cycle: revisiting a seen node must not change its hop count.
    edges = _df(spark, [(0, 1), (1, 2), (2, 0)], "src long, dst long")
    seeds = _df(spark, [(0,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=8).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


@pytest.mark.parametrize("stride", [1, 4])
@pytest.mark.parametrize("broadcast_edges", [False, True])
def test_sssp_late_improvement(spark, stride, broadcast_edges):
    # Direct hop 0->3 costs 10; the 3-edge path costs 3. With stride=1
    # the cheap path lands rounds AFTER the expensive one, forcing the
    # merged-min to strictly improve an existing dist row.
    edges = _df(
        spark,
        [(0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 4, 1)],
        "src long, dst long, wgt long",
    )
    seeds = _df(spark, [(0,)], "node long")
    out = sssp_costs(edges, seeds, stride=stride, broadcast_edges=broadcast_edges)
    got = {r["node"]: r["cost"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_sssp_multi_seed_min(spark):
    edges = _df(spark, [(0, 2, 5), (1, 2, 1)], "src long, dst long, wgt long")
    seeds = _df(spark, [(0,), (1,), (1,)], "node long")  # duplicate seed
    got = {r["node"]: r["cost"] for r in sssp_costs(edges, seeds).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_hypertable_rollup_custom_levels_exact(spark):
    from versatiles_rs_spark.operators.temporal import hypertable_rollup

    import datetime as dt

    rows = [
        ("a", dt.datetime(2024, 1, 1, 0, 0, s), float(s)) for s in (1, 2, 31, 59)
    ] + [("b", dt.datetime(2024, 1, 1, 0, 1, 30), 2.5)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = hypertable_rollup(
        ev, key_col="event_type", levels_us={"half": 30_000_000, "minute": 60_000_000}
    )
    got = {
        (r["level"], r["key"], r["bucket_us"]): (
            r["n_events"], r["sum_qv"], r["min_qv"], r["max_qv"])
        for r in out.collect()
    }
    t0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
    assert got == {
        ("half", "a", t0): (2, 3_000_000, 1_000_000, 2_000_000),
        ("half", "a", t0 + 30_000_000): (2, 90_000_000, 31_000_000, 59_000_000),
        ("half", "b", t0 + 90_000_000): (1, 2_500_000, 2_500_000, 2_500_000),
        ("minute", "a", t0): (4, 93_000_000, 1_000_000, 59_000_000),
        ("minute", "b", t0 + 60_000_000): (1, 2_500_000, 2_500_000, 2_500_000),
    }
