"""Link extraction, host graph, PageRank (pages/links.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.links import extract_links, host_edges, pagerank_hosts


def _pages(spark):
    rows = [
        ("http://a.io/1", b'<a href="http://b.io/x">b</a><a href="https://c.io/y">c</a>'),
        ("http://a.io/2", b'<a href="http://b.io/z">b</a> nolink text'),
        ("http://b.io/1", b'<a href="http://c.io/q">c</a>'),
        ("http://c.io/1", b"<p>dangling: no links</p>"),
        ("http://a.io/3", b'<a href="http://a.io/other">self</a>'),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"]))


def test_extract_links(spark):
    links = extract_links(_pages(spark)).collect()
    got = sorted((r["url"], r["link"]) for r in links)
    assert got == [
        ("http://a.io/1", "http://b.io/x"),
        ("http://a.io/1", "https://c.io/y"),
        ("http://a.io/2", "http://b.io/z"),
        ("http://a.io/3", "http://a.io/other"),
        ("http://b.io/1", "http://c.io/q"),
    ]


def test_host_edges_weighted_no_self_loops(spark):
    edges = host_edges(extract_links(_pages(spark))).collect()
    got = {(r["src"], r["dst"]): r["weight"] for r in edges}
    # a.io -> a.io self-loop dropped; a.io -> b.io weight 2
    assert got == {("a.io", "b.io"): 2, ("a.io", "c.io"): 1, ("b.io", "c.io"): 1}


def test_pagerank_properties(spark):
    edges = host_edges(extract_links(_pages(spark)))
    ranks = {r["host"]: r["rank"] for r in pagerank_hosts(edges, n_iter=5).collect()}
    assert set(ranks) == {"a.io", "b.io", "c.io"}
    # total mass conserved (teleport + flow + dangling redistribution)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    # c.io receives from both others and is dangling-fed -> top rank;
    # a.io receives nothing but teleport/dangling -> bottom
    assert ranks["c.io"] > ranks["b.io"] > ranks["a.io"]


def test_pagerank_matches_numpy_reference(spark):
    """5 iterations of the DataFrame PageRank equal a dense numpy power
    iteration on the same 3-node graph."""
    import numpy as np

    edges = host_edges(extract_links(_pages(spark)))
    got = {r["host"]: r["rank"] for r in pagerank_hosts(edges, n_iter=5).collect()}

    hosts = ["a.io", "b.io", "c.io"]
    # column-stochastic transition: a-> b (2/3), a->c (1/3), b->c (1); c dangling
    p = np.array([[0, 0, 0], [2 / 3, 0, 0], [1 / 3, 1, 0]])
    dang = np.array([0.0, 0.0, 1.0])
    r = np.full(3, 1 / 3)
    for _ in range(5):
        r = 0.15 / 3 + 0.85 * (p @ r + (dang @ r) / 3)
    for i, h in enumerate(hosts):
        assert got[h] == pytest.approx(r[i], abs=1e-12)


def test_pagerank_many_iterations_bounded_plan(spark):
    """25 power iterations keep a bounded plan (localCheckpoint every k)
    and still sum to 1."""
    import pandas as pd

    from versatiles_rs_spark.pages.links import pagerank_hosts

    edges = spark.createDataFrame(
        pd.DataFrame(
            {"src": ["a", "b", "c", "d", "a"],
             "dst": ["b", "c", "a", "a", "c"],
             "weight": [1, 2, 1, 1, 3]}
        )
    )
    pr = pagerank_hosts(edges, n_iter=25, checkpoint_every=5)
    plan25 = pr._jdf.queryExecution().toString()
    plan10 = pagerank_hosts(edges, n_iter=10, checkpoint_every=5)._jdf.queryExecution().toString()
    # bounded by the CHECKPOINT WINDOW, not the total iteration count:
    # 25 iterations must not cost a bigger plan than 10 (both end on a
    # 5-iteration window after their last checkpoint). Without
    # checkpointing the plan doubles per iteration (2^25 vs 2^10).
    assert len(plan25) < 1.5 * len(plan10), (len(plan25), len(plan10))
    rows = pr.collect()
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-6


def test_pagerank_checkpointing_preserves_values(spark):
    """Checkpoint cadence must not change the numbers: 6 iterations with
    checkpoint_every=2 equals checkpoint_every=100 (never fires) exactly."""
    import pandas as pd

    from versatiles_rs_spark.pages.links import pagerank_hosts

    edges = spark.createDataFrame(
        pd.DataFrame(
            {"src": ["a", "b", "c"], "dst": ["b", "c", "a"], "weight": [1, 1, 2]}
        )
    )
    a = {r["host"]: r["rank"] for r in pagerank_hosts(edges, 6, checkpoint_every=2).collect()}
    b = {r["host"]: r["rank"] for r in pagerank_hosts(edges, 6, checkpoint_every=100).collect()}
    assert a.keys() == b.keys()
    for h in a:
        assert abs(a[h] - b[h]) < 1e-12


def test_bfs_hops_hand_case(spark):
    from versatiles_rs_spark.pages.links import bfs_hops

    # path 0->1->2->3->4 plus shortcut 0->3: hops(3) = 1, hops(4) = 2
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3)], "src int, dst int"
    )
    seeds = spark.createDataFrame([(0,)], "node int")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 10).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}


def test_bfs_hops_cap_and_multisource(spark):
    from versatiles_rs_spark.pages.links import bfs_hops

    # two chains from two seeds; node 13 is 3 hops from seed 10 but the
    # cap of 2 excludes it; node 2 takes its MIN distance (1 via seed 0)
    edges = spark.createDataFrame(
        [(0, 2), (10, 11), (11, 12), (12, 13), (11, 2)],
        "src int, dst int",
    )
    seeds = spark.createDataFrame([(0,), (10,)], "node int")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 2).collect()}
    assert got == {0: 0, 10: 0, 2: 1, 11: 1, 12: 2}


def test_bfs_hops_unreachable_absent(spark):
    from versatiles_rs_spark.pages.links import bfs_hops

    edges = spark.createDataFrame([(5, 6), (7, 8)], "src int, dst int")
    seeds = spark.createDataFrame([(5,)], "node int")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 10).collect()}
    assert got == {5: 0, 6: 1}
