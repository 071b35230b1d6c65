"""Connected-component dedup clustering (dedup/clusters.py)."""

import pandas as pd

from versatiles_rs_spark.dedup.clusters import connected_components, dedup_clusters


def _edges(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id_a", "id_b"]))


def test_components_chain_and_clique(spark):
    # chain 1-2-3-4 (diameter 3, needs several propagation rounds),
    # clique 10-11-12, isolated pair 20-21
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)])
    got = {r["node"]: r["cluster"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_keep_decision(spark):
    edges = _edges(spark, [(5, 9), (9, 7)])
    rows = {r["node"]: r for r in dedup_clusters(edges).collect()}
    assert all(r["cluster"] == 5 and r["cluster_size"] == 3 for r in rows.values())
    assert rows[5]["keep"] is True
    assert rows[7]["keep"] is False and rows[9]["keep"] is False


def test_components_direction_independent(spark):
    a = connected_components(_edges(spark, [(3, 1), (2, 3)])).collect()
    b = connected_components(_edges(spark, [(1, 3), (3, 2)])).collect()
    assert sorted((r["node"], r["cluster"]) for r in a) == sorted(
        (r["node"], r["cluster"]) for r in b
    ) == [(1, 1), (2, 1), (3, 1)]


def test_deep_path_graph_bounded_plan(spark):
    """VERDICT r3 #2 done-criterion: 25 label-propagation iterations on a
    deep path graph converge correctly AND the logical plan stays bounded
    (localCheckpoint truncates lineage every k iterations — without it the
    plan string grows exponentially with iteration count)."""
    import pandas as pd

    from versatiles_rs_spark.dedup.clusters import connected_components

    # path graph 0-1-2-...-30: diameter 30, min-label needs many rounds
    n = 31
    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    )
    cc = connected_components(edges, max_iter=25, checkpoint_every=4)
    plan = cc._jdf.queryExecution().toString()
    assert len(plan) < 200_000, f"plan grew to {len(plan)} chars"
    rows = cc.collect()
    assert len(rows) == n
    # not fully converged in 25 rounds is fine for the plan check, but the
    # head of the path must certainly be labeled 0
    assert all(r["cluster"] == 0 for r in rows if r["node"] <= 8)


def test_deep_path_graph_converges(spark):
    """Full convergence on a 12-node path (needs ~ceil(log2)+ rounds under
    doubling-free min-propagation = up to 11) with checkpointing active."""
    import pandas as pd

    from versatiles_rs_spark.dedup.clusters import connected_components

    n = 12
    edges = spark.createDataFrame(
        pd.DataFrame({"id_a": range(n - 1), "id_b": range(1, n)})
    )
    out = {r["node"]: r["cluster"] for r in
           connected_components(edges, max_iter=15, checkpoint_every=3).collect()}
    assert out == {i: 0 for i in range(n)}
