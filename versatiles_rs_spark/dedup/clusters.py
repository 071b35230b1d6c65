"""Near-duplicate CLUSTERS from pair output — the dedup endgame.

Pair emitters (MinHash/SimHash/embedding) find edges; deciding which
documents to actually drop needs the connected components of that pair
graph: one canonical representative per cluster, everything else removed.
This is iterative min-label propagation (the Pregel/GraphX connected-
components algorithm) written as DataFrame joins:

- labels start as each node's own id,
- every iteration each node takes the min of its label and its
  neighbors' labels (one join on the symmetrized edge list + one
  aggregation, both on the node key),
- the loop stops when an in-plan count says no label changed
  (O(component diameter) iterations — near-dup clusters are dense, so
  typically 2-3; ``max_iter`` is a safety valve).

At 10^12 docs the edge list is the SMALL side (pairs are rare by
construction), so each iteration is a modest shuffle keyed by node —
never anything corpus-sized."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_every: int = 5,
    symmetric: bool = False,
) -> DataFrame:
    """(node, cluster) for every node in ``edges``; cluster = the min node
    id in its component (the canonical representative).

    Iterative-lineage hygiene (GraphX-style): every ``checkpoint_every``
    iterations the label table is ``localCheckpoint``-ed, truncating the
    logical plan — without it the plan tree doubles per iteration and a
    deep-diameter graph (20+ iterations) blows analysis/serialization
    long before data size matters. Superseded label tables are unpersisted
    as soon as the next iteration's change count has been computed.
    """
    # ``symmetric=True``: the caller asserts the edge list already
    # contains both directions of every pair (e.g. grid_dbscan's
    # neighbor-offset join emits (a,b) AND (b,a) by construction) — the
    # symmetrizing union + distinct exchange is pure waste there.
    # Duplicate edges would only inflate the propagation join, never
    # change the min-label fixpoint, so this is a cost assertion, not a
    # correctness precondition.
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not symmetric:
        sym = sym.union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))).distinct()
    sym = sym.cache()
    # Seed labels with the FIRST propagation step folded into the init:
    # comp0 = min(node, min neighbor id) is exactly what iteration 1
    # would compute from comp = node, so the loop starts one round ahead
    # (round-6 optimization; the fixpoint is unchanged — min-label
    # propagation is monotone from any over-approximation of it).
    labels = (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.min("v").alias("mn"))
        .select("node", F.least(F.col("node"), F.col("mn")).alias("comp"))
    )
    pinned = labels  # the persisted frame backing `labels` (unpersist target)
    for i in range(max_iter):
        # (round-6 note: fusing TWO propagation steps per round was tried
        # — sound, since min-label propagation is monotone — but measured
        # WORSE here: the seeded init already converges dense near-dup
        # clusters in one round, so the extra step is pure cost. Single
        # step + seeded init stays.)
        # One-exchange propagation (guide §2.4): the previous form ran a
        # neighbor min-agg exchange, then a LEFT JOIN of labels against
        # it (two more exchanges), then re-joined new labels against old
        # just to count changes. Union the label rows (tag 0) with the
        # propagated neighbor labels (tag 1) and take min(comp) AND
        # min(tag-0 comp) per node in ONE groupBy: min over the union IS
        # least(own, min neighbor), nodes without neighbors keep their
        # own row, and convergence is a filter comparing the two
        # aggregates on the same frame — no joins beyond the edge probe.
        prop = sym.join(labels.withColumnRenamed("node", "u"), "u").select(
            F.col("v").alias("node"), "comp"
        )
        new = (
            labels.select("node", "comp", F.lit(0).alias("_tag"))
            .unionByName(prop.select("node", "comp", F.lit(1).alias("_tag")))
            .groupBy("node")
            .agg(
                F.min("comp").alias("comp"),
                F.min(F.when(F.col("_tag") == 0, F.col("comp"))).alias("old"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            # LAZY checkpoint: the `changed` count below computes,
            # persists, and truncates lineage in one job (an eager
            # checkpoint would spend a separate job first — guide §2.6)
            new = new.localCheckpoint(eager=False)
        else:
            new = new.cache()
        changed = new.where(F.col("comp") != F.col("old")).count()
        pinned.unpersist()
        pinned = new
        labels = new.select("node", "comp")
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("comp").alias("cluster"))


def dedup_clusters(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """(node, cluster, cluster_size, keep) — keep is true only for the
    canonical (min-id) representative; dropping ``not keep`` rows is the
    dedup action."""
    cc = connected_components(edges, src, dst)
    sizes = cc.groupBy("cluster").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "cluster")
        .select(
            "node", "cluster",
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            (F.col("node") == F.col("cluster")).alias("keep"),
        )
    )
