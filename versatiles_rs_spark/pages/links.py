"""Link extraction + host-level link graph + distributed PageRank.

The web-graph layer of a crawl pipeline: pull hrefs out of raw HTML
(``regexp_extract_all`` — JVM-side, shared with the DuckDB oracle),
canonicalize them, collapse to a host→host edge list, and rank hosts
with power-iteration PageRank expressed as DataFrame joins.

Scale shape (100 TB): link extraction is a codegen projection; the edge
list aggregates with map-side combine on (src_host, dst_host) — web graphs
are sparse, so the grouped edge list is orders of magnitude smaller than
the page table; each PageRank iteration is one broadcast-or-shuffle join
of ranks (one row per host) against edges plus one aggregation. Hosts are
range-partitionable by the reversed-host key (pages/urls.py) so a host's
out-edges co-locate. A fixed iteration count keeps the whole job a static
DAG (no driver-side convergence loop at scale; convergence is monitored
from the per-iteration delta aggregate if needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.urls import host_of, host_of_sql

# href extraction rule — Java-regex/RE2 shared subset, double-quoted
# attributes (the form crawl HTML normalizes to).
HREF_PATTERN = r'href="(https?://[^"]+)"'


def extract_links(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """(url, link) — one row per absolute href in each page's HTML."""
    html_str = F.col(html_col).cast("string")
    return pages.select(
        "url",
        F.explode(F.regexp_extract_all(html_str, F.lit(HREF_PATTERN), F.lit(1))).alias("link"),
    )


def host_edges(links: DataFrame) -> DataFrame:
    """Collapse page-level links to a weighted host graph; self-loops
    dropped (they distort PageRank and carry no cross-site signal)."""
    e = links.select(
        host_of(F.col("url")).alias("src"),
        host_of(F.col("link")).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(F.count("*").alias("weight"))


def pagerank_hosts(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Weighted PageRank over the host graph, ``n_iter`` power iterations.

    Classic formulation with uniform teleport over the node set N:
    rank' = (1-d)/|N| + d * (in-flow + dangling-mass/|N|), where each
    node's out-flow is split by edge weight. Every step is a DataFrame
    join/agg — the rank table is one row per host, broadcastable for any
    realistic host count even at crawl scale.

    Iterative-lineage hygiene: every ``checkpoint_every`` iterations the
    rank table is ``localCheckpoint``-ed so the unevaluated plan does not
    accumulate across all ``n_iter`` iterations (fine at 3, fatal at 30).
    The previous checkpoint is unpersisted once superseded.
    """
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
    ).cache()
    n = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    # per-edge share of the source's out-flow, fixed across iterations
    share = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("w_out")).alias("share")
    ).cache()
    share.count()

    ranks = nodes.select("host", F.lit(1.0 / n).alias("rank"))
    prev_ckpt = None
    for i in range(n_iter):
        flow = (
            share.join(ranks.withColumnRenamed("host", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("share") * F.col("rank")).alias("inflow"))
        )
        # dangling hosts (no out-edges) spread their mass uniformly; the
        # one-row aggregate stays IN the plan (broadcast cross join) so no
        # driver round-trip happens per iteration
        dangling = (
            ranks.join(out_w.withColumnRenamed("src", "host"), "host", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
        )
        ranks = (
            nodes.join(flow.withColumnRenamed("dst", "host"), "host", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dangling_mass") / n
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint(eager=True)  # truncate plan lineage
            if prev_ckpt is not None:
                prev_ckpt.unpersist()
            prev_ckpt = ranks
    return ranks


def triangle_counts(edges: DataFrame, a_col: str = "a", b_col: str = "b") -> DataFrame:
    """Per-node triangle participation counts over an undirected graph —
    the clustering/community signal on the link graph (a host in many
    triangles sits in a dense cluster; spam farms light up).

    Input: distinct canonical edges (a < b). The wedge-join plan (the
    standard distributed formulation, cf. Suri & Vassilvitskii WWW'11):
    wedges (a<b<c) = edges joined on the middle node, closed by a
    semi-join against the (a, c) edge — two equi-join shuffles, never an
    all-pairs product; each triangle is produced exactly once because
    its three nodes appear in sorted order. At scale the join explodes
    with max-degree² — the production refinement (degree-ordered pivot:
    orient edges from low- to high-degree nodes) drops that to O(E^1.5)
    and composes with this same plan; the fixture graphs are
    degree-bounded so the plain sorted orientation is used here.

    Output: (node, n_triangles) for nodes in >= 1 triangle.
    """
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).distinct()
    ab = e.select(F.col("a"), F.col("b").alias("m"))
    bc = e.select(F.col("a").alias("m"), F.col("b").alias("c"))
    wedges = ab.join(bc, "m").select("a", F.col("m").alias("b"), "c")
    tri = wedges.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "leftsemi"
    )
    nodes = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 10,
    rows_hint: int | None = None,
) -> DataFrame:
    """Multi-source BFS over a directed graph: minimum hop count from
    ANY seed to each reachable node, capped at ``max_hops`` — the crawl-
    frontier depth question (how many link hops from the seed list is
    each host?), and the primitive behind "within-k-hops" site
    neighborhoods.

    Input: ``edges`` (src, dst) directed, ``seeds`` (node). Output:
    (node, hops) for nodes reachable within the cap; unreached nodes are
    absent (the oracle's rule too).

    Plan: level-synchronous frontier expansion — each round is ONE
    equi-join of the current frontier against the edge list plus one
    anti-join against the visited set, so round cost is frontier-sized,
    never graph-sized. Frontiers are localCheckpointed (the iterative-
    lineage discipline of pagerank_hosts) and the loop exits as soon as
    a frontier comes back empty. At web scale the visited anti-join is
    the hot spot: production keeps `dist` hash-bucketed on node so the
    anti-join co-partitions, or swaps in a Bloom-filter pre-kill (cf.
    pages/bloom.py) with the exact anti-join on the sliver.

    Action discipline (round-6, guide §2.6): the per-round frontier is
    LAZILY localCheckpointed and its emptiness check is a full count —
    one Spark job computes, persists, and convergence-checks the round
    (the eager-checkpoint + limit(1).count shape paid two jobs and
    cached only the partitions limit touched); the growing dist union is
    lazily checkpointed and materializes inside the next round's count.
    """
    # Pin the edge list once (see sssp_costs): every round re-probes it,
    # and callers pass derived plans whose recomputation would otherwise
    # be charged once per round.
    #
    # ``rows_hint``: caller-known bound on the node space (so on the
    # dist/frontier tables).  When given, the loop rounds run under
    # AQE-off static plans sized from that bound (operators/iterconf.py)
    # — one Spark job per round instead of 2-3 AQE stage-jobs (A/B at
    # sf0.1: 22 -> 11 jobs, 1.87 -> 1.34 s interleaved best); the edge
    # pin then materializes EAGERLY under the caller's AQE conf so the
    # derived edge-build plan keeps its scan parallelism.
    from contextlib import nullcontext

    from versatiles_rs_spark.operators.iterconf import static_round_conf

    if rows_hint:
        edges = edges.select("src", "dst").localCheckpoint(eager=True)
        scope = static_round_conf(edges.sparkSession, rows_hint)
    else:
        edges = edges.select("src", "dst").localCheckpoint(eager=False)
        scope = nullcontext()
    dist = seeds.select(F.col("node"), F.lit(0).alias("hops")).distinct()
    dist = dist.localCheckpoint(eager=True)
    frontier = dist.select("node")
    # One-exchange rounds (round-6, guide §2.4): the previous round paid
    # a distinct exchange, a two-exchange anti-join against the visited
    # set, and a dist-union checkpoint. Union the tagged visited rows
    # with the raw frontier expansions instead and aggregate min(hops)
    # AND min(visited-tagged hops) per node in ONE groupBy: every
    # previously-seen node keeps its (strictly smaller) hop count, and a
    # node is NEW iff it has no visited-tagged row — the same rows the
    # anti-join produced, one shuffle per round.
    with scope:
        for h in range(1, max_hops + 1):
            exp = frontier.join(edges, frontier["node"] == edges["src"]).select(
                F.col("dst").alias("node"), F.lit(h).alias("hops")
            )
            merged = (
                dist.select("node", "hops", F.lit(0).alias("_tag"))
                .unionByName(exp.select("node", "hops", F.lit(1).alias("_tag")))
                .groupBy("node")
                .agg(
                    F.min("hops").alias("hops"),
                    F.min(F.when(F.col("_tag") == 0, F.col("hops"))).alias("_ohops"),
                )
                .localCheckpoint(eager=False)
            )
            fresh = F.col("_ohops").isNull()
            new_cnt = merged.filter(fresh).count()
            dist = merged.select("node", "hops")
            if new_cnt == 0:
                break
            frontier = merged.filter(fresh).select("node")
    return dist


def sssp_costs(
    edges: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 40,
    stride: int = 4,
    broadcast_edges: bool = False,
    rows_hint: int | None = None,
) -> DataFrame:
    """Multi-source single-source-shortest-path costs over positive
    integer edge weights — the weighted upgrade of ``bfs_hops`` (crawl
    depth where hops aren't equal: politeness delay, fetch cost, link
    quality). Input: ``edges`` (src, dst, wgt > 0), ``seeds`` (node).
    Output: (node, cost) exact minimum cost from any seed, for every
    reachable node.

    Plan: frontier Bellman-Ford — each round relaxes only the nodes
    IMPROVED last round (frontier-sized join against edges), merges
    candidate costs into the distance table with one min-agg, and exits
    as soon as a round improves nothing. Positive weights guarantee
    convergence in <= |V| rounds; real graphs converge in
    O(shortest-path diameter). Frontiers and the distance table are
    localCheckpointed per round (iterative-lineage discipline).

    ``stride``: lazy relaxation depth per materialization — each round
    chains ``stride`` frontier->edges joins WITHOUT a barrier and merges
    their union once, cutting synchronization rounds (and checkpoint/
    count actions) by the stride factor. Sound because Bellman-Ford
    relaxation is monotone: extra or stale relaxations can only produce
    costs the min-merge discards; the exit condition (no improvement
    anywhere) is unchanged, so the fixpoint is the exact SSSP.

    Action discipline (round-6, guide §2.6): `imp` is LAZILY
    localCheckpointed and counted in full — one Spark job computes,
    persists, and convergence-checks the round (the previous shape paid
    an eager checkpoint job + a limit(1).count job + an eager dist-merge
    job = 3 actions per round); the merged dist is lazily checkpointed
    and materializes inside the next round's count (or the caller's
    first action after convergence).
    """
    # Pin the edge list once: callers often pass a DERIVED plan (scan +
    # distinct + explode), and each round references it `stride` times —
    # without this, round k recomputes that subtree stride times (guide
    # §5 caching rule: reused AND expensive to recompute). Lazy: the
    # first round's count materializes it.
    #
    # A checkpointed table has UNKNOWN size statistics, so every wave
    # join would plan as sort-merge (two exchanges per wave). Callers
    # that know the graph is dimension-table-sized pass
    # broadcast_edges=True (guide §3.1: explicit broadcast hint when a
    # side is known small) and every relaxation join becomes
    # exchange-free; web-scale edge lists keep the default shuffle path.
    # ``rows_hint``: caller-known bound on the node space.  When given,
    # the rounds run under AQE-off static plans sized from that bound
    # (operators/iterconf.py) — one job per round.  Mutually exclusive
    # with ``broadcast_edges`` in practice: under a static plan every
    # wave's broadcast build would re-execute as its own job per action
    # (measured 22 -> 113 jobs), so static rounds keep the SMJ path.
    from contextlib import nullcontext

    from versatiles_rs_spark.operators.iterconf import static_round_conf

    if rows_hint:
        edges = edges.select("src", "dst", "wgt").localCheckpoint(eager=True)
        scope = static_round_conf(edges.sparkSession, rows_hint)
    else:
        edges = edges.select("src", "dst", "wgt").localCheckpoint(eager=False)
        scope = nullcontext()
    if broadcast_edges:
        edges = F.broadcast(edges)
    dist = (
        seeds.select("node", F.lit(0).alias("cost"))
        .distinct()
        .localCheckpoint(eager=False)  # round 1's count materializes it
    )
    # One-exchange rounds (round-6, guide §2.4): the previous round shape
    # paid a candidate min-agg exchange, a sort-merge join of candidates
    # vs the checkpointed dist (2 exchanges — checkpointed tables have
    # unknown stats) just to FIND improvements, and a dist union-merge
    # exchange. All three collapse into one union + groupBy: tag dist
    # rows 0 and wave expansions 1, aggregate min(cost) AND
    # min(old-tagged cost) per node in a single pass — the new dist is
    # min(cost) (min-merge is associative, discards non-improvements),
    # and a node improved iff it had no old cost or the merged min is
    # strictly below it. Same fixpoint, same exit condition, one shuffle
    # per round.
    frontier = dist
    with scope:
        for _ in range(max_rounds):
            waves = []
            c = frontier
            for _i in range(max(1, stride)):
                c = (
                    c.join(edges, c["node"] == edges["src"])
                    .select(F.col("dst").alias("node"), (F.col("cost") + F.col("wgt")).alias("cost"))
                )
                waves.append(c)
            allc = dist.select("node", "cost", F.lit(0).alias("_tag"))
            for wv in waves:
                allc = allc.unionByName(wv.select("node", "cost", F.lit(1).alias("_tag")))
            merged = (
                allc.groupBy("node")
                .agg(
                    F.min("cost").alias("cost"),
                    F.min(F.when(F.col("_tag") == 0, F.col("cost"))).alias("_ocost"),
                )
                .localCheckpoint(eager=False)
            )
            improved = F.col("_ocost").isNull() | (F.col("cost") < F.col("_ocost"))
            imp_cnt = merged.filter(improved).count()
            dist = merged.select("node", "cost")
            if imp_cnt == 0:
                break
            frontier = merged.filter(improved).select("node", "cost")
    return dist
