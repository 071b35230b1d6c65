"""ArcGraph: topology-aware shared-border simplification.

Re-implements the semantics of versatiles_geometry/src/feature_import/
arc_graph/ (extract.rs:39 build, simplify.rs:17 chained simplify,
reassemble.rs:17): polygon rings that share borders (admin boundaries!) are
decomposed into *arcs* — maximal vertex chains whose every edge is shared by
the same set of rings. Each arc is simplified ONCE, then rings reassemble
from the simplified arcs, so two neighboring polygons keep bit-identical
shared borders after simplification — no slivers, no gaps. Naive per-ring
Douglas-Peucker cannot guarantee this (each ring would keep a different
vertex subset of the border).

Algorithm (batch-local; runs inside an applyInPandas topology group or on
the driver — the reference also builds its graph once in memory):

1. index every directed edge by its canonical undirected key -> the set of
   (ring id)s using it;
2. a vertex is a *junction* if its incident edges do not all share the same
   ring set (or its degree != 2 within a ring set);
3. split each ring at junctions into arcs; canonicalize arc orientation so
   both users of a shared border reference the same arc object;
4. simplify each arc once (DP, endpoints pinned);
5. reassemble each ring by concatenating its arcs (reversed where needed).
"""

from __future__ import annotations

from versatiles_rs_spark.functions.geometry import simplify_dp

Pt = tuple[float, float]


def _edge_key(a: Pt, b: Pt) -> tuple[Pt, Pt]:
    return (a, b) if a <= b else (b, a)


def build_arc_graph(rings: list[list[Pt]]) -> tuple[list[list[Pt]], list[list[tuple[int, bool]]]]:
    """Decompose closed rings into shared arcs.

    Returns (arcs, ring_specs): ``arcs[i]`` is a vertex chain;
    ``ring_specs[r]`` is the ordered list of (arc_id, reversed) rebuilding
    ring r.
    """
    # normalize: drop explicit closing vertex
    norm = []
    for ring in rings:
        r = list(ring)
        if len(r) > 1 and r[0] == r[-1]:
            r = r[:-1]
        norm.append(r)

    edge_users: dict[tuple[Pt, Pt], frozenset[int]] = {}
    for ri, r in enumerate(norm):
        for i in range(len(r)):
            k = _edge_key(r[i], r[(i + 1) % len(r)])
            edge_users[k] = edge_users.get(k, frozenset()) | {ri}

    # a vertex is a junction for ring r if its two incident ring edges have
    # different user sets (border ownership changes there), or it is an
    # endpoint shared by >2 edges overall
    vertex_edges: dict[Pt, set[tuple[Pt, Pt]]] = {}
    for k in edge_users:
        vertex_edges.setdefault(k[0], set()).add(k)
        vertex_edges.setdefault(k[1], set()).add(k)

    def is_junction(ri: int, r: list[Pt], idx: int) -> bool:
        v = r[idx]
        prev_k = _edge_key(r[idx - 1], v)
        next_k = _edge_key(v, r[(idx + 1) % len(r)])
        if edge_users[prev_k] != edge_users[next_k]:
            return True
        return len(vertex_edges[v]) > 2

    arcs: list[list[Pt]] = []
    arc_ids: dict[tuple[Pt, ...], int] = {}
    ring_specs: list[list[tuple[int, bool]]] = []

    for ri, r in enumerate(norm):
        n = len(r)
        junctions = [i for i in range(n) if is_junction(ri, r, i)]
        spec: list[tuple[int, bool]] = []
        if not junctions:
            # whole ring is one closed arc owned by one user set
            chain = r + [r[0]]
            key = tuple(chain) if chain[0] <= chain[-1] else tuple(reversed(chain))
            rev = tuple(chain) != key
            if key not in arc_ids:
                arc_ids[key] = len(arcs)
                arcs.append(list(key))
            spec.append((arc_ids[key], rev))
        else:
            m = len(junctions)
            for j in range(m):
                a = junctions[j]
                b = junctions[(j + 1) % m]
                # vertex chain a..b inclusive (wrapping)
                if b > a:
                    chain = r[a : b + 1]
                else:
                    chain = r[a:] + r[: b + 1]
                fwd = tuple(chain)
                bwd = tuple(reversed(chain))
                key = fwd if fwd <= bwd else bwd
                rev = key != fwd
                if key not in arc_ids:
                    arc_ids[key] = len(arcs)
                    arcs.append(list(key))
                spec.append((arc_ids[key], rev))
        ring_specs.append(spec)
    return arcs, ring_specs


def reassemble_rings(
    arcs: list[list[Pt]], ring_specs: list[list[tuple[int, bool]]]
) -> list[list[Pt]]:
    """Rebuild closed rings from (possibly simplified) arcs."""
    out = []
    for spec in ring_specs:
        ring: list[Pt] = []
        for arc_id, rev in spec:
            chain = arcs[arc_id][::-1] if rev else arcs[arc_id]
            if ring and ring[-1] == chain[0]:
                ring.extend(chain[1:])
            else:
                ring.extend(chain)
        if len(ring) > 1 and ring[0] == ring[-1]:
            ring = ring[:-1]
        out.append(ring)
    return out


def simplify_rings_topology(
    rings: list[list[Pt]], tolerance: float
) -> list[list[Pt]]:
    """Simplify a set of rings with shared-border consistency: every shared
    arc is simplified once (endpoints pinned), so adjacent rings keep
    identical borders (arc_graph/simplify.rs semantics)."""
    arcs, specs = build_arc_graph(rings)
    simplified = [simplify_dp(a, tolerance) for a in arcs]
    return reassemble_rings(simplified, specs)
