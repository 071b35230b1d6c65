"""Incremental tile maintenance: re-render ONLY the dirty tiles.

At 10^12 pages a daily delta touches a sliver of the corpus; rebuilding
the whole pyramid (the reference's `convert` is always a full rebuild —
versatiles/src/tools/convert.rs) wastes 99%+ of the work. The batch
incremental pattern here is the one production tile pipelines use
(planetiler/tilelive diff builds; same shape as this repo's streaming
dirty-tile path, streaming/tiling.py:75):

1. delta-detect: which docs were added / removed / moved,
2. dirty set: every (z, x, y) the OLD or NEW position of a changed doc
   touches — bounded by |delta| * zooms, broadcastable,
3. re-render: the full NEW corpus assigned to tiles, SEMI-joined to the
   dirty set (partition-pruned to dirty stripes), rendered with the
   identical thinning/encode parameters as the base build,
4. patch: base tiles ANTI-join dirty, union the re-rendered tiles.
   Dirty tiles whose docs all vanished disappear (the re-render emits no
   row for them); byte-identity with a from-scratch rebuild is the
   correctness contract (tests/test_incremental.py).

Scale shape: the only corpus-sized operations are the delta full-outer
join on doc_id (skippable — pass `changed` explicitly when the ingest
log / CDC stream already knows the delta) and the semi-join of assigned
rows against the broadcast dirty set; render work is proportional to the
DELTA's tile footprint, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from versatiles_rs_spark.operators.convert import (
    assign_tiles,
    render_point_tiles,
)
from versatiles_rs_spark.operators.reduce_points import drop_rate_keep


def doc_delta(
    old_docs: DataFrame,
    new_docs: DataFrame,
    key: str = "doc_id",
    cols: tuple[str, ...] = ("lon", "lat"),
) -> DataFrame:
    """Rows of BOTH sides for every added / removed / changed doc.

    Output columns: key, the compared cols, and `side` ('old' | 'new').
    A moved doc contributes two rows (its old and new positions), so the
    dirty set covers both footprints. One co-partitioned full-outer join
    on the key — skip it entirely when the delta is already known."""
    o = old_docs.select(key, *cols)
    n = new_docs.select(key, *cols)
    on = o.alias("o").join(n.alias("n"), key, "full_outer")
    same = F.lit(True)
    for c in cols:
        same = same & (F.col(f"o.{c}") == F.col(f"n.{c}"))
    changed = on.where(
        F.col(f"o.{cols[0]}").isNull() | F.col(f"n.{cols[0]}").isNull() | ~same
    )
    old_rows = changed.where(F.col(f"o.{cols[0]}").isNotNull()).select(
        key, *[F.col(f"o.{c}").alias(c) for c in cols], F.lit("old").alias("side")
    )
    new_rows = changed.where(F.col(f"n.{cols[0]}").isNotNull()).select(
        key, *[F.col(f"n.{c}").alias(c) for c in cols], F.lit("new").alias("side")
    )
    return old_rows.unionByName(new_rows)


def dirty_tiles(
    delta: DataFrame, min_zoom: int, max_zoom: int
) -> DataFrame:
    """Distinct (z, x, y) touched by any delta row at any zoom — bounded
    by |delta| * zooms; broadcast everywhere downstream."""
    return assign_tiles(delta, min_zoom, max_zoom).select("z", "x", "y").distinct()


def incremental_convert(
    base_tiles: DataFrame,
    new_docs_geo: DataFrame,
    dirty: DataFrame,
    min_zoom: int = 0,
    max_zoom: int = 14,
    keep_ratio: float = 1.0,
    layer_name: str = "pages",
    compression: str = "gzip",
    hash_flavor: str = "splitmix",
    props_cols: list[str] | None = None,
) -> DataFrame:
    """Patch `base_tiles` so the result is byte-identical to a full
    rebuild from `new_docs_geo`, re-rendering only tiles in `dirty`.

    The thinning (keep_ratio/hash_flavor) MUST match the base build: the
    per-doc keep decision is a pure hash of (doc_id, z), so clean tiles
    keep identical content and re-rendered tiles thin identically."""
    assigned = assign_tiles(new_docs_geo, min_zoom, max_zoom)
    reduced = drop_rate_keep(assigned, "doc_id", "z", max_zoom, keep_ratio, hash_flavor)
    touched = reduced.join(F.broadcast(dirty), ["z", "x", "y"], "left_semi")
    rerendered = render_point_tiles(
        touched, layer_name, props_cols=props_cols, compression=compression
    )
    kept = base_tiles.join(F.broadcast(dirty), ["z", "x", "y"], "left_anti")
    return kept.unionByName(rerendered)
