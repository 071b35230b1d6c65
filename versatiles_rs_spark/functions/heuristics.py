"""Zoom heuristics + CEL-expression translation.

- ``auto_max_zoom``: versatiles_geometry/src/feature_import/heuristics.rs:
  25-68 — median feature size (mercator length for lines, sqrt(area) for
  polygons) mapped to the zoom where it spans ≈ 4 px of a 4096-extent tile;
  point-only sources get 14.

- ``cel_to_spark_expr``: the plan-time translation of the reference's CEL
  feature predicates (vector_filter_features.rs:9-81) into Catalyst SQL
  expressions over the exploded-features props map — same compile-once,
  analyze-at-build property.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TILE_EXTENT = 4096
TARGET_PX = 4.0
WORLD_SIZE = 2.0 * math.pi * 6_378_137.0
POINT_ONLY_MAX_ZOOM = 14


def auto_max_zoom_from_size(median_size_m: float | None) -> int:
    """Zoom where median_size ≈ TARGET_PX pixels (heuristics.rs math):
    ground size of one px at z = WORLD_SIZE / (2^z * TILE_EXTENT/256 px...)
    We use the tile-edge px convention: px_size(z) = WORLD_SIZE / (2^z * 256).
    """
    if median_size_m is None or median_size_m <= 0:
        return POINT_ONLY_MAX_ZOOM
    z = math.log2(WORLD_SIZE * TARGET_PX / (median_size_m * 256.0))
    return max(0, min(POINT_ONLY_MAX_ZOOM, math.ceil(z)))


def auto_max_zoom(features: DataFrame, size_col: str | None = None) -> int:
    """Distributed form: percentile_approx(median) of the size column; a
    null/absent size column means point-only -> 14."""
    if size_col is None or size_col not in features.columns:
        return POINT_ONLY_MAX_ZOOM
    med = features.agg(F.percentile_approx(size_col, 0.5).alias("m")).collect()[0]["m"]
    return auto_max_zoom_from_size(med)


# ---------------------------------------------------------------------------
# CEL -> Spark SQL
# ---------------------------------------------------------------------------

_CEL_REWRITES = [
    (re.compile(r"\bprops\[(?P<q>['\"])(?P<k>[^'\"]+)(?P=q)\]"), r"props['\g<k>']"),
    (re.compile(r"(?<![=!<>])\s==\s"), " = "),
    (re.compile(r"\s&&\s"), " AND "),
    (re.compile(r"\s\|\|\s"), " OR "),
    (re.compile(r"!\s*\("), "NOT ("),
    (re.compile(r"\bmatches\((?P<a>[^,]+),\s*(?P<b>[^)]+)\)"), r"\g<a> RLIKE \g<b>"),
    (re.compile(r"\bhas\(props\[(?P<q>['\"])(?P<k>[^'\"]+)(?P=q)\]\)"), r"props['\g<k>'] IS NOT NULL"),
]


def cel_to_spark_expr(cel: str) -> str:
    """FAST-PATH translation of simple CEL (map access, ==, &&, ||, !,
    matches, has) into a Spark SQL boolean string so the filter runs inside
    Catalyst/codegen on exploded features. This is a syntactic subset — the
    full-semantics CEL implementation (missing-key->null, heterogeneous
    equality, error-to-false) lives in ``functions.cel.compile_cel`` and is
    what the VPL ``vector_filter_features`` op uses. Raises at plan time if
    the result does not parse — the compile-at-build contract."""
    out = cel
    for rx, rep in _CEL_REWRITES:
        out = rx.sub(rep, out)
    return out


def filter_features_cel(exploded: DataFrame, cel: str) -> DataFrame:
    """Apply a CEL predicate to an explode_features DataFrame. The
    expression is analyzed here (plan build); bad CEL fails before any job
    runs — vector_filter_features.rs:68-81 behavior.

    Fast path: the full AST translates to a Catalyst Column
    (functions.cel.cel_to_column) so the predicate runs inside
    WholeStageCodegen with zero Python in the filter. Outside the
    translatable subset, the real CEL evaluator (compile_cel — missing-key
    -> null, heterogeneous equality, error absorption) runs as an
    Arrow-batched pandas UDF over the props map; both paths parse at build
    time and share identical semantics on stringified props."""
    from versatiles_rs_spark.functions.cel import cel_to_column, compile_cel

    col = cel_to_column(cel, props_col="props")
    if col is not None:
        return exploded.filter(col)

    pred = compile_cel(cel)  # parse now: malformed CEL fails at build

    @F.pandas_udf("boolean")
    def cel_udf(props: pd.Series) -> pd.Series:
        return props.map(lambda p: pred(dict(p) if p is not None else {}))

    return exploded.filter(cel_udf(F.col("props")))
