"""Deterministic admin-like polygon corpus for the vector-geometry
cascade (from_geo candidate explode -> clip -> render) at bench scale.

Every document becomes one axis-aligned rectangular ring placed on a
1/16-of-a-z8-tile grid with a +1/96 offset. The offset makes every
tile-assignment floor DECIDABLE despite cross-engine float noise: a
decision boundary is floor(grid*2^(z-8) +/- 80/4096), i.e. (dyadic) +
1/(3*2^(13-z)); the 3 in the denominator can never cancel against the
dyadic terms, so the boundary sits >= 1/(3*2^13) ~ 4e-5 of a tile away
from every integer at EVERY zoom 0..8 — six orders of magnitude above
libm round-trip noise (lat = inverse-Mercator(yf) forward-maps back to
yf only to ~1 ulp). A dyadic offset would NOT work: e.g. +1/64 at z6
gives grid/4 - 80/4096 exactly integral, a knife-edge where engines
disagree. All literals are e-notation (1e0/96, 360e0, ...) because both
Spark SQL and DuckDB parse `1.0` as DECIMAL, and decimal-typed
arithmetic rounds differently from IEEE doubles.

Because the rectangles ARE their bounding boxes, every candidate tile
(bbox overlap with the 80/4096 buffer, from_geo.py candidate_tiles)
renders a non-degenerate clipped polygon (minimum sliver 1/256 of a tile
= 16 MVT px), so per-tile rendered feature counts equal the closed-form
candidate counts — which is exactly what the DuckDB oracle computes.

Reference semantics: feature import + tiling cascade
versatiles_geometry/src/feature_import/mod.rs:95-140.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_ZOOM = 0
MAX_ZOOM = 8
_BUF = "80e0/4096"  # from_geo.BUFFER_FRAC, dyadic 5/256

# shared engine-twin formulas ({i} = non-negative feature id).
# Multipliers are the usual public hash primes (Knuth 2654435761,
# xxhash 2246822519 / 3266489917); products stay far below 2^53 so the
# arithmetic is exact in both engines. Portable positive mod throughout.
_XF0 = "((((({i}) * 2654435761) % 3998) + 3998) % 3998 / 16e0 + 1e0/96)"
_W = "(((((({i}) * 40503) % 64) + 64) % 64 + 1) / 16e0)"
_YF0 = "((((({i}) * 2246822519) % 3998) + 3998) % 3998 / 16e0 + 1e0/96)"
_H = "(((((({i}) * 3266489917) % 64) + 64) % 64 + 1) / 16e0)"


def _lon(xf: str) -> str:
    return f"((({xf}) / 256e0 - 5e-1) * 360e0)"


def _lat(yf: str) -> str:
    # inverse Web Mercator of the z8 fractional row (y down)
    return (
        f"degrees(2e0 * atan(exp((1e0 - 2e0 * ({yf}) / 256e0) * pi()))"
        f" - pi() / 2e0)"
    )


def synth_admin_features(
    spark: SparkSession, sf_dir: str, replicate: int = 1
) -> DataFrame:
    """documents.parquet doc_ids -> FEATURE_ROW_SCHEMA rows (one closed
    rectangular Polygon ring per doc), pure Column math, zero Python."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    if replicate > 1:
        r = F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("r")
        docs = docs.select("doc_id", r).select(
            (F.col("doc_id") * replicate + F.col("r")).alias("doc_id")
        )
    # the input is one small parquet file (one scan task), but every doc
    # fans out into a 9-zoom Douglas-Peucker chain downstream — spread the
    # doc_ids BEFORE the heavy per-feature work or the whole candidate
    # explode runs single-task (measured 6.6 s -> sub-second at sf0.1)
    docs = docs.repartition(spark.sparkContext.defaultParallelism * 2)
    i = "doc_id"
    xf0, w = _XF0.format(i=i), _W.format(i=i)
    yf0, h = _YF0.format(i=i), _H.format(i=i)
    lon0, lon1 = _lon(xf0), _lon(f"{xf0} + {w}")
    lat0, lat1 = _lat(yf0), _lat(f"{yf0} + {h}")
    ring = (
        f"array(array({lon0}, {lat0}), array({lon1}, {lat0}), "
        f"array({lon1}, {lat1}), array({lon0}, {lat1}), "
        f"array({lon0}, {lat0}))"
    )
    return docs.select(
        F.col("doc_id").alias("feature_id"),
        F.lit("Polygon").alias("geom_type"),
        F.expr(f"array({ring})").alias("coords"),
        F.expr("map()").cast("map<string,string>").alias("props"),
    )


def admin_tiles_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin: closed-form per-tile (n_features, sum_fid) for the
    z0-8 cascade over the same synthesized rectangles, INCLUDING the
    render-stage drop rule: a candidate survives only if its clipped
    rect quantizes to nonzero area (geometry.py quantize_ring: snap =
    floor(v*4096 + 0.5), degenerate when both edges snap to the same
    pixel). For axis-aligned rects that predicate is exactly
    qx0 != qx1 AND qy0 != qy1 — decidable because every snap input sits
    1/6 px away from the nearest rounding threshold (the 1/96 offset's
    1/3-denominator again)."""
    i = "i"
    xf0, w = _XF0.format(i=i), _W.format(i=i)
    yf0, h = _YF0.format(i=i), _H.format(i=i)

    def _q(v: str) -> str:
        return f"floor(({v}) * 4096e0 + 5e-1)"

    qx0 = _q(f"GREATEST(xf0 * pow(2e0, z - 8) - x, -({_BUF}))")
    qx1 = _q(f"LEAST(xf1 * pow(2e0, z - 8) - x, 1e0 + {_BUF})")
    qy0 = _q(f"GREATEST(yf0 * pow(2e0, z - 8) - y, -({_BUF}))")
    qy1 = _q(f"LEAST(yf1 * pow(2e0, z - 8) - y, 1e0 + {_BUF})")
    return f"""
WITH ids AS (SELECT doc_id AS i FROM {table}),
geom AS (
  SELECT i, {xf0} AS xf0, {xf0} + {w} AS xf1,
         {yf0} AS yf0, {yf0} + {h} AS yf1
  FROM ids
), zs AS (SELECT CAST(z AS INTEGER) AS z FROM generate_series(0, 8) t(z)),
tl AS (
  SELECT i, z, xf0, xf1, yf0, yf1,
    GREATEST(0, CAST(floor(xf0 * pow(2e0, z - 8) - {_BUF}) AS BIGINT)) AS tx0,
    LEAST(CAST(pow(2e0, z) AS BIGINT) - 1,
          CAST(floor(xf1 * pow(2e0, z - 8) + {_BUF}) AS BIGINT)) AS tx1,
    GREATEST(0, CAST(floor(yf0 * pow(2e0, z - 8) - {_BUF}) AS BIGINT)) AS ty0,
    LEAST(CAST(pow(2e0, z) AS BIGINT) - 1,
          CAST(floor(yf1 * pow(2e0, z - 8) + {_BUF}) AS BIGINT)) AS ty1
  FROM geom CROSS JOIN zs
), cx AS (
  SELECT i, z, xf0, xf1, yf0, yf1,
         unnest(range(tx0, tx1 + 1)) AS x, ty0, ty1 FROM tl
), cand AS (
  SELECT i, z, xf0, xf1, yf0, yf1, x,
         unnest(range(ty0, ty1 + 1)) AS y FROM cx
), kept AS (
  SELECT i, z, x, y FROM cand
  WHERE {qx0} != {qx1} AND {qy0} != {qy1}
)
SELECT z, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       CAST(count(*) AS BIGINT) AS n_features,
       CAST(sum(i) AS BIGINT) AS sum_fid
FROM kept GROUP BY 1, 2, 3
"""
