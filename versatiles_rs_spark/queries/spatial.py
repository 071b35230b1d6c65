"""Spatial-domain queries: point-in-polygon, kNN, S2 and hex cell encodings.

Split from the single-file registry in round 5; QUERIES/ORACLES stay in
`versatiles_rs_spark.queries` (the package __init__), in driver-sweep order.
"""


from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.queries._shared import (
    LAT_SQL,
    LON_SQL,
    _docs_geo,
    _events_geo,
    _tile_sql,
)

# ---------------------------------------------------------------------------
# 11. spatial join: broadcast ray-cast point-in-polygon (raster_mask core)
# ---------------------------------------------------------------------------

def q_pip_join_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from versatiles_rs_spark.spatial import pip_join, sample_polygons

    pts = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat")
    return pip_join(pts, sample_polygons(), payload_cols=["doc_id"])


def _pip_oracle_sql() -> str:
    from versatiles_rs_spark.spatial.polygons import _RAW

    edge_rows = []
    name_rows = []
    for fid, name, _, ring in _RAW:
        name_rows.append(f"({fid}, '{name}')")
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            edge_rows.append(f"({fid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    edges = ",\n    ".join(edge_rows)
    names = ", ".join(name_rows)
    return f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), edges(fid, x1, y1, x2, y2) AS (VALUES
    {edges}
), names(fid, poly_name) AS (VALUES {names}),
crossings AS (
  SELECT p.doc_id, e.fid,
    count(*) FILTER (WHERE ((e.y1 > p.lat) <> (e.y2 > p.lat))
      AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1) AS c
  FROM pts p CROSS JOIN edges e
  GROUP BY 1, 2
)
SELECT c.doc_id, CAST(c.fid AS INTEGER) AS feature_id, n.poly_name
FROM crossings c JOIN names n ON n.fid = c.fid
WHERE c.c % 2 = 1
"""


O_PIP_JOIN_DOCS = _pip_oracle_sql()


def q_pip_join_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-cover two-stage spatial join (the 100 TB path) — must produce
    exactly the broadcast join's rows, so it shares that oracle."""
    from versatiles_rs_spark.spatial.cells import pip_join_cells
    from versatiles_rs_spark.spatial import sample_polygons

    pts = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat")
    return pip_join_cells(pts, sample_polygons(), cell_zoom=6).select(
        "doc_id", F.col("feature_id").cast("int").alias("feature_id"), "poly_name"
    )



# ---------------------------------------------------------------------------
# 12. kNN via cell-ring expansion (north rule) — oracle: SQL brute force
# ---------------------------------------------------------------------------

KNN_QUERIES = [(0, 13.4, 52.5), (1, -100.0, 40.0), (2, 0.0, -84.0)]
KNN_K = 5


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from versatiles_rs_spark.spatial.knn import knn_cell_ring

    pts = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat")
    return knn_cell_ring(pts, KNN_QUERIES, KNN_K, cell_zoom=5)


def _knn_oracle_sql() -> str:
    qvals = ", ".join(f"({qid}, {qlon!r}, {qlat!r})" for qid, qlon, qlat in KNN_QUERIES)
    return f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), qs(qid, qlon, qlat) AS (VALUES {qvals}),
scored AS (
  SELECT q.qid, p.doc_id AS pid,
         (p.lon - q.qlon) * (p.lon - q.qlon) + (p.lat - q.qlat) * (p.lat - q.qlat) AS d2
  FROM pts p CROSS JOIN qs q
), ranked AS (
  SELECT qid, pid, d2, row_number() OVER (PARTITION BY qid ORDER BY d2 ASC, pid ASC) AS rank
  FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, pid, round(d2, 9) AS dist2, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {KNN_K}
"""


O_KNN = _knn_oracle_sql()



# ---------------------------------------------------------------------------
# 15c. S2 cell encoding (north rule: "encoded into H3/S2 cells and XYZ tile
#      coordinates via batched pandas/Arrow UDFs")
# ---------------------------------------------------------------------------

_S2_LEVEL = 10


def q_s2_face_ij(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 face/i/j encoding of the documents table through the REAL numpy
    implementation (tile_math/s2.py, one Arrow-batched pass); the oracle
    reimplements the cube-face + quadratic-ST math in pure SQL, so parity
    attests the projection end to end. (The per-face Hilbert position is
    not SQL-expressible; it is property-tested in tests/test_s2.py and its
    ids feed the same cell-cover joins as the quadkey cells.)"""
    from versatiles_rs_spark.tile_math.s2 import lonlat_to_face_uv, st_to_ij, uv_to_st

    docs = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat")

    def enc(it):
        import pandas as pd

        for pdf in it:
            face, u, v = lonlat_to_face_uv(pdf["lon"].values, pdf["lat"].values)
            i10 = st_to_ij(uv_to_st(u)) >> (2 * (30 - _S2_LEVEL) // 2)
            j10 = st_to_ij(uv_to_st(v)) >> (2 * (30 - _S2_LEVEL) // 2)
            yield pd.DataFrame({"face": face, "i10": i10, "j10": j10})

    cells = docs.mapInPandas(enc, "face long, i10 long, j10 long")
    return cells.groupBy("face").agg(
        F.count("*").alias("n"),
        F.sum("i10").alias("i_sum"),
        F.sum("j10").alias("j_sum"),
    )


O_S2_FACE_IJ = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), xyz AS (
  SELECT doc_id,
         cos(radians(lat)) * cos(radians(lon)) AS x,
         cos(radians(lat)) * sin(radians(lon)) AS y,
         sin(radians(lat)) AS z
  FROM pts
), fuv AS (
  SELECT doc_id,
    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN CASE WHEN x < 0 THEN 3 ELSE 0 END
         WHEN abs(y) >= abs(z) THEN CASE WHEN y < 0 THEN 4 ELSE 1 END
         ELSE CASE WHEN z < 0 THEN 5 ELSE 2 END END AS face,
    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN
           CASE WHEN x < 0 THEN z / x ELSE y / x END
         WHEN abs(y) >= abs(z) THEN
           CASE WHEN y < 0 THEN z / y ELSE -x / y END
         ELSE CASE WHEN z < 0 THEN -y / z ELSE -x / z END END AS u,
    CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN
           CASE WHEN x < 0 THEN y / x ELSE z / x END
         WHEN abs(y) >= abs(z) THEN
           CASE WHEN y < 0 THEN -x / y ELSE z / y END
         ELSE CASE WHEN z < 0 THEN -x / z ELSE -y / z END END AS v
  FROM xyz
), st AS (
  SELECT face,
    CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3 * u) ELSE 1 - 0.5 * sqrt(1 - 3 * u) END AS s,
    CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3 * v) ELSE 1 - 0.5 * sqrt(1 - 3 * v) END AS t
  FROM fuv
)
SELECT CAST(face AS BIGINT) AS face, count(*) AS n,
  CAST(sum(CAST(least(greatest(floor(s * 1073741824), 0), 1073741823) AS BIGINT) // {1 << 20}) AS BIGINT) AS i_sum,
  CAST(sum(CAST(least(greatest(floor(t * 1073741824), 0), 1073741823) AS BIGINT) // {1 << 20}) AS BIGINT) AS j_sum
FROM st GROUP BY face
"""


_HEX_RADIUS_M = 150_000.0


def q_hex_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-style hexagonal binning (spatial/hexcells.py): axial hex cells on
    the Mercator plane via cube rounding — pure Column math, zero UDF, the
    third cell-key family next to quadkey and S2."""
    from versatiles_rs_spark.spatial.hexcells import hex_cell_stats

    return hex_cell_stats(_docs_geo(spark, sf_dir), _HEX_RADIUS_M)


O_HEX_CELL_STATS = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), merc AS (
  SELECT doc_id, radians(lon) * 6378137.0 AS mx,
         ln(tan(radians(lat)/2 + pi()/4)) * 6378137.0 AS my
  FROM pts
), ax AS (
  SELECT doc_id,
         (2.0/3.0 * mx) / {_HEX_RADIUS_M} AS q,
         (-1.0/3.0 * mx + sqrt(3.0)/3.0 * my) / {_HEX_RADIUS_M} AS r
  FROM merc
), rounded AS (
  SELECT doc_id, q AS x, (-q - r) AS y, r AS z,
         floor(q + 0.5) AS rx, floor((-q - r) + 0.5) AS ry, floor(r + 0.5) AS rz
  FROM ax
), fixed AS (
  SELECT doc_id,
    CASE WHEN abs(rx - x) > abs(ry - y) AND abs(rx - x) > abs(rz - z)
         THEN -ry - rz ELSE rx END AS hq,
    CASE WHEN abs(rx - x) > abs(ry - y) AND abs(rx - x) > abs(rz - z) THEN rz
         WHEN abs(ry - y) > abs(rz - z) THEN rz
         ELSE -rx - ry END AS hr
  FROM rounded
)
SELECT CAST(hq AS BIGINT) AS hq, CAST(hr AS BIGINT) AS hr,
       count(*) AS n, min(doc_id) AS min_id
FROM fixed GROUP BY 1, 2
"""




def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal statistics (operators/zonal.py): a 32x32 DEM tile pyramid
    level (64px tiles; elevation affine in global pixel coords, raw =
    3*gx + 5*gy + 1000, real PNG bytes through the real decoder) is
    aggregated per pixel-rectangle zone. The oracle computes the same
    window sums in CLOSED FORM (arithmetic series — exact because raw
    values are integers), attesting tile cover, window clipping, the
    PNG+DEM decode, and the mergeable partial aggregation."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.raster import png_encode
    from versatiles_rs_spark.operators.zonal import zonal_stats

    t = 64

    base = spark.range(32 * 32).select(
        F.expr("id div 32").alias("x"), (F.col("id") % 32).alias("y")
    )

    def gen(it):
        for pdf in it:
            rows = {"x": [], "y": [], "tile": []}
            for r in pdf.itertuples(index=False):
                gx = np.arange(r.x * t, (r.x + 1) * t, dtype=np.int64)
                gy = np.arange(r.y * t, (r.y + 1) * t, dtype=np.int64)
                raw = 3 * gx[None, :] + 5 * gy[:, None] + 1000
                rgb = np.stack(
                    [(raw >> 16) & 255, (raw >> 8) & 255, raw & 255], axis=-1
                ).astype(np.uint8)
                rows["x"].append(r.x)
                rows["y"].append(r.y)
                rows["tile"].append(png_encode(rgb))
            yield pd.DataFrame(rows)

    tiles = base.repartition(8).mapInPandas(gen, "x bigint, y bigint, tile binary")

    i = F.col("id")
    zones = spark.range(50).select(
        i.alias("zone_id"),
        ((i * 37) % 1900).alias("gx0"),
        ((i * 37) % 1900 + 40 + (i % 7) * 13).alias("gx1"),
        ((i * 53) % 1900).alias("gy0"),
        ((i * 53) % 1900 + 30 + (i % 5) * 17).alias("gy1"),
    )
    return zonal_stats(tiles, zones, t).orderBy("zone_id")


O_ZONAL_STATS = """
WITH z AS (
  SELECT i AS zone_id,
         (i * 37) % 1900 AS gx0, (i * 37) % 1900 + 40 + (i % 7) * 13 AS gx1,
         (i * 53) % 1900 AS gy0, (i * 53) % 1900 + 30 + (i % 5) * 17 AS gy1
  FROM generate_series(0, 49) AS s(i)
), d AS (
  SELECT zone_id, gx1 - gx0 AS w, gy1 - gy0 AS h,
         ((gx0 + gx1 - 1) * (gx1 - gx0)) // 2 AS sum_gx,
         ((gy0 + gy1 - 1) * (gy1 - gy0)) // 2 AS sum_gy,
         gx0, gx1, gy0, gy1
  FROM z
)
SELECT zone_id, w * h AS n_px,
       3 * sum_gx * h + 5 * sum_gy * w + 1000 * w * h AS sum_raw,
       3 * gx0 + 5 * gy0 + 1000 AS min_raw,
       3 * (gx1 - 1) + 5 * (gy1 - 1) + 1000 AS max_raw
FROM d ORDER BY zone_id
"""


def q_dem_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Halo-exchange terrain derivative (operators/map_algebra.py):
    per-tile forward-difference slope sums over a 32x32 DEM level with
    QUADRATIC elevation (raw = gx^2 + 2*gy^2) — border columns/rows use
    the neighbor tile's strip, so a missing or misaligned halo changes
    both counts and sums. The oracle computes each tile's sums in closed
    form (arithmetic series of 2gx+1 / 4gy+2), with the world-edge
    column/row excluded exactly like the operator's absent-halo rule."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.raster import png_encode
    from versatiles_rs_spark.operators.map_algebra import dem_slope_stats

    t = 64

    base = spark.range(32 * 32).select(
        F.expr("id div 32").alias("x"), (F.col("id") % 32).alias("y")
    )

    def gen(it):
        for pdf in it:
            rows = {"x": [], "y": [], "tile": []}
            for r in pdf.itertuples(index=False):
                gx = np.arange(r.x * t, (r.x + 1) * t, dtype=np.int64)
                gy = np.arange(r.y * t, (r.y + 1) * t, dtype=np.int64)
                raw = gx[None, :] ** 2 + 2 * gy[:, None] ** 2
                rgb = np.stack(
                    [(raw >> 16) & 255, (raw >> 8) & 255, raw & 255], axis=-1
                ).astype(np.uint8)
                rows["x"].append(r.x)
                rows["y"].append(r.y)
                rows["tile"].append(png_encode(rgb))
            yield pd.DataFrame(rows)

    tiles = base.repartition(8).mapInPandas(gen, "x bigint, y bigint, tile binary")
    return dem_slope_stats(tiles, t).orderBy("x", "y")


O_DEM_SLOPE = """
WITH g AS (
  SELECT i // 32 AS x, i % 32 AS y FROM generate_series(0, 1023) AS s(i)
), b AS (
  SELECT x, y,
         64 * x AS ax, 64 * x + 63 - CASE WHEN x = 31 THEN 1 ELSE 0 END AS bx,
         64 * y AS ay, 64 * y + 63 - CASE WHEN y = 31 THEN 1 ELSE 0 END AS by
  FROM g
)
SELECT x, y,
       64 * (bx - ax + 1) AS n_dx,
       64 * (bx - ax + 1) * (ax + bx + 1) AS sum_dx,
       64 * (by - ay + 1) AS n_dy,
       64 * (by - ay + 1) * 2 * (ay + by + 1) AS sum_dy
FROM b ORDER BY x, y
"""


def q_reverse_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse geocoding: nearest of 100 zone centers per document, by
    exact integer quantized-degree distance (1e6 units; ties -> lowest
    zone_id). Scale shape = semantic_decontaminate's: the zone dimension
    is bounded, so its integer matrix broadcasts and one mapInPandas
    pass computes the (batch x zones) argmin — zero joins, zero
    shuffles, corpus streamed once. Oracle brute-forces the same argmin
    with a windowed cross join."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    centers = np.array(
        [
            (i, (i * 77 % 360 - 180) * 1_000_000 + 500_000,
             (i * 53 % 170 - 85) * 1_000_000 + 250_000)
            for i in range(100)
        ],
        dtype=np.int64,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(360000000) - F.lit(180000000)).alias("qlon"),
        ((F.col("doc_id") * F.lit(2246822519)) % F.lit(170000000) - F.lit(85000000)).alias("qlat"),
    )
    b = spark.sparkContext.broadcast(centers)

    def nearest(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b.value  # sorted by zone_id -> argmin's first-min == lowest id
        for pdf in it:
            if not len(pdf):
                continue
            dlon = pdf["qlon"].values[:, None] - c[None, :, 1]
            dlat = pdf["qlat"].values[:, None] - c[None, :, 2]
            d2 = dlon * dlon + dlat * dlat
            j = d2.argmin(axis=1)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "zone_id": c[j, 0],
                 "d2": d2[np.arange(len(j)), j]}
            )

    return docs.mapInPandas(nearest, "doc_id bigint, zone_id bigint, d2 bigint")


O_REVERSE_GEOCODE = """
WITH c AS (
  SELECT i AS zone_id,
         (i * 77 % 360 - 180) * 1000000 + 500000 AS qclon,
         (i * 53 % 170 - 85) * 1000000 + 250000 AS qclat
  FROM generate_series(0, 99) AS s(i)
), p AS (
  SELECT doc_id,
         (doc_id * 2654435761) % 360000000 - 180000000 AS qlon,
         (doc_id * 2246822519) % 170000000 - 85000000 AS qlat
  FROM documents
), scored AS (
  SELECT p.doc_id, c.zone_id,
         (p.qlon - c.qclon) * (p.qlon - c.qclon)
           + (p.qlat - c.qclat) * (p.qlat - c.qclat) AS d2,
         row_number() OVER (
           PARTITION BY p.doc_id
           ORDER BY (p.qlon - c.qclon) * (p.qlon - c.qclon)
                      + (p.qlat - c.qclat) * (p.qlat - c.qclat),
                    c.zone_id) AS rn
  FROM p CROSS JOIN c
)
SELECT doc_id, zone_id, d2 FROM scored WHERE rn = 1
"""


def q_intersection_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-box spatial intersection join (spatial/overlaps.py): two
    deterministic rectangle layers joined on a 128-unit cell grid with
    the reference-point emit-exactly-once rule — one equi-join, no
    dedup stage, exact integer intersection areas. Oracle brute-forces
    the cross product with the same half-open overlap predicate."""
    from versatiles_rs_spark.spatial.overlaps import intersection_join

    i = F.col("id")
    a = spark.range(300).select(
        i.alias("id"),
        ((i * 97) % 3000).alias("x0"),
        ((i * 61) % 3000).alias("y0"),
        ((i * 97) % 3000 + 20 + (i % 13) * 7).alias("x1"),
        ((i * 61) % 3000 + 15 + (i % 11) * 9).alias("y1"),
    )
    b = spark.range(300).select(
        i.alias("id"),
        ((i * 89 + 13) % 3000).alias("x0"),
        ((i * 71 + 29) % 3000).alias("y0"),
        ((i * 89 + 13) % 3000 + 25 + (i % 9) * 11).alias("x1"),
        ((i * 71 + 29) % 3000 + 10 + (i % 7) * 13).alias("y1"),
    )
    return intersection_join(a, b, cell=128)


O_INTERSECTION_JOIN = """
WITH a AS (
  SELECT i AS a_id, (i * 97) % 3000 AS x0, (i * 61) % 3000 AS y0,
         (i * 97) % 3000 + 20 + (i % 13) * 7 AS x1,
         (i * 61) % 3000 + 15 + (i % 11) * 9 AS y1
  FROM generate_series(0, 299) AS s(i)
), b AS (
  SELECT i AS b_id, (i * 89 + 13) % 3000 AS x0, (i * 71 + 29) % 3000 AS y0,
         (i * 89 + 13) % 3000 + 25 + (i % 9) * 11 AS x1,
         (i * 71 + 29) % 3000 + 10 + (i % 7) * 13 AS y1
  FROM generate_series(0, 299) AS s(i)
)
SELECT a.a_id, b.b_id,
       (least(a.x1, b.x1) - greatest(a.x0, b.x0))
         * (least(a.y1, b.y1) - greatest(a.y0, b.y0)) AS area
FROM a CROSS JOIN b
WHERE a.x0 < b.x1 AND b.x0 < a.x1 AND a.y0 < b.y1 AND b.y0 < a.y1
"""


def q_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self distance join (spatial/overlaps.distance_join): all document
    pairs within 10,000,000 quantized-degree units (~10 deg), via the
    one-cell-per-point 3x3 neighbor probe — each pair emitted exactly
    once, exact integer d². Oracle brute-forces the half cross product."""
    from versatiles_rs_spark.spatial.overlaps import distance_join

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"),
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(360000000)).alias("qx"),
        ((F.col("doc_id") * F.lit(2246822519)) % F.lit(170000000)).alias("qy"),
    )
    return distance_join(docs, radius=10_000_000)


O_DISTANCE_JOIN = """
WITH p AS (
  SELECT doc_id AS id,
         (doc_id * 2654435761) % 360000000 AS qx,
         (doc_id * 2246822519) % 170000000 AS qy
  FROM documents
)
SELECT a.id AS a_id, b.id AS b_id,
       (a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy) AS d2
FROM p a JOIN p b ON a.id < b.id
WHERE (a.qx - b.qx) * (a.qx - b.qx) + (a.qy - b.qy) * (a.qy - b.qy)
      <= 100000000000000
"""


def q_density_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-density raster tiles (operators/density.py): events binned
    onto the z3/64px global grid with TRUE int64 division, one
    map-side-combined shuffle to at most tiles*px² bin rows, per-tile
    PNG render from pre-aggregated bins (Python never sees raw points).
    The query returns the per-tile stats; the PNG render path is
    round-trip-validated in pytest. Oracle recomputes bins with // ."""
    from versatiles_rs_spark.operators.density import density_bins, density_tiles

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        ((F.col("event_id") * F.lit(2654435761)) % F.lit(360000000)).alias("qx"),
        ((F.col("event_id") * F.lit(2246822519)) % F.lit(170000000)).alias("qy"),
    )
    tiles = density_tiles(density_bins(ev, zoom=3, tile_px=64))
    # n_points crosses the oracle bridge as DuckDB sum(BIGINT) -> HUGEINT,
    # which pandas materializes as float64: match that dtype exactly so the
    # driver's value hash agrees (CORRECTNESS_r05 hash-red fix).
    return tiles.select(
        "x", "y", F.col("n_points").cast("double").alias("n_points"),
        "occupied_px", "max_bin",
    )


O_DENSITY_TILES = """
WITH g AS (
  SELECT ((event_id * 2654435761) % 360000000) * 512 // 360000000 AS gx,
         ((event_id * 2246822519) % 170000000) * 512 // 170000000 AS gy
  FROM events
), b AS (
  SELECT gx // 64 AS x, gy // 64 AS y, gx % 64 AS px, gy % 64 AS py,
         count(*) AS n
  FROM g GROUP BY 1, 2, 3, 4
)
SELECT x, y, sum(n) AS n_points, count(*) AS occupied_px, max(n) AS max_bin
FROM b GROUP BY 1, 2
"""


def q_tile_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord-style hotspot detection (operators/density.tile_hotspots):
    per-tile event counts at z6, each occupied tile's 3x3 neighborhood
    sum/present-count, hot = neighborhood mean >= global mean by exact
    integer cross-multiplication. Two exchanges over tile-cardinality
    data; oracle brute-forces the neighborhood self-join."""
    from versatiles_rs_spark.operators.convert import assign_tiles
    from versatiles_rs_spark.operators.density import tile_hotspots

    assigned = assign_tiles(_events_geo(spark, sf_dir), 6, 6)
    counts = assigned.groupBy("x", "y").agg(F.count("*").alias("n"))
    return tile_hotspots(counts, zoom=6, hot_mult=1)


O_TILE_HOTSPOTS = f"""
WITH pts AS (
  SELECT event_id, {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat
  FROM events
), c AS (
  SELECT {_tile_sql("x", z="6")} AS x, {_tile_sql("y", z="6")} AS y, count(*) AS n
  FROM pts GROUP BY 1, 2
), tot AS (SELECT sum(n) AS s, count(*) AS t FROM c),
hood AS (
  SELECT a.x, a.y,
         max(CASE WHEN b.x = a.x AND b.y = a.y THEN b.n END) AS own_n,
         CAST(sum(b.n) AS BIGINT) AS neigh_n, count(*) AS n_present
  FROM c a JOIN c b ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
  GROUP BY 1, 2
)
SELECT h.x, h.y, h.own_n, h.neigh_n, h.n_present,
       CAST(h.neigh_n * tot.t >= h.n_present * tot.s AS INT) AS hot
FROM hood h, tot
"""


def q_dem_contours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contouring (operators/map_algebra.dem_contour_cases)
    over a centered elliptic 32x32 DEM level (raw = (gx-1023)^2 +
    2*(gy-1023)^2, real PNG bytes through the real decoder) at iso-level
    9e5 — per-tile counts of every 4-bit case. The surface is non-monotone
    in both axes and the full iso-ellipse fits inside the raster
    (semi-axes 949 x 671 < 1024), so all 14 non-saddle cases occur —
    saddles (6/9) are impossible on a convex paraboloid, and a monotone
    ramp would collapse to 6 cases. Cells straddling tile borders need the right/
    bottom/diagonal neighbor's strips, so a missing or misaligned halo
    (including the single corner pixel) shifts case counts. The oracle
    recomputes every cell's corner predicate from the closed form."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.raster import png_encode
    from versatiles_rs_spark.operators.map_algebra import dem_contour_cases

    t = 64

    base = spark.range(32 * 32).select(
        F.expr("id div 32").alias("x"), (F.col("id") % 32).alias("y")
    )

    def gen(it):
        for pdf in it:
            rows = {"x": [], "y": [], "tile": []}
            for r in pdf.itertuples(index=False):
                gx = np.arange(r.x * t, (r.x + 1) * t, dtype=np.int64)
                gy = np.arange(r.y * t, (r.y + 1) * t, dtype=np.int64)
                raw = (gx[None, :] - 1023) ** 2 + 2 * (gy[:, None] - 1023) ** 2
                rgb = np.stack(
                    [(raw >> 16) & 255, (raw >> 8) & 255, raw & 255], axis=-1
                ).astype(np.uint8)
                rows["x"].append(r.x)
                rows["y"].append(r.y)
                rows["tile"].append(png_encode(rgb))
            yield pd.DataFrame(rows)

    tiles = base.repartition(8).mapInPandas(gen, "x bigint, y bigint, tile binary")
    return dem_contour_cases(tiles, t, level=900_000).orderBy("x", "y", "ms_case")


O_DEM_CONTOURS = """
WITH cells AS (
  SELECT a.i AS gx, b.i AS gy
  FROM generate_series(0, 2046) a(i) CROSS JOIN generate_series(0, 2046) b(i)
), v AS (
  SELECT gx, gy, (gx-1023)*(gx-1023) + 2*(gy-1023)*(gy-1023) AS v00,
         (gx-1022)*(gx-1022) + 2*(gy-1023)*(gy-1023) AS v10,
         (gx-1023)*(gx-1023) + 2*(gy-1022)*(gy-1022) AS v01,
         (gx-1022)*(gx-1022) + 2*(gy-1022)*(gy-1022) AS v11
  FROM cells
), c AS (
  SELECT gx // 64 AS x, gy // 64 AS y,
    (CASE WHEN v00 >= 900000 THEN 8 ELSE 0 END)
    + (CASE WHEN v10 >= 900000 THEN 4 ELSE 0 END)
    + (CASE WHEN v01 >= 900000 THEN 2 ELSE 0 END)
    + (CASE WHEN v11 >= 900000 THEN 1 ELSE 0 END) AS ms_case
  FROM v
)
SELECT x, y, CAST(ms_case AS BIGINT) AS ms_case, count(*) AS n
FROM c GROUP BY 1, 2, 3
"""


def q_map_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map matching (spatial/mapmatch.py): every event snaps to the
    nearest of 200 equal-length road segments by EXACT integer
    point-to-segment distance (millidegree coords, common squared length
    D=4e6, scaled distance S = D*|w|^2 - c*(2*w.v - c) with c =
    clamp(w.v, 0, D) — no division anywhere). Broadcast segment matrix +
    one mapInPandas argmin pass; ties -> lowest seg_id. Oracle
    brute-forces the identical algebra with a windowed cross join."""
    import numpy as np

    from versatiles_rs_spark.spatial.mapmatch import snap_to_segments

    L = 2000
    seg = np.array(
        [
            (
                i,
                (i * 97) % 340_000 - 170_000,
                (i * 61) % 150_000 - 75_000,
                L if i % 2 == 0 else 0,
                0 if i % 2 == 0 else L,
            )
            for i in range(200)
        ],
        dtype=np.int64,
    )
    pts = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id",
        ((F.col("event_id") * F.lit(2654435761)) % F.lit(360_000) - F.lit(180_000)).alias("qx"),
        ((F.col("event_id") * F.lit(2246822519)) % F.lit(170_000) - F.lit(85_000)).alias("qy"),
    )
    return snap_to_segments(pts, seg, d_sq=L * L)


O_MAP_MATCH = """
WITH seg AS (
  SELECT i AS seg_id, (i*97) % 340000 - 170000 AS ax, (i*61) % 150000 - 75000 AS ay,
         CASE WHEN i % 2 = 0 THEN 2000 ELSE 0 END AS vx,
         CASE WHEN i % 2 = 0 THEN 0 ELSE 2000 END AS vy
  FROM generate_series(0, 199) s(i)
), p AS (
  SELECT event_id, (event_id * 2654435761) % 360000 - 180000 AS qx,
         (event_id * 2246822519) % 170000 - 85000 AS qy
  FROM events
), scored AS (
  SELECT p.event_id, seg.seg_id,
    4000000 * ((qx-ax)*(qx-ax) + (qy-ay)*(qy-ay))
      - LEAST(GREATEST((qx-ax)*vx + (qy-ay)*vy, 0), 4000000)
        * (2*((qx-ax)*vx + (qy-ay)*vy)
           - LEAST(GREATEST((qx-ax)*vx + (qy-ay)*vy, 0), 4000000)) AS s
  FROM p CROSS JOIN seg
), r AS (
  SELECT event_id, seg_id, s,
         row_number() OVER (PARTITION BY event_id ORDER BY s ASC, seg_id ASC) AS rn
  FROM scored
)
SELECT event_id, seg_id, CAST(s AS BIGINT) AS s_scaled FROM r WHERE rn = 1
"""


def q_dem_flow_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow direction (operators/map_algebra.dem_flow_dir) over the
    centered elliptic DEM level (raw = (gx-1023)^2 + 2*(gy-1023)^2, real
    PNG bytes): all 8 descent directions occur around the bowl and the
    minimum region yields sinks. Needs the FULL 1px ring halo (4 strips
    + 4 corners per tile, one exchange); a misrouted or misaligned ring
    piece flips border pixels' codes. Oracle recomputes every pixel's
    argmax drop from the closed form with the exact integer slope keys
    (2*drop^2 straight vs drop^2 diagonal)."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.raster import png_encode
    from versatiles_rs_spark.operators.map_algebra import dem_flow_dir

    t = 64

    base = spark.range(32 * 32).select(
        F.expr("id div 32").alias("x"), (F.col("id") % 32).alias("y")
    )

    def gen(it):
        for pdf in it:
            rows = {"x": [], "y": [], "tile": []}
            for r in pdf.itertuples(index=False):
                gx = np.arange(r.x * t, (r.x + 1) * t, dtype=np.int64)
                gy = np.arange(r.y * t, (r.y + 1) * t, dtype=np.int64)
                raw = (gx[None, :] - 1023) ** 2 + 2 * (gy[:, None] - 1023) ** 2
                rgb = np.stack(
                    [(raw >> 16) & 255, (raw >> 8) & 255, raw & 255], axis=-1
                ).astype(np.uint8)
                rows["x"].append(r.x)
                rows["y"].append(r.y)
                rows["tile"].append(png_encode(rgb))
            yield pd.DataFrame(rows)

    tiles = base.repartition(8).mapInPandas(gen, "x bigint, y bigint, tile binary")
    return dem_flow_dir(tiles, t).orderBy("x", "y", "d8_code")


def _o_dem_flow_dir() -> str:
    def f(x: str, y: str) -> str:
        # fully parenthesized: these compose as `f(p) - f(n)`
        return f"((({x})-1023)*(({x})-1023) + 2*(({y})-1023)*(({y})-1023))"

    # D8 code order: E, SE, S, SW, W, NW, N, NE (ties -> lowest code)
    offs = [(1, 0), (1, 1), (0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1)]
    drops = ",\n    ".join(
        f"{f('gx','gy')} - {f(f'gx+({dx})', f'gy+({dy})')} AS d{i}"
        for i, (dx, dy) in enumerate(offs, start=1)
    )
    keys = ",\n    ".join(
        f"CASE WHEN d{i} > 0 THEN {2 if i % 2 == 1 else 1}*d{i}*d{i} ELSE -1 END AS k{i}"
        for i in range(1, 9)
    )
    first_match = " ".join(f"WHEN k{i} = m THEN {i}" for i in range(1, 9))
    return f"""
WITH px AS (
  SELECT a.i AS gx, b.i AS gy
  FROM generate_series(1, 2046) a(i) CROSS JOIN generate_series(1, 2046) b(i)
), d AS (
  SELECT gx, gy,
    {drops}
  FROM px
), k AS (
  SELECT gx, gy,
    {keys}
  FROM d
), c AS (
  SELECT gx // 64 AS x, gy // 64 AS y,
         greatest(k1,k2,k3,k4,k5,k6,k7,k8) AS m,
         k1, k2, k3, k4, k5, k6, k7, k8
  FROM k
), coded AS (
  SELECT x, y, CASE WHEN m < 0 THEN 0 {first_match} END AS d8_code FROM c
)
SELECT x, y, CAST(d8_code AS BIGINT) AS d8_code, count(*) AS n
FROM coded GROUP BY 1, 2, 3
"""


O_DEM_FLOW_DIR = _o_dem_flow_dir()


#: watershed fixture: 8x8 tiles of 32px (256x256 px) whose elevation is
#: the min over 12 attractor paraboloids — each attractor is a local
#: minimum, so the D8 drain graph partitions the raster into ~12 basins
#: with curved boundaries crossing many tile borders.
_WS_CENTERS = tuple(((k * 97 + 13) % 256, (k * 61 + 7) % 256) for k in range(12))


def _ws_tiles(spark: SparkSession):
    """The shared watershed/accumulation DEM fixture: 8x8 tiles of 32px,
    elevation = min over the 12 _WS_CENTERS paraboloids, real PNG bytes."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.raster import png_encode

    t = 32
    cx = np.array([c[0] for c in _WS_CENTERS], dtype=np.int64)
    cy = np.array([c[1] for c in _WS_CENTERS], dtype=np.int64)
    base = spark.range(8 * 8).select(
        F.expr("id div 8").alias("x"), (F.col("id") % 8).alias("y")
    )

    def gen(it):
        for pdf in it:
            rows = {"x": [], "y": [], "tile": []}
            for r in pdf.itertuples(index=False):
                gx = np.arange(r.x * t, (r.x + 1) * t, dtype=np.int64)
                gy = np.arange(r.y * t, (r.y + 1) * t, dtype=np.int64)
                dx2 = (gx[None, :, None] - cx[None, None, :]) ** 2
                dy2 = (gy[:, None, None] - cy[None, None, :]) ** 2
                raw = (dx2 + 2 * dy2).min(axis=-1)
                rgb = np.stack(
                    [(raw >> 16) & 255, (raw >> 8) & 255, raw & 255], axis=-1
                ).astype(np.uint8)
                rows["x"].append(r.x)
                rows["y"].append(r.y)
                rows["tile"].append(png_encode(rgb))
            yield pd.DataFrame(rows)

    return base.repartition(8).mapInPandas(gen, "x bigint, y bigint, tile binary")


def q_watershed_basins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watershed basin labeling (operators/map_algebra.dem_flow_edges +
    watershed_basins): every pixel of a 256x256 DEM level drains along
    D8 steepest descent to its terminal sink; output = per-sink basin
    size. Edge pixels drain among AVAILABLE neighbors (no world-edge
    exclusion), so basin sizes conserve the pixel count. The plan is the
    scale story: one ring-halo exchange builds per-pixel pointers,
    IN-TILE path compression collapses chains to tile hops executor-
    locally, then O(log tile-diameter) pointer-doubling joins resolve
    the global fixed point. The oracle recomputes the drain argmax from
    the closed form and follows every path with a recursive CTE —
    attesting pointer construction, halo routing, compression, AND the
    doubling loop."""
    from versatiles_rs_spark.operators.map_algebra import (
        dem_flow_edges,
        watershed_basins,
    )

    t, w = 32, 256
    # rows_hint = w*w: one (pid, rep) row per raster pixel — the caller
    # defines the raster, so the loop can run static one-job rounds
    # (operators/iterconf.py) with a partition count derived from this
    # size at ANY raster dimension.
    basins = watershed_basins(dem_flow_edges(_ws_tiles(spark), t, w), rows_hint=w * w)
    return (
        basins.groupBy("rep")
        .agg(F.count(F.lit(1)).alias("n_px"))
        .select(
            (F.col("rep") % w).alias("sink_gx"),
            (F.col("rep") / w).cast("long").alias("sink_gy"),
            "n_px",
        )
        .orderBy("sink_gx", "sink_gy")
    )


def _o_watershed_basins() -> str:
    terms = ", ".join(
        f"(gx-{cx})*(gx-{cx}) + 2*(gy-{cy})*(gy-{cy})" for cx, cy in _WS_CENTERS
    )
    return f"""
WITH RECURSIVE px AS (
  SELECT a.i AS gx, b.i AS gy
  FROM generate_series(0, 255) a(i) CROSS JOIN generate_series(0, 255) b(i)
), rv AS (
  SELECT gx, gy, least({terms}) AS raw FROM px
), o AS (
  SELECT * FROM (VALUES
    (1, 1, 0, 2), (2, 1, 1, 1), (3, 0, 1, 2), (4, -1, 1, 1),
    (5, -1, 0, 2), (6, -1, -1, 1), (7, 0, -1, 2), (8, 1, -1, 1)
  ) AS v(code, dx, dy, wt)
), cand AS (
  SELECT p.gx, p.gy, o.code,
         (p.gy + o.dy) * 256 + (p.gx + o.dx) AS npid,
         o.wt * (p.raw - n.raw) * (p.raw - n.raw) AS key
  FROM rv p
  CROSS JOIN o
  JOIN rv n ON n.gx = p.gx + o.dx AND n.gy = p.gy + o.dy
  WHERE p.raw - n.raw > 0
), best AS (
  SELECT gx, gy, npid,
         row_number() OVER (PARTITION BY gx, gy ORDER BY key DESC, code ASC) AS rn
  FROM cand
), edges AS (
  SELECT p.gy * 256 + p.gx AS pid,
         coalesce(b.npid, p.gy * 256 + p.gx) AS par
  FROM rv p
  LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.gx = p.gx AND b.gy = p.gy
), walk AS (
  SELECT pid, par AS cur FROM edges
  UNION ALL
  SELECT w.pid, e.par FROM walk w JOIN edges e ON e.pid = w.cur
  WHERE e.par <> w.cur
), root AS (
  SELECT w.pid, w.cur AS root
  FROM walk w JOIN edges e ON e.pid = w.cur AND e.par = w.cur
)
SELECT root % 256 AS sink_gx, root // 256 AS sink_gy, count(*) AS n_px
FROM root GROUP BY 1, 2 ORDER BY 1, 2
"""


O_WATERSHED_BASINS = _o_watershed_basins()


def q_areal_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Areal interpolation (spatial/overlaps.areal_interpolate): transfer
    a source-zone statistic onto a target zone system by exact integer
    area weighting — 400 uniform-area source rectangles (48x32, shared
    D = 1536 keeps the final division exact) carrying qv, 250 varied
    targets; PBSM reference-point grid join + one agg on the target key.
    Oracle brute-forces the cross product with the same half-open
    overlap algebra."""
    from versatiles_rs_spark.spatial.overlaps import areal_interpolate

    i = F.col("id")
    src = spark.range(400).select(
        i.alias("id"),
        ((i * 53) % 2000).alias("x0"),
        ((i * 71) % 2000).alias("y0"),
        ((i * 53) % 2000 + 48).alias("x1"),
        ((i * 71) % 2000 + 32).alias("y1"),
        ((i * 37 + 11) * 1000).alias("qv"),
    )
    tgt = spark.range(250).select(
        i.alias("id"),
        ((i * 97 + 7) % 2000).alias("x0"),
        ((i * 61 + 3) % 2000).alias("y0"),
        ((i * 97 + 7) % 2000 + 20 + (i % 9) * 9).alias("x1"),
        ((i * 61 + 3) % 2000 + 14 + (i % 7) * 11).alias("y1"),
    )
    # wsum/covered_area are DuckDB HUGEINT sums on the oracle side ->
    # pandas float64; cast to double for a dtype-exact driver hash.
    return (
        areal_interpolate(src, tgt, cell=128)
        .select(
            "t_id", "n_src",
            F.col("wsum").cast("double").alias("wsum"),
            F.col("covered_area").cast("double").alias("covered_area"),
        )
        .orderBy("t_id")
    )


O_AREAL_INTERP = """
WITH s AS (
  SELECT i AS id, (i * 53) % 2000 AS x0, (i * 71) % 2000 AS y0,
         (i * 53) % 2000 + 48 AS x1, (i * 71) % 2000 + 32 AS y1,
         (i * 37 + 11) * 1000 AS qv
  FROM generate_series(0, 399) AS v(i)
), t AS (
  SELECT i AS id, (i * 97 + 7) % 2000 AS x0, (i * 61 + 3) % 2000 AS y0,
         (i * 97 + 7) % 2000 + 20 + (i % 9) * 9 AS x1,
         (i * 61 + 3) % 2000 + 14 + (i % 7) * 11 AS y1
  FROM generate_series(0, 249) AS v(i)
), inter AS (
  SELECT t.id AS t_id,
         (least(s.x1, t.x1) - greatest(s.x0, t.x0))
           * (least(s.y1, t.y1) - greatest(s.y0, t.y0)) AS area,
         s.qv
  FROM s CROSS JOIN t
  WHERE s.x0 < t.x1 AND t.x0 < s.x1 AND s.y0 < t.y1 AND t.y0 < s.y1
)
SELECT t_id, count(*) AS n_src, sum(qv * area) AS wsum,
       sum(area) AS covered_area
FROM inter GROUP BY t_id ORDER BY t_id
"""


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I (operators/density.morans_i) over z6 per-tile
    event counts with 8-neighborhood binary weights: exact integer
    numerator/denominator via the N*n_i - S centering identity (the
    caller's final division is the only float step and happens outside
    the attested data). Oracle recomputes both sums from the adjacency
    self-join."""
    from versatiles_rs_spark.operators.convert import assign_tiles
    from versatiles_rs_spark.operators.density import morans_i

    assigned = assign_tiles(_events_geo(spark, sf_dir), 6, 6)
    counts = assigned.groupBy("x", "y").agg(F.count("*").alias("n"))
    return morans_i(counts, zoom=6)


O_MORANS_I = f"""
WITH pts AS (
  SELECT event_id, {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat
  FROM events
), c AS (
  SELECT {_tile_sql("x", z="6")} AS x, {_tile_sql("y", z="6")} AS y, count(*) AS n
  FROM pts GROUP BY 1, 2
), tot AS (SELECT count(*) AS n_tiles, sum(n) AS s FROM c),
pairs AS (
  SELECT a.n AS n_i, b.n AS n_j
  FROM c a JOIN c b ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
                   AND NOT (a.x = b.x AND a.y = b.y)
), num AS (
  SELECT count(*) AS w_pairs,
         CAST(sum((tot.n_tiles * n_i - tot.s) * (tot.n_tiles * n_j - tot.s)) AS BIGINT) AS num_q
  FROM pairs, tot
), den AS (
  SELECT CAST(max(tot.n_tiles) AS BIGINT) AS n_tiles,
         CAST(sum((tot.n_tiles * n - tot.s) * (tot.n_tiles * n - tot.s)) AS BIGINT) AS den_q
  FROM c, tot
)
SELECT den.n_tiles, num.w_pairs, num.num_q, den.den_q FROM num, den
"""


def q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash cell keys (tile_math/geohash.py — validated against the
    published test vectors, e.g. (42.6, -5.6) -> ezs42): per-document
    precision-5 geohash from pure integer div/mod arithmetic (one
    codegen Project), aggregated per precision-2 cell (n_docs, sum of
    ids, max precision-5 key — attesting both the coarse and fine
    bit/base32 paths). Oracle = the identical generated arithmetic in
    DuckDB's dialect."""
    from versatiles_rs_spark.tile_math.geohash import geohash_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(360_000_000) - F.lit(180_000_000)).alias("qlon"),
        ((F.col("doc_id") * F.lit(2246822519)) % F.lit(170_000_000) - F.lit(85_000_000)).alias("qlat"),
    )
    keyed = docs.select(
        "doc_id",
        geohash_col("qlon", "qlat", 2).alias("gh2"),
        geohash_col("qlon", "qlat", 5).alias("gh5"),
    )
    return (
        keyed.groupBy("gh2")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # oracle-side sum(BIGINT) -> HUGEINT -> pandas float64
            F.sum("doc_id").cast("double").alias("sum_doc_id"),
            F.max("gh5").alias("max_gh5"),
        )
        .orderBy("gh2")
    )


def _o_geohash_cells() -> str:
    from versatiles_rs_spark.tile_math.geohash import geohash_sql

    lon = "(doc_id * 2654435761) % 360000000 - 180000000"
    lat = "(doc_id * 2246822519) % 170000000 - 85000000"
    return f"""
WITH k AS (
  SELECT doc_id, {geohash_sql(lon, lat, 2)} AS gh2, {geohash_sql(lon, lat, 5)} AS gh5
  FROM documents
)
SELECT gh2, count(*) AS n_docs, sum(doc_id) AS sum_doc_id, max(gh5) AS max_gh5
FROM k GROUP BY 1 ORDER BY 1
"""


O_GEOHASH_CELLS = _o_geohash_cells()


def q_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid DBSCAN (spatial/gridcluster.grid_dbscan): 16 planted point
    blobs (350-unit jitter around spaced centers) + 1/4 uniform noise;
    cell 100, min_pts 8 — dense-cell 8-adjacency components labeled by
    min packed key, noise cells excluded by the density threshold.
    Oracle recomputes density and closes the adjacency graph with a
    min-label recursive CTE."""
    from versatiles_rs_spark.spatial.gridcluster import grid_dbscan

    d = F.col("doc_id")
    k = d % 16
    pts = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.when(d % 4 == 0, (d * 2654435761) % 1000000)
        .otherwise((k * 5 + 3) * 1000 + (d * 7919) % 150)
        .alias("qx"),
        F.when(d % 4 == 0, (d * 2246822519) % 1000000)
        .otherwise(((k * 11 + 7) % 16) * 1000 + (d * 104729) % 150)
        .alias("qy"),
    )
    return grid_dbscan(pts, cell=100, min_pts=5).orderBy("cluster")


O_GRID_DBSCAN = """
WITH RECURSIVE p AS (
  SELECT CASE WHEN doc_id % 4 = 0 THEN (doc_id * 2654435761) % 1000000
              ELSE ((doc_id % 16) * 5 + 3) * 1000 + (doc_id * 7919) % 150 END AS qx,
         CASE WHEN doc_id % 4 = 0 THEN (doc_id * 2246822519) % 1000000
              ELSE (((doc_id % 16) * 11 + 7) % 16) * 1000 + (doc_id * 104729) % 150 END AS qy
  FROM documents
), c AS (
  SELECT qx // 100 AS cx, qy // 100 AS cy, count(*) AS n FROM p GROUP BY 1, 2
), d AS (
  SELECT cx, cy, n, cx * 2097152 + cy AS key FROM c WHERE n >= 5
), e AS (
  SELECT a.key AS u, b.key AS v
  FROM d a JOIN d b ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
), reach AS (
  SELECT key AS node, key AS lab FROM d
  UNION
  SELECT e.v AS node, r.lab FROM reach r JOIN e ON e.u = r.node
), comp AS (
  SELECT node, min(lab) AS cluster FROM reach GROUP BY node
)
SELECT comp.cluster, count(*) AS n_cells, CAST(sum(d.n) AS BIGINT) AS n_points
FROM d JOIN comp ON comp.node = d.key GROUP BY 1 ORDER BY 1
"""


def q_union_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rectangle union area per group (spatial/overlaps.union_area):
    the intersection_join rect layer grouped mod 7 — PBSM cell cover +
    executor-local bitmap paint (overlaps counted once, O(cell²) task
    memory). Oracle = the classic slab sweep: distinct-x slabs joined to
    covering rects, y-interval union via gaps-and-islands, area =
    Σ slab_width x covered_y."""
    from versatiles_rs_spark.spatial.overlaps import union_area

    i = F.col("id")
    rects = spark.range(300).select(
        (i % 7).alias("grp"),
        ((i * 97) % 3000).alias("x0"),
        ((i * 61) % 3000).alias("y0"),
        ((i * 97) % 3000 + 20 + (i % 13) * 7).alias("x1"),
        ((i * 61) % 3000 + 15 + (i % 11) * 9).alias("y1"),
    )
    return union_area(rects, cell=128).orderBy("grp")


O_UNION_AREA = """
WITH r AS (
  SELECT i % 7 AS grp, (i * 97) % 3000 AS x0, (i * 61) % 3000 AS y0,
         (i * 97) % 3000 + 20 + (i % 13) * 7 AS x1,
         (i * 61) % 3000 + 15 + (i % 11) * 9 AS y1
  FROM generate_series(0, 299) AS s(i)
), xs AS (
  SELECT DISTINCT grp, x0 AS x FROM r UNION SELECT DISTINCT grp, x1 FROM r
), slabs AS (
  SELECT grp, x AS sx0, lead(x) OVER (PARTITION BY grp ORDER BY x) AS sx1
  FROM xs
), cov AS (
  SELECT s.grp, s.sx0, s.sx1, rr.y0, rr.y1
  FROM slabs s JOIN r rr
    ON rr.grp = s.grp AND rr.x0 <= s.sx0 AND rr.x1 >= s.sx1
  WHERE s.sx1 IS NOT NULL
), flagged AS (
  SELECT grp, sx0, sx1, y0, y1,
         CASE WHEN max(y1) OVER (PARTITION BY grp, sx0 ORDER BY y0, y1
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR y0 > max(y1) OVER (PARTITION BY grp, sx0 ORDER BY y0, y1
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS ni
  FROM cov
), islands AS (
  SELECT grp, sx0, sx1, y0, y1,
         sum(ni) OVER (PARTITION BY grp, sx0 ORDER BY y0, y1
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), per_island AS (
  SELECT grp, sx0, max(sx1) AS sx1, island, max(y1) - min(y0) AS ylen
  FROM islands GROUP BY grp, sx0, island
), per_slab AS (
  SELECT grp, sx0, max(sx1) AS sx1, sum(ylen) AS ycov
  FROM per_island GROUP BY grp, sx0
), nr AS (
  SELECT grp, count(*) AS n_rects FROM r GROUP BY grp
)
SELECT nr.grp, nr.n_rects,
       CAST(sum((per_slab.sx1 - per_slab.sx0) * per_slab.ycov) AS BIGINT) AS union_area
FROM per_slab JOIN nr ON nr.grp = per_slab.grp
GROUP BY nr.grp, nr.n_rects ORDER BY nr.grp
"""


def q_flow_accumulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 flow accumulation (operators/map_algebra.flow_accumulation):
    per-pixel upstream drainage area over the watershed fixture —
    ancestor-pair enumeration by pointer doubling on the ONE-STEP drain
    pointers (O(log max-path) rounds; the pair set is inherently
    Σ-path-length sized), acc = 1 + distinct upstream pixels. Output =
    the exact accumulation histogram. Oracle walks every path with a
    recursive CTE and counts per path element — a single missing or
    duplicated ancestor pair anywhere in 65,536 paths shifts the
    histogram."""
    from versatiles_rs_spark.operators.map_algebra import (
        dem_flow_edges,
        flow_accumulation,
    )

    edges = dem_flow_edges(_ws_tiles(spark), 32, 256, compress=False)
    # static_rounds: the raster is caller-bounded (65,536 pixels, pair
    # sets a few million) — the doubling rounds run one static job each
    # with partitions re-derived per round from the measured pair count
    # (80 -> 16 jobs, 15.2 -> 8.9 s interleaved A/B at sf0.1).
    acc = flow_accumulation(edges, static_rounds=True)
    return acc.groupBy("acc").agg(F.count(F.lit(1)).alias("n_px")).orderBy("acc")


def _o_flow_accumulation() -> str:
    terms = ", ".join(
        f"(gx-{cx})*(gx-{cx}) + 2*(gy-{cy})*(gy-{cy})" for cx, cy in _WS_CENTERS
    )
    return f"""
WITH RECURSIVE px AS (
  SELECT a.i AS gx, b.i AS gy
  FROM generate_series(0, 255) a(i) CROSS JOIN generate_series(0, 255) b(i)
), rv AS (
  SELECT gx, gy, least({terms}) AS raw FROM px
), o AS (
  SELECT * FROM (VALUES
    (1, 1, 0, 2), (2, 1, 1, 1), (3, 0, 1, 2), (4, -1, 1, 1),
    (5, -1, 0, 2), (6, -1, -1, 1), (7, 0, -1, 2), (8, 1, -1, 1)
  ) AS v(code, dx, dy, wt)
), cand AS (
  SELECT p.gx, p.gy, o.code,
         (p.gy + o.dy) * 256 + (p.gx + o.dx) AS npid,
         o.wt * (p.raw - n.raw) * (p.raw - n.raw) AS key
  FROM rv p
  CROSS JOIN o
  JOIN rv n ON n.gx = p.gx + o.dx AND n.gy = p.gy + o.dy
  WHERE p.raw - n.raw > 0
), best AS (
  SELECT gx, gy, npid,
         row_number() OVER (PARTITION BY gx, gy ORDER BY key DESC, code ASC) AS rn
  FROM cand
), edges AS (
  SELECT p.gy * 256 + p.gx AS pid,
         coalesce(b.npid, p.gy * 256 + p.gx) AS par
  FROM rv p
  LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.gx = p.gx AND b.gy = p.gy
), walk AS (
  SELECT pid AS q, par AS cur FROM edges WHERE par <> pid
  UNION ALL
  SELECT w.q, e.par FROM walk w JOIN edges e ON e.pid = w.cur
  WHERE e.par <> w.cur
), ups AS (
  SELECT cur AS pid, count(*) AS n_up FROM walk GROUP BY cur
), acc AS (
  SELECT e.pid, 1 + coalesce(u.n_up, 0) AS acc
  FROM edges e LEFT JOIN ups u ON u.pid = e.pid
)
SELECT CAST(acc AS BIGINT) AS acc, count(*) AS n_px
FROM acc GROUP BY acc ORDER BY acc
"""


O_FLOW_ACCUMULATION = _o_flow_accumulation()
