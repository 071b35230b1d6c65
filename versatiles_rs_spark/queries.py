"""Driver-facing query registry: Spark implementations + DuckDB oracle SQL.

Each entry implements one operator family from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable, with a matching ANSI-SQL oracle that
DuckDB runs on the same parquet views. Column names/aliases match exactly;
float outputs are rounded or integer-quantized so value hashes are stable
across engines.

Shared derivations (pages/generator.py): lon/lat come from pure integer
arithmetic on doc_id / event_id, so both engines compute identical doubles.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.operators.convert import assign_tiles, convert_pages_to_tiles
from versatiles_rs_spark.operators.reduce_points import drop_rate_keep
from versatiles_rs_spark.pages.generator import lat_expr, lon_expr
from versatiles_rs_spark.tile_math.coords import lonlat_to_tile_cols

# ---------------------------------------------------------------------------
# shared SQL fragments (valid in both Spark SQL and DuckDB)
# ---------------------------------------------------------------------------

LON_SQL = "(({id} * 2654435761) % 360000000) / 1000000.0 - 180.0"
LAT_SQL = "(({id} * 2246822519) % 170000000) / 1000000.0 - 85.0"


def _tile_sql(axis: str, z: str = "z") -> str:
    """floor(clamp(...)) tile index formula (tile_coord.rs:139-146)."""
    if axis == "x":
        frac = f"pow(2.0,{z})*(lon/360.0+0.5)"
    else:
        frac = f"pow(2.0,{z})*(0.5-0.5*ln(tan(lat*pi()/360.0+pi()/4.0))/pi())"
    return f"CAST(floor(least(greatest({frac},0.0),pow(2.0,{z})-1.0)) AS BIGINT)"


def _docs_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.withColumn("lon", lon_expr(F.col("doc_id"))).withColumn("lat", lat_expr(F.col("doc_id")))


def _events_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.withColumn("lon", lon_expr(F.col("event_id"))).withColumn("lat", lat_expr(F.col("event_id")))


# ---------------------------------------------------------------------------
# 1. tile assignment (from_csv geocoding core — SURVEY.md §2.1/§2.10)
# ---------------------------------------------------------------------------

def q_tile_assign_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = assign_tiles(_docs_geo(spark, sf_dir), 0, 8)
    return (
        assigned.groupBy("z", "x", "y")
        .agg(F.count("*").alias("n"))
    )


O_TILE_ASSIGN_COUNTS = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), zs AS (SELECT z FROM generate_series(0, 8) t(z))
SELECT CAST(z AS INTEGER) AS z, {_tile_sql("x")} AS x, {_tile_sql("y")} AS y, count(*) AS n
FROM pts CROSS JOIN zs GROUP BY 1, 2, 3
"""


def q_events_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = assign_tiles(_events_geo(spark, sf_dir), 0, 10)
    return assigned.groupBy("z", "x", "y").agg(F.count("*").alias("n"))


O_EVENTS_TILE_COUNTS = f"""
WITH pts AS (
  SELECT event_id, {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat
  FROM events
), zs AS (SELECT z FROM generate_series(0, 10) t(z))
SELECT CAST(z AS INTEGER) AS z, {_tile_sql("x")} AS x, {_tile_sql("y")} AS y, count(*) AS n
FROM pts CROSS JOIN zs GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# 2. probe statistics (§2.5) — per-zoom rollup of the coords plan
# ---------------------------------------------------------------------------

def q_zoom_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = assign_tiles(_docs_geo(spark, sf_dir), 0, 8)
    per_tile = assigned.groupBy("z", "x", "y").agg(F.count("*").alias("n"))
    return per_tile.groupBy("z").agg(
        F.count("*").alias("tile_count"),
        F.sum("n").alias("point_count"),
        F.max("n").alias("max_per_tile"),
    )


O_ZOOM_STATS = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), zs AS (SELECT z FROM generate_series(0, 8) t(z)),
per_tile AS (
  SELECT CAST(z AS INTEGER) AS z, {_tile_sql("x")} AS x, {_tile_sql("y")} AS y, count(*) AS n
  FROM pts CROSS JOIN zs GROUP BY 1, 2, 3
)
SELECT z, count(*) AS tile_count, CAST(sum(n) AS BIGINT) AS point_count, max(n) AS max_per_tile
FROM per_tile GROUP BY z
"""


# ---------------------------------------------------------------------------
# 3. drop_rate point reduction (§2.3, reduce_points.rs:60) — portable hash
# ---------------------------------------------------------------------------

def q_drop_rate_thin(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned = assign_tiles(_docs_geo(spark, sf_dir), 0, 8)
    thinned = drop_rate_keep(assigned, "doc_id", "z", max_zoom=8, keep_ratio=0.5, hash_flavor="portable")
    return thinned.groupBy("z").agg(
        F.count("*").alias("kept"),
        F.sum("doc_id").alias("id_sum"),
    )


O_DROP_RATE_THIN = """
WITH zs AS (SELECT z FROM generate_series(0, 8) t(z))
SELECT CAST(z AS INTEGER) AS z, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents CROSS JOIN zs
WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296.0 < pow(0.5, CAST(8 - z AS DOUBLE))
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 4. min_distance thinning (§2.3) — scalable cell-winner variant
# ---------------------------------------------------------------------------

def q_min_distance_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = _docs_geo(spark, sf_dir)
    merc = geo.select(
        "doc_id",
        (F.radians("lon") * F.lit(6378137.0)).alias("mx"),
        (F.log(F.tan(F.radians("lat") / 2 + F.lit(3.141592653589793) / 4)) * F.lit(6378137.0)).alias("my"),
    )
    cell = 200000.0
    keyed = merc.select(
        "doc_id",
        F.floor(F.col("mx") / F.lit(cell)).alias("cx"),
        F.floor(F.col("my") / F.lit(cell)).alias("cy"),
    )
    return keyed.groupBy("cx", "cy").agg(F.min("doc_id").alias("winner"), F.count("*").alias("n"))


O_MIN_DISTANCE_CELLS = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), merc AS (
  SELECT doc_id, radians(lon) * 6378137.0 AS mx,
         ln(tan(radians(lat)/2 + pi()/4)) * 6378137.0 AS my
  FROM pts
)
SELECT CAST(floor(mx/200000.0) AS BIGINT) AS cx, CAST(floor(my/200000.0) AS BIGINT) AS cy,
       min(doc_id) AS winner, count(*) AS n
FROM merc GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# 5. allow-list semi-join (general/filter.rs:83-84 filename= mask — §2.4)
# ---------------------------------------------------------------------------

def q_allowlist_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = 6
    docs = _docs_geo(spark, sf_dir)
    dx, dy = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), z)
    doc_tiles = docs.select("doc_id", dx.alias("x"), dy.alias("y"))
    events = _events_geo(spark, sf_dir)
    ex, ey = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), z)
    allow = events.select(ex.alias("x"), ey.alias("y")).distinct()
    return doc_tiles.join(allow, ["x", "y"], "left_semi").select("doc_id", "x", "y")


O_ALLOWLIST_SEMIJOIN = f"""
WITH dpts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat FROM documents
), dtiles AS (
  SELECT doc_id, {_tile_sql("x", "6")} AS x, {_tile_sql("y", "6")} AS y FROM dpts
), epts AS (
  SELECT event_id, {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat FROM events
), allow AS (
  SELECT DISTINCT {_tile_sql("x", "6")} AS x, {_tile_sql("y", "6")} AS y FROM epts
)
SELECT d.doc_id, d.x, d.y FROM dtiles d
WHERE EXISTS (SELECT 1 FROM allow a WHERE a.x = d.x AND a.y = d.y)
"""


# ---------------------------------------------------------------------------
# 6. vector_update_properties (§2.4) — broadcast hash join with a dim table
# ---------------------------------------------------------------------------

def q_update_properties_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    joined = docs.withColumn("nkey", (F.col("doc_id") % 25).cast("int")).join(
        F.broadcast(nation), F.col("nkey") == F.col("n_nationkey"), "inner"
    )
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
    )


O_UPDATE_PROPERTIES_JOIN = """
SELECT n.n_name, count(*) AS n_docs, CAST(sum(d.n_chars) AS BIGINT) AS chars_sum
FROM documents d JOIN nation n ON CAST(d.doc_id % 25 AS INTEGER) = n.n_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# 7. probe top-k (§2.5 probe.rs:192-204)
# ---------------------------------------------------------------------------

def q_probe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", "n_chars").orderBy(F.desc("n_chars"), F.asc("doc_id")).limit(10)


O_PROBE_TOPK = """
SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# 8. text analysis (training-data pipeline ops)
# ---------------------------------------------------------------------------

_TOKEN_COUNT_EXPR = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END"
)


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.expr(_TOKEN_COUNT_EXPR).cast("bigint").alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
    )


O_TOKEN_COUNT = f"""
SELECT doc_id, CAST({_TOKEN_COUNT_EXPR} AS BIGINT) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_actual
FROM documents
"""

# Integer micro-quantization instead of round(x, 6): DuckDB rounds decimal
# ties half-even while Spark rounds half-up, so decimal `round` hash-mismatches.
# floor(x*1e6 + 0.5) as BIGINT is tie-unambiguous and identical on both engines
# (scores here are always >= 0).
_QUALITY_RAW = (
    "(((length(text) - length(replace(text, 'the', ''))) / 3.0)"
    " / (length(text) + 1))"
)
_QUALITY_EXPR = f"CAST(floor({_QUALITY_RAW} * 1000000 + 0.5) AS BIGINT)"
_MEAN_TOKEN_RAW = f"(length(text) / greatest({_TOKEN_COUNT_EXPR}, 1))"
_MEAN_TOKEN_EXPR = f"CAST(floor({_MEAN_TOKEN_RAW} * 1000000 + 0.5) AS BIGINT)"


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword-density + mean-token-length signals (micro-units)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.expr(_QUALITY_EXPR).alias("stopword_density_u"),
        F.expr(_MEAN_TOKEN_EXPR).alias("mean_token_len_u"),
    )


O_QUALITY_SCORE = f"""
SELECT doc_id, {_QUALITY_EXPR} AS stopword_density_u,
       {_MEAN_TOKEN_EXPR} AS mean_token_len_u
FROM documents
"""


_LANG_PRED_EXPR = (
    "CASE WHEN length(text) - length(replace(text, 'spark', '')) >= "
    "length(text) - length(replace(text, 'vector', '')) THEN 'tech' ELSE 'math' END"
)


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language/topic-ID heuristic; deterministic CASE expr."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select("lang", F.expr(_LANG_PRED_EXPR).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


O_LANG_ID = f"""
SELECT lang, {_LANG_PRED_EXPR} AS predicted, count(*) AS n
FROM documents GROUP BY 1, 2
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (hash-groupBy; md5 matches across engines)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper"))
    )


O_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keeper
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# 9. ANN: brute-force cosine top-k with exact integer quantization
# ---------------------------------------------------------------------------

def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k, shaped for 10^12 rows: the BOUNDED
    query set is collected and broadcast (round-2 shape broadcast the whole
    CORPUS and nested-loop-joined it — backwards at scale); the corpus
    streams through ONE mapInPandas computing all query dots per Arrow
    batch as a single int64 matmul, emitting only each batch's local top-k;
    the global window top-k then ranks candidate rows only. Integer
    micro-quantization (half-away-from-zero, matching SQL round) keeps the
    dot products exact and order-independent across engines."""
    import numpy as np
    from pyspark.sql import Window

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = emb.filter("vec_id < 5").select("vec_id", "embedding").collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qraw = np.array([r["embedding"] for r in qrows], dtype=np.float64) * 1e6
    qm = (np.sign(qraw) * np.floor(np.abs(qraw) + 0.5)).astype(np.int64)
    bc = spark.sparkContext.broadcast((qids, qm))

    def score(it):
        import pandas as pd

        bqids, bqm = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            raw = np.array(pdf["embedding"].tolist(), dtype=np.float64) * 1e6
            vm = (np.sign(raw) * np.floor(np.abs(raw) + 0.5)).astype(np.int64)
            vids = pdf["vec_id"].values
            dots = bqm @ vm.T  # (n_queries, batch) exact int64
            parts = []
            for t, qid in enumerate(bqids):
                mask = vids != qid
                d, vv = dots[t][mask], vids[mask]
                k = min(3, len(vv))
                order = np.lexsort((vv, -d))[:k]  # (dot desc, vid asc)
                parts.append(pd.DataFrame({"qid": qid, "vid": vv[order], "dot": d[order]}))
            if parts:
                yield pd.concat(parts, ignore_index=True)

    local = emb.select("vec_id", "embedding").mapInPandas(
        score, "qid long, vid long, dot long"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vid"))
    return local.withColumn("rank", F.row_number().over(w)).filter("rank <= 3")


O_ANN_TOPK = """
WITH scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
    CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(round(CAST(p[1] AS DOUBLE)*1000000) AS BIGINT) * CAST(round(CAST(p[2] AS DOUBLE)*1000000) AS BIGINT)), 'sum') AS BIGINT) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 5
), ranked AS (
  SELECT qid, vid, dot, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, dot, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# 10. rendered tiles (the applyInPandas path) — n_features vs SQL counts
# ---------------------------------------------------------------------------

def q_tile_render_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    geo = _docs_geo(spark, sf_dir)
    tiles = convert_pages_to_tiles(geo, 0, 6, keep_ratio=1.0)
    return tiles.select("z", "x", "y", "n_features")


O_TILE_RENDER_SUMMARY = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), zs AS (SELECT z FROM generate_series(0, 6) t(z))
SELECT CAST(z AS INTEGER) AS z, {_tile_sql("x")} AS x, {_tile_sql("y")} AS y, count(*) AS n_features
FROM pts CROSS JOIN zs GROUP BY 1, 2, 3
"""


def q_container_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render a z0-4 pyramid, export it to a real .mbtiles file (stdlib
    sqlite3, XYZ->TMS flip per mbtiles/writer.rs), re-ingest it with the
    distributed rowid-sliced reader, and emit the surviving coordinates.
    The oracle recomputes the expected non-empty tile set from the raw
    documents — coordinate identity proves the TMS flip + schema round-trip.
    (Byte-identity of the blobs is asserted in tests/test_mbtiles.py.)"""
    import hashlib
    import tempfile

    from versatiles_rs_spark.sources.mbtiles import read_mbtiles, write_mbtiles

    geo = _docs_geo(spark, sf_dir)
    tiles = convert_pages_to_tiles(geo, 0, 4, keep_ratio=1.0)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = f"{tempfile.gettempdir()}/vt_roundtrip_{tag}.mbtiles"
    write_mbtiles(tiles, path)
    back = read_mbtiles(spark, path)
    return back.select("z", "x", "y")


O_CONTAINER_ROUNDTRIP = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), zs AS (SELECT z FROM generate_series(0, 4) t(z))
SELECT DISTINCT CAST(z AS INTEGER) AS z, {_tile_sql("x")} AS x, {_tile_sql("y")} AS y
FROM pts CROSS JOIN zs
"""


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
# 13. from_stacked / from_merged_vector (§2.4) — counts-level oracles
# ---------------------------------------------------------------------------

_STACK_Z = 4


def _two_tile_sources(spark: SparkSession, sf_dir: str):
    from versatiles_rs_spark.operators.convert import render_point_tiles

    d = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    dt = render_point_tiles(assign_tiles(d, _STACK_Z, _STACK_Z), layer_name="docs")
    e = _events_geo(spark, sf_dir).filter("event_id % 7 = 0").select(
        F.col("event_id").alias("doc_id"), "lon", "lat", F.col("event_type").alias("lang")
    )
    et = render_point_tiles(assign_tiles(e, _STACK_Z, _STACK_Z), layer_name="events")
    return dt, et


def q_stacked_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from versatiles_rs_spark.operators.stacked import from_stacked

    dt, et = _two_tile_sources(spark, sf_dir)
    return from_stacked([dt, et]).select("z", "x", "y", "n_features")


def q_merged_vector_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from versatiles_rs_spark.operators.stacked import from_merged_vector

    dt, et = _two_tile_sources(spark, sf_dir)
    return from_merged_vector([dt, et]).select("z", "x", "y", "n_features")


_STACK_CTE = f"""
WITH dpts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat FROM documents
), d AS (
  SELECT {_tile_sql("x", str(_STACK_Z))} AS x, {_tile_sql("y", str(_STACK_Z))} AS y, count(*) AS n
  FROM dpts GROUP BY 1, 2
), epts AS (
  SELECT event_id, {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat
  FROM events WHERE event_id % 7 = 0
), e AS (
  SELECT {_tile_sql("x", str(_STACK_Z))} AS x, {_tile_sql("y", str(_STACK_Z))} AS y, count(*) AS n
  FROM epts GROUP BY 1, 2
)
"""

O_STACKED_COALESCE = _STACK_CTE + f"""
SELECT CAST({_STACK_Z} AS INTEGER) AS z, coalesce(d.x, e.x) AS x, coalesce(d.y, e.y) AS y,
       CAST(coalesce(d.n, e.n) AS BIGINT) AS n_features
FROM d FULL OUTER JOIN e ON d.x = e.x AND d.y = e.y
"""

O_MERGED_VECTOR_COUNTS = _STACK_CTE + f"""
SELECT CAST({_STACK_Z} AS INTEGER) AS z, coalesce(d.x, e.x) AS x, coalesce(d.y, e.y) AS y,
       CAST(coalesce(d.n, 0) + coalesce(e.n, 0) AS BIGINT) AS n_features
FROM d FULL OUTER JOIN e ON d.x = e.x AND d.y = e.y
"""


# ---------------------------------------------------------------------------
# 14. vector_filter_features (CEL analog): relational predicate on tiles
# ---------------------------------------------------------------------------

def q_filter_features_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    from versatiles_rs_spark.operators.convert import render_point_tiles
    from versatiles_rs_spark.operators.vector_transforms import explode_features

    d = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang")
    tiles = render_point_tiles(assign_tiles(d, _STACK_Z, _STACK_Z), layer_name="docs")
    feats = explode_features(tiles).filter(F.expr("props['lang'] = 'en'"))
    return feats.groupBy("z", "x", "y").agg(F.count("*").alias("n"), F.min("fid").alias("min_fid"))


O_FILTER_FEATURES_EN = f"""
WITH dpts AS (
  SELECT doc_id, lang, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
)
SELECT CAST({_STACK_Z} AS INTEGER) AS z, {_tile_sql("x", str(_STACK_Z))} AS x,
       {_tile_sql("y", str(_STACK_Z))} AS y, count(*) AS n, min(doc_id) AS min_fid
FROM dpts WHERE lang = 'en' GROUP BY 1, 2, 3
"""



# ---------------------------------------------------------------------------
# 15. dedup family (training-data ops): minhash-LSH / simhash / ngram /
#     embedding near-dup / fingerprint
# ---------------------------------------------------------------------------

# Shared DuckDB fragments: word-3-gram shingle sets exactly matching
# dedup.ngram.shingle_set (python text.split() tokenization; whole-text
# gram when fewer than 3 tokens).
_SQL_GRAMS_CTE = """
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk
  FROM documents
), grams AS (
  SELECT doc_id,
    CASE WHEN len(tk) = 0 THEN []
         WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - 1),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
    END AS gs
  FROM toks
)"""


def q_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, projected to the exact-verified output:
    (id_a, id_b, micro-quantized 3-gram Jaccard). The LSH banding itself is
    not SQL-expressible, but its VERIFIED OUTPUT is — the oracle brute-forces
    all pairs at threshold 0.5, so equality attests both recall (every true
    pair found) and precision (no extra pairs) end to end."""
    from versatiles_rs_spark.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    return pairs.select(
        "id_a", "id_b",
        F.floor(F.col("jaccard") * 1e6 + F.lit(0.5)).cast("bigint").alias("jaccard_u"),
    )


O_MINHASH_NEARDUP = f"""
WITH {_SQL_GRAMS_CTE},
sets AS (SELECT doc_id, list_distinct(gs) AS s FROM grams),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS j
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(floor(j * 1000000 + 0.5) AS BIGINT) AS jaccard_u
FROM pairs WHERE j >= 0.5
"""


def _sql_simhash_sigs() -> str:
    """DuckDB CTE computing the EXACT 64-bit SimHash of dedup.simhash
    (polynomial rolling hash h = h*P + byte mod 2^64, P = the FNV prime,
    -> splitmix64 -> per-bit votes, 3-gram shingles) with HUGEINT modular
    arithmetic — a true cross-engine signature oracle. The reduce below is
    the Horner form of minhash._shingle_hashes' prefix-sum formulation;
    both compute sum d[j] * P^(len-1-j) mod 2^64 per gram."""
    m64 = "18446744073709551616::HUGEINT"

    def mulmod(a: str, c: int) -> str:
        hi, lo = c >> 32, c & 0xFFFFFFFF
        return (
            f"((({a}) * {lo}::HUGEINT + (((({a}) * {hi}::HUGEINT) % 4294967296::HUGEINT)"
            f" * 4294967296::HUGEINT)) % {m64})"
        )

    def xor64(a: str, b: str) -> str:
        return f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) AS HUGEINT)"

    def shr(a: str, n: int) -> str:
        return f"CAST((CAST(({a}) AS UBIGINT) >> {n}) AS HUGEINT)"

    # splitmix64 (reduce_points.rs:139 mixer, same constants as dedup.minhash)
    s = f"(((x) + {0x9E3779B97F4A7C15}::HUGEINT) % {m64})"
    s = mulmod(xor64(s, shr(s, 30)), 0xBF58476D1CE4E5B9)
    s = mulmod(xor64(s, shr(s, 27)), 0x94D049BB133111EB)
    splitmix = xor64(s, shr(s, 31))
    poly = (
        "list_reduce(list_prepend(0::HUGEINT, "
        "list_transform(range(1, length(g) + 1), i -> ord(substr(g, i, 1))::HUGEINT)), "
        f"(h, c) -> (({mulmod('h', 0x100000001B3)}) + c) % {m64})"
    )
    gram_hash = splitmix.replace("(x)", f"({poly})")
    return f"""
hashes AS (
  SELECT doc_id,
    CASE WHEN len(gs) = 0 THEN [0::HUGEINT]
         ELSE list_distinct(list_transform(gs, g -> {gram_hash}))
    END AS hs
  FROM grams
), sigs AS (
  SELECT doc_id,
    CAST(list_sum(list_transform(range(0, 64), b ->
      CASE WHEN 2 * list_sum(list_transform(hs,
               h -> CAST((CAST(h AS UBIGINT) >> b) & 1 AS HUGEINT))) > len(hs)
           THEN (1::HUGEINT << b) ELSE 0::HUGEINT END
    )) AS UBIGINT) AS sig
  FROM hashes
)"""


_SIMHASH_MAX_HAMMING = 6


def q_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming <= 6 with COMPLETE candidates
    (7 signature blocks -> pigeonhole guarantees recall for the full radius;
    the old 4-block table only guaranteed Hamming <= 3). The oracle
    recomputes the signatures in pure SQL and brute-forces all pairs."""
    from versatiles_rs_spark.dedup import simhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_dedup_pairs(docs, max_hamming=_SIMHASH_MAX_HAMMING, shingle_n=3)


O_SIMHASH_NEARDUP = f"""
WITH {_SQL_GRAMS_CTE},{_sql_simhash_sigs()}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {_SIMHASH_MAX_HAMMING}
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH embedding near-dup over the embeddings table augmented with
    deterministic clones (vec_id + 100000 for vec_id % 50 == 0). The natural
    table has no near-dup pairs (max cosine ~0.51 at sf0.01), so the clones
    provide structurally-guaranteed positives: identical vectors share every
    LSH bucket, making recall 1.0 by construction, while min_dot=950e9 (cos
    ~0.95 for unit vectors) excludes every non-clone pair — the oracle
    brute-forces the same augmented table."""
    from versatiles_rs_spark.dedup.embedding import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clones = emb.filter("vec_id % 50 = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    aug = emb.select("vec_id", "embedding").unionByName(clones)
    return embedding_neardup_pairs(aug, min_dot=950_000_000_000)


O_EMBEDDING_NEARDUP = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 50 = 0
), q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
  FROM aug
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CAST(list_aggregate(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2]), 'sum') AS BIGINT) AS dot
  FROM q a JOIN q b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, dot FROM pairs WHERE dot >= 950000000000
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table sign-LSH approximate top-k. Table/probe counts are sized
    so the candidate set provably contains the exact top-3 at oracle scale
    (verified against the brute-force oracle); at 100 TB the same knobs trade
    recall for scan fraction."""
    from versatiles_rs_spark.dedup.embedding import ann_lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_lsh_topk(emb, [0, 1, 2, 3, 4], k=3, n_tables=8, probe_hamming=2)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means inverted-file) approximate top-k — the second ANN scale
    path next to sign-LSH. The synthetic embeddings are near-uniform on the
    sphere (no cluster structure), so exactness at oracle scale needs
    nprobe/n_cells = 0.75; on real clustered embeddings the same code runs
    with a much smaller scan fraction."""
    from versatiles_rs_spark.dedup.embedding import ann_ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivf_topk(emb, [0, 1, 2, 3, 4], k=3, n_cells=8, nprobe=6)


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (dedup/pq.py) — the compressed-index ANN path: 32x PQ code
    compression, ADC lookup-table scoring over probed cells, exact
    integer-dot refine of the top pool. The synthetic embeddings are
    near-uniform on the sphere (worst case for PQ), so oracle-scale
    exactness needs nprobe=7/refine=48; clustered real embeddings run with far
    smaller pools."""
    from versatiles_rs_spark.dedup.pq import ann_ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ann_ivfpq_topk(emb, [0, 1, 2, 3, 4], k=3, n_cells=8, nprobe=7, refine=48)


O_ANN_LSH_TOPK = """
WITH scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
    CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(round(CAST(p[1] AS DOUBLE)*1000000) AS BIGINT) * CAST(round(CAST(p[2] AS DOUBLE)*1000000) AS BIGINT)), 'sum') AS BIGINT) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 5
), ranked AS (
  SELECT qid, vid, dot, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, dot, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 3
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard on a deterministic pair sample — SQL oracle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta")).filter("id_a % 10 = 0")
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    pairs = a.join(b, F.col("id_b") == F.col("id_a") + 1)
    ta = F.array_distinct(F.split("ta", " "))
    tb = F.array_distinct(F.split("tb", " "))
    inter = F.size(F.array_intersect(ta, tb)).cast("double")
    union = (F.size(ta) + F.size(tb)).cast("double") - F.size(F.array_intersect(ta, tb))
    return pairs.select(
        "id_a", "id_b", F.round(inter / union, 9).alias("jaccard")
    )


O_NGRAM_JACCARD = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(
    CAST(len(list_intersect(list_distinct(string_split(a.text, ' ')),
                            list_distinct(string_split(b.text, ' ')))) AS DOUBLE)
    / (len(list_distinct(string_split(a.text, ' ')))
       + len(list_distinct(string_split(b.text, ' ')))
       - len(list_intersect(list_distinct(string_split(a.text, ' ')),
                            list_distinct(string_split(b.text, ' '))))), 9) AS jaccard
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
WHERE a.doc_id % 10 = 0
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-content fingerprint (md5 of first 64 chars + length bucket)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.md5(F.substring("text", 1, 64)).alias("fp"),
        F.floor(F.length("text") / 100).cast("int").alias("len_bucket"),
    )


O_DOC_FINGERPRINT = """
SELECT doc_id, md5(substr(text, 1, 64)) AS fp,
       CAST(floor(length(text) / 100.0) AS INTEGER) AS len_bucket
FROM documents
"""


# BPE-ish tokenization: word runs OR single non-word-non-space chars —
# ASCII classes spelled out so Spark's and DuckDB's regex engines agree.
_BPE_RX = "[0-9A-Za-z_]+|[^0-9A-Za-z_ ]"


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counting (the BPE-ish path of the training-data brief) —
    stays JVM-side via regexp_count; compare with the whitespace count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        F.expr(f"regexp_count(text, '{_BPE_RX}')").cast("bigint").alias("n_bpe_tokens"),
        F.expr(_TOKEN_COUNT_EXPR).cast("bigint").alias("n_ws_tokens"),
    )


O_TOKEN_COUNT_BPE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_BPE_RX}')) AS BIGINT) AS n_bpe_tokens,
       CAST({_TOKEN_COUNT_EXPR} AS BIGINT) AS n_ws_tokens
FROM documents
"""


# Rabin-Karp polynomial rolling hash, base 131 mod 2^31-1: products stay
# below 2^39, exact in BIGINT on both engines. Fingerprint = (full-text
# hash, min 16-char-window hash) — the winnowing-style selection.
_RK_P = 2147483647
_RK_B = 131
_RK_W = 16


def q_doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    codes = "transform(split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))"
    roll = f"(acc, c) -> (acc * {_RK_B} + c) % {_RK_P}"
    full = f"aggregate({codes}, 0L, {roll})"
    win = (
        f"array_min(transform(sequence(1, greatest(size({codes}) - {_RK_W - 1}, 1)), "
        f"i -> aggregate(slice({codes}, i, {_RK_W}), 0L, {roll})))"
    )
    return docs.select(
        "doc_id",
        F.expr(full).alias("rk_full"),
        F.expr(win).alias("rk_min_window"),
    )


O_DOC_FINGERPRINT_ROLLING = f"""
WITH codes AS (
  SELECT doc_id,
         list_transform(range(1, length(text) + 1),
                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS cs
  FROM documents
)
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, cs),
                   (acc, c) -> (acc * {_RK_B} + c) % {_RK_P}) AS rk_full,
       list_min(list_transform(range(1, greatest(len(cs) - {_RK_W - 1}, 1) + 1),
                i -> list_reduce(list_prepend(0::BIGINT, cs[i:i+{_RK_W - 1}]),
                                 (acc, c) -> (acc * {_RK_B} + c) % {_RK_P}))) AS rk_min_window
FROM codes
"""



# ---------------------------------------------------------------------------
# 16. event-time tumbling window aggregation (batch form of the streaming op)
# ---------------------------------------------------------------------------

def q_windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_geo(spark, sf_dir)
    x, y = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), 3)
    return (
        ev.withColumn("x", x).withColumn("y", y)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "x", "y"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("value_sum"))
    )


O_WINDOWED_EVENTS = f"""
WITH pts AS (
  SELECT event_id, ts, value,
         {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat
  FROM events
)
SELECT date_trunc('hour', ts) AS window_start,
       {_tile_sql("x", "3")} AS x, {_tile_sql("y", "3")} AS y,
       count(*) AS n, round(sum(value), 6) AS value_sum
FROM pts GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# 17. set operations on coordinate sets (tile_cover/set_ops.rs analog)
# ---------------------------------------------------------------------------

def q_coord_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = 5
    docs = _docs_geo(spark, sf_dir)
    dx, dy = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), z)
    a = docs.select(dx.alias("x"), dy.alias("y")).distinct()
    ev = _events_geo(spark, sf_dir)
    ex, ey = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), z)
    b = ev.select(ex.alias("x"), ey.alias("y")).distinct()
    union = a.union(b).distinct().select(F.lit("union").alias("op"), "x", "y")
    inter = a.intersect(b).select(F.lit("intersect").alias("op"), "x", "y")
    diff = a.exceptAll(a.intersect(b)).select(F.lit("difference").alias("op"), "x", "y")
    return union.unionByName(inter).unionByName(diff)


O_COORD_SET_OPS = f"""
WITH dpts AS (
  SELECT {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat FROM documents
), a AS (
  SELECT DISTINCT {_tile_sql("x", "5")} AS x, {_tile_sql("y", "5")} AS y FROM dpts
), epts AS (
  SELECT {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat FROM events
), b AS (
  SELECT DISTINCT {_tile_sql("x", "5")} AS x, {_tile_sql("y", "5")} AS y FROM epts
)
SELECT 'union' AS op, x, y FROM (SELECT x, y FROM a UNION SELECT x, y FROM b)
UNION ALL
SELECT 'intersect' AS op, x, y FROM (SELECT x, y FROM a INTERSECT SELECT x, y FROM b)
UNION ALL
SELECT 'difference' AS op, x, y FROM (SELECT x, y FROM a EXCEPT SELECT x, y FROM b)
"""



# ---------------------------------------------------------------------------
# 18. linear sort-index ordering key (tile_coord.rs:235-239, §2.8)
# ---------------------------------------------------------------------------

def q_sort_index_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from versatiles_rs_spark.tile_math.coords import sort_index_col

    z = 6
    docs = _docs_geo(spark, sf_dir)
    x, y = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), z)
    t = docs.select("doc_id", F.lit(z).alias("z"), x.alias("x"), y.alias("y"))
    return t.select(
        "doc_id", "x", "y", sort_index_col(F.col("z"), F.col("x"), F.col("y")).alias("sort_key")
    )


O_SORT_INDEX_KEY = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), t AS (
  SELECT doc_id, {_tile_sql("x", "6")} AS x, {_tile_sql("y", "6")} AS y FROM pts
)
SELECT doc_id, x, y,
       CAST(floor((pow(4.0, 6) - 1) / 3) AS BIGINT) + y * 64 + x AS sort_key
FROM t
"""



# ---------------------------------------------------------------------------
# 19. salted two-phase aggregation (hot-tile skew valve) — must equal the
#     plain groupBy, which IS the oracle
# ---------------------------------------------------------------------------

def q_salted_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from versatiles_rs_spark.operators.skew import salted_tile_stats

    ev = _events_geo(spark, sf_dir)
    assigned = assign_tiles(
        ev.select(F.col("event_id").alias("doc_id"), "lon", "lat", "value"), 0, 6
    )
    return salted_tile_stats(assigned, n_salts=8, id_col="doc_id", value_col="value")


O_SALTED_TILE_STATS = f"""
WITH pts AS (
  SELECT event_id, value,
         {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat
  FROM events
), zs AS (SELECT z FROM generate_series(0, 6) t(z))
SELECT CAST(z AS INTEGER) AS z, {_tile_sql("x")} AS x, {_tile_sql("y")} AS y,
       count(*) AS n, round(sum(value), 6) AS value_sum
FROM pts CROSS JOIN zs GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# 15b. training-data hygiene: benchmark decontamination + quality-weighted
#      sampling (first-class LLM-pipeline ops)
# ---------------------------------------------------------------------------

_DECONTAM_N = 4
_DECONTAM_MOD = 97  # docs with doc_id % 97 == 0 form the "benchmark" set


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination (GPT-3-style hygiene): flag every
    corpus document sharing a verbatim word 4-gram with the benchmark
    subset. Pure Column n-gram explode + broadcast hash join — zero
    Python, zero corpus shuffle (dedup/decontam.py)."""
    from versatiles_rs_spark.dedup.decontam import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % _DECONTAM_MOD == 0)
    rest = docs.filter(F.col("doc_id") % _DECONTAM_MOD != 0)
    out = decontaminate(rest, bench, n=_DECONTAM_N)
    return out.select("doc_id", F.col("n_hits").cast("bigint").alias("n_hits"))


O_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t != '') AS tk FROM documents
), grams AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(tk) = 0 THEN []
         WHEN len(tk) < {_DECONTAM_N} THEN [array_to_string(tk, ' ')]
         ELSE list_transform(range(1, len(tk) - {_DECONTAM_N - 2}),
                             i -> array_to_string(tk[i:i+{_DECONTAM_N - 1}], ' '))
    END) AS gs
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % {_DECONTAM_MOD} = 0
)
SELECT g.doc_id, CAST(count(DISTINCT u.gram) AS BIGINT) AS n_hits
FROM grams g, unnest(g.gs) AS u(gram)
WHERE u.gram IN (SELECT gram FROM bench) AND g.doc_id % {_DECONTAM_MOD} != 0
GROUP BY g.doc_id
"""


def q_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality-weighted sampling (training-mix shaping): keep
    probability grows with document length, decided by the same portable
    integer hash as drop_rate thinning — reproducible across engines and
    runs, embarrassingly parallel (pure Column math in codegen)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
    u = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    kept = docs.filter((u / F.lit(4294967296.0)) < p)
    return kept.groupBy("lang").agg(
        F.count("*").alias("kept"), F.sum("doc_id").alias("id_sum")
    )


O_QUALITY_SAMPLE = """
SELECT lang, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents
WHERE ((doc_id * 2654435761) % 4294967296) / 4294967296.0
      < least(1.0, n_chars / 400.0)
GROUP BY lang
"""


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


# ---------------------------------------------------------------------------
# 16. shortbread fixture decode (external MVT wire-format validation)
# ---------------------------------------------------------------------------

# The reference's only real-world vector tile — produced by external
# shortbread tooling, decoded by versatiles_geometry/src/vector_tile/
# tile.rs:41 from_blob in the reference's own tests. Decoding it here
# validates the MVT reader against a third-party encoder, not just our own
# encode/decode symmetry.
SHORTBREAD_PBF = "/root/reference/testdata/shortbread-tile.pbf"

_SHORTBREAD_STAT_COLS = [
    "layer", "extent", "n_features", "n_rings", "n_vertices",
    "n_props", "n_points", "n_lines", "n_polys",
]


def q_shortbread_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-layer stats of the shortbread fixture, decoded through the
    engine's Arrow-batched MVT path (one mapInPandas over binaryFile rows —
    the same shape used to ingest third-party MVT tilesets at scale). The
    oracle is a literal expectation table; tests/test_reference_fixtures.py
    re-derives the same counts with an independent generic protobuf TLV
    walker, so the constants are not self-referential."""
    from versatiles_rs_spark.functions.mvt import decode_tile

    df = spark.read.format("binaryFile").load(SHORTBREAD_PBF).select("content")

    def stats(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for blob in pdf["content"]:
                for name, layer in decode_tile(bytes(blob)).items():
                    fs = layer["features"]
                    rows.append(
                        (
                            name,
                            int(layer["extent"]),
                            len(fs),
                            sum(len(f.rings) for f in fs),
                            sum(len(r) for f in fs for r in f.rings),
                            sum(len(f.props) for f in fs),
                            sum(1 for f in fs if f.geom_type == 1),
                            sum(1 for f in fs if f.geom_type == 2),
                            sum(1 for f in fs if f.geom_type == 3),
                        )
                    )
            yield pd.DataFrame(rows, columns=_SHORTBREAD_STAT_COLS)

    schema = (
        "layer string, extent int, n_features bigint, n_rings bigint, "
        "n_vertices bigint, n_props bigint, n_points bigint, n_lines bigint, "
        "n_polys bigint"
    )
    return df.mapInPandas(stats, schema)


_SHORTBREAD_EXPECTED = [
    ("addresses", 4096, 2609, 2609, 2609, 2614, 2609, 0, 0),
    ("buildings", 4096, 2328, 2356, 32250, 2328, 0, 0, 2328),
    ("land", 4096, 871, 886, 17503, 871, 0, 0, 871),
    ("place_labels", 4096, 6, 6, 6, 30, 6, 0, 0),
    ("public_transport", 4096, 4, 4, 4, 16, 4, 0, 0),
    ("sites", 4096, 333, 334, 3098, 333, 0, 0, 333),
    ("street_labels", 4096, 608, 608, 2867, 4256, 0, 608, 0),
    ("street_polygons", 4096, 11, 18, 367, 54, 0, 0, 11),
    ("streets", 4096, 4224, 4225, 17013, 25296, 0, 4224, 0),
    ("streets_polygons_labels", 4096, 11, 11, 11, 17, 11, 0, 0),
    ("water_lines", 4096, 1, 1, 5, 1, 0, 1, 0),
    ("water_polygons", 4096, 7, 7, 136, 7, 0, 0, 7),
    ("water_polygons_labels", 4096, 2, 2, 2, 8, 2, 0, 0),
]

O_SHORTBREAD_LAYERS = (
    "SELECT layer, CAST(extent AS INTEGER) AS extent, "
    + ", ".join(
        f"CAST({c} AS BIGINT) AS {c}" for c in _SHORTBREAD_STAT_COLS[2:]
    )
    + " FROM (VALUES "
    + ", ".join(
        "(" + ", ".join(repr(v) if isinstance(v, str) else str(v) for v in row) + ")"
        for row in _SHORTBREAD_EXPECTED
    )
    + f") AS t({', '.join(_SHORTBREAD_STAT_COLS)})"
)


# ---------------------------------------------------------------------------
# 17. generic HTML -> text extraction (webtext payload; pure codegen)
# ---------------------------------------------------------------------------

# Deterministic "wild" page template: comment, script, style, entities —
# everything a real extractor must strip. Built identically in Spark and
# DuckDB from the documents table; single quotes avoided so the SQL literal
# needs no escaping.
_RICH_HTML_PARTS = [
    '<!DOCTYPE html><html><head><!-- crawl &amp; extract --><style type="text/css">body { color: #000; }</style>'
    '<script src="t.js">var x = 1; if (x) { track("pv"); }</script></head><body><h1>Doc ',
    "</h1><p>",
    '</p><div class="footer">lang &lt;',
    "&gt; &amp; source ",
    "</div></body></html>",
]


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic HTML->text extraction (pages/html_text.py): strip comments /
    script / style / tags, decode entities, collapse whitespace — the whole
    chain is regexp_replace Columns inside whole-stage codegen (zero
    Python), and the oracle runs the IDENTICAL rule list via
    html_to_text_sql, so the rules are cross-engine-verified, not
    self-checked."""
    from versatiles_rs_spark.pages.html_text import html_to_text

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _RICH_HTML_PARTS
    html = F.concat(
        F.lit(p[0]), F.col("doc_id").cast("string"),
        F.lit(p[1]), F.col("text"),
        F.lit(p[2]), F.col("lang"),
        F.lit(p[3]), F.col("source"),
        F.lit(p[4]),
    )
    txt = html_to_text(html)
    return docs.select(
        "doc_id",
        txt.alias("txt"),
        F.length(txt).cast("bigint").alias("n_chars_out"),
    )


def _o_html_extract() -> str:
    from versatiles_rs_spark.pages.html_text import html_to_text_sql

    p = _RICH_HTML_PARTS
    html = (
        f"'{p[0]}' || CAST(doc_id AS VARCHAR) || '{p[1]}' || text || "
        f"'{p[2]}' || lang || '{p[3]}' || source || '{p[4]}'"
    )
    txt = html_to_text_sql(html)
    return (
        f"SELECT doc_id, {txt} AS txt, CAST(length({txt}) AS BIGINT) AS n_chars_out "
        "FROM documents"
    )


O_HTML_EXTRACT = _o_html_extract()


# ---------------------------------------------------------------------------
# 18. URL canonicalization + host keys (crawl dedup prerequisite)
# ---------------------------------------------------------------------------

# Deterministic "messy crawl" URL: case noise, default ports, userinfo,
# doubled slashes, unsorted query params, fragments — varied by doc_id so
# every branch of the canonicalizer is exercised.
_MESSY_URL_SPARK = None  # built in the query from the same parts as the SQL

_MESSY_PARTS = {
    "scheme": ("http", "HTTPS", "https", "HTTP"),  # doc_id % 4
    "port": ("", ":80", ":443", ":8080"),  # doc_id % 4 (paired with scheme)
}


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (pages/urls.py): scheme/host lowercase, default
    port + userinfo + fragment stripped, doubled slashes collapsed, query
    params sorted — all codegen Columns; the oracle applies the IDENTICAL
    rule chain via canonical_url_sql. Grouped by reversed-host key so the
    hash compares canonical urls, host keys, and group sizes at once."""
    from versatiles_rs_spark.pages.urls import canonical_url, host_key

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m4 = F.col("doc_id") % 4
    scheme = F.element_at(F.array(*[F.lit(s) for s in _MESSY_PARTS["scheme"]]), (m4 + 1).cast("int"))
    port = F.element_at(F.array(*[F.lit(p) for p in _MESSY_PARTS["port"]]), (m4 + 1).cast("int"))
    user = F.when(F.col("doc_id") % 5 == 0, F.lit("bot:pw@")).otherwise(F.lit(""))
    messy = F.concat(
        scheme, F.lit("://"), user,
        F.lit("WWW."), F.upper(F.col("source")), F.lit(".Example.COM"), port,
        F.lit("//docs//"), (F.col("doc_id") % 7).cast("string"), F.lit("/page"),
        F.lit("?z="), (F.col("doc_id") % 3).cast("string"), F.lit("&a=1"),
        F.lit("#sec"), (F.col("doc_id") % 2).cast("string"),
    )
    canon = canonical_url(messy)
    return (
        docs.select(canon.alias("curl"), host_key(canon).alias("hkey"))
        .groupBy("curl", "hkey")
        .agg(F.count("*").alias("n"))
    )


def _o_url_canonical() -> str:
    from versatiles_rs_spark.pages.urls import canonical_url_sql, host_key_sql

    schemes = ", ".join(f"'{s}'" for s in _MESSY_PARTS["scheme"])
    ports = ", ".join(f"'{p}'" for p in _MESSY_PARTS["port"])
    messy = (
        f"list_extract([{schemes}], CAST(doc_id % 4 + 1 AS INT)) || '://' || "
        "(CASE WHEN doc_id % 5 = 0 THEN 'bot:pw@' ELSE '' END) || "
        "'WWW.' || upper(source) || '.Example.COM' || "
        f"list_extract([{ports}], CAST(doc_id % 4 + 1 AS INT)) || "
        "'//docs//' || CAST(doc_id % 7 AS VARCHAR) || '/page' || "
        "'?z=' || CAST(doc_id % 3 AS VARCHAR) || '&a=1' || "
        "'#sec' || CAST(doc_id % 2 AS VARCHAR)"
    )
    canon = canonical_url_sql(messy)
    return (
        f"SELECT {canon} AS curl, {host_key_sql(canon)} AS hkey, count(*) AS n "
        "FROM documents GROUP BY 1, 2"
    )


O_URL_CANONICAL = _o_url_canonical()


# ---------------------------------------------------------------------------
# 19. PII scrubbing (training-data hygiene)
# ---------------------------------------------------------------------------


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (pages/pii.py): emails / cards / phones / IPv4s
    replaced by typed tokens — regexp_replace Columns in codegen, rule
    list shared verbatim with the DuckDB oracle via scrub_pii_sql.
    Deterministic PII is injected per doc_id (each kind on its own residue
    class, none on class 0) so every rule and the no-op path are hit."""
    from versatiles_rs_spark.pages.pii import pii_counts, scrub_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    did = F.col("doc_id")
    m4 = did % 4
    noisy = F.concat(
        F.col("text"),
        F.when(m4 == 1, F.concat(F.lit(" mail user"), did.cast("string"), F.lit("@ex.org")))
        .when(m4 == 2, F.concat(F.lit(" tel +1 555-01"), F.lpad((did % 100).cast("string"), 2, "0"), F.lit(" end")))
        .when(m4 == 3, F.concat(F.lit(" card 4111 1111 1111 "), F.lpad((did % 10000).cast("string"), 4, "0"), F.lit(" ip 10.0.0."), (did % 256).cast("string")))
        .otherwise(F.lit("")),
    )
    counts = pii_counts(noisy)
    return docs.select(
        "doc_id",
        scrub_pii(noisy).alias("clean"),
        counts["n_email"].alias("n_email"),
        counts["n_card"].alias("n_card"),
        counts["n_phone"].alias("n_phone"),
        counts["n_ip"].alias("n_ip"),
    )


def _o_pii_scrub() -> str:
    from versatiles_rs_spark.pages.pii import scrub_pii_sql

    noisy = (
        "text || (CASE "
        "WHEN doc_id % 4 = 1 THEN ' mail user' || CAST(doc_id AS VARCHAR) || '@ex.org' "
        "WHEN doc_id % 4 = 2 THEN ' tel +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ' end' "
        "WHEN doc_id % 4 = 3 THEN ' card 4111 1111 1111 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) "
        "ELSE '' END)"
    )
    clean = scrub_pii_sql(noisy)
    cnt = {
        tok: f"CAST((length({clean}) - length(replace({clean}, '<{tok}>', ''))) / {len(tok) + 2} AS BIGINT)"
        for tok in ("EMAIL", "CARD", "PHONE", "IP")
    }
    return (
        f"SELECT doc_id, {clean} AS clean, "
        f"{cnt['EMAIL']} AS n_email, {cnt['CARD']} AS n_card, "
        f"{cnt['PHONE']} AS n_phone, {cnt['IP']} AS n_ip "
        "FROM documents"
    )


O_PII_SCRUB = _o_pii_scrub()


# ---------------------------------------------------------------------------
# 20. paragraph-level corpus dedup (CCNet/GPT-3-style boilerplate removal)
# ---------------------------------------------------------------------------

# Deterministic multi-paragraph pages: every doc gets its unique body plus
# shared boilerplate — a footer on residue classes 0-2 of 4 (corpus-wide
# duplicate -> dropped) and a per-source banner (duplicated within each
# source group -> dropped), while 'extra <doc_id>' stays unique (kept).
_PARA_FOOTER = "all rights reserved footer"


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup (dedup/paragraphs.py): posexplode ->
    hash-count with map-side combine -> join on hash -> order-preserving
    reassembly. The oracle reimplements it in pure SQL (list aggregation
    with ORDER BY pos)."""
    from versatiles_rs_spark.dedup.paragraphs import paragraph_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    body = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 < 3, F.lit("\n\n" + _PARA_FOOTER)).otherwise(F.lit("")),
        F.lit("\n\nbanner for "), F.col("source"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("\n\nextra "), F.col("doc_id").cast("string")),
        ).otherwise(F.lit("")),
    )
    out = paragraph_dedup(docs.select("doc_id", body.alias("text")), max_occurrences=1)
    return out.select("doc_id", "text", "n_kept", "n_dropped")


# ---------------------------------------------------------------------------
# 20b. repetition quality signals (Gopher/MassiveText-style filters)
# ---------------------------------------------------------------------------


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition signals (pages/repetition.py): dup-line fraction as
    zero-shuffle array Column math and top-bigram share via exploded
    two-level aggregation. Deterministic repetition is injected per
    residue class: duplicated lines (class 1), unique extra lines
    (class 2), and a spammy repeated bigram tail (class 3)."""
    from versatiles_rs_spark.pages.repetition import (
        dup_fraction,
        top_bigram_fraction,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m4 = F.col("doc_id") % 4
    body = (
        F.when(m4 == 1, F.concat(F.col("text"), F.lit("\n"), F.col("text"), F.lit("\n"), F.col("text")))
        .when(m4 == 2, F.concat(F.col("text"), F.lit("\nunique line one\nunique line two")))
        .when(m4 == 3, F.concat(F.col("text"), F.lit(" "), F.repeat(F.lit("buy now "), 12)))
        .otherwise(F.col("text"))
    )
    shaped = docs.select("doc_id", body.alias("text"))
    lines = shaped.select(
        "doc_id", F.round(dup_fraction(F.col("text"), "\n"), 6).alias("dup_line_frac")
    )
    grams = top_bigram_fraction(shaped)
    return lines.join(grams, "doc_id").select(
        "doc_id",
        "dup_line_frac",
        "n_bigrams",
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    )


def _o_repetition_stats() -> str:
    from versatiles_rs_spark.pages.repetition import dup_fraction_sql

    body = (
        "CASE WHEN doc_id % 4 = 1 THEN text || e'\\n' || text || e'\\n' || text "
        "WHEN doc_id % 4 = 2 THEN text || e'\\nunique line one\\nunique line two' "
        "WHEN doc_id % 4 = 3 THEN text || ' ' || repeat('buy now ', 12) "
        "ELSE text END"
    )
    dup = dup_fraction_sql("s.text", "e'\\n'")
    return f"""
WITH shaped AS (
  SELECT doc_id, {body} AS text FROM documents
), toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM shaped
), grams AS (
  SELECT doc_id, unnest(CASE WHEN len(l) < 2 THEN []
                             ELSE list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])
                        END) AS gram
  FROM toks
), per_gram AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         round(max(c) * 1.0 / sum(c), 6) AS top_bigram_frac
  FROM per_gram GROUP BY 1
)
SELECT s.doc_id, round({dup}, 6) AS dup_line_frac,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       coalesce(p.top_bigram_frac, 0.0) AS top_bigram_frac
FROM shaped s LEFT JOIN per_doc p USING (doc_id)
"""


O_REPETITION_STATS = _o_repetition_stats()


# ---------------------------------------------------------------------------
# 20d. stratified sampling + vocabulary (training-mix shaping)
# ---------------------------------------------------------------------------

_STRATA = {"en": 0.9, "de": 0.5, "fr": 0.25}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stratified sampling (pages/sampling.py): deterministic
    portable-hash keep decision per stratum fraction — zero-shuffle Column
    predicate; the oracle runs the identical predicate via
    stratified_sample_sql. Audit aggregate: kept count + id checksum per
    language."""
    from versatiles_rs_spark.pages.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = stratified_sample(docs, _STRATA, default_fraction=0.75)
    return kept.groupBy("lang").agg(
        F.count("*").alias("kept"), F.sum("doc_id").alias("id_sum")
    )


def _o_stratified_sample() -> str:
    from versatiles_rs_spark.pages.sampling import stratified_sample_sql

    pred = stratified_sample_sql(_STRATA, default_fraction=0.75)
    return (
        "SELECT lang, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS id_sum "
        f"FROM documents WHERE {pred} GROUP BY lang"
    )


O_STRATIFIED_SAMPLE = _o_stratified_sample()

_VOCAB_K = 50


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-k vocabulary (tokenizer-training step 1): word explode in
    codegen, map-side-combined counts, distributed TakeOrderedAndProject
    top-k with a deterministic (count DESC, word ASC) total order."""
    from versatiles_rs_spark.pages.sampling import vocab_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_topk(docs, k=_VOCAB_K).select(
        F.col("rank").cast("bigint").alias("rank"), "word", F.col("n").cast("bigint").alias("n")
    )


_ROBOTS_TXT = "User-agent: *\nDisallow: /d/\nAllow: /d/ok/\n"


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance filter (pages/robots.py): parse per-host
    policies into a rules table, broadcast-join pages with the prefix
    match in the join condition, longest-prefix winner per row (allow
    beats disallow on ties). Even-numbered hosts carry a policy
    (disallow /d/, allow-override /d/ok/); odd hosts have none. The
    oracle reimplements the winner selection in SQL over the SAME rule
    set written as literals — so both the parser and the applier are
    cross-checked."""
    import pandas as pd

    from versatiles_rs_spark.pages.robots import apply_robots, parse_robots

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    robots = spark.createDataFrame(
        pd.DataFrame(
            [(f"src{k}.ex.com", _ROBOTS_TXT.encode()) for k in range(0, 20, 2)],
            columns=["host", "robots"],
        )
    )
    rules = parse_robots(robots)
    m5 = F.col("doc_id") % 5
    path = (
        F.when(m5 == 0, F.lit("/d/x"))
        .when(m5 == 1, F.lit("/d/ok/y"))
        .when(m5 == 2, F.lit("/p/z"))
        .when(m5 == 3, F.lit("/d/"))
        .otherwise(F.lit("/q"))
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://src"), (F.col("doc_id") % 20).cast("string"), F.lit(".ex.com"), path
        ).alias("url"),
    )
    return apply_robots(pages, rules).select("doc_id", "url", "allowed")


def _o_robots_filter() -> str:
    rules = ", ".join(
        f"('src{k}.ex.com', 'disallow', '/d/'), ('src{k}.ex.com', 'allow', '/d/ok/')"
        for k in range(0, 20, 2)
    )
    return f"""
WITH pages AS (
  SELECT doc_id,
         'src' || CAST(doc_id % 20 AS VARCHAR) || '.ex.com' AS host,
         CASE doc_id % 5 WHEN 0 THEN '/d/x' WHEN 1 THEN '/d/ok/y'
              WHEN 2 THEN '/p/z' WHEN 3 THEN '/d/' ELSE '/q' END AS path
  FROM documents
), rules AS (
  SELECT * FROM (VALUES {rules}) AS t(host, rule, prefix)
), cand AS (
  SELECT p.doc_id, p.host, p.path, r.rule, r.prefix
  FROM pages p LEFT JOIN rules r
    ON r.host = p.host AND starts_with(p.path, r.prefix)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY length(prefix) DESC NULLS LAST, rule ASC) AS rn
  FROM cand
)
SELECT doc_id, 'http://' || host || path AS url,
       coalesce(rule = 'allow', TRUE) AS allowed
FROM ranked WHERE rn = 1
"""


O_ROBOTS_FILTER = _o_robots_filter()


_SESSION_GAP_MIN = 20.0


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators/sessions.py): lag + running-sum
    windows on the user key, boundaries compared in integer microseconds
    so the SQL oracle's sessions are bit-identical."""
    from versatiles_rs_spark.operators.sessions import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = session_stats(ev, gap_minutes=_SESSION_GAP_MIN)
    return out.select(
        "user_id",
        F.col("session_no").cast("bigint").alias("session_no"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("duration_s", 6).alias("duration_s"),
        "value_sum",
    )


def _o_sessionize() -> str:
    from versatiles_rs_spark.operators.sessions import session_stats_sql

    sql = session_stats_sql(gap_minutes=_SESSION_GAP_MIN).rstrip()
    # wrap to round duration identically to the Spark side
    return (
        "SELECT user_id, session_no, n_events, round(duration_s, 6) AS duration_s, "
        f"value_sum FROM ({sql})"
    )


O_SESSIONIZE = _o_sessionize()


def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-NN graph over the embedding corpus (dedup/pq.py knn_graph):
    every vector's top-3 cosine neighbors via cell-local candidate
    generation (IVF member x probe equi-join on the cell key — the
    partition key at corpus scale) + exact integer-dot rescoring. Nothing
    corpus-sized ever reaches the driver. The synthetic embeddings are
    uniform on the sphere (no cluster structure — the IVF worst case), and
    ALL 500 per-vector top-3 sets must be simultaneously exact for the
    hash gate, so the oracle-scale run probes every cell (nprobe=8/8; the
    candidate join stays cell-local/co-located — the SHAPE that scales —
    while clustered real embeddings run nprobe << n_cells). The oracle is
    the all-pairs window top-3."""
    from versatiles_rs_spark.dedup.pq import knn_graph

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return knn_graph(emb, k=3, n_cells=8, nprobe=8)


O_KNN_GRAPH = """
WITH scored AS (
  SELECT a.vec_id AS qid, b.vec_id AS vid,
    CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
      p -> CAST(round(CAST(p[1] AS DOUBLE)*1000000) AS BIGINT) * CAST(round(CAST(p[2] AS DOUBLE)*1000000) AS BIGINT)), 'sum') AS BIGINT) AS dot
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
), ranked AS (
  SELECT qid, vid, dot, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vid ASC) AS rank
  FROM scored
)
SELECT qid, vid, dot, CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= 3
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters (dedup/clusters.py): MinHash-LSH pairs become
    connected components via iterative min-label propagation; output is
    one row per clustered doc with its canonical representative, cluster
    size, and the keep/drop decision. The oracle recomputes the SAME pair
    graph by brute force and takes its transitive closure with a
    recursive CTE — graph construction AND clustering are cross-checked."""
    from versatiles_rs_spark.dedup import minhash_dedup_pairs
    from versatiles_rs_spark.dedup.clusters import dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_dedup_pairs(docs, threshold=0.5)
    return dedup_clusters(pairs).select("node", "cluster", "cluster_size", "keep")


def _o_dedup_clusters() -> str:
    return f"""
WITH RECURSIVE {_SQL_GRAMS_CTE},
sets AS (SELECT doc_id, list_distinct(gs) AS s FROM grams),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
cc(node, lab) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, cc.lab FROM cc JOIN edges e ON e.u = cc.node
),
comp AS (SELECT node, min(lab) AS cluster FROM cc GROUP BY node)
SELECT node, cluster,
       CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size,
       node = cluster AS keep
FROM comp
"""


O_DEDUP_CLUSTERS = _o_dedup_clusters()


_DIFF_MOD = 7


def q_tile_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-update verification (operators/tile_diff.py): render the
    full corpus and a corpus with every 7th doc removed, diff the two
    pyramids by content hash (only 16-byte digests shuffle). doc_id rides
    in the tile properties, so byte-equality holds exactly when the
    contributing doc set is unchanged — which is what the oracle computes
    independently from the raw points (per-tile sorted doc lists under the
    shared Web-Mercator formula), never decoding a tile."""
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.operators.tile_diff import tile_diff_summary

    geo = _docs_geo(spark, sf_dir)
    old = convert_pages_to_tiles(geo, 0, 4, keep_ratio=1.0, props_cols=["doc_id"], compression="none")
    new = convert_pages_to_tiles(
        geo.where(F.col("doc_id") % _DIFF_MOD != 0), 0, 4,
        keep_ratio=1.0, props_cols=["doc_id"], compression="none",
    )
    return tile_diff_summary(old, new).select(
        F.col("z").cast("int").alias("z"), "status", F.col("n").cast("bigint").alias("n")
    )


O_TILE_DIFF = f"""
WITH pts AS (
  SELECT doc_id, {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), zs AS (SELECT z FROM generate_series(0, 4) t(z)),
a AS (
  SELECT CAST(z AS INTEGER) AS z, {_tile_sql("x")} AS x, {_tile_sql("y")} AS y,
         list(doc_id ORDER BY doc_id) AS ds
  FROM pts CROSS JOIN zs GROUP BY 1, 2, 3
),
b AS (
  SELECT CAST(z AS INTEGER) AS z, {_tile_sql("x")} AS x, {_tile_sql("y")} AS y,
         list(doc_id ORDER BY doc_id) AS ds
  FROM pts CROSS JOIN zs WHERE doc_id % {_DIFF_MOD} != 0 GROUP BY 1, 2, 3
),
d AS (
  SELECT coalesce(a.z, b.z) AS z,
         CASE WHEN a.ds IS NULL THEN 'added'
              WHEN b.ds IS NULL THEN 'removed'
              WHEN a.ds = b.ds THEN 'same' ELSE 'changed' END AS status
  FROM a FULL OUTER JOIN b ON a.z = b.z AND a.x = b.x AND a.y = b.y
)
SELECT z, status, count(*) AS n FROM d GROUP BY 1, 2
"""


_ANOM_Z = 2
_ANOM_THRESH = 2.0


def q_tile_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatio-temporal anomaly detection: per-tile hourly event counts
    z-scored against that tile's own hourly distribution, flagging hours
    with |z| > 2 — the hot-tile monitoring op a live crawl/tile service
    runs. Pure groupBy + window aggregation on natural keys (tile, hour);
    integer counts make the mean/std arithmetic bit-identical in both
    engines."""
    from versatiles_rs_spark.operators.convert import assign_tiles

    ev = assign_tiles(_events_geo(spark, sf_dir), _ANOM_Z, _ANOM_Z)
    hourly = (
        ev.withColumn("hour", F.date_trunc("hour", F.col("ts").cast("timestamp")))
        .groupBy("z", "x", "y", "hour")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("z", "x", "y")
    stats = hourly.withColumn("mu", F.avg("n").over(w)).withColumn(
        "sigma", F.stddev_pop("n").over(w)
    )
    flagged = stats.where(
        (F.col("sigma") > 0)
        & (F.abs((F.col("n") - F.col("mu")) / F.col("sigma")) > _ANOM_THRESH)
    )
    return flagged.select(
        F.col("x").cast("bigint").alias("x"),
        F.col("y").cast("bigint").alias("y"),
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("n").cast("bigint").alias("n"),
        F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 6).alias("zscore"),
    )


O_TILE_ANOMALY = f"""
WITH pts AS (
  SELECT ts, {LON_SQL.format(id="event_id")} AS lon, {LAT_SQL.format(id="event_id")} AS lat
  FROM events
), hourly AS (
  SELECT {_tile_sql("x", str(_ANOM_Z))} AS x, {_tile_sql("y", str(_ANOM_Z))} AS y,
         date_trunc('hour', ts) AS hour, count(*) AS n
  FROM pts GROUP BY 1, 2, 3
), stats AS (
  SELECT x, y, hour, n,
         avg(n) OVER (PARTITION BY x, y) AS mu,
         stddev_pop(n) OVER (PARTITION BY x, y) AS sigma
  FROM hourly
)
SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(n AS BIGINT) AS n, round((n - mu) / sigma, 6) AS zscore
FROM stats WHERE sigma > 0 AND abs((n - mu) / sigma) > {_ANOM_THRESH}
"""


_LM_REF_MOD = 10


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (pages/lm.py): add-k bigram LM
    trained on the doc_id % 10 == 0 reference slice (two hash
    aggregations), every document scored by joining its exploded bigrams
    to the broadcast model. The oracle retrains and rescores entirely in
    SQL — model AND scorer are cross-engine-verified."""
    from versatiles_rs_spark.pages.lm import perplexity, train_bigram_lm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.where(F.col("doc_id") % _LM_REF_MOD == 0)
    uni, bi, vocab = train_bigram_lm(ref)
    return perplexity(docs, uni, bi, vocab)


def _o_lm_perplexity() -> str:
    from versatiles_rs_spark.pages.lm import perplexity_sql

    return perplexity_sql(f"doc_id % {_LM_REF_MOD} = 0")


O_LM_PERPLEXITY = _o_lm_perplexity()


def q_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix analysis: documents ranked into exact deciles by
    length (ntile over a total order with doc_id tiebreak — deterministic,
    unlike approximate percentiles), with per-decile population, bounds,
    and id checksum. One window + one aggregation."""
    from pyspark.sql.window import Window as _W

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = _W.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    binned = docs.withColumn("decile", F.ntile(10).over(w))
    return binned.groupBy("decile").agg(
        F.count("*").alias("n"),
        F.min("n_chars").alias("len_min"),
        F.max("n_chars").alias("len_max"),
        F.sum("doc_id").alias("id_sum"),
    )


O_QUALITY_DECILES = """
WITH binned AS (
  SELECT doc_id, n_chars,
         ntile(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS decile
  FROM documents
)
SELECT decile, count(*) AS n,
       min(n_chars) AS len_min, max(n_chars) AS len_max,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM binned GROUP BY decile
"""


_PMI_MIN_PAIR = 5


def q_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-association mining: pointwise mutual information of adjacent
    word pairs over the corpus — PMI(w1,w2) = ln(N * c12 / (c1 * c2))
    with N the bigram total. Collocations (high PMI) drive tokenizer
    merges and phrase detection. Pure two-level aggregation: bigram and
    unigram counts (map-side combinable) joined on the word keys; the
    oracle rebuilds the identical statistic in SQL."""
    from versatiles_rs_spark.pages.lm import _doc_bigrams, _toks

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bi = _doc_bigrams(docs, "text").groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = (
        docs.select(F.explode(_toks("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n = bi.agg(F.sum("c12")).collect()[0][0]
    out = (
        bi.where(F.col("c12") >= _PMI_MIN_PAIR)
        .join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2")), "w2")
        .select(
            "w1", "w2", F.col("c12").cast("bigint").alias("c12"),
            F.round(
                F.log(F.lit(float(n)) * F.col("c12") / (F.col("c1") * F.col("c2"))), 6
            ).alias("pmi"),
        )
    )
    return out


O_WORD_PMI = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '),
                     x -> x != '') AS l
  FROM documents
), grams AS (
  SELECT unnest(CASE WHEN len(l) < 2 THEN []
                     ELSE list_transform(range(1, len(l)), i -> {{'w1': l[i], 'w2': l[i + 1]}})
                END) AS g
  FROM toks
), bi AS (
  SELECT g.w1 AS w1, g.w2 AS w2, count(*) AS c12 FROM grams GROUP BY 1, 2
), uni2 AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(l) AS w FROM toks) GROUP BY 1
), n AS (SELECT sum(c12) AS total FROM bi)
SELECT b.w1, b.w2, CAST(b.c12 AS BIGINT) AS c12,
       round(ln((SELECT total FROM n) * b.c12 / (u1.c * u2.c)), 6) AS pmi
FROM bi b JOIN uni2 u1 ON b.w1 = u1.w JOIN uni2 u2 ON b.w2 = u2.w
WHERE b.c12 >= {_PMI_MIN_PAIR}
"""


_BM25_TERMS = ["spark", "window", "hash"]
_BM25_K = 15


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (pages/retrieval.py): inverted-index postings pruned
    to the query terms before any scoring, Lucene-variant idf, document-
    length normalization, distributed top-k on a (rounded score, doc_id)
    total order. The oracle recomputes the full formula in SQL."""
    from versatiles_rs_spark.pages.retrieval import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, _BM25_TERMS, k=_BM25_K)


def _o_bm25_topk() -> str:
    from versatiles_rs_spark.pages.retrieval import bm25_topk_sql

    return bm25_topk_sql(_BM25_TERMS, k=_BM25_K)


O_BM25_TOPK = _o_bm25_topk()


O_VOCAB_TOPK = f"""
WITH words AS (
  SELECT unnest(list_filter(string_split(regexp_replace(text, '\\s+', ' ', 'g'), ' '),
                x -> x != '')) AS word
  FROM documents
), counts AS (
  SELECT word, count(*) AS n FROM words GROUP BY word
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, word ASC) AS BIGINT) AS rank,
       word, CAST(n AS BIGINT) AS n
FROM counts ORDER BY n DESC, word ASC LIMIT {_VOCAB_K}
"""


# ---------------------------------------------------------------------------
# 20c. WARC archive round-trip (Common-Crawl container path)
# ---------------------------------------------------------------------------


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the synthetic pages to Common-Crawl-layout .warc.gz archives
    (member-per-record + CDX sidecars), re-ingest with the distributed
    reader, and emit (url, md5 of the html payload, second-truncated
    timestamp). The oracle recomputes all three straight from the
    documents table via the shared SQL derivations — byte-level survival
    of every record through the archive format is what the hash proves."""
    import hashlib
    import shutil
    import tempfile

    from versatiles_rs_spark.pages.generator import synth_pages
    from versatiles_rs_spark.sources.warc import read_warc, write_warc

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out = f"{tempfile.gettempdir()}/vt_warc_rt_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    write_warc(synth_pages(spark, sf_dir).repartition(4), out)
    back = read_warc(spark, out)
    return back.select(
        "url",
        F.md5(F.col("html").cast("string")).alias("html_md5"),
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
    )


O_WARC_ROUNDTRIP = """
SELECT 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       md5('<html><head><meta name="geo" content="'
           || CAST((doc_id * 2654435761) % 360000000 AS VARCHAR) || ','
           || CAST((doc_id * 2246822519) % 170000000 AS VARCHAR)
           || '"></head><body>' || text || '</body></html>') AS html_md5,
       strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id),
                '%Y-%m-%d %H:%M:%S') AS ts
FROM documents
"""


# ---------------------------------------------------------------------------
# 21. link graph + PageRank (web-graph layer)
# ---------------------------------------------------------------------------

_PR_DAMPING = 0.85
_PR_ITER = 3


def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph PageRank (pages/links.py): href extraction with
    regexp_extract_all, weighted host edge list (self-loops dropped),
    3 power iterations as DataFrame joins with the dangling-mass term kept
    in-plan. Deterministic linky HTML: every src<k> page links to
    src<k+1>, every third page links to the hub src0, and src19 pages
    emit no links (a dangling host). Oracle: the same graph + 3 unrolled
    iterations in pure SQL CTEs."""
    from versatiles_rs_spark.pages.links import extract_links, host_edges, pagerank_hosts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = F.col("doc_id") % 20
    url = F.concat(F.lit("http://src"), k.cast("string"), F.lit(".ex.com/d/"), F.col("doc_id").cast("string"))
    nxt = (F.col("doc_id") + 1) % 20
    html = F.when(k == 19, F.lit("<p>no links</p>")).otherwise(
        F.concat(
            F.lit('<a href="http://src'), nxt.cast("string"), F.lit('.ex.com/p">n</a>'),
            F.when(
                F.col("doc_id") % 3 == 0, F.lit('<a href="http://src0.ex.com/h">h</a>')
            ).otherwise(F.lit("")),
        )
    )
    pages = docs.select(url.alias("url"), F.encode(html, "UTF-8").alias("html"))
    edges = host_edges(extract_links(pages))
    ranks = pagerank_hosts(edges, n_iter=_PR_ITER, damping=_PR_DAMPING)
    return ranks.select("host", F.round("rank", 6).alias("rank"))


def _o_link_pagerank() -> str:
    from versatiles_rs_spark.pages.links import HREF_PATTERN
    from versatiles_rs_spark.pages.urls import host_of_sql

    d = _PR_DAMPING
    pat = HREF_PATTERN.replace("'", "''").replace('"', '"')
    html = (
        "CASE WHEN doc_id % 20 = 19 THEN '<p>no links</p>' ELSE "
        "'<a href=\"http://src' || CAST((doc_id + 1) % 20 AS VARCHAR) || '.ex.com/p\">n</a>' || "
        "(CASE WHEN doc_id % 3 = 0 THEN '<a href=\"http://src0.ex.com/h\">h</a>' ELSE '' END) END"
    )
    url = "'http://src' || CAST(doc_id % 20 AS VARCHAR) || '.ex.com/d/' || CAST(doc_id AS VARCHAR)"
    sql = f"""
WITH pages AS (
  SELECT {url} AS url, {html} AS html FROM documents
), links AS (
  SELECT url, unnest(regexp_extract_all(html, '{pat}', 1)) AS link FROM pages
), edges_raw AS (
  SELECT {host_of_sql('url')} AS src, {host_of_sql('link')} AS dst FROM links
), edges AS (
  SELECT src, dst, count(*) AS weight FROM edges_raw WHERE src != dst GROUP BY 1, 2
), nodes AS (
  SELECT DISTINCT host FROM (SELECT src AS host FROM edges UNION ALL SELECT dst FROM edges)
), nn AS (SELECT count(*) AS n FROM nodes
), outw AS (SELECT src, sum(weight) AS w_out FROM edges GROUP BY 1
), share AS (
  SELECT e.src, e.dst, e.weight * 1.0 / o.w_out AS share FROM edges e JOIN outw o USING (src)
), r0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    for i in range(1, _PR_ITER + 1):
        p = i - 1
        sql += f""", f{i} AS (
  SELECT s.dst AS host, sum(s.share * r.rank) AS inflow
  FROM share s JOIN r{p} r ON s.src = r.host GROUP BY 1
), d{i} AS (
  SELECT coalesce(sum(rank), 0) AS dm FROM r{p}
  WHERE host NOT IN (SELECT src FROM outw)
), r{i} AS (
  SELECT n.host,
         (1 - {d}) / (SELECT n FROM nn)
         + {d} * (coalesce(f.inflow, 0) + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM nodes n LEFT JOIN f{i} f USING (host)
)"""
    sql += f"\nSELECT host, round(rank, 6) AS rank FROM r{_PR_ITER}"
    return sql


O_LINK_PAGERANK = _o_link_pagerank()


O_PARAGRAPH_DEDUP = f"""
WITH pages AS (
  SELECT doc_id,
         text
         || (CASE WHEN doc_id % 4 < 3 THEN e'\\n\\n{_PARA_FOOTER}' ELSE '' END)
         || e'\\n\\nbanner for ' || source
         || (CASE WHEN doc_id % 5 = 0 THEN e'\\n\\nextra ' || CAST(doc_id AS VARCHAR) ELSE '' END)
         AS text
  FROM documents
), split AS (
  SELECT doc_id, string_split(text, e'\\n\\n') AS l FROM pages
), paras AS (
  SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
                 i -> {{'pos': i, 'para': l[i]}})) AS s
  FROM split
), flat AS (
  SELECT doc_id, s.pos AS pos, s.para AS para FROM paras WHERE trim(s.para) != ''
), counts AS (
  SELECT para, count(*) AS n_occ FROM flat GROUP BY para
)
SELECT f.doc_id,
       array_to_string(list(f.para ORDER BY f.pos) FILTER (WHERE c.n_occ <= 1), e'\\n\\n') AS text,
       CAST(count(*) FILTER (WHERE c.n_occ <= 1) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE c.n_occ > 1) AS BIGINT) AS n_dropped
FROM flat f JOIN counts c USING (para)
GROUP BY f.doc_id
"""


_BPE_TOPK = 20
_BPE_MERGES = 12


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed BPE trainer's pair-counting core (pages/bpe.py):
    corpus -> word counts -> adjacent character-pair counts, top-k with a
    deterministic (count DESC, left ASC, right ASC) total order. This is
    iteration 0 of training, the one step SQL can express — so the oracle
    checks the exact aggregation the whole trainer loops on."""
    from versatiles_rs_spark.pages.bpe import _initial_symbols, _pair_counts, word_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc = word_counts(docs)
    return (
        _pair_counts(_initial_symbols(wc).where(F.size("syms") > 1))
        .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
        .limit(_BPE_TOPK)
        .select(
            F.col("left").alias("l_sym"),
            F.col("right").alias("r_sym"),
            F.col("pair_count").cast("bigint").alias("pair_count"),
        )
    )


O_BPE_PAIR_COUNTS = f"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '{_BPE_RX}')) AS word FROM documents
), wc AS (
  SELECT word, COUNT(*) AS freq FROM words GROUP BY word
), prs AS (
  SELECT unnest(list_zip(regexp_extract_all(word, '.'),
                         regexp_extract_all(word, '.')[2:])) AS p, freq
  FROM wc WHERE length(word) > 1
)
SELECT p[1] AS l_sym, p[2] AS r_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
FROM prs WHERE p[2] IS NOT NULL
GROUP BY 1, 2
ORDER BY pair_count DESC, l_sym ASC, r_sym ASC
LIMIT {_BPE_TOPK}
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full sequential BPE training (pages/bpe.py train_bpe) on the
    documents corpus: the learned merge list in rank order. Classic BPE's
    argmax-then-rewrite loop is not SQL-expressible, so this entry has no
    DuckDB oracle (rows-only driver check); the merge-for-merge equality
    against an independent single-node reference implementation is
    covered by tests/test_bpe.py."""
    from versatiles_rs_spark.pages.bpe import train_bpe, word_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(word_counts(docs), n_merges=_BPE_MERGES)
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("rank", LongType()),
            StructField("l_sym", StringType()),
            StructField("r_sym", StringType()),
            StructField("merged", StringType()),
            StructField("pair_count", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["merged"], m["pair_count"]) for m in merges],
        schema,
    )


# ---------------------------------------------------------------------------
# 34. heuristic quality filters (C4 / Gopher) + normalization-before-dedup
# ---------------------------------------------------------------------------

def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line+page quality rules (Raffel et al. 2020 §2.2) over the
    deterministic decorated page built from (doc_id, text) — terminal
    punctuation, >= 3 words/line, javascript-line drop, '{' and
    'lorem ipsum' page drops. Zero shuffles; the oracle renders the
    IDENTICAL rule chain via pages.quality_filters.c4_filter_sql."""
    from versatiles_rs_spark.pages.quality_filters import c4_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return c4_filter(docs)


def q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher Table-A1 quality signals (Rae et al. 2021): word-count
    bounds, mean word length, alpha-word / bullet-line / ellipsis-line
    fractions (micro-quantized), stop-word floor. Zero shuffles."""
    from versatiles_rs_spark.pages.quality_filters import gopher_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_filter(docs)


def q_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup AFTER canonical text normalization (lowercase, strip
    punctuation, collapse whitespace): deterministic case/punct/space
    noise is injected per doc_id, and n_variants > 1 groups prove the
    normalizer merged raw-distinct rows. Same single-shuffle shape as
    dedup_exact."""
    from versatiles_rs_spark.pages.quality_filters import normalized_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return normalized_dedup(docs)


def _o_c4_filter() -> str:
    from versatiles_rs_spark.pages.quality_filters import c4_filter_sql

    return c4_filter_sql()


def _o_gopher_filter() -> str:
    from versatiles_rs_spark.pages.quality_filters import gopher_filter_sql

    return gopher_filter_sql()


def _o_normalized_dedup() -> str:
    from versatiles_rs_spark.pages.quality_filters import normalized_dedup_sql

    return normalized_dedup_sql()


O_C4_FILTER = _o_c4_filter()
O_GOPHER_FILTER = _o_gopher_filter()
O_NORMALIZED_DEDUP = _o_normalized_dedup()


# ---------------------------------------------------------------------------
# 35. exact-substring duplication: dup n-grams (Lee et al.) + winnowing (MOSS)
# ---------------------------------------------------------------------------

def q_dup_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-duplicated word-5-gram coverage per document (Lee et al.,
    ACL 2022): one explode + one map-side-combined gram-hash aggregate +
    one equi-join against the (small) duplicate set."""
    from versatiles_rs_spark.dedup.substrings import dup_ngram_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dup_ngram_stats(docs, n=5, min_count=2)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (Schleimer et al., SIGMOD 2003):
    k=3-word-gram Rabin-Karp hashes, window w=4 minima with the exact
    rightmost-min tie rule (packed-key construction). Zero-shuffle
    per-row array math."""
    from versatiles_rs_spark.dedup.substrings import winnow_fingerprints

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return winnow_fingerprints(docs, k=3, w=4)


def _o_dup_ngram_stats() -> str:
    from versatiles_rs_spark.dedup.substrings import dup_ngram_stats_sql

    return dup_ngram_stats_sql(n=5, min_count=2)


def _o_winnow_fingerprints() -> str:
    from versatiles_rs_spark.dedup.substrings import winnow_fingerprints_sql

    return winnow_fingerprints_sql(k=3, w=4)


O_DUP_NGRAM_STATS = _o_dup_ngram_stats()
O_WINNOW_FINGERPRINTS = _o_winnow_fingerprints()


# ---------------------------------------------------------------------------
# 36. corpus curation funnel + relational k-means + SemDeDup
# ---------------------------------------------------------------------------

def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel all -> C4 -> +Gopher -> +normalized
    dedup with per-stage doc and token counts: one per-row flag
    projection, one dedup window, one 4-group aggregate."""
    from versatiles_rs_spark.pages.quality_filters import filter_funnel

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return filter_funnel(docs)


def _o_filter_funnel() -> str:
    from versatiles_rs_spark.pages.quality_filters import filter_funnel_sql

    return filter_funnel_sql()


O_FILTER_FUNNEL = _o_filter_funnel()


def q_polygon_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-geometry cascade over a deterministic admin-like polygon
    corpus (spatial/admin_rings.py): candidate explode z0-8 -> clip ->
    quantize -> MVT render, returning per-tile (n_features, sum_fid)
    where BOTH counts come from DECODING the rendered MVT bytes (the
    engine's own decoder recovering feature ids). The corpus is
    constructed so the closed-form oracle decides every tile floor and
    every quantize-drop exactly (1/96-offset grid, see
    spatial/admin_rings.py), so equality attests the whole distributed
    cascade end to end: explode ranges, the shuffle to (z,x,y),
    clipping, quantization, and the encode/decode round trip."""
    from versatiles_rs_spark.operators.from_geo import (
        candidate_tiles,
        render_geo_tiles,
    )
    from versatiles_rs_spark.spatial.admin_rings import synth_admin_features

    import pandas as pd

    feats = synth_admin_features(spark, sf_dir)
    cands = candidate_tiles(feats, 0, 8, simplify_px=0.0)
    tiles = render_geo_tiles(cands, compression="none")

    def summarize(it):
        from versatiles_rs_spark.functions.mvt import decode_tile

        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                fs = decode_tile(bytes(r["tile"]))["features"]["features"]
                rows.append((int(r["z"]), int(r["x"]), int(r["y"]),
                             len(fs), sum(f.fid for f in fs)))
            yield pd.DataFrame(
                rows, columns=["z", "x", "y", "n_features", "sum_fid"]
            )

    return tiles.mapInPandas(
        summarize, "z int, x long, y long, n_features long, sum_fid long"
    )


def _o_polygon_tiles() -> str:
    from versatiles_rs_spark.spatial.admin_rings import admin_tiles_oracle_sql

    return admin_tiles_oracle_sql()


O_POLYGON_TILES = _o_polygon_tiles()


_NEARDUP_FUNNEL_THRESHOLD = 0.5


def q_filter_funnel_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel extended with a 5th near-dup stage (the
    `curate_job --neardup minhash` pipeline): stage-3 survivors go
    through MinHash-LSH banded pairs -> exact-Jaccard verify ->
    connected components, keeping the min-doc_id representative per
    cluster. The oracle brute-forces the same pair graph among the
    survivors and closes it with a recursive CTE, so banding recall,
    the verify threshold, AND the cluster-keeper rule are all attested."""
    from versatiles_rs_spark.pages.quality_filters import filter_funnel

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return filter_funnel(docs, neardup_threshold=_NEARDUP_FUNNEL_THRESHOLD)


def _o_filter_funnel_neardup() -> str:
    from versatiles_rs_spark.pages.quality_filters import filter_funnel_sql

    return filter_funnel_sql(neardup_threshold=_NEARDUP_FUNNEL_THRESHOLD)


O_FILTER_FUNNEL_NEARDUP = _o_filter_funnel_neardup()


_SEM_CLONE_MOD = 50
_SEM_CLONE_OFFSET = 100000


def _aug_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clone-augmented embeddings table q_embedding_neardup
    established: identical vectors at vec_id+100000 for vec_id%50==0
    guarantee near-dup positives (the natural table's max cosine ~0.51)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clones = emb.filter(f"vec_id % {_SEM_CLONE_MOD} = 0").select(
        (F.col("vec_id") + _SEM_CLONE_OFFSET).alias("vec_id"), "embedding"
    )
    return emb.select("vec_id", "embedding").unionByName(clones)


_AUG_SQL = f"""aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_SEM_CLONE_OFFSET}, embedding FROM embeddings
  WHERE vec_id % {_SEM_CLONE_MOD} = 0
)"""


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (k=8, 2 assign/update rounds) over the
    clone-augmented embeddings: per-cluster membership counts + exact
    integer centroid checksums. Assignment is a zero-shuffle map against
    broadcast centroid literals; each update is one K*dim-group
    aggregate; the oracle unrolls both iterations in SQL."""
    from versatiles_rs_spark.dedup.kmeans import kmeans_summary, lloyd_kmeans

    assigned, cents = lloyd_kmeans(_aug_embeddings(spark, sf_dir), k=8, iters=2)
    return kmeans_summary(assigned, cents)


def _o_kmeans_clusters() -> str:
    from versatiles_rs_spark.dedup.kmeans import kmeans_summary_sql

    sql = kmeans_summary_sql(k=8, iters=2, table="aug")
    return sql.replace("WITH ", f"WITH {_AUG_SQL},\n", 1)


O_KMEANS_CLUSTERS = _o_kmeans_clusters()


def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means clustering then exact
    quantized-dot near-dup pairs WITHIN clusters — cluster-keyed equi-join,
    never corpus-quadratic. Clone augmentation guarantees positives; the
    identical-vector clones must co-cluster by construction."""
    from versatiles_rs_spark.dedup.kmeans import semdedup_pairs

    return semdedup_pairs(_aug_embeddings(spark, sf_dir), k=8, iters=2)


def _o_semdedup_pairs() -> str:
    from versatiles_rs_spark.dedup.kmeans import semdedup_pairs_sql

    sql = semdedup_pairs_sql(k=8, iters=2, table="aug")
    return sql.replace("WITH ", f"WITH {_AUG_SQL},\n", 1)


O_SEMDEDUP_PAIRS = _o_semdedup_pairs()


# ---------------------------------------------------------------------------
# 36b. registered domains (PSL algorithm) + crawl politeness scheduling
# ---------------------------------------------------------------------------

# deterministic host zoo exercising every branch of the PSL algorithm:
# multi-label public suffixes (2- and 3-label), deep subdomains, plain TLDs
_HOST_SPARK = (
    "CASE cast(doc_id % 4 as int) "
    "WHEN 0 THEN 'www.' || source || '.example.co.uk' "
    "WHEN 1 THEN source || '.github.io' "
    "WHEN 2 THEN 'a.b.' || source || '.com' "
    "ELSE source || '.blogspot.com' END"
)
_HOST_DUCK = (
    "CASE CAST(doc_id % 4 AS INT) "
    "WHEN 0 THEN 'www.' || source || '.example.co.uk' "
    "WHEN 1 THEN source || '.github.io' "
    "WHEN 2 THEN 'a.b.' || source || '.com' "
    "ELSE source || '.blogspot.com' END"
)


def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain rollup (the crawl-dedup / politeness key): the
    public-suffix algorithm (longest multi-label suffix + one label) as
    pure Column math over a host zoo hitting every branch. One hash-agg."""
    from versatiles_rs_spark.pages.urls import registered_domain

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host = F.expr(_HOST_SPARK)
    return (
        docs.select(
            registered_domain(host).alias("rdomain"), host.alias("host")
        )
        .groupBy("rdomain")
        .agg(F.count("*").alias("n_docs"), F.countDistinct("host").alias("n_hosts"))
    )


def _o_domain_stats() -> str:
    from versatiles_rs_spark.pages.urls import registered_domain_sql

    rd = registered_domain_sql(f"({_HOST_DUCK})")
    return f"""
SELECT {rd} AS rdomain, count(*) AS n_docs,
       count(DISTINCT ({_HOST_DUCK})) AS n_hosts
FROM documents GROUP BY 1
"""


O_DOMAIN_STATS = _o_domain_stats()

_CRAWL_RATE = 3  # fetches per politeness slot per registered domain


def q_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier politeness scheduling: per registered domain,
    deterministic fetch order (doc_id) bucketed into rate-limited slots —
    one window shuffle on the domain key, the frontier-scheduler shape."""
    from pyspark.sql import Window

    from versatiles_rs_spark.pages.urls import registered_domain

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host = F.expr(_HOST_SPARK)
    d = docs.select("doc_id", registered_domain(host).alias("rdomain"))
    rn = F.row_number().over(Window.partitionBy("rdomain").orderBy("doc_id"))
    d = d.withColumn("slot", ((rn - 1) / _CRAWL_RATE).cast("bigint"))
    return d.groupBy("rdomain").agg(
        F.count("*").alias("n_docs"),
        (F.max("slot") + 1).alias("n_slots"),
        F.sum("slot").alias("slot_checksum"),
    )


def _o_crawl_schedule() -> str:
    from versatiles_rs_spark.pages.urls import registered_domain_sql

    rd = registered_domain_sql(f"({_HOST_DUCK})")
    return f"""
WITH d AS (
  SELECT doc_id, {rd} AS rdomain FROM documents
), s AS (
  SELECT rdomain,
         CAST((row_number() OVER (PARTITION BY rdomain ORDER BY doc_id) - 1)
              // {_CRAWL_RATE} AS BIGINT) AS slot
  FROM d
)
SELECT rdomain, count(*) AS n_docs, max(slot) + 1 AS n_slots,
       CAST(sum(slot) AS BIGINT) AS slot_checksum
FROM s GROUP BY 1
"""


O_CRAWL_SCHEDULE = _o_crawl_schedule()


# ---------------------------------------------------------------------------
# 37. tile-pyramid integrity validation (the `validate` side of convert)
# ---------------------------------------------------------------------------

_PYR_ZMAX = 8
# deterministic damage schedule: drop ~1/11 of the non-root pyramid so the
# validator has real gaps to find
_PYR_DAMAGE = "(z >= 1 AND (x * 73 + y * 37 + z) % 11 = 0)"


def q_pyramid_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container validation: per-zoom tile counts + orphan tiles (present
    at z with no parent at z-1) over a deterministically damaged pyramid
    derived from the docs' max-zoom tiles. Models the reference's
    container consistency checking (versatiles probe / tile_coord parent
    math, tile_coord.rs:79-96): a healthy halved pyramid has zero
    orphans, so every reported orphan is damage-schedule-caused.
    Shape: one distinct, one broadcast-sized zoom explode, one self
    equi-join on (z-1, x>>1, y>>1) — all key-partitioned."""
    from versatiles_rs_spark.tile_math.coords import lonlat_to_tile_cols

    geo = _docs_geo(spark, sf_dir)
    x8, y8 = lonlat_to_tile_cols(F.col("lon"), F.col("lat"), _PYR_ZMAX)
    t8 = geo.select(x8.alias("x8"), y8.alias("y8")).distinct()
    zs = F.explode(F.sequence(F.lit(0), F.lit(_PYR_ZMAX))).alias("z")
    present = (
        t8.select("x8", "y8", zs)
        .select(
            F.col("z").cast("int").alias("z"),
            F.expr(f"shiftright(x8, {_PYR_ZMAX} - z)").alias("x"),
            F.expr(f"shiftright(y8, {_PYR_ZMAX} - z)").alias("y"),
        )
        .distinct()
        .where(~F.expr(_PYR_DAMAGE))
    )
    parents = present.select(
        (F.col("z") + 1).alias("z"),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
    )
    joined = present.join(
        parents,
        on=[
            present.z == parents.z,
            F.shiftright(present.x, 1) == parents.px,
            F.shiftright(present.y, 1) == parents.py,
        ],
        how="left",
    )
    return (
        joined.groupBy(present.z.alias("z"))
        .agg(
            F.count("*").alias("n_tiles"),
            F.sum(
                F.when((present.z >= 1) & F.col("px").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_orphans"),
        )
    )


O_PYRAMID_GAPS = f"""
WITH pts AS (
  SELECT {LON_SQL.format(id="doc_id")} AS lon, {LAT_SQL.format(id="doc_id")} AS lat
  FROM documents
), t8 AS (
  SELECT DISTINCT {_tile_sql("x", str(_PYR_ZMAX))} AS x8, {_tile_sql("y", str(_PYR_ZMAX))} AS y8
  FROM pts
), zs AS (SELECT z FROM generate_series(0, {_PYR_ZMAX}) t(z)),
present AS (
  SELECT DISTINCT CAST(z AS INTEGER) AS z,
         x8 >> ({_PYR_ZMAX} - z) AS x, y8 >> ({_PYR_ZMAX} - z) AS y
  FROM t8 CROSS JOIN zs
), damaged AS (
  SELECT * FROM present WHERE NOT {_PYR_DAMAGE}
)
SELECT c.z, count(*) AS n_tiles,
       CAST(sum(CASE WHEN c.z >= 1 AND p.x IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM damaged c LEFT JOIN damaged p
  ON p.z = c.z - 1 AND p.x = c.x >> 1 AND p.y = c.y >> 1
GROUP BY c.z
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "filter_funnel_neardup": q_filter_funnel_neardup,
    "polygon_tiles": q_polygon_tiles,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "bpe_pair_counts": q_bpe_pair_counts,
    "c4_filter": q_c4_filter,
    "crawl_schedule": q_crawl_schedule,
    "dedup_clusters": q_dedup_clusters,
    "domain_stats": q_domain_stats,
    "dup_ngram_stats": q_dup_ngram_stats,
    "filter_funnel": q_filter_funnel,
    "gopher_filter": q_gopher_filter,
    "kmeans_clusters": q_kmeans_clusters,
    "knn_graph": q_knn_graph,
    "lm_perplexity": q_lm_perplexity,
    "normalized_dedup": q_normalized_dedup,
    "pyramid_gaps": q_pyramid_gaps,
    "quality_deciles": q_quality_deciles,
    "robots_filter": q_robots_filter,
    "semdedup_pairs": q_semdedup_pairs,
    "sessionize": q_sessionize,
    "tile_anomaly": q_tile_anomaly,
    "tile_diff": q_tile_diff,
    "winnow_fingerprints": q_winnow_fingerprints,
    "tile_assign_counts": q_tile_assign_counts,
    "events_tile_counts": q_events_tile_counts,
    "zoom_stats": q_zoom_stats,
    "drop_rate_thin": q_drop_rate_thin,
    "min_distance_cells": q_min_distance_cells,
    "allowlist_semijoin": q_allowlist_semijoin,
    "update_properties_join": q_update_properties_join,
    "probe_topk": q_probe_topk,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "dedup_exact": q_dedup_exact,
    "ann_topk": q_ann_topk,
    "tile_render_summary": q_tile_render_summary,
    "container_roundtrip": q_container_roundtrip,
    "pip_join_docs": q_pip_join_docs,
    "knn": q_knn,
    "pip_join_cells": q_pip_join_cells,
    "stacked_coalesce": q_stacked_coalesce,
    "merged_vector_counts": q_merged_vector_counts,
    "filter_features_en": q_filter_features_en,
    "minhash_neardup": q_minhash_neardup,
    "simhash_neardup": q_simhash_neardup,
    "embedding_neardup": q_embedding_neardup,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ngram_jaccard": q_ngram_jaccard,
    "doc_fingerprint": q_doc_fingerprint,
    "token_count_bpe": q_token_count_bpe,
    "doc_fingerprint_rolling": q_doc_fingerprint_rolling,
    "windowed_events": q_windowed_events,
    "coord_set_ops": q_coord_set_ops,
    "sort_index_key": q_sort_index_key,
    "salted_tile_stats": q_salted_tile_stats,
    "shortbread_layers": q_shortbread_layers,
    "decontaminate": q_decontaminate,
    "quality_sample": q_quality_sample,
    "s2_face_ij": q_s2_face_ij,
    "hex_cell_stats": q_hex_cell_stats,
    "html_extract": q_html_extract,
    "url_canonical": q_url_canonical,
    "pii_scrub": q_pii_scrub,
    "paragraph_dedup": q_paragraph_dedup,
    "link_pagerank": q_link_pagerank,
    "repetition_stats": q_repetition_stats,
    "warc_roundtrip": q_warc_roundtrip,
    "stratified_sample": q_stratified_sample,
    "vocab_topk": q_vocab_topk,
    "bm25_topk": q_bm25_topk,
    "word_pmi": q_word_pmi,
    "bpe_merges": q_bpe_merges,
}

ORACLES: dict[str, str] = {
    "tile_assign_counts": O_TILE_ASSIGN_COUNTS,
    "events_tile_counts": O_EVENTS_TILE_COUNTS,
    "zoom_stats": O_ZOOM_STATS,
    "drop_rate_thin": O_DROP_RATE_THIN,
    "min_distance_cells": O_MIN_DISTANCE_CELLS,
    "allowlist_semijoin": O_ALLOWLIST_SEMIJOIN,
    "update_properties_join": O_UPDATE_PROPERTIES_JOIN,
    "probe_topk": O_PROBE_TOPK,
    "token_count": O_TOKEN_COUNT,
    "quality_score": O_QUALITY_SCORE,
    "lang_id": O_LANG_ID,
    "dedup_exact": O_DEDUP_EXACT,
    "ann_topk": O_ANN_TOPK,
    "tile_render_summary": O_TILE_RENDER_SUMMARY,
    "container_roundtrip": O_CONTAINER_ROUNDTRIP,
    "pip_join_docs": O_PIP_JOIN_DOCS,
    "knn": O_KNN,
    "pip_join_cells": O_PIP_JOIN_DOCS,
    "stacked_coalesce": O_STACKED_COALESCE,
    "merged_vector_counts": O_MERGED_VECTOR_COUNTS,
    "filter_features_en": O_FILTER_FEATURES_EN,
    "minhash_neardup": O_MINHASH_NEARDUP,
    "simhash_neardup": O_SIMHASH_NEARDUP,
    "embedding_neardup": O_EMBEDDING_NEARDUP,
    "ann_lsh_topk": O_ANN_LSH_TOPK,
    "ann_ivf_topk": O_ANN_LSH_TOPK,
    "ngram_jaccard": O_NGRAM_JACCARD,
    "doc_fingerprint": O_DOC_FINGERPRINT,
    "token_count_bpe": O_TOKEN_COUNT_BPE,
    "doc_fingerprint_rolling": O_DOC_FINGERPRINT_ROLLING,
    "windowed_events": O_WINDOWED_EVENTS,
    "coord_set_ops": O_COORD_SET_OPS,
    "sort_index_key": O_SORT_INDEX_KEY,
    "salted_tile_stats": O_SALTED_TILE_STATS,
    "shortbread_layers": O_SHORTBREAD_LAYERS,
    "decontaminate": O_DECONTAMINATE,
    "quality_sample": O_QUALITY_SAMPLE,
    "s2_face_ij": O_S2_FACE_IJ,
    "hex_cell_stats": O_HEX_CELL_STATS,
    "html_extract": O_HTML_EXTRACT,
    "url_canonical": O_URL_CANONICAL,
    "pii_scrub": O_PII_SCRUB,
    "paragraph_dedup": O_PARAGRAPH_DEDUP,
    "link_pagerank": O_LINK_PAGERANK,
    "repetition_stats": O_REPETITION_STATS,
    "warc_roundtrip": O_WARC_ROUNDTRIP,
    "stratified_sample": O_STRATIFIED_SAMPLE,
    "vocab_topk": O_VOCAB_TOPK,
    "bm25_topk": O_BM25_TOPK,
    "sessionize": O_SESSIONIZE,
    "robots_filter": O_ROBOTS_FILTER,
    "lm_perplexity": O_LM_PERPLEXITY,
    "ann_ivfpq_topk": O_ANN_LSH_TOPK,
    "filter_funnel_neardup": O_FILTER_FUNNEL_NEARDUP,
    "polygon_tiles": O_POLYGON_TILES,
    "tile_diff": O_TILE_DIFF,
    "dedup_clusters": O_DEDUP_CLUSTERS,
    "tile_anomaly": O_TILE_ANOMALY,
    "word_pmi": O_WORD_PMI,
    "quality_deciles": O_QUALITY_DECILES,
    "knn_graph": O_KNN_GRAPH,
    "bpe_pair_counts": O_BPE_PAIR_COUNTS,
    "c4_filter": O_C4_FILTER,
    "gopher_filter": O_GOPHER_FILTER,
    "normalized_dedup": O_NORMALIZED_DEDUP,
    "dup_ngram_stats": O_DUP_NGRAM_STATS,
    "winnow_fingerprints": O_WINNOW_FINGERPRINTS,
    "pyramid_gaps": O_PYRAMID_GAPS,
    "filter_funnel": O_FILTER_FUNNEL,
    "kmeans_clusters": O_KMEANS_CLUSTERS,
    "semdedup_pairs": O_SEMDEDUP_PAIRS,
    "domain_stats": O_DOMAIN_STATS,
    "crawl_schedule": O_CRAWL_SCHEDULE,
    # bpe_merges: intentionally no oracle — sequential argmax/rewrite is
    # not SQL-expressible; validated merge-for-merge vs an independent
    # reference in tests/test_bpe.py (driver records rows-only).
}
