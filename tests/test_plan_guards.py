"""Physical-plan regression guards for the headline pipelines.

These pin the PLAN SHAPE the engine is designed around (README "Scale
design", PLANS.md): shuffle counts, scan pruning, and which stages may
run Python. A future edit that silently adds an exchange or drags a
Python stage into a codegen path fails here, not in a benchmark three
rounds later.
"""

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_convert_pyramid_single_shuffle(spark, sf_dir):
    """pages -> pyramid: exactly ONE exchange (the hash partition on tile
    coords into the renderer); geocode/explode/thin all pre-shuffle."""
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.queries import _docs_geo

    tiles = convert_pages_to_tiles(_docs_geo(spark, sf_dir), 0, 10, keep_ratio=0.7)
    plan = _plan(tiles)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "RoundRobin" not in plan


def test_tile_assign_zero_shuffle_zero_python(spark, sf_dir):
    from versatiles_rs_spark.operators.convert import assign_tiles
    from versatiles_rs_spark.queries import _docs_geo

    assigned = assign_tiles(_docs_geo(spark, sf_dir), 0, 10)
    plan = _plan(assigned)
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_docs_scan_prunes_columns(spark, sf_dir):
    """The geocode path must not read text/lang bytes it doesn't use."""
    from versatiles_rs_spark.operators.convert import assign_tiles
    from versatiles_rs_spark.queries import _docs_geo

    assigned = assign_tiles(
        _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat"), 0, 5
    )
    scan = next(ln for ln in _plan(assigned).splitlines() if "Scan parquet" in ln or "FileScan" in ln)
    full = _plan(assigned)
    m = re.search(r"ReadSchema: struct<([^>]*)>", full)
    assert m, full
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert "text" not in cols


def test_html_extract_is_scan_bound(spark, sf_dir):
    """The whole extraction chain lives in the scan stage: no exchange, no
    Python, one codegen span."""
    from versatiles_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["html_extract"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_pip_join_broadcast_only(spark, sf_dir):
    """The broadcast PIP probe adds no hash exchange on the probe side."""
    from versatiles_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["pip_join_docs"](spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan.split("ArrowEvalPython")[0].split("MapInArrow")[0]


def test_paragraph_dedup_two_shuffles(spark, sf_dir):
    """Design contract: one exchange on the paragraph hash, one on doc_id
    (plus a possible broadcast for the small counts side — broadcasts are
    not counted)."""
    from versatiles_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["paragraph_dedup"](spark, sf_dir))
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3


def test_bpe_pair_counts_one_shuffle_with_partial_agg(spark, sf_dir):
    """The trainer's looped aggregation: map-side combine (partial then
    final HashAggregate) around exactly the word-count + pair-count
    exchanges — no extra shuffle, no Python beyond nothing (pure Column)."""
    from versatiles_rs_spark.queries import QUERIES

    plan = _plan(QUERIES["bpe_pair_counts"](spark, sf_dir))
    assert "Python" not in plan
    # two aggregations (word counts, pair counts) -> at most 3 hash
    # exchanges incl. the TakeOrdered/limit machinery
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 3
    assert "partial_count" in plan or "HashAggregate" in plan


def test_filter_tiles_bbox_adds_no_exchange(spark):
    """The bbox filter is row-local Column math: applied to a plain scan
    it must introduce zero exchanges."""
    from versatiles_rs_spark.operators.convert import filter_tiles_bbox

    df = spark.range(1000).selectExpr(
        "CAST(id % 5 AS INT) z", "id % 32 AS x", "(id * 7) % 32 AS y"
    )
    plan = _plan(filter_tiles_bbox(df, (-90.0, -45.0, 90.0, 45.0), border=1))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_windowed_gdal_single_range_exchange(spark, tmp_path):
    """Windowed raster ingest: exactly ONE exchange (the locality range
    partition) before the render stage; the driver plan carries only the
    KB-sized candidate table."""
    import numpy as np

    import versatiles_rs_spark.sources.geotiff as gt

    img = np.zeros((64, 128), np.uint8)
    p = str(tmp_path / "pg.tif")
    gt.write_geotiff_gray8(p, img, -180.0, 90.0, 360 / 128, 180 / 64)
    plan = _plan(gt.from_gdal_raster(spark, p, 0, 2, mode="windowed"))
    assert len(re.findall(r"Exchange", plan)) == 1
    assert "rangepartitioning" in plan


def test_bloom_probe_zero_shuffle_zero_python(spark, sf_dir):
    """Crawl-frontier bloom probe: the bit table compiles to a literal
    bitmap, so probing is ONE codegen Project — no exchange, no Python,
    nothing corpus-sized near the driver."""
    from versatiles_rs_spark.pages.bloom import URL_SPARK, bloom_bits, bloom_probe

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "url", F.expr(URL_SPARK)
    )
    bits = bloom_bits(docs.where("doc_id % 3 = 0"), "url", m=1024)
    probed = bloom_probe(docs.where("doc_id % 3 != 0"), bits, "url", m=1024,
                         keep=["doc_id", "url"])
    plan = _plan(probed)
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan
