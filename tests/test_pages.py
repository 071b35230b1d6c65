"""Pages synthesis + extraction: the byte-identical-text-per-url invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from versatiles_rs_spark.pages import synth_pages, with_extracted_text


def test_pages_schema(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    got = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert got["url"] == "string"
    assert got["warc_ts"] == "timestamp"
    assert got["html"] == "binary"
    assert got["text"] == "string"
    assert got["lang"] == "string"
    assert pages.count() == spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert pages.select("url").distinct().count() == pages.count()


def test_extracted_text_byte_identical(spark, sf_dir):
    """Per-row invariant (BASELINE.json): extracted text == golden text, byte-for-byte."""
    pages = synth_pages(spark, sf_dir)
    ext = with_extracted_text(pages)
    mismatches = ext.filter(
        F.encode(F.col("extracted_text"), "UTF-8") != F.encode(F.col("text"), "UTF-8")
    ).count()
    assert mismatches == 0


def test_extracted_geo_matches_column_derivation(spark, sf_dir):
    """lon/lat recovered from the html bytes == the pure-SQL derivation."""
    from versatiles_rs_spark.pages.generator import lat_expr, lon_expr

    ext = with_extracted_text(synth_pages(spark, sf_dir))
    bad = ext.filter(
        (F.col("lon") != lon_expr(F.col("doc_id"))) | (F.col("lat") != lat_expr(F.col("doc_id")))
    ).count()
    assert bad == 0
    rng = ext.agg(
        F.min("lon").alias("lo"), F.max("lon").alias("hi"),
        F.min("lat").alias("la"), F.max("lat").alias("ha"),
    ).collect()[0]
    assert -180 <= rng["lo"] <= rng["hi"] < 180
    assert -85 <= rng["la"] <= rng["ha"] < 85


def test_extraction_is_deterministic(spark, sf_dir):
    e1 = with_extracted_text(synth_pages(spark, sf_dir)).select("url", "extracted_text")
    e2 = with_extracted_text(synth_pages(spark, sf_dir)).select("url", "extracted_text")
    assert e1.exceptAll(e2).count() == 0
    assert e2.exceptAll(e1).count() == 0
