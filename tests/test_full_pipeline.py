"""End-to-end crawl pipeline: every stage a Common-Crawl-to-training-data
(and -to-tiles) user runs, chained on real archives with exact row
accounting at each step.

WARC archives -> pages -> robots compliance -> text extraction (byte
invariant) -> PII scrub -> repetition/quality signals -> paragraph dedup
-> exact dedup -> stratified sample -> geocode -> tile pyramid with
resumable lineage. One test, the whole product."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_warc_to_tiles_full_chain(spark, tmp_path):
    from versatiles_rs_spark.dedup.paragraphs import paragraph_dedup
    from versatiles_rs_spark.lineage import convert_resumable, read_tiles
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.pages.extract import with_extracted_text
    from versatiles_rs_spark.pages.generator import synth_pages
    from versatiles_rs_spark.pages.pii import scrub_pii
    from versatiles_rs_spark.pages.repetition import dup_fraction
    from versatiles_rs_spark.pages.robots import apply_robots, parse_robots
    from versatiles_rs_spark.pages.sampling import stratified_sample
    from versatiles_rs_spark.sources.warc import read_warc, write_warc

    # 0. corpus -> WARC archives (the CC wire format)
    golden = synth_pages(spark, SF)
    n_total = golden.count()
    warc_dir = str(tmp_path / "crawl")
    stats = write_warc(golden.repartition(3), warc_dir)
    assert stats["records"] == n_total

    # 1. ingest archives; doc identity via xxhash64(url)
    pages = read_warc(spark, warc_dir)
    assert pages.count() == n_total

    # 2. robots compliance: block half the sources' /doc/ paths
    robots = spark.createDataFrame(
        pd.DataFrame(
            [(f"src{k}.example.com", b"User-agent: *\nDisallow: /doc/\n")
             for k in range(0, 20, 2)],
            columns=["host", "robots"],
        )
    )
    allowed = apply_robots(pages, parse_robots(robots)).where("allowed")
    n_allowed = allowed.count()
    # urls are https://src<k>.example.com/doc/<id>: even sources blocked
    want_allowed = golden.where(
        (F.regexp_extract("url", r"src(\d+)\.", 1).cast("int") % 2) == 1
    ).count()
    assert n_allowed == want_allowed

    # 3. extraction: byte-identical text per url (the per-row invariant)
    extracted = with_extracted_text(allowed)
    j = extracted.join(golden.select("url", F.col("text").alias("g")), "url")
    assert j.where(F.col("extracted_text") != F.col("g")).count() == 0

    # 4. hygiene: PII scrub is a no-op on the clean corpus; repetition
    # signals all near zero (no duplicated lines in synthetic docs)
    hygiene = extracted.select(
        "url",
        F.xxhash64("url").alias("doc_id"),
        scrub_pii(F.col("extracted_text")).alias("text"),
        F.col("extracted_text").alias("_pre"),
        "lon", "lat",
    )
    assert hygiene.where(F.col("text") != F.col("_pre")).count() == 0
    hygiene = hygiene.drop("_pre")
    assert (
        extracted.select(dup_fraction(F.col("extracted_text"), "\n").alias("f"))
        .agg(F.max("f")).collect()[0][0] == 0.0
    )

    # 5. paragraph dedup (docs are single-paragraph and unique -> identity)
    pd_out = paragraph_dedup(hygiene, max_occurrences=1)
    assert pd_out.count() == n_allowed
    assert pd_out.agg(F.sum("n_dropped")).collect()[0][0] == 0

    # 6. exact dedup (no clones in the corpus -> identity)
    deduped = hygiene.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    assert deduped.count() == n_allowed

    # 7. deterministic stratified downsample on the source host
    sampled = stratified_sample(
        hygiene.withColumn("stratum", F.lit("all")),
        {"all": 0.8},
        stratum_col="stratum",
        key_col="doc_id",
    )
    n_sampled = sampled.count()
    assert 0 < n_sampled < n_allowed
    # reproducible: second run keeps the same rows
    again = stratified_sample(
        hygiene.withColumn("stratum", F.lit("all")),
        {"all": 0.8},
        stratum_col="stratum",
        key_col="doc_id",
    )
    assert again.count() == n_sampled

    # 8. geocode survivors -> z0-4 pyramid with resumable lineage commits
    geo = sampled.select("doc_id", "lon", "lat", F.lit("en").alias("lang"))
    tiles = convert_pages_to_tiles(geo, 0, 4, keep_ratio=1.0)
    table = str(tmp_path / "tiles")
    recs = convert_resumable(tiles, table, 0, 4)
    assert sum(r["row_count"] for r in recs) == tiles.count()
    assert read_tiles(spark, table).count() == tiles.count()
    # resume contract holds at the end of the chain too
    assert convert_resumable(tiles, table, 0, 4) == []
