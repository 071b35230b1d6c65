"""curate_job CLI: the runnable curation funnel (filters -> dedup ->
sample) over documents parquet and WARC input, metrics observed during
the single write pass."""

import json
import os
import subprocess
import sys


def _run(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out = subprocess.run(
        [sys.executable, "/root/repo/jobs/curate_job.py", *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_curate_documents_parquet(tmp_path, spark):
    out_dir = str(tmp_path / "curated")
    m = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--master", "local[4]",
    ])
    # funnel monotone; written == deduped survivors (no sample stage)
    assert m["n_all"] >= m["n_c4"] >= m["n_c4_gopher"] >= m["n_deduped"]
    assert m["n_written"] == m["n_deduped"] > 0
    got = spark.read.parquet(out_dir)
    assert got.count() == m["n_written"]
    assert {"doc_id", "text", "lang"} <= set(got.columns)
    # metrics sidecar written
    side = json.load(open(f"{out_dir}/_funnel_metrics.json"))
    assert side["n_written"] == m["n_written"]
    # funnel counts agree with the oracle-checked filter_funnel query
    from versatiles_rs_spark.pages.quality_filters import filter_funnel

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {r["stage"]: r["n_docs"] for r in filter_funnel(docs).collect()}
    assert m["n_c4"] == want["c4"]
    assert m["n_c4_gopher"] == want["c4_gopher"]
    assert m["n_deduped"] == want["c4_gopher_dedup"]


def test_curate_sample_and_skips(tmp_path, spark):
    out_dir = str(tmp_path / "curated_s")
    m = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--sample", "0.5",
        "--skip-c4", "--skip-gopher", "--master", "local[4]",
    ])
    # with filters skipped, dedup alone decides survivors
    assert m["n_all"] == m["n_c4"] == m["n_c4_gopher"]
    assert 0 < m["n_written"] < m["n_deduped"]  # the sample actually thins
    # deterministic: re-run writes the identical row set
    out_dir2 = str(tmp_path / "curated_s2")
    m2 = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir2, "--sample", "0.5",
        "--skip-c4", "--skip-gopher", "--master", "local[4]",
    ])
    a = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    b = {r["doc_id"] for r in spark.read.parquet(out_dir2).collect()}
    assert a == b and m2["n_written"] == m["n_written"]


def test_curate_resumable_lineage(tmp_path, spark):
    from versatiles_rs_spark.lineage import read_tiles

    out_dir = str(tmp_path / "curated_r")
    m = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--resumable", "4", "--master", "local[4]",
    ])
    assert m["batches_run"] == 4
    assert m["n_written"] == m["n_deduped"] > 0
    # committed-files read equals the manifest's row accounting
    got = read_tiles(spark, out_dir)
    assert got.count() == m["n_written"]
    # re-submission commits nothing and changes nothing
    m2 = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--resumable", "4", "--master", "local[4]",
    ])
    assert m2["batches_run"] == 0
    assert m2["n_written"] == m["n_written"]


def test_curate_resumable_with_sample(tmp_path, spark):
    """--resumable and --sample compose: the manifest accounts for the
    SAMPLED survivors; the funnel metrics still report pre-sample dedup."""
    out_dir = str(tmp_path / "curated_rs")
    m = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--resumable", "2", "--sample", "0.5",
        "--master", "local[4]",
    ])
    assert m["batches_run"] == 2
    assert 0 < m["n_written"] < m["n_deduped"]
    from versatiles_rs_spark.lineage import read_tiles

    assert read_tiles(spark, out_dir).count() == m["n_written"]
    # resume is still a no-op with the sample in place
    m2 = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--resumable", "2", "--sample", "0.5",
        "--master", "local[4]",
    ])
    assert m2["batches_run"] == 0 and m2["n_written"] == m["n_written"]


def test_keyed_resumable_partial_and_guard(tmp_path, spark):
    from versatiles_rs_spark.lineage import (
        KeyBatch,
        keyed_resumable,
        read_tiles,
        write_key_batch,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    table = str(tmp_path / "tbl")
    import os

    os.makedirs(table)
    # simulate a job killed after 2 of 4 bucket commits
    for b in range(2):
        write_key_batch(table, KeyBatch(b, 4), docs)
    records = keyed_resumable(docs, table, n_buckets=4)
    assert len(records) == 2  # only the missing buckets ran
    assert read_tiles(spark, table).count() == docs.count()
    # a second resume is a no-op
    assert keyed_resumable(docs, table, n_buckets=4) == []
    # resuming with a different bucket count is refused
    import pytest

    with pytest.raises(ValueError, match="different n_buckets"):
        keyed_resumable(docs, table, n_buckets=8)


def test_curate_warc_input(tmp_path, spark):
    from versatiles_rs_spark.pages.generator import synth_pages
    from versatiles_rs_spark.sources.warc import write_warc

    warc_dir = str(tmp_path / "crawl")
    write_warc(synth_pages(spark, "/root/testdata/sf0.001").repartition(2), warc_dir)
    out_dir = str(tmp_path / "curated_w")
    m = _run([
        "--input", warc_dir, "--output", out_dir, "--master", "local[4]",
    ])
    assert m["n_all"] == 500
    assert m["n_written"] == m["n_deduped"] > 0
    got = spark.read.parquet(out_dir)
    assert "url" in got.columns


def test_curate_neardup_stage(tmp_path, spark):
    """--neardup minhash inserts the LSH near-dup stage; counts agree
    with the oracle-checked filter_funnel_neardup query's stage rows."""
    out_dir = str(tmp_path / "curated_nd")
    m = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--neardup", "minhash", "--master", "local[4]",
    ])
    assert m["n_all"] >= m["n_c4"] >= m["n_c4_gopher"] >= m["n_deduped"] \
        >= m["n_neardup"]
    assert m["n_written"] == m["n_neardup"] > 0
    got = spark.read.parquet(out_dir)
    assert got.count() == m["n_written"]

    from versatiles_rs_spark.pages.quality_filters import filter_funnel

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {r["stage"]: r["n_docs"]
            for r in filter_funnel(docs, neardup_threshold=0.5).collect()}
    assert m["n_deduped"] == want["c4_gopher_dedup"]
    assert m["n_neardup"] == want["c4_gopher_neardup"]
    # the stage dropped somebody on this corpus, or it proved a no-op —
    # either way the survivor set matches the query's keeper rule
    drop_expected = want["c4_gopher_dedup"] - want["c4_gopher_neardup"]
    assert m["n_deduped"] - m["n_neardup"] == drop_expected


def test_curate_neardup_resumable(tmp_path, spark):
    """Near-dup stage composes with the lineage protocol: batches commit
    the post-neardup survivor set; re-submission is a no-op."""
    from versatiles_rs_spark.lineage import read_tiles

    out_dir = str(tmp_path / "curated_ndr")
    args = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--neardup", "minhash",
        "--resumable", "3", "--master", "local[4]",
    ]
    m = _run(args)
    assert m["batches_run"] == 3
    assert m["n_written"] == m["n_neardup"] > 0
    assert read_tiles(spark, out_dir).count() == m["n_written"]
    m2 = _run(args)
    assert m2["batches_run"] == 0
    assert m2["n_written"] == m["n_written"]


def test_curate_classifier_stage(tmp_path, spark):
    """--classifier nb trains the hashed NB on the C4-labeled seed and
    drops survivors the model predicts as failures; the survivor set
    matches the in-process model applied to the same stage input."""
    out_dir = str(tmp_path / "curated_clf")
    m = _run([
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--classifier", "nb", "--master", "local[4]",
    ])
    assert m["n_deduped"] >= m["n_classifier"] > 0
    assert m["n_written"] == m["n_classifier"]
    got = spark.read.parquet(out_dir)
    assert got.count() == m["n_written"]

    # in-process expectation: same seed labels, same model, same gate
    from pyspark.sql import functions as F

    from versatiles_rs_spark.operators.curate import (
        curation_flags,
        curation_survivors,
    )
    from versatiles_rs_spark.pages.classifier import nb_keep_expr, train_nb
    from versatiles_rs_spark.pages.quality_filters import decorated_lines

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    d, _ = curation_flags(docs)
    page = f"array_join({decorated_lines('doc_id', 'text')}, ' ')"
    seed = d.where("doc_id % 4 = 0").select(
        F.col("_c4").alias("label"), F.expr(page).alias("text"))
    model = train_nb(seed)
    want = (
        curation_survivors(d)
        .where(F.expr(nb_keep_expr(model, f"({page})")))
        .count()
    )
    assert m["n_classifier"] == want


def test_curate_classifier_with_neardup_resumable(tmp_path, spark):
    """The learned gate composes with near-dup and the lineage protocol."""
    from versatiles_rs_spark.lineage import read_tiles

    out_dir = str(tmp_path / "curated_clfr")
    args = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--output", out_dir, "--classifier", "nb", "--neardup", "minhash",
        "--resumable", "3", "--master", "local[4]",
    ]
    m = _run(args)
    assert m["batches_run"] == 3
    assert m["n_neardup"] >= m["n_classifier"] == m["n_written"] > 0
    assert read_tiles(spark, out_dir).count() == m["n_written"]
    m2 = _run(args)
    assert m2["batches_run"] == 0
    assert m2["n_written"] == m["n_written"]
