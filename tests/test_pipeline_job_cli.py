"""pipeline_job CLI: crawl -> curate -> tiles -> stats in one submission,
both heavy stages resumable through the lineage protocol."""

import json
import os
import subprocess
import sys


def _run(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out = subprocess.run(
        [sys.executable, "/root/repo/jobs/pipeline_job.py", *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_pipeline_warc_input_with_sample(tmp_path, spark):
    """The real crawl shape: WARC archives in, sampled curation, tiles out.
    Geo must survive the curated table (extracted from the html meta)."""
    from versatiles_rs_spark.lineage import read_tiles
    from versatiles_rs_spark.pages.generator import synth_pages
    from versatiles_rs_spark.sources.warc import write_warc

    warc_dir = str(tmp_path / "crawl")
    write_warc(synth_pages(spark, "/root/testdata/sf0.001").repartition(2), warc_dir)
    wd = str(tmp_path / "run_w")
    m = _run([
        "--input", warc_dir, "--workdir", wd, "--min-zoom", "0", "--max-zoom", "3",
        "--sample", "0.6", "--curate-buckets", "2", "--normalizer", "pandas",
        "--master", "local[4]",
    ])
    f = m["funnel"]
    assert f["n_all"] == 500
    # the sample thins below the dedup survivors
    assert 0 < m["n_curated"] < f["n_deduped"]
    assert m["n_tiles"] > 0
    curated = read_tiles(spark, f"{wd}/curated")
    assert {"doc_id", "text", "lang", "url", "lon", "lat"} <= set(curated.columns)
    assert curated.count() == m["n_curated"]


def test_pipeline_end_to_end_and_resume(tmp_path, spark):
    wd = str(tmp_path / "run")
    args = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--workdir", wd, "--min-zoom", "0", "--max-zoom", "4",
        "--curate-buckets", "4", "--master", "local[4]",
    ]
    m = _run(args)
    # funnel sane and consistent with the committed corpus
    f = m["funnel"]
    assert f["n_all"] >= f["n_c4"] >= f["n_c4_gopher"] >= f["n_deduped"] > 0
    assert m["n_curated"] == f["n_deduped"]
    assert m["curate_batches_run"] == 4
    assert m["tile_batches_run"] == 5  # one batch per zoom 0..4
    assert m["n_tiles"] > 0
    zs = {s["z"]: s for s in m["zoom_stats"]}
    assert set(zs) == set(range(5))
    assert sum(s["tile_count"] for s in zs.values()) == m["n_tiles"]

    # the pipeline's tiles == the equivalent in-process chain
    from versatiles_rs_spark.lineage import read_tiles
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.operators.curate import (
        curation_flags,
        curation_survivors,
        load_corpus,
    )

    corpus = load_corpus(spark, "/root/testdata/sf0.001/documents.parquet", keep_geo=True)
    flagged, _ = curation_flags(corpus)
    want_tiles = convert_pages_to_tiles(curation_survivors(flagged), 0, 4)
    got = read_tiles(spark, f"{wd}/tiles")
    assert got.count() == want_tiles.count() == m["n_tiles"]

    # re-submission: both stages fully committed -> nothing runs
    m2 = _run(args)
    assert m2["curate_batches_run"] == 0
    assert m2["tile_batches_run"] == 0
    assert m2["n_tiles"] == m["n_tiles"]
    assert m2["n_curated"] == m["n_curated"]


def test_pipeline_neardup_and_classifier_stages(tmp_path, spark):
    """The full chain with the near-dup and learned-gate stages wired in
    (shared operators/curate.py helpers — same semantics as curate_job);
    both heavy stages stay resumable."""
    wd = str(tmp_path / "run_nc")
    args = [
        "--input", "/root/testdata/sf0.001/documents.parquet",
        "--workdir", wd, "--min-zoom", "0", "--max-zoom", "3",
        "--curate-buckets", "3", "--neardup", "minhash",
        "--classifier", "nb", "--master", "local[4]",
    ]
    m = _run(args)
    f = m["funnel"]
    assert f["n_deduped"] >= f["n_neardup"] >= f["n_classifier"] > 0
    assert m["n_curated"] == f["n_classifier"]
    assert m["curate_batches_run"] == 3
    m2 = _run(args)
    assert m2["curate_batches_run"] == 0 and m2["tile_batches_run"] == 0
    assert m2["n_curated"] == m["n_curated"]
