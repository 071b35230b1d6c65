"""convert_job CLI parity surface: container->container conversion with
bbox/border/flip/swap/tile-format (reference versatiles/src/tools/convert.rs)."""

import json
import subprocess
import sys


def _run(args):
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    # the workers must resolve the same interpreter as the driver
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    out = subprocess.run(
        [sys.executable, "/root/repo/jobs/convert_job.py", *args],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_container_to_container_with_bbox(tmp_path, spark):
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.queries import _docs_geo
    from versatiles_rs_spark.sources import read_container, write_container

    tiles = convert_pages_to_tiles(_docs_geo(spark, "/root/testdata/sf0.001"), 0, 4, keep_ratio=1.0)
    src = str(tmp_path / "src.mbtiles")
    write_container(tiles, src)
    n_all = tiles.count()

    out_tbl = str(tmp_path / "out_tbl")
    out_pm = str(tmp_path / "out.pmtiles")
    summary = _run([
        "--input", src, "--output", out_tbl, "--min-zoom", "0", "--max-zoom", "3",
        "--bbox=-90,-45,90,45", "--bbox-border", "1",
        "--master", "local[4]", "--export", out_pm,
    ])
    assert 0 < summary["rows"] < n_all
    got = read_container(spark, out_pm)
    assert got.count() == summary["rows"]
    assert got.agg({"z": "max"}).collect()[0][0] <= 3
    # resume: second run commits nothing
    summary2 = _run([
        "--input", src, "--output", out_tbl, "--min-zoom", "0", "--max-zoom", "3",
        "--bbox=-90,-45,90,45", "--bbox-border", "1", "--master", "local[4]",
    ])
    assert summary2["batches_run"] == 0


def test_flip_y_cli_roundtrip(tmp_path, spark):
    from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
    from versatiles_rs_spark.queries import _docs_geo
    from versatiles_rs_spark.sources import write_container

    tiles = convert_pages_to_tiles(_docs_geo(spark, "/root/testdata/sf0.001"), 2, 2, keep_ratio=1.0)
    src = str(tmp_path / "s.mbtiles")
    write_container(tiles, src)
    out = str(tmp_path / "flip_tbl")
    _run(["--input", src, "--output", out, "--min-zoom", "2", "--max-zoom", "2",
          "--flip-y", "--master", "local[4]"])
    from versatiles_rs_spark.lineage import read_tiles

    got = {(r["z"], r["x"], r["y"]) for r in read_tiles(spark, out).select("z", "x", "y").collect()}
    want = {(r["z"], r["x"], (1 << r["z"]) - 1 - r["y"])
            for r in tiles.select("z", "x", "y").collect()}
    assert got == want
