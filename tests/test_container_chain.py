"""Cross-format conversion chain: one tile set through EVERY container
format in sequence, byte-identical at the end — the workflow of a user
migrating between formats with this engine as the converter."""

from pyspark.sql import functions as F

from versatiles_rs_spark.operators.convert import convert_pages_to_tiles
from versatiles_rs_spark.queries import _docs_geo
from versatiles_rs_spark.sources import read_container, write_container


def test_chain_through_all_formats(spark, tmp_path):
    tiles = convert_pages_to_tiles(
        _docs_geo(spark, "/root/testdata/sf0.001"), 0, 3, keep_ratio=1.0
    )
    want = {
        (r["z"], r["x"], r["y"]): bytes(r["tile"])
        for r in tiles.collect()
    }

    chain = [
        str(tmp_path / "a.mbtiles"),
        str(tmp_path / "b.pmtiles"),
        str(tmp_path / "c.versatiles"),
        str(tmp_path / "d.tar.gz"),
        str(tmp_path / "e.tar"),
    ]
    cur = tiles
    for path in chain:
        out = write_container(cur, path)
        assert out["tiles"] == len(want), path
        cur = read_container(spark, path)

    got = {
        (r["z"], r["x"], r["y"]): bytes(r["tile"])
        for r in cur.collect()
    }
    assert set(got) == set(want)
    # vector tiles are gzip-normalized on the first container write; after
    # that every hop must preserve bytes exactly — compare decompressed
    # content to the original render and bytes across the last two hops
    from versatiles_rs_spark.functions.compression import decompress

    first = {
        (r["z"], r["x"], r["y"]): bytes(r["tile"])
        for r in read_container(spark, chain[0]).collect()
    }
    for k, blob in got.items():
        assert blob == first[k], k  # byte-stable across all later hops
        original = decompress(want[k], "gzip") if want[k][:2] == b"\x1f\x8b" else want[k]
        assert decompress(blob, "gzip") == original, k
