"""End-to-end convert pipeline: pages -> tile pyramid; golden invariants.

Mirrors the reference's convert_integrity strategy
(versatiles/tests/convert_integrity.rs): per-(z,x,y) byte equality across
pipeline variants, counts-agree invariant, MVT validity of every produced
tile.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import decompress
from versatiles_rs_spark.functions.mvt import decode_tile
from versatiles_rs_spark.operators.convert import (
    assign_tiles,
    convert_pages_to_tiles,
    with_hilbert_key,
)
from versatiles_rs_spark.operators.probe import (
    layer_breakdown,
    top_k_tiles,
    validate_tiles,
    zoom_stats,
)
from versatiles_rs_spark.pages import synth_pages, with_extracted_text
from versatiles_rs_spark.tile_math import lonlat_to_tile_np

MAXZ = 6


@pytest.fixture(scope="module")
def pages_geo(spark, sf_dir):
    return with_extracted_text(synth_pages(spark, sf_dir)).cache()


@pytest.fixture(scope="module")
def tiles(pages_geo):
    return convert_pages_to_tiles(pages_geo, 0, MAXZ, keep_ratio=0.8).cache()


def test_tile_assignment_matches_numpy(pages_geo):
    pdf = assign_tiles(pages_geo.select("doc_id", "lon", "lat"), 0, MAXZ).toPandas()
    for z, g in pdf.groupby("z"):
        xn, yn = lonlat_to_tile_np(g["lon"].values, g["lat"].values, int(z))
        np.testing.assert_array_equal(g["x"].values, xn)
        np.testing.assert_array_equal(g["y"].values, yn)


def test_z0_has_single_tile_with_all_points(pages_geo, tiles):
    n_docs = pages_geo.count()
    z0 = tiles.filter("z = 0").collect()
    assert len(z0) == 1
    row = z0[0]
    assert (row["x"], row["y"]) == (0, 0)
    # keep_ratio^(maxz-0) of docs survive at z0 — just check bounds
    assert 0 < row["n_features"] <= n_docs


def test_all_tiles_valid_mvt(tiles):
    bad = validate_tiles(tiles).filter("n_issues > 0").count()
    assert bad == 0


def test_counts_agree_invariant(pages_geo, tiles):
    """assert_stream_counts_agree analog (versatiles_container/src/testing.rs:40):
    the coords-only plan and the rendered-tiles plan yield identical per-zoom
    tile sets and feature counts."""
    from versatiles_rs_spark.operators.reduce_points import drop_rate_keep

    assigned = assign_tiles(pages_geo, 0, MAXZ)
    reduced = drop_rate_keep(assigned, "doc_id", "z", MAXZ, 0.8)
    coords_only = reduced.groupBy("z", "x", "y").agg(F.count("*").alias("n_features"))
    full = tiles.select("z", "x", "y", "n_features")
    assert coords_only.exceptAll(full).count() == 0
    assert full.exceptAll(coords_only).count() == 0


def test_convert_deterministic_byte_identical(pages_geo):
    """Golden: two independent runs produce byte-identical blobs per coord."""
    t1 = convert_pages_to_tiles(pages_geo, 0, 4, keep_ratio=0.9).select("z", "x", "y", "tile")
    t2 = convert_pages_to_tiles(pages_geo, 0, 4, keep_ratio=0.9).select("z", "x", "y", "tile")
    assert t1.exceptAll(t2).count() == 0
    assert t2.exceptAll(t1).count() == 0


def test_tile_blob_decodes_to_expected_features(pages_geo, tiles):
    row = tiles.filter("z = %d" % MAXZ).orderBy(F.desc("n_features")).first()
    raw = decompress(bytes(row["tile"]), row["compression"])
    layers = decode_tile(raw)
    feats = layers["pages"]["features"]
    assert len(feats) == row["n_features"]
    # feature ids sorted ascending (deterministic order)
    fids = [f.fid for f in feats]
    assert fids == sorted(fids)
    # every point is inside the tile grid
    for f in feats:
        (gx, gy), = f.rings[0]
        assert 0 <= gx < 4096 and 0 <= gy < 4096
    assert all(f.props.get("lang") for f in feats)


def test_zoom_stats_and_topk(tiles):
    stats = zoom_stats(tiles).toPandas()
    assert stats["z"].tolist() == list(range(MAXZ + 1))
    assert (stats["tile_count"] >= 1).all()
    # tile counts increase (or stay equal) with zoom for scattered points
    assert stats["tile_count"].is_monotonic_increasing
    top = top_k_tiles(tiles, 5).toPandas()
    assert len(top) == 5
    assert top["size"].is_monotonic_decreasing


def test_layer_breakdown(tiles):
    bd = layer_breakdown(tiles).toPandas()
    assert set(bd["layer"]) == {"pages"}
    assert (bd["n_features"] > 0).all()


def test_hilbert_key_unique_and_ordered(tiles):
    hk = with_hilbert_key(tiles).select("z", "x", "y", "hilbert_id").toPandas()
    assert hk["hilbert_id"].is_unique
    # z0 tile has hilbert_id 0; all z1 ids in [1,4], etc.
    z0 = hk[hk["z"] == 0]["hilbert_id"].iloc[0]
    assert z0 == 0


def test_fast_path_byte_identical():
    """Single-point fast path must produce byte-identical blobs to the
    generic encode_tile path (same codec)."""
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.functions.mvt import MvtFeature, GEOM_POINT, encode_tile
    from versatiles_rs_spark.operators.convert import _encode_tile_rows

    n = 500
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "z": np.full(n, 12, dtype=np.int32),
            "x": np.arange(n, dtype=np.int64),  # all distinct -> all singles
            "y": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-80, 80, n),
            "doc_id": rng.integers(0, 1 << 40, n),
            "lang": rng.choice(["en", "de", "zh"], n),
        }
    )
    out = _encode_tile_rows(pdf.copy(), "pages", ["lang"], "gzip").set_index(["x", "y"])
    # recompute each via the generic encoder
    from versatiles_rs_spark.functions.compression import compress
    from versatiles_rs_spark.operators.convert import _quantize_grid

    gx, gy = _quantize_grid(pdf)
    for i in range(n):
        f = MvtFeature(GEOM_POINT, [[(int(gx[i]), int(gy[i]))]],
                       {"lang": pdf["lang"].values[i]}, fid=int(pdf["doc_id"].values[i]))
        want = compress(encode_tile({"pages": [f]}), "gzip")
        got = out.loc[(pdf["x"].values[i], pdf["y"].values[i])]
        assert bytes(got["tile"]) == want, f"row {i} differs"


def test_optimize_compression_mode():
    import numpy as np
    import pandas as pd

    from versatiles_rs_spark.operators.convert import _encode_tile_rows

    n = 200
    rng = np.random.default_rng(10)
    pdf = pd.DataFrame(
        {
            "z": np.full(n, 12, dtype=np.int32),
            "x": np.arange(n, dtype=np.int64),
            "y": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-80, 80, n),
            "doc_id": np.arange(n),
            "lang": rng.choice(["en", "de"], n),
        }
    )
    out = _encode_tile_rows(pdf, "pages", ["lang"], "optimize")
    # tiny single-point tiles are smaller uncompressed -> codec 'none'
    assert (out["compression"] == "none").all()
    from versatiles_rs_spark.functions.mvt import validate_tile

    assert all(validate_tile(bytes(b)) == [] for b in out["tile"])


def test_multi_fast_path_byte_identical():
    """The specialized multi-point encoder emits EXACTLY the bytes of the
    generic MvtFeature/encode_tile path for null-free uniform-prop tiles."""
    import numpy as np

    from versatiles_rs_spark.functions.mvt import GEOM_POINT, MvtFeature, encode_tile
    from versatiles_rs_spark.operators.convert import _encode_multi_point_tile

    rng = np.random.default_rng(7)
    n = 200
    ids = np.sort(rng.choice(10_000, size=n, replace=False)).astype(np.int64)
    gx = rng.integers(0, 4096, n)
    gy = rng.integers(0, 4096, n)
    langs = np.array([["en", "de", "fr"][i % 3] for i in range(n)], dtype=object)
    scores = rng.integers(0, 50, n).astype(object)
    props = {"lang": langs, "score": scores}
    fast = _encode_multi_point_tile(ids, gx, gy, props, 0, n, "pages")
    feats = [
        MvtFeature(GEOM_POINT, [[(int(gx[i]), int(gy[i]))]],
                   {"lang": langs[i], "score": scores[i]}, fid=int(ids[i]))
        for i in range(n)
    ]
    generic = encode_tile({"pages": feats})
    assert fast == generic
    # degenerate: single prop, single feature
    one = _encode_multi_point_tile(ids, gx, gy, {"lang": langs}, 3, 4, "pages")
    g1 = encode_tile({"pages": [MvtFeature(GEOM_POINT, [[(int(gx[3]), int(gy[3]))]],
                                           {"lang": langs[3]}, fid=int(ids[3]))]})
    assert one == g1


def test_filter_tiles_bbox_matches_geometric_intersection(spark):
    """border=0 must equal the geometric tile-bounds intersection test."""
    from pyspark.sql import functions as F

    from versatiles_rs_spark.operators.convert import filter_tiles_bbox
    from versatiles_rs_spark.tile_math.coords import tile_bounds_cols

    full = []
    for z in range(0, 5):
        for x in range(1 << z):
            for y in range(1 << z):
                full.append((z, x, y))
    df = spark.createDataFrame(full, "z int, x long, y long")
    box = (-90.0, -45.0, 90.0, 45.0)
    got = {(r["z"], r["x"], r["y"]) for r in filter_tiles_bbox(df, box).collect()}
    tw, ts, te, tn = tile_bounds_cols(F.col("z"), F.col("x"), F.col("y"))
    want = {
        (r["z"], r["x"], r["y"])
        for r in df.filter(
            (te > box[0]) & (tw < box[2]) & (tn > box[1]) & (ts < box[3])
        ).collect()
    }
    assert got == want
    # border=1 adds exactly the surrounding ring (clamped at grid edges)
    got_b = {(r["z"], r["x"], r["y"]) for r in filter_tiles_bbox(df, box, border=1).collect()}
    assert got < got_b
    for z, x, y in got:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx, ny = x + dx, y + dy
                if 0 <= nx < (1 << z) and 0 <= ny < (1 << z):
                    assert (z, nx, ny) in got_b


def test_flip_y_and_swap_xy(spark):
    from versatiles_rs_spark.operators.convert import flip_tiles_y, swap_tiles_xy

    df = spark.createDataFrame([(2, 1, 0), (2, 3, 2)], "z int, x long, y long")
    flipped = {(r["z"], r["x"], r["y"]) for r in flip_tiles_y(df).collect()}
    assert flipped == {(2, 1, 3), (2, 3, 1)}
    swapped = {(r["z"], r["x"], r["y"]) for r in swap_tiles_xy(df).collect()}
    assert swapped == {(2, 0, 1), (2, 2, 3)}
    # involutions
    assert {(r["z"], r["x"], r["y"]) for r in flip_tiles_y(flip_tiles_y(df)).collect()} == \
        {(2, 1, 0), (2, 3, 2)}
