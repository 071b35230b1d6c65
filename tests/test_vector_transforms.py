"""vector_* transforms, stacked/merged sources, explode/reassemble."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import decompress
from versatiles_rs_spark.functions.mvt import decode_tile
from versatiles_rs_spark.operators.convert import assign_tiles, render_point_tiles
from versatiles_rs_spark.operators.stacked import (
    from_merged_vector,
    from_stacked,
    from_stacked_raster,
)
from versatiles_rs_spark.operators.vector_transforms import (
    explode_features,
    reassemble_tiles,
    vector_filter_features,
    vector_filter_layers,
    vector_filter_properties,
    vector_update_properties,
)
from versatiles_rs_spark.queries import _docs_geo

Z = 4


@pytest.fixture(scope="module")
def doc_tiles(spark, sf_dir):
    geo = _docs_geo(spark, sf_dir).select("doc_id", "lon", "lat", "lang", "source")
    assigned = assign_tiles(geo, Z, Z)
    return render_point_tiles(assigned, layer_name="docs", props_cols=["lang", "source"]).cache()


@pytest.fixture(scope="module")
def event_tiles(spark, sf_dir):
    from versatiles_rs_spark.queries import _events_geo

    geo = _events_geo(spark, sf_dir).select(
        F.col("event_id").alias("doc_id"), "lon", "lat", F.col("event_type").alias("lang")
    )
    assigned = assign_tiles(geo.filter("doc_id % 7 = 0"), Z, Z)
    return render_point_tiles(assigned, layer_name="events", props_cols=["lang"]).cache()


def _first_layers(df):
    row = df.first()
    return decode_tile(decompress(bytes(row["tile"]), row["compression"]))


def test_filter_layers_drop_and_invert(doc_tiles):
    dropped = vector_filter_layers(doc_tiles, ["docs"])
    assert dropped.count() == 0  # only layer removed -> all tiles empty -> dropped
    kept = vector_filter_layers(doc_tiles, ["docs"], invert=True)
    assert kept.count() == doc_tiles.count()


def test_filter_properties(doc_tiles):
    out = vector_filter_properties(doc_tiles, r"docs/source")
    layers = _first_layers(out)
    for f in layers["docs"]["features"]:
        assert "source" not in f.props and "lang" in f.props
    inv = vector_filter_properties(doc_tiles, r"docs/source", invert=True)
    layers = _first_layers(inv)
    for f in layers["docs"]["features"]:
        assert set(f.props) <= {"source"}


def test_filter_features_predicate(spark, doc_tiles, sf_dir):
    out = vector_filter_features(doc_tiles, lambda layer, props: props.get("lang") == "en")
    n = out.agg(F.sum("n_features")).collect()[0][0]
    want = spark.read.parquet(f"{sf_dir}/documents.parquet").filter("lang = 'en'").count()
    assert n == want


def test_update_properties_broadcast(spark, doc_tiles):
    dim = spark.createDataFrame(
        pd.DataFrame({"lang_key": ["en", "de"], "lang_name": ["English", "German"]})
    )
    out = vector_update_properties(doc_tiles, dim, id_prop="lang", dim_id_col="lang_key")
    feats = [f for lay in _first_layers(out).values() for f in lay["features"]]
    en = [f for f in feats if f.props.get("lang") == "en"]
    if en:
        assert en[0].props["lang_name"] == "English"
    other = [f for f in feats if f.props.get("lang") not in ("en", "de")]
    for f in other:
        assert "lang_name" not in f.props
    inner = vector_update_properties(
        doc_tiles, dim, id_prop="lang", dim_id_col="lang_key", remove_non_matching=True
    )
    n_inner = inner.agg(F.sum("n_features")).collect()[0][0]
    n_all = doc_tiles.agg(F.sum("n_features")).collect()[0][0]
    assert 0 < n_inner < n_all


def test_from_stacked_first_wins(doc_tiles, event_tiles):
    stacked = from_stacked([doc_tiles, event_tiles])
    # every coord appears exactly once
    assert stacked.groupBy("z", "x", "y").count().filter("count > 1").count() == 0
    # coords present in docs keep the docs blob
    doc_coords = {(r["x"], r["y"]): bytes(r["tile"]) for r in doc_tiles.collect()}
    for r in stacked.collect():
        key = (r["x"], r["y"])
        if key in doc_coords:
            assert bytes(r["tile"]) == doc_coords[key]


def test_from_merged_vector_concats_layers(doc_tiles, event_tiles):
    merged = from_merged_vector([doc_tiles, event_tiles])
    n_doc = doc_tiles.agg(F.sum("n_features")).collect()[0][0]
    n_ev = event_tiles.agg(F.sum("n_features")).collect()[0][0]
    assert merged.agg(F.sum("n_features")).collect()[0][0] == n_doc + n_ev
    both = (
        doc_tiles.select("x", "y").intersect(event_tiles.select("x", "y")).collect()
    )
    if both:
        x, y = both[0]["x"], both[0]["y"]
        row = merged.filter(f"x = {x} and y = {y}").first()
        layers = decode_tile(decompress(bytes(row["tile"]), row["compression"]))
        assert set(layers) == {"docs", "events"}


def test_from_stacked_raster_composites(spark):
    import numpy as np

    from versatiles_rs_spark.functions.raster import png_decode, png_encode

    def tile_df(v, alpha):
        img = np.full((4, 4, 4), v, np.uint8)
        img[:, :, 3] = alpha
        return spark.createDataFrame(
            pd.DataFrame(
                [(0, 0, 0, "png", "none", png_encode(img), 0)],
                columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
            )
        )

    top = tile_df(200, 128)
    bottom = tile_df(50, 255)
    out = from_stacked_raster([top, bottom]).collect()
    assert len(out) == 1
    img = png_decode(bytes(out[0]["tile"]))
    assert img[0, 0, 3] == 255
    assert 100 < img[0, 0, 0] < 160  # blend of 200@50% over 50


def test_explode_reassemble_roundtrip(spark, doc_tiles):
    feats = explode_features(doc_tiles)
    assert feats.count() == doc_tiles.agg(F.sum("n_features")).collect()[0][0]
    en = feats.filter(F.expr("props['lang'] = 'en'"))
    back = reassemble_tiles(en)
    assert back.agg(F.sum("n_features")).collect()[0][0] == en.count()
    # roundtrip without filtering is byte-identical to the source tiles
    full = reassemble_tiles(feats)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in full.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in doc_tiles.collect()}
    assert a == b


def test_vector_repair_clean_passthrough(doc_tiles):
    from versatiles_rs_spark.operators.vector_transforms import vector_repair

    out = vector_repair(doc_tiles)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in out.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in doc_tiles.collect()}
    assert a == b  # clean tiles forwarded byte-identically


def test_vector_repair_fixes_duplicate_layers(spark):
    import pandas as pd

    from versatiles_rs_spark.functions.mvt import (
        GEOM_POINT,
        MvtFeature,
        encode_tile,
        validate_tile,
    )
    from versatiles_rs_spark.operators.vector_transforms import vector_repair

    f = MvtFeature(GEOM_POINT, [[(0, 0)]], {}, fid=1)
    one = encode_tile({"l": [f]})
    broken = one + one  # duplicate layer 'l'
    assert validate_tile(broken)
    df = spark.createDataFrame(
        pd.DataFrame(
            [(0, 0, 0, "mvt", "none", broken, 2)],
            columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
        )
    )
    out = vector_repair(df).collect()
    assert len(out) == 1
    assert validate_tile(bytes(out[0]["tile"])) == []
