"""MVT transform operators (SURVEY.md §2.3/§2.4 vector_* inventory).

Two complementary forms, mirroring how the reference splits plan-time and
run-time work:

1. **Blob-level transforms** (``vector_filter_layers``, ``vector_filter_
   properties``, ``vector_filter_features``, ``vector_update_properties``):
   decode -> mutate -> re-encode inside one mapInPandas — zero shuffle, the
   direct analog of the reference's per-tile Runner plug-ins
   (operations/vector/traits.rs:9-66).

2. **Relational form** (``explode_features`` / ``reassemble_tiles``): tiles
   -> one row per feature with a props map, so predicates become plain
   Catalyst ``F.expr`` strings (the CEL-compiles-to-plan-time-expression
   analog of vector_filter_features.rs:68-81) and property joins become real
   DataFrame joins; re-encode groups back with grouped_tile_map.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from versatiles_rs_spark.functions.compression import compress, decompress
from versatiles_rs_spark.functions.mvt import MvtFeature, decode_tile, encode_tile
from versatiles_rs_spark.operators.convert import TILE_SCHEMA, grouped_tile_map


def _transform_tiles(tiles: DataFrame, fn: Callable[[dict], dict | None]) -> DataFrame:
    """Lift a per-tile {layer: [features]} -> same-or-None function onto the
    tiles DataFrame (the TransformOp/filter_map_parallel lift,
    operations/vector/traits.rs:40-66). None drops the tile."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                codec = row["compression"]
                decoded = decode_tile(decompress(bytes(row["tile"]), codec))
                layers = {name: d["features"] for name, d in decoded.items()}
                out = fn(layers)
                if out is None or not any(out.values()):
                    continue
                n = sum(len(v) for v in out.values())
                blob = compress(encode_tile({k: v for k, v in out.items() if v}), codec)
                rows.append(
                    (int(row["z"]), int(row["x"]), int(row["y"]), row["format"], codec, blob, n)
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


def vector_filter_layers(tiles: DataFrame, layers: list[str], invert: bool = False) -> DataFrame:
    """Keep (or drop, invert=True... note: reference semantics are
    *remove listed layers*, invert keeps only them —
    vector_filter_layers.rs:42)."""
    names = set(layers)

    def fn(lyrs: dict) -> dict:
        if invert:
            return {k: v for k, v in lyrs.items() if k in names}
        return {k: v for k, v in lyrs.items() if k not in names}

    return _transform_tiles(tiles, fn)


def vector_filter_properties(tiles: DataFrame, pattern: str, invert: bool = False) -> DataFrame:
    """Remove feature properties where 'layer/prop' matches ``pattern``
    (vector_filter_properties.rs:47); invert keeps only matches."""
    rx = re.compile(pattern)

    def fn(lyrs: dict) -> dict:
        out = {}
        for name, feats in lyrs.items():
            nf = []
            for f in feats:
                props = {
                    k: v
                    for k, v in f.props.items()
                    if bool(rx.search(f"{name}/{k}")) == invert
                }
                nf.append(MvtFeature(f.geom_type, f.rings, props, f.fid))
            out[name] = nf
        return out

    return _transform_tiles(tiles, fn)


def vector_filter_features(
    tiles: DataFrame, predicate: Callable[[str, dict], bool]
) -> DataFrame:
    """Per-feature boolean predicate over (layer_name, props) — the compiled
    CEL expression analog (vector_filter_features.rs:146). Compile your
    predicate once at plan build; it is shipped to executors as a closure."""

    def fn(lyrs: dict) -> dict:
        return {
            name: [f for f in feats if predicate(name, f.props)]
            for name, feats in lyrs.items()
        }

    return _transform_tiles(tiles, fn)


def vector_update_properties(
    tiles: DataFrame,
    dim: DataFrame,
    id_prop: str,
    dim_id_col: str,
    replace: bool = False,
    remove_non_matching: bool = False,
    include_id: bool = False,
    layer_name: str | None = None,
) -> DataFrame:
    """Broadcast hash join features x dim rows by id property
    (vector_update_properties.rs:63-121): the dim DataFrame is collected to
    a dict (the reference's HashMap build :75-94) and merged into each
    matching feature's props; inner vs left via ``remove_non_matching``.
    ``include_id`` keeps the DATA SOURCE's id column in the merged props
    (vector_update_properties.rs:89-91 — tile-side props are never removed).
    ``layer_name`` scopes the update to one layer; other layers pass
    through unchanged (vector_update_properties.rs Args.layer_name)."""
    rows = dim.collect()
    lookup: dict[object, dict] = {}
    for r in rows:
        d = r.asDict()
        key = d[dim_id_col]
        if not include_id:
            d.pop(dim_id_col)
        lookup[str(key)] = d
    bc = tiles.sparkSession.sparkContext.broadcast(lookup)

    def fn(lyrs: dict) -> dict:
        table = bc.value
        out = {}
        for name, feats in lyrs.items():
            if layer_name is not None and name != layer_name:
                out[name] = feats
                continue
            nf = []
            for f in feats:
                key = f.props.get(id_prop)
                hit = table.get(str(key)) if key is not None else None
                if hit is None:
                    if not remove_non_matching:
                        nf.append(f)
                    continue
                props = dict(hit) if replace else {**f.props, **hit}
                nf.append(MvtFeature(f.geom_type, f.rings, props, f.fid))
            out[name] = nf
        return out

    return _transform_tiles(tiles, fn)


def vector_repair(tiles: DataFrame) -> DataFrame:
    """Validate each tile; forward the ORIGINAL blob untouched when the
    validator finds it clean (the recompression-avoidance / lazy-decode
    optimization, vector_repair.rs + versatiles_pipeline README §vector_
    repair), else re-encode a repaired tile (duplicate layers merged,
    empty layers dropped — repair_tile, vector_tile/repair.rs:44)."""
    from versatiles_rs_spark.functions.mvt import validate_tile

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                codec = row["compression"]
                raw = decompress(bytes(row["tile"]), codec)
                issues = validate_tile(raw)
                if not issues:
                    blob = bytes(row["tile"])  # clean: no decode/re-encode
                else:
                    decoded = decode_tile(raw)
                    layers = {
                        name: d["features"] for name, d in decoded.items()
                        if d["features"] and name
                    }
                    if not layers:
                        continue
                    blob = compress(encode_tile(layers), codec)
                rows.append(
                    (int(row["z"]), int(row["x"]), int(row["y"]), row["format"], codec,
                     blob, int(row["n_features"]))
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


# ---------------------------------------------------------------------------
# relational form
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = StructType(
    [
        StructField("z", IntegerType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("layer", StringType()),
        StructField("fid", LongType()),
        StructField("geom_type", IntegerType()),
        StructField("rings", ArrayType(ArrayType(ArrayType(IntegerType())))),
        StructField("props", MapType(StringType(), StringType())),
    ]
)


def explode_features(tiles: DataFrame) -> DataFrame:
    """tiles -> one row per feature; props stringified into a map column so
    Catalyst expressions (``F.expr("props['lang'] = 'en'")``) apply."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                decoded = decode_tile(decompress(bytes(row["tile"]), row["compression"]))
                for name, layer in decoded.items():
                    for f in layer["features"]:
                        rows.append(
                            (
                                int(row["z"]), int(row["x"]), int(row["y"]),
                                name,
                                f.fid,
                                f.geom_type,
                                [[list(p) for p in ring] for ring in f.rings],
                                {k: str(v) for k, v in f.props.items()},
                            )
                        )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["z", "x", "y", "layer", "fid", "geom_type", "rings", "props"],
                )

    return tiles.mapInPandas(run, schema=FEATURE_SCHEMA)


def reassemble_tiles(features: DataFrame, compression: str = "gzip") -> DataFrame:
    """Inverse of explode_features: group feature rows back into MVT tiles."""

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (z, x, y), idx in pdf.groupby(["z", "x", "y"], sort=False).indices.items():
            sub = pdf.iloc[idx]
            layers: dict[str, list[MvtFeature]] = {}
            for _, r in sub.iterrows():
                rings = [[(int(p[0]), int(p[1])) for p in ring] for ring in r["rings"]]
                # feature ids are OPTIONAL in MVT (the shortbread fixture's
                # address features carry none) — preserve absence
                fid = None if pd.isna(r["fid"]) else int(r["fid"])
                layers.setdefault(r["layer"], []).append(
                    MvtFeature(int(r["geom_type"]), rings, dict(r["props"]), fid)
                )
            blob = compress(encode_tile(layers), compression)
            n = int(len(sub))
            rows.append((int(z), int(x), int(y), "mvt", compression, blob, n))
        return pd.DataFrame(
            rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
        )

    return grouped_tile_map(features, body, TILE_SCHEMA)
