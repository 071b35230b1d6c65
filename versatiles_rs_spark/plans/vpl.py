"""VPL-equivalent pipeline language: parse + plan to DataFrame transforms.

The reference's VersaTiles Pipeline Language (versatiles_pipeline/README.md;
parser versatiles_pipeline/src/vpl/parser.rs:17-130) composes one read op
with transform ops:

    from_csv filename="quakes.csv" | filter level_max=8 |
        vector_filter_properties pattern="points/depth"

This module re-implements the same surface over the Spark engine:

- ``parse_vpl``   : text -> [VplNode(name, props, children)]; supports
  ``#`` comments, quoted values, ``[a,b,c]`` arrays, and nested source
  lists ``from_stacked [ <pipeline>, <pipeline> ]`` (vpl_node.rs:21 model).
- ``build_pipeline``: node list -> DataFrame, validating op names and typed
  arguments at *build time* exactly like PipelineFactory::build
  (factory.rs:81-150) — unknown op / missing arg / wrong position raise
  before anything executes.

The registry is the extension surface (§2.12): register_op adds new
transforms the same way the reference registers factories by tag name.
"""

from __future__ import annotations

import re
import shlex
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class VplNode:
    name: str
    props: dict[str, object] = field(default_factory=dict)
    children: list[list["VplNode"]] = field(default_factory=list)


class VplError(ValueError):
    pass


def _parse_value(v: str) -> object:
    if v.startswith("[") and v.endswith("]"):
        inner = v[1:-1].strip()
        return [_parse_value(p.strip()) for p in inner.split(",")] if inner else []
    if re.fullmatch(r"-?\d+", v):
        return int(v)
    if re.fullmatch(r"-?\d*\.\d+", v):
        return float(v)
    if v in ("true", "false"):
        return v == "true"
    return v


def _split_pipes(text: str) -> list[str]:
    """Split on '|' at bracket depth 0, respecting quotes."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "|" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _split_top_commas(text: str) -> list[str]:
    parts, depth, cur, quote = [], 0, [], None
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_node(text: str) -> VplNode:
    # children: trailing [ pipeline, pipeline ] block (nested source list)
    children: list[list[VplNode]] = []
    m = re.search(r"\[(.*)\]\s*$", text, re.S)
    head = text
    if m:
        # only treat as child block when the bracket is not part of key=[...]
        before = text[: m.start()].rstrip()
        if not before.endswith("="):
            head = before
            children = [parse_vpl(p) for p in _split_top_commas(m.group(1))]
    toks = shlex.split(head)
    if not toks:
        raise VplError("empty pipeline node")
    name = toks[0]
    props: dict[str, object] = {}
    for t in toks[1:]:
        if "=" not in t:
            raise VplError(f"malformed argument {t!r} in op {name!r} (expected key=value)")
        k, v = t.split("=", 1)
        props[k] = _parse_value(v)
    return VplNode(name, props, children)


def parse_vpl(text: str) -> list[VplNode]:
    """Parse one pipeline string -> node list (comments stripped)."""
    text = "\n".join(ln.split("#", 1)[0] for ln in text.splitlines())
    return [_parse_node(p) for p in _split_pipes(text)]


# ---------------------------------------------------------------------------
# op registry (the PipelineFactory)
# ---------------------------------------------------------------------------

READ_OPS: dict[str, Callable] = {}
TRANSFORM_OPS: dict[str, Callable] = {}


def register_read(name: str):
    def deco(fn):
        READ_OPS[name] = fn
        return fn

    return deco


def register_transform(name: str):
    def deco(fn):
        TRANSFORM_OPS[name] = fn
        return fn

    return deco


def _req(node: VplNode, key: str):
    if key not in node.props:
        raise VplError(f"op {node.name!r}: missing required argument {key!r}")
    return node.props[key]


@register_read("from_container")
def _op_from_container(spark: SparkSession, node: VplNode) -> DataFrame:
    """Dispatch by extension: .mbtiles / .pmtiles / .versatiles / parquet
    tile table (from_container.rs + container_registry.rs:85)."""
    from versatiles_rs_spark.sources import read_container

    return read_container(spark, str(_req(node, "filename")))


@register_read("from_csv")
def _op_from_csv(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.sources import from_csv

    return from_csv(
        spark,
        str(_req(node, "filename")),
        lon_col=str(node.props.get("lon", "longitude")),
        lat_col=str(node.props.get("lat", "latitude")),
        id_col=node.props.get("id"),
        min_zoom=int(node.props.get("level_min", 0)),
        max_zoom=int(node.props.get("level_max", 14)),
        layer_name=str(node.props.get("layer", "points")),
        props_cols=[str(c) for c in node.props.get("properties", [])],
    )


@register_read("from_color")
def _op_from_color(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.sources import from_color

    rgba = tuple(int(c) for c in _req(node, "color"))
    return from_color(
        spark, rgba, int(node.props.get("level_min", 0)), int(node.props.get("level_max", 4))
    )


@register_read("from_debug")
def _op_from_debug(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.sources import from_debug

    return from_debug(
        spark, int(node.props.get("level_min", 0)), int(node.props.get("level_max", 4))
    )


@register_read("from_stacked")
def _op_from_stacked(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.stacked import from_stacked

    if not node.children:
        raise VplError("from_stacked: needs a [source, source, ...] list")
    return from_stacked([build_pipeline(spark, c) for c in node.children])


@register_read("from_merged_vector")
def _op_from_merged(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.stacked import from_merged_vector

    if not node.children:
        raise VplError("from_merged_vector: needs a [source, source, ...] list")
    return from_merged_vector([build_pipeline(spark, c) for c in node.children])


@register_transform("filter")
def _op_filter(df: DataFrame, node: VplNode) -> DataFrame:
    out = df
    if "level_min" in node.props:
        out = out.filter(F.col("z") >= int(node.props["level_min"]))
    if "level_max" in node.props:
        out = out.filter(F.col("z") <= int(node.props["level_max"]))
    if "bbox" in node.props:
        w, s, e, n = (float(v) for v in node.props["bbox"])
        from versatiles_rs_spark.tile_math.coords import tile_bounds_cols

        tw, ts, te, tn = tile_bounds_cols(F.col("z"), F.col("x"), F.col("y"))
        out = out.filter((te > w) & (tw < e) & (tn > s) & (ts < n))
    return out


@register_transform("vector_filter_layers")
def _op_filter_layers(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.vector_transforms import vector_filter_layers

    layers = [str(x) for x in _req(node, "layers")]
    return vector_filter_layers(df, layers, invert=bool(node.props.get("invert", False)))


@register_transform("vector_filter_properties")
def _op_filter_props(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.vector_transforms import vector_filter_properties

    return vector_filter_properties(
        df, str(_req(node, "pattern")), invert=bool(node.props.get("invert", False))
    )


@register_transform("vector_overview")
def _op_overview(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.overview import build_overviews

    return build_overviews(
        df, int(_req(node, "level_base")), int(node.props.get("level_min", 0)), kind="vector"
    )


@register_read("from_geo")
def _op_from_geo(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.from_geo import from_geo

    return from_geo(
        spark,
        str(_req(node, "filename")),
        min_zoom=int(node.props.get("level_min", 0)),
        max_zoom=int(node.props.get("level_max", 8)),
        layer_name=str(node.props.get("layer", "features")),
        simplify_px=float(node.props.get("simplify", 1.0)),
    )


@register_read("from_shapefile")
def _op_from_shapefile(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.sources.shapefile import from_shapefile

    return from_shapefile(
        spark,
        str(_req(node, "filename")),
        min_zoom=int(node.props.get("level_min", 0)),
        max_zoom=int(node.props.get("level_max", 8)),
        layer_name=str(node.props.get("layer", "features")),
    )


@register_transform("raster_mask")
def _op_raster_mask(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.raster_ops import raster_mask
    from versatiles_rs_spark.spatial.geojson_io import load_polygons_geojson

    polys = load_polygons_geojson(str(_req(node, "filename")))
    want = node.props.get("feature")
    if want is not None:
        polys = [p for p in polys if p.name == str(want)]
    if not polys:
        raise VplError(f"raster_mask: no usable polygon (feature={want!r}) in mask file")
    # multi-polygon mask: per-polygon containment OR-ed inside raster_mask
    # (mask_geometry.rs:185-219) — overlapping features stay masked-in.
    return raster_mask(df, polys, smooth=int(node.props.get("smooth", 0)))


@register_transform("vector_repair")
def _op_vector_repair(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.vector_transforms import vector_repair

    return vector_repair(df)


@register_transform("raster_levels")
def _op_raster_levels(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.raster_ops import raster_levels

    return raster_levels(
        df,
        brightness=float(node.props.get("brightness", 0.0)),
        contrast=float(node.props.get("contrast", 1.0)),
        gamma=float(node.props.get("gamma", 1.0)),
    )


@register_transform("raster_flatten")
def _op_raster_flatten(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.raster_ops import raster_flatten

    bg = node.props.get("color", [255, 255, 255])
    return raster_flatten(df, bg=tuple(int(c) for c in bg)[:3])


@register_transform("raster_overview")
def _op_raster_overview(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.overview import build_overviews

    return build_overviews(
        df, int(_req(node, "level_base")), int(node.props.get("level_min", 0)), kind="raster"
    )


@register_transform("vector_overzoom")
def _op_overzoom(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.overzoom import overzoom_to

    return overzoom_to(
        df,
        int(_req(node, "level_base")),
        int(_req(node, "level_target")),
        buffer=int(node.props.get("buffer", 80)),
    )


@register_read("from_tile")
def _op_from_tile(spark: SparkSession, node: VplNode) -> DataFrame:
    import base64

    from versatiles_rs_spark.sources import from_tile

    if "filename" in node.props:
        with open(str(node.props["filename"]), "rb") as f:
            blob = f.read()
    else:
        blob = base64.b64decode(str(_req(node, "blob_base64")))
    return from_tile(
        spark,
        blob,
        str(node.props.get("format", "png")),
        int(node.props.get("level_min", 0)),
        int(node.props.get("level_max", 4)),
    )


@register_read("from_stacked_raster")
def _op_from_stacked_raster(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.stacked import from_stacked_raster

    if not node.children:
        raise VplError("from_stacked_raster: needs a [source, source, ...] list")
    return from_stacked_raster([build_pipeline(spark, c) for c in node.children])


@register_read("from_mbtiles")
def _op_from_mbtiles(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.sources.mbtiles import read_mbtiles

    return read_mbtiles(spark, str(_req(node, "filename")))


@register_transform("vector_filter_features")
def _op_vector_filter_features(df: DataFrame, node: VplNode) -> DataFrame:
    """CEL predicate over feature properties; layers outside ``layer`` pass
    through untouched (vector_filter_features.rs:25-53). The expression
    compiles HERE, so malformed CEL fails at plan-build time."""
    from versatiles_rs_spark.functions.cel import CelParseError, compile_cel
    from versatiles_rs_spark.operators.vector_transforms import vector_filter_features

    expr = str(_req(node, "expr"))
    layers = node.props.get("layer")
    layer_set = {str(x) for x in layers} if layers else None
    try:
        pred = compile_cel(expr)
    except CelParseError as e:
        raise VplError(f"vector_filter_features: failed to compile CEL expression: {e}") from e

    def predicate(layer_name: str, props: dict) -> bool:
        if layer_set is not None and layer_name not in layer_set:
            return True  # out-of-scope layers untouched
        return pred(props)

    return vector_filter_features(df, predicate)


@register_transform("vector_update_properties")
def _op_vector_update_properties(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.vector_transforms import vector_update_properties

    spark = df.sparkSession
    path = str(_req(node, "data_source_path"))
    sep = str(node.props.get("field_separator", "\t" if path.endswith(".tsv") else ","))
    dim = spark.read.csv(path, header=True, inferSchema=True, sep=sep)
    return vector_update_properties(
        df,
        dim,
        id_prop=str(_req(node, "id_field_tiles")),
        dim_id_col=str(_req(node, "id_field_data")),
        replace=bool(node.props.get("replace_properties", False)),
        remove_non_matching=bool(node.props.get("remove_non_matching", False)),
        include_id=bool(node.props.get("include_id", False)),
        layer_name=(str(node.props["layer_name"]) if "layer_name" in node.props else None),
    )


@register_transform("raster_format")
def _op_raster_format(df: DataFrame, node: VplNode) -> DataFrame:
    """Image-format + quality switch (raster_format.rs): ``format=jpg
    quality="70,14:50"`` converts the image codec with the reference's
    zoom-dependent quality syntax; ``compression=`` additionally sets the
    transport codec."""
    from versatiles_rs_spark.operators.raster_ops import raster_format, raster_image_format

    out = df
    if "format" in node.props:
        out = raster_image_format(
            out,
            fmt=str(node.props["format"]).lower(),
            quality=node.props.get("quality", 85),
            quality_translucent=node.props.get("quality_translucent"),
        )
    if "compression" in node.props or "compression_by_zoom" in node.props:
        by_zoom = node.props.get("compression_by_zoom")
        schedule = (
            {int(k): str(v) for k, v in by_zoom.items()} if isinstance(by_zoom, dict) else None
        )
        out = raster_format(out, schedule, default=str(node.props.get("compression", "none")))
    return out


@register_transform("raster_overscale")
def _op_raster_overscale(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.raster_ops import raster_overscale

    return raster_overscale(df, levels_up=int(node.props.get("levels", 1)))


@register_transform("raster_tile_resize")
def _op_raster_tile_resize(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.raster_ops import raster_tile_split

    return raster_tile_split(df, size=int(node.props.get("tile_size", 256)))


@register_transform("dem_tile_resize")
def _op_dem_tile_resize(df: DataFrame, node: VplNode) -> DataFrame:
    """Registry parity with operations/mod.rs:16 (dem::dem_tile_resize).
    tile_size is required by the reference (dem_tile_resize.rs:34)."""
    from versatiles_rs_spark.operators.raster_ops import dem_tile_resize

    return dem_tile_resize(df, tile_size=int(_req(node, "tile_size")))


@register_transform("dem_overview")
def _op_dem_overview(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.overview import build_overviews

    return build_overviews(
        df, int(_req(node, "level_base")), int(node.props.get("level_min", 0)), kind="dem"
    )


@register_transform("dem_quantize")
def _op_dem_quantize(df: DataFrame, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.operators.raster_ops import dem_quantize

    return dem_quantize(
        df,
        elevation_error=float(node.props.get("elevation_error", 1.0)),
        schema=str(node.props.get("encoding", "terrarium")),
    )


# Build-time TileJSON side channel for meta_update: build_pipeline pushes the
# caller's metadata dict while constructing (driver-side, single-threaded);
# meta_update merges its props into it (meta_update.rs TileJSON merge).
_META_STACK: list[dict] = []


@register_transform("meta_update")
def _op_meta_update(df: DataFrame, node: VplNode) -> DataFrame:
    if _META_STACK:
        _META_STACK[-1].update(node.props)
    return df


def build_pipeline(
    spark: SparkSession, nodes: list[VplNode] | str, meta: dict | None = None
) -> DataFrame:
    """Plan a parsed pipeline: first node must be a read op, the rest
    transforms (factory.rs:81-123 contract). All validation happens here,
    before any job runs. Pass ``meta`` (a dict) to receive TileJSON updates
    from any ``meta_update`` nodes in this pipeline."""
    if isinstance(nodes, str):
        nodes = parse_vpl(nodes)
    if not nodes:
        raise VplError("empty pipeline")
    head, rest = nodes[0], nodes[1:]
    if head.name not in READ_OPS:
        if head.name in TRANSFORM_OPS:
            raise VplError(f"pipeline must start with a read op, got transform {head.name!r}")
        raise VplError(f"unknown read op {head.name!r} (have: {sorted(READ_OPS)})")
    _META_STACK.append(meta if meta is not None else {})
    try:
        df = READ_OPS[head.name](spark, head)
        for node in rest:
            if node.name not in TRANSFORM_OPS:
                if node.name in READ_OPS:
                    raise VplError(f"read op {node.name!r} cannot appear mid-pipeline")
                raise VplError(
                    f"unknown transform op {node.name!r} (have: {sorted(TRANSFORM_OPS)})"
                )
            df = TRANSFORM_OPS[node.name](df, node)
    finally:
        _META_STACK.pop()
    return df


@register_read("from_tilejson")
def _op_from_tilejson(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.sources.tilejson import from_tilejson

    return from_tilejson(
        spark,
        str(_req(node, "url")),
        min_zoom=node.props.get("level_min"),
        max_zoom=node.props.get("level_max"),
    )


def _gdal_common_props(node: VplNode) -> dict:
    """Shared from_gdal options (reference raster/args.rs + cutline.rs):
    resampling=nearest|bilinear, nodata=<float>, cutline=<geojson path>,
    mode=auto|broadcast|windowed."""
    out: dict = {
        "resampling": str(node.props.get("resampling", "nearest")),
        "mode": str(node.props.get("mode", "auto")),
        "low_zoom": str(node.props.get("low_zoom", "direct")),
    }
    if "nodata" in node.props:
        out["nodata"] = float(node.props["nodata"])
    if "cutline" in node.props:
        from versatiles_rs_spark.spatial.geojson_io import load_polygons_geojson

        polys = load_polygons_geojson(str(node.props["cutline"]))
        if not polys:
            raise ValueError("cutline GeoJSON contains no polygons")
        # merge all polygons into one even-odd ring set
        from versatiles_rs_spark.spatial.pip import Polygon

        rings = [r for p in polys for r in p.rings]
        out["cutline"] = Polygon(0, "cutline", "cutline", rings)
    return out


@register_read("from_gdal_raster")
def _op_from_gdal_raster(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.sources.geotiff import from_gdal_raster

    kw = _gdal_common_props(node)
    if "bands" in node.props:
        kw["bands"] = [int(b) for b in str(node.props["bands"]).split(",") if b]
    return from_gdal_raster(
        spark,
        str(_req(node, "filename")),
        min_zoom=int(node.props.get("level_min", 0)),
        max_zoom=int(node.props.get("level_max", 4)),
        **kw,
    )


@register_read("from_gdal_dem")
def _op_from_gdal_dem(spark: SparkSession, node: VplNode) -> DataFrame:
    from versatiles_rs_spark.sources.geotiff import from_gdal_dem

    return from_gdal_dem(
        spark,
        str(_req(node, "filename")),
        min_zoom=int(node.props.get("level_min", 0)),
        max_zoom=int(node.props.get("level_max", 4)),
        encoding=str(node.props.get("encoding", "terrarium")),
        **_gdal_common_props(node),
    )
