"""Raster tile operators: levels / flatten / format / mask / overscale /
tile_resize / dem_quantize (SURVEY.md §2.3/§2.7/§2.10 raster inventory).

All are per-tile mapInPandas transforms (zero shuffle) except tile_resize
merge (a groupBy-parent, same shape as overview). raster_mask is the full
spatial composition: classify tile vs polygon (FullyInside passthrough /
FullyOutside drop / Partial per-pixel), then vectorized ray-cast PIP on the
pixel grid of Partial tiles -> alpha channel (raster_mask/mask_geometry.rs:
237 classify, :402 contains_point, :442 alpha grid; the signed-distance
blur is approximated by the binary alpha + optional box smoothing).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import compress, decompress
from versatiles_rs_spark.functions.raster import (
    dem_decode,
    dem_encode,
    flatten_onto,
    levels,
    png_decode,
    png_encode,
)
from versatiles_rs_spark.operators.convert import TILE_SCHEMA, grouped_tile_map
from versatiles_rs_spark.spatial.pip import (
    FULLY_INSIDE,
    FULLY_OUTSIDE,
    Polygon,
    classify_tiles,
    pip_contains_np,
)
from versatiles_rs_spark.tile_math.coords import tile_geo_bbox_np


def _map_tiles(tiles: DataFrame, img_fn) -> DataFrame:
    """Lift img -> img-or-None onto tile rows (None drops the tile)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                img = png_decode(decompress(bytes(r["tile"]), r["compression"]))
                out = img_fn(img, int(r["z"]), int(r["x"]), int(r["y"]))
                if out is None:
                    continue
                blob = compress(png_encode(out), r["compression"])
                rows.append(
                    (int(r["z"]), int(r["x"]), int(r["y"]), "png", r["compression"], blob,
                     int(r["n_features"]))
                )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


def raster_levels(tiles: DataFrame, brightness: float = 0.0, contrast: float = 1.0,
                  gamma: float = 1.0) -> DataFrame:
    """Per-pixel brightness/contrast/gamma (raster_levels.rs:64-84)."""
    return _map_tiles(tiles, lambda img, *_: levels(img, brightness, contrast, gamma))


def raster_flatten(tiles: DataFrame, bg: tuple[int, int, int] = (255, 255, 255)) -> DataFrame:
    """RGBA -> RGB onto a background color (raster_flatten.rs)."""

    def fn(img, *_):
        return flatten_onto(img, bg) if img.shape[2] == 4 else img

    return _map_tiles(tiles, fn)


def raster_format(tiles: DataFrame, compression_by_zoom: dict[int, str] | None = None,
                  default: str = "none") -> DataFrame:
    """Re-encode with a per-zoom compression schedule (raster_format.rs
    quality-list analog; PNG is lossless so 'quality' maps to codec)."""
    sched = compression_by_zoom or {}

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                raw = decompress(bytes(r["tile"]), r["compression"])
                codec = sched.get(int(r["z"]), default)
                rows.append(
                    (int(r["z"]), int(r["x"]), int(r["y"]), r["format"], codec,
                     compress(raw, codec), int(r["n_features"]))
                )
            yield pd.DataFrame(
                rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
            )

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


def raster_mask(
    tiles: DataFrame, poly: Polygon | list[Polygon], smooth: int = 0
) -> DataFrame:
    """Mask raster tiles to one or more polygons: FullyOutside tiles drop,
    FullyInside tiles pass through untouched (the lazy-decode no-op path),
    Partial tiles get a per-pixel PIP alpha grid. ``smooth`` > 0 box-blurs
    the alpha edge (approximation of the signed-distance blur,
    blur_function.rs).

    Multi-polygon semantics match the reference (mask_geometry.rs:185-219):
    a pixel is kept if it is inside ANY polygon (per-polygon even-odd ring
    test, results OR-ed) — NOT the even-odd rule over the concatenated ring
    set, which would wrongly unmask regions where two polygons overlap."""
    polys = [poly] if isinstance(poly, Polygon) else list(poly)
    edge_sets = [p.edges() for p in polys]

    def fn(img, z, x, y):
        classes = [
            classify_tiles(z, np.array([x]), np.array([y]), p)[0] for p in polys
        ]
        if all(c == FULLY_OUTSIDE for c in classes):
            return None
        if img.shape[2] == 3:
            img = np.concatenate([img, np.full(img.shape[:2] + (1,), 255, np.uint8)], axis=2)
        if any(c == FULLY_INSIDE for c in classes):
            return img
        h, w = img.shape[:2]
        west, south, east, north = (
            a[0] for a in tile_geo_bbox_np(z, np.array([x]), np.array([y]))
        )
        lons = west + (np.arange(w) + 0.5) / w * (east - west)
        lats = north - (np.arange(h) + 0.5) / h * (north - south)
        gx, gy = np.meshgrid(lons, lats)
        inside = np.zeros(h * w, dtype=bool)
        for cls, edges in zip(classes, edge_sets):
            if cls == FULLY_OUTSIDE:
                continue
            inside |= pip_contains_np(gx.ravel(), gy.ravel(), edges)
        inside = inside.reshape(h, w)
        alpha = inside.astype(np.float64)
        for _ in range(smooth):
            padded = np.pad(alpha, 1, mode="edge")
            alpha = (
                padded[:-2, 1:-1] + padded[2:, 1:-1] + padded[1:-1, :-2]
                + padded[1:-1, 2:] + padded[1:-1, 1:-1]
            ) / 5.0
        out = img.copy()
        out[:, :, 3] = np.round(out[:, :, 3].astype(np.float64) * alpha).astype(np.uint8)
        return out

    return _map_tiles(tiles, fn)


def raster_tile_split(tiles: DataFrame, size: int = 256) -> DataFrame:
    """512->256-style retiling: split each tile into 4 children at z+1
    (raster_tile_resize.rs split direction) — a shuffle-free flat-map."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                img = png_decode(decompress(bytes(r["tile"]), r["compression"]))
                h, w = img.shape[:2]
                hh, hw = h // 2, w // 2
                for dy in (0, 1):
                    for dx in (0, 1):
                        sub = img[dy * hh : (dy + 1) * hh, dx * hw : (dx + 1) * hw]
                        # upscale x2 by pixel duplication to keep tile size
                        up = np.repeat(np.repeat(sub, 2, axis=0), 2, axis=1)
                        blob = compress(png_encode(up), r["compression"])
                        rows.append(
                            (int(r["z"]) + 1, int(r["x"]) * 2 + dx, int(r["y"]) * 2 + dy,
                             "png", r["compression"], blob, 0)
                        )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
                )

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


def dem_tile_resize(tiles: DataFrame, tile_size: int = 256) -> DataFrame:
    """Convert DEM tile size between 256px and 512px
    (operations/dem/dem_tile_resize.rs + helpers/tile_resize.rs).

    tile_size=256 (split, source must be 512px): each source tile at
    (z, x, y) is CROPPED into four 256px quadrants emitted at
    (z+1, 2x+dx, 2y+dy) — no resampling (tile_resize.rs:141-158
    process_split_tile). The source (0,0,0) additionally produces the
    output level-0 tile via dem_scale_down (24-bit raw-value averaging,
    not channel-wise — dem_tile_resize.rs:13-14).

    tile_size=512 (merge, source must be 256px): the four children at
    (z+1, 2x+dx, 2y+dy) are pasted onto a 512px RGBA canvas at
    (256*dx, 256*dy); missing children stay transparent
    (tile_resize.rs:160-192 process_merge_tile).

    Spark shape: split is a shuffle-free flat-map (mapInPandas); merge is
    one hash aggregation keyed on the parent coord (grouped_tile_map),
    identical shape to raster_overview — both scale as a single pass.
    """
    from versatiles_rs_spark.functions.raster import dem_scale_down

    if tile_size not in (256, 512):
        raise ValueError("dem_tile_resize: tile_size must be 256 or 512")

    if tile_size == 256:
        def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                rows = []
                for _, r in pdf.iterrows():
                    img = png_decode(decompress(bytes(r["tile"]), r["compression"]))
                    if img.shape[0] != 512 or img.shape[1] != 512:
                        raise ValueError(
                            "dem_tile_resize 256: source tiles must be 512px, "
                            f"got {img.shape[1]}x{img.shape[0]}"
                        )
                    z, x, y = int(r["z"]), int(r["x"]), int(r["y"])
                    if z == 0:
                        blob = compress(png_encode(dem_scale_down(img)), r["compression"])
                        rows.append((0, 0, 0, "png", r["compression"], blob, 0))
                    for dy in (0, 1):
                        for dx in (0, 1):
                            sub = img[dy * 256 : (dy + 1) * 256, dx * 256 : (dx + 1) * 256]
                            blob = compress(png_encode(sub), r["compression"])
                            rows.append((z + 1, x * 2 + dx, y * 2 + dy,
                                         "png", r["compression"], blob, 0))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
                    )

        return tiles.mapInPandas(run, schema=TILE_SCHEMA)

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (pz, px, py), idx in pdf.groupby(["pz", "px", "py"], sort=False).indices.items():
            sub = pdf.iloc[idx]
            canvas = np.zeros((512, 512, 4), dtype=np.uint8)
            compression = sub.iloc[0]["compression"]
            for _, r in sub.iterrows():
                img = png_decode(decompress(bytes(r["tile"]), r["compression"]))
                if img.shape[0] != 256 or img.shape[1] != 256:
                    raise ValueError(
                        "dem_tile_resize 512: source tiles must be 256px, "
                        f"got {img.shape[1]}x{img.shape[0]}"
                    )
                if img.shape[2] == 3:
                    img = np.concatenate(
                        [img, np.full((256, 256, 1), 255, np.uint8)], axis=2
                    )
                dx, dy = int(r["x"]) & 1, int(r["y"]) & 1
                canvas[dy * 256 : (dy + 1) * 256, dx * 256 : (dx + 1) * 256] = img
            blob = compress(png_encode(canvas), compression)
            rows.append((int(pz), int(px), int(py), "png", compression, blob, 0))
        return pd.DataFrame(
            rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
        )

    # The reference validates source_max >= 1 against pyramid metadata at
    # build time (tile_resize.rs:88-92); here z=0 source tiles simply have
    # no parent in the 512px scheme and are filtered out declaratively —
    # no extra validation job over the data.
    keyed = (
        tiles.where(F.col("z") >= 1)
        .withColumn("pz", F.col("z") - 1)
        .withColumn("px", F.shiftright("x", 1))
        .withColumn("py", F.shiftright("y", 1))
    )
    return grouped_tile_map(keyed, body, TILE_SCHEMA, key_cols=("pz", "px", "py"))


def parse_quality_schedule(spec: str) -> tuple[int, list[tuple[int, int]]]:
    """Parse the reference's zoom-dependent quality syntax
    (raster_format.rs:16-18): "70,14:50,15:20" -> default 70, then quality
    50 from z14 up, 20 from z15 up. Returns (default, [(zoom, q), ...])."""
    parts = [p.strip() for p in str(spec).split(",") if p.strip()]
    default = 85
    sched: list[tuple[int, int]] = []
    for i, p in enumerate(parts):
        if ":" in p:
            z, q = p.split(":", 1)
            sched.append((int(z), int(q)))
        elif i == 0:
            default = int(p)
        else:
            raise ValueError(f"bad quality spec segment {p!r}")
    sched.sort()
    return default, sched


def _quality_for(z: int, default: int, sched: list[tuple[int, int]]) -> int:
    q = default
    for zz, qq in sched:
        if z >= zz:
            q = qq
    return q


def raster_image_format(
    tiles: DataFrame,
    fmt: str = "png",
    quality: str | int = 85,
    quality_translucent: str | int | None = None,
) -> DataFrame:
    """Convert the raster IMAGE format (raster_format.rs): png <-> jpg with
    the reference's zoom-dependent quality syntax. Translucent tiles use
    ``quality_translucent`` when set (raster_format.rs:19-22); JPG drops
    alpha, so translucent tiles converted to JPG are flattened onto white
    first."""
    from versatiles_rs_spark.functions.raster import (
        image_decode,
        image_encode,
        is_opaque,
    )

    if fmt not in ("png", "jpg", "webp", "avif"):
        raise ValueError(f"raster_image_format: unsupported format {fmt!r}")
    q_def, q_sched = parse_quality_schedule(str(quality))
    if quality_translucent is not None:
        qt_def, qt_sched = parse_quality_schedule(str(quality_translucent))
    else:
        qt_def, qt_sched = q_def, q_sched

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                z = int(r["z"])
                raw = decompress(bytes(r["tile"]), r["compression"])
                img = image_decode(raw, r["format"])
                opaque = is_opaque(img)
                q = _quality_for(z, q_def, q_sched) if opaque else _quality_for(z, qt_def, qt_sched)
                if fmt == "jpg" and img.shape[2] == 4:
                    img = flatten_onto(img, (255, 255, 255))
                blob = compress(image_encode(img, fmt, quality=q), r["compression"])
                rows.append((z, int(r["x"]), int(r["y"]), fmt, r["compression"], blob,
                             int(r["n_features"])))
            yield pd.DataFrame(
                rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
            )

    return tiles.mapInPandas(run, schema=TILE_SCHEMA)


def raster_overscale(tiles: DataFrame, levels_up: int = 1) -> DataFrame:
    """Serve z+Δ from zoom z: crop the parent's pixel sub-region and upscale
    (raster_overscale.rs:49-111 find/extract). Implemented as Δ chained
    splits — each is the crop+x2-upscale for all 4 children."""
    out = tiles
    for _ in range(levels_up):
        out = raster_tile_split(out)
    return out


def dem_quantize(tiles: DataFrame, elevation_error: float = 1.0, schema: str = "terrarium") -> DataFrame:
    """Quantize DEM tiles: snap elevations to a power-of-2 step derived from
    the allowed error (dem_quantize.rs:45 compute_quantizer, :87
    quantize_pixel round-to-nearest) — improves compression."""
    step = max(1.0, 2.0 ** np.ceil(np.log2(max(elevation_error, 1e-9))))

    def fn(img, *_):
        elev = dem_decode(img[:, :, :3], schema)
        q = np.round(elev / step) * step
        return dem_encode(q, schema)

    return _map_tiles(tiles, fn)
