"""Mosaic assembly: many overlapping containers -> one composited set.

The reference's `versatiles mosaic assemble` (mosaic_tools/assemble/
mod.rs) streams N sources and composites translucent tiles onto the
opaque base, with two crucial shortcuts this port keeps:

- **opaque short-circuit**: a coordinate whose topmost contribution is
  opaque needs NO compositing below it — and if that opaque tile is the
  only contribution kept, its blob is forwarded BYTE-UNTOUCHED (the
  §4.1 "recompression avoidance" rewrite: no decode, no re-encode).
- **cheap opacity classification**: a PNG whose IHDR color type lacks an
  alpha channel (0/2/3 without tRNS) is opaque from its header bytes —
  no pixel decode; only RGBA (6) / gray-alpha (4) tiles decode to check
  their alpha plane.

The reference's two-pass batching exists to bound single-node memory;
under Spark the same semantic is one groupBy on the coordinate key — the
shuffle machinery does the batching, AQE the memory safety.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from versatiles_rs_spark.functions.compression import compress, decompress
from versatiles_rs_spark.functions.raster import overlay, png_decode, png_encode
from versatiles_rs_spark.operators.convert import TILE_SCHEMA, grouped_tile_map


def _rgba(img):
    """Promote RGB to RGBA (alpha 255) — overlay composites in RGBA."""
    import numpy as np

    if img.shape[2] >= 4:
        return img
    a = np.full((*img.shape[:2], 1), 255, dtype=img.dtype)
    return np.concatenate([img[:, :, :3], a], axis=2)


def _png_has_trns(blob: bytes) -> bool:
    """Bounded chunk walk: tRNS must precede IDAT (PNG §5.6 ordering), so
    the walk stops at the first IDAT/IEND — no fixed-window substring
    search that a >2KB ancillary prefix could defeat, and no false hit on
    b'tRNS' appearing inside compressed pixel data."""
    pos, n = 8, len(blob)
    while pos + 8 <= n:
        length = int.from_bytes(blob[pos : pos + 4], "big")
        ctype = blob[pos + 4 : pos + 8]
        if ctype == b"tRNS":
            return True
        if ctype in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


def png_is_opaque(blob: bytes) -> bool:
    """Opacity from the cheapest available evidence: IHDR color type
    (byte 25) for alpha-less types; a full alpha-plane check only for
    types that carry alpha."""
    if blob[:8] != b"\x89PNG\r\n\x1a\n" or len(blob) < 26:
        return False
    color_type = blob[25]
    if color_type in (0, 2, 3):  # alpha only via a tRNS chunk
        return not _png_has_trns(blob)
    img = png_decode(blob)
    return img.shape[2] < 4 or bool((img[:, :, 3] == 255).all())


def tile_is_opaque(raw: bytes, fmt: str) -> bool:
    """Format-aware opacity: JPEG has no alpha channel at all, so any
    jpg contribution terminates the stack; PNG uses the header/tRNS walk;
    unknown formats (webp/avif without a decoder) are conservatively
    treated as translucent so nothing beneath them is dropped."""
    if fmt == "jpg":
        return True
    if fmt == "png":
        return png_is_opaque(raw)
    return False


def mosaic_assemble_tiles(sources: list[DataFrame], compression: str = "none") -> DataFrame:
    """Tile-table form of mosaic assemble: sources ordered top-first."""
    ranked = []
    for i, s in enumerate(sources):
        fmt = F.col("format") if "format" in s.columns else F.lit("png")
        ranked.append(
            s.select(
                "z", "x", "y", "compression", "tile", fmt.alias("format")
            ).withColumn("src_rank", F.lit(i))
        )
    u = ranked[0]
    for r in ranked[1:]:
        u = u.unionByName(r)

    def body(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (z, x, y), idx in pdf.groupby(["z", "x", "y"], sort=False).indices.items():
            sub = pdf.iloc[idx].sort_values("src_rank", kind="stable")
            # keep contributions top-down until (and including) the first
            # opaque one; everything beneath is invisible
            kept: list[tuple[bytes, str, str]] = []
            for _, r in sub.iterrows():
                raw = decompress(bytes(r["tile"]), r["compression"])
                kept.append((raw, r["compression"], r["format"]))
                if tile_is_opaque(raw, r["format"]):
                    break
            if len(kept) == 1:
                # opaque top (or single source): forward bytes untouched,
                # format propagated from the source row
                raw, codec, fmt = kept[0]
                blob = raw if compression == codec == "none" else compress(raw, compression)
                rows.append((int(z), int(x), int(y), fmt, compression, blob, 0))
                continue
            bad = sorted({fmt for _, _, fmt in kept if fmt != "png"})
            if bad:
                raise ValueError(
                    f"mosaic: tile {z}/{x}/{y} needs compositing but has "
                    f"non-png contributions {bad}; only png stacks can be "
                    "alpha-composited on this host"
                )
            img = None
            for raw, _, _ in reversed(kept):  # bottom-up overlay
                cur = _rgba(png_decode(raw))
                img = cur if img is None else overlay(img, cur)
            rows.append(
                (int(z), int(x), int(y), "png", compression,
                 compress(png_encode(img), compression), 0)
            )
        return pd.DataFrame(
            rows, columns=["z", "x", "y", "format", "compression", "tile", "n_features"]
        )

    return grouped_tile_map(u, body, TILE_SCHEMA)


def mosaic_assemble(
    spark: SparkSession, inputs: list[str], output: str, compression: str = "none"
) -> dict:
    """Container-level mosaic: N input container paths (top priority
    first) -> one assembled output container."""
    from versatiles_rs_spark.sources import read_container, write_container

    if len(inputs) < 2:
        raise ValueError("mosaic needs at least two input containers")
    tiles = mosaic_assemble_tiles([read_container(spark, p) for p in inputs], compression)
    return write_container(tiles, output)
