"""TileJSON-3.0 dataset metadata (versatiles_core/src/types/tilejson/lib.rs).

In the reference this travels in container headers; here it is the tile
table's sidecar metadata (Iceberg table-properties equivalent). Implements
the reference's union-merge semantics (lib.rs:357-381: union bounds, widen
zoom range, merge vector_layers) and the meta_update operator
(operations/general/meta_update.rs field overrides).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class TileJson:
    tilejson: str = "3.0.0"
    name: str | None = None
    bounds: list[float] | None = None  # [w, s, e, n]
    center: list[float] | None = None  # [lon, lat, zoom]
    minzoom: int | None = None
    maxzoom: int | None = None
    vector_layers: list[dict] = field(default_factory=list)
    extra: dict = field(default_factory=dict)

    def merge(self, other: "TileJson") -> "TileJson":
        """Union semantics (tilejson/lib.rs:357): widen bounds and zooms,
        union vector_layers by id (other's fields win per layer)."""
        out = TileJson(name=self.name or other.name)
        bs = [b for b in (self.bounds, other.bounds) if b]
        if bs:
            out.bounds = [
                min(b[0] for b in bs), min(b[1] for b in bs),
                max(b[2] for b in bs), max(b[3] for b in bs),
            ]
        zmins = [z for z in (self.minzoom, other.minzoom) if z is not None]
        zmaxs = [z for z in (self.maxzoom, other.maxzoom) if z is not None]
        out.minzoom = min(zmins) if zmins else None
        out.maxzoom = max(zmaxs) if zmaxs else None
        layers = {layer["id"]: dict(layer) for layer in self.vector_layers}
        for layer in other.vector_layers:
            if layer["id"] in layers:
                merged = layers[layer["id"]]
                merged.update({k: v for k, v in layer.items() if k != "fields"})
                merged.setdefault("fields", {}).update(layer.get("fields", {}))
            else:
                layers[layer["id"]] = dict(layer)
        out.vector_layers = [layers[k] for k in sorted(layers)]
        out.extra = {**self.extra, **other.extra}
        out.center = other.center or self.center
        return out

    def update(self, **overrides) -> "TileJson":
        """meta_update: explicit field overrides."""
        out = TileJson(**{**self.__dict__})
        for k, v in overrides.items():
            if hasattr(out, k):
                setattr(out, k, v)
            else:
                out.extra[k] = v
        return out

    def to_json(self) -> str:
        d = {k: v for k, v in self.__dict__.items() if k != "extra" and v not in (None, [])}
        d.update(self.extra)
        return json.dumps(d, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "TileJson":
        d = json.loads(s)
        known = {f for f in cls.__dataclass_fields__ if f != "extra"}  # noqa: B009
        kw = {k: d.pop(k) for k in list(d) if k in known}
        return cls(**kw, extra=d)

    @classmethod
    def from_tiles(cls, tiles, name: str = "tiles", layer: str | None = None) -> "TileJson":
        """Infer metadata from a tiles DataFrame: zoom range + bounds from
        the coordinate extent at maxzoom (the pyramid-stats aggregation)."""
        from pyspark.sql import functions as F

        from versatiles_rs_spark.tile_math.coords import tile_geo_bbox_np

        import numpy as np

        zr = tiles.agg(F.min("z"), F.max("z")).collect()[0]
        mz = int(zr[1])
        ext = tiles.filter(F.col("z") == mz).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        w, s, _, _ = (a[0] for a in tile_geo_bbox_np(mz, np.array([ext[0]]), np.array([ext[3]])))
        _, _, e, n = (a[0] for a in tile_geo_bbox_np(mz, np.array([ext[1]]), np.array([ext[2]])))
        vl = [{"id": layer, "fields": {}}] if layer else []
        return cls(
            name=name,
            bounds=[float(w), float(s), float(e), float(n)],
            minzoom=int(zr[0]),
            maxzoom=mz,
            vector_layers=vl,
        )


def from_tilejson(spark, path: str, min_zoom: int | None = None, max_zoom: int | None = None):
    """from_tilejson.rs analog: read a TileJSON document from ``path`` and
    resolve its ``tiles`` URL template ({z}/{x}/{y}).

    - file:// / plain-path templates load every matching tile in parallel
      via the binaryFile source (glob + path regex).
    - http(s):// templates fetch the pyramid declared by the TileJSON's
      minzoom/maxzoom/bounds over HTTP, distributed, with the reference's
      retry semantics (``_from_tilejson_http``; from_tilejson.rs:35-45).
    """
    import json as _json
    import os
    import re

    from pyspark.sql import functions as F

    with open(path) as f:
        tj = _json.loads(f.read())
    tiles_tpl = (tj.get("tiles") or [None])[0]
    if not tiles_tpl:
        raise ValueError(f"TileJSON at {path} has no 'tiles' template")
    if tiles_tpl.startswith(("http://", "https://")):
        return _from_tilejson_http(spark, tj, tiles_tpl, min_zoom, max_zoom)
    tpl = tiles_tpl[len("file://"):] if tiles_tpl.startswith("file://") else tiles_tpl
    if not os.path.isabs(tpl):
        tpl = os.path.join(os.path.dirname(os.path.abspath(path)), tpl)
    m = re.match(r"^(.*)\{z\}(.*)\{x\}(.*)\{y\}(\.\w+)$", tpl)
    if m is None:
        raise ValueError(f"unsupported tiles template {tiles_tpl!r} (need .../{{z}}/{{x}}/{{y}}.ext)")
    ext = m.group(4).lstrip(".")
    glob = f"{m.group(1)}*{m.group(2)}*{m.group(3)}*{m.group(4)}"
    rx = (
        re.escape(m.group(1)) + r"(\d+)" + re.escape(m.group(2)) + r"(\d+)"
        + re.escape(m.group(3)) + r"(\d+)" + re.escape(m.group(4)) + "$"
    )
    fmt = {"pbf": "mvt"}.get(ext, ext)
    codec = "gzip" if fmt == "mvt" else "none"
    df = spark.read.format("binaryFile").load(glob)
    out = df.select(
        F.regexp_extract("path", rx, 1).cast("int").alias("z"),
        F.regexp_extract("path", rx, 2).cast("bigint").alias("x"),
        F.regexp_extract("path", rx, 3).cast("bigint").alias("y"),
        F.lit(fmt).alias("format"),
        F.lit(codec).alias("compression"),
        F.col("content").alias("tile"),
        F.lit(0).cast("bigint").alias("n_features"),
    )
    zmin = min_zoom if min_zoom is not None else tj.get("minzoom")
    zmax = max_zoom if max_zoom is not None else tj.get("maxzoom")
    if zmin is not None:
        out = out.filter(F.col("z") >= int(zmin))
    if zmax is not None:
        out = out.filter(F.col("z") <= int(zmax))
    return out


def _from_tilejson_http(spark, tj: dict, tiles_tpl: str, min_zoom, max_zoom, http_partitions: int = 8):
    """HTTP(S) tile template fetch — the reference's from_tilejson proper
    (from_tilejson.rs:35-45,71-72): enumerate the pyramid declared by the
    TileJSON's minzoom/maxzoom/bounds, fetch each tile distributed with
    ``max_retries=3`` and exponential backoff, skip 404s (sparse
    tilesets). Concurrency is bounded by ``http_partitions`` Spark tasks —
    the max_concurrent_requests analog."""
    import math
    import time as _time
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType, IntegerType, LongType, StringType, StructField, StructType,
    )

    zmin = int(min_zoom if min_zoom is not None else tj.get("minzoom", 0))
    zmax = int(max_zoom if max_zoom is not None else tj.get("maxzoom", zmin))
    bounds = tj.get("bounds", [-180.0, -85.05112878, 180.0, 85.05112878])
    ext = tiles_tpl.rsplit(".", 1)[-1] if "." in tiles_tpl.rsplit("/", 1)[-1] else "png"
    fmt = {"pbf": "mvt"}.get(ext, ext)
    codec = "gzip" if fmt == "mvt" else "none"

    def _tx(lon, z):
        return min(max(int(2**z * (lon / 360.0 + 0.5)), 0), 2**z - 1)

    def _ty(lat, z):
        lat = max(min(lat, 85.05112878), -85.05112878)
        f = 0.5 - 0.5 * math.log(math.tan(lat * math.pi / 360.0 + math.pi / 4.0)) / math.pi
        return min(max(int(2**z * f), 0), 2**z - 1)

    coords = None
    for z in range(zmin, zmax + 1):
        x0, x1 = _tx(bounds[0], z), _tx(bounds[2], z)
        # y axis flips: north (bounds[3]) is the smaller tile row
        y0, y1 = _ty(bounds[3], z), _ty(bounds[1], z)
        layer = spark.range(x0, x1 + 1).select(
            F.lit(z).alias("z"),
            F.col("id").alias("x"),
            F.explode(F.sequence(F.lit(y0), F.lit(y1))).alias("y"),
        )
        coords = layer if coords is None else coords.unionByName(layer)

    out_schema = StructType(
        [
            StructField("z", IntegerType()),
            StructField("x", LongType()),
            StructField("y", LongType()),
            StructField("format", StringType()),
            StructField("compression", StringType()),
            StructField("tile", BinaryType()),
            StructField("n_features", LongType()),
        ]
    )

    def fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import urllib.error
        import urllib.request

        for pdf in it:
            rows = []
            for z, x, y in zip(pdf["z"], pdf["x"], pdf["y"]):
                url = (
                    tiles_tpl.replace("{z}", str(int(z)))
                    .replace("{x}", str(int(x)))
                    .replace("{y}", str(int(y)))
                )
                for attempt in range(4):  # 1 try + max_retries=3
                    try:
                        with urllib.request.urlopen(url, timeout=10) as r:
                            blob = r.read()
                        rows.append((int(z), int(x), int(y), fmt, codec, blob, 0))
                        break
                    except urllib.error.HTTPError as e:
                        if e.code == 404:
                            break  # sparse tileset: missing tile, not an error
                        if attempt == 3:
                            raise
                        _time.sleep(0.05 * (attempt + 1))
                    except urllib.error.URLError:
                        if attempt == 3:
                            raise
                        _time.sleep(0.05 * (attempt + 1))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["z", "x", "y", "format", "compression", "tile", "n_features"],
                )

    return coords.repartition(http_partitions).mapInPandas(fetch, out_schema)
