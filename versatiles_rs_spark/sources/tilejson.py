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
