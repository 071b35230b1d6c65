"""GeoJSON FeatureCollection IO (ext/geojson_io.rs analog): load polygon
features into spatial.Polygon objects for the PIP/mask operators."""

from __future__ import annotations

import json

from versatiles_rs_spark.spatial.pip import Polygon


def load_polygons_geojson(path_or_text: str) -> list[Polygon]:
    """Parse a GeoJSON FeatureCollection (file path or raw text) into
    Polygon objects; MultiPolygons flatten to one Polygon per part with the
    same feature id (even-odd holes preserved as extra rings)."""
    if path_or_text.lstrip().startswith("{"):
        data = json.loads(path_or_text)
    else:
        with open(path_or_text) as f:
            data = json.load(f)
    out: list[Polygon] = []
    for feat in data.get("features", []):
        geom = feat.get("geometry") or {}
        props = feat.get("properties") or {}
        fid = int(feat.get("id", len(out) + 1))
        name = str(props.get("name", f"feature_{fid}"))
        kind = str(props.get("kind", ""))
        t = geom.get("type")
        c = geom.get("coordinates")
        if t == "Polygon":
            rings = [[(float(p[0]), float(p[1])) for p in ring] for ring in c]
            out.append(Polygon(fid, name, kind, rings))
        elif t == "MultiPolygon":
            for part in c:
                rings = [[(float(p[0]), float(p[1])) for p in ring] for ring in part]
                out.append(Polygon(fid, name, kind, rings))
    return out
