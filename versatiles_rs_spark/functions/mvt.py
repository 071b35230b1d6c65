"""Deterministic Mapbox Vector Tile (MVT) codec — pure Python, zero deps.

Logical model mirrors the reference (versatiles_geometry/src/vector_tile/):
``VectorTile { layers }``, ``VectorTileLayer {name, features, extent=4096,
version=2}`` with dictionary-encoded properties (layer.rs:41,
property_manager.rs:80-105), geometry as command-encoded integers in
tile-local [0, 4096] space (feature_import/mod.rs:78 TILE_EXTENT=4096).

Determinism contract (the reference gets it from BTreeMap ordering,
geo/value.rs:20-22 + properties.rs:18): we sort layers by name, features by
(id, then encoded geometry) and property keys lexicographically, so encoding
the same logical tile always yields identical bytes — required for the
convert_integrity-style golden tests (versatiles/tests/convert_integrity.rs).

This codec runs *inside* applyInPandas batches: Spark groups rows into tiles,
Python encodes one tile per group. The per-feature loop is bounded by tile
feature counts (post point-reduction), not table size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

TILE_EXTENT = 4096

# protobuf wire types
_VARINT = 0
_LEN = 2

GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3

CMD_MOVE_TO = 1
CMD_LINE_TO = 2
CMD_CLOSE_PATH = 7


# ---------------------------------------------------------------------------
# low-level protobuf writers
# ---------------------------------------------------------------------------

def _varint_slow(v: int) -> bytes:
    out = bytearray()
    v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# ~all varints in tile encoding are small (tags, lengths, zigzagged deltas
# within the 4096 grid); a precomputed table removes the hot-loop cost
_VARINT_CACHE = [_varint_slow(i) for i in range(1 << 14)]


def _varint(v: int) -> bytes:
    if 0 <= v < (1 << 14):
        return _VARINT_CACHE[v]
    return _varint_slow(v)


def _tag(fieldno: int, wire: int) -> bytes:
    return _varint((fieldno << 3) | wire)


def _len_field(fieldno: int, payload: bytes) -> bytes:
    return _tag(fieldno, _LEN) + _varint(len(payload)) + payload


def _varint_field(fieldno: int, v: int) -> bytes:
    return _tag(fieldno, _VARINT) + _varint(v)


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


# ---------------------------------------------------------------------------
# logical model
# ---------------------------------------------------------------------------

@dataclass
class MvtFeature:
    geom_type: int  # GEOM_POINT / GEOM_LINESTRING / GEOM_POLYGON
    # rings: list of list of (x, y) integer grid coords in [0, TILE_EXTENT]
    rings: list[list[tuple[int, int]]]
    props: dict[str, object] = field(default_factory=dict)
    fid: int | None = None


def encode_geometry(geom_type: int, rings: list[list[tuple[int, int]]]) -> list[int]:
    """Command-encode geometry (MVT spec §4.3); cursor persists across rings."""
    cmds: list[int] = []
    cx = cy = 0
    for ring in rings:
        if not ring:
            continue
        x0, y0 = ring[0]
        cmds.append((CMD_MOVE_TO & 0x7) | (1 << 3))
        cmds.append(zigzag(x0 - cx))
        cmds.append(zigzag(y0 - cy))
        cx, cy = x0, y0
        rest = ring[1:]
        if geom_type == GEOM_POLYGON and len(rest) >= 1 and rest and ring[-1] == ring[0]:
            rest = rest[:-1]  # closing vertex is implicit via ClosePath
        if geom_type in (GEOM_LINESTRING, GEOM_POLYGON) and rest:
            cmds.append((CMD_LINE_TO & 0x7) | (len(rest) << 3))
            for x, y in rest:
                cmds.append(zigzag(x - cx))
                cmds.append(zigzag(y - cy))
                cx, cy = x, y
        if geom_type == GEOM_POLYGON:
            cmds.append((CMD_CLOSE_PATH & 0x7) | (1 << 3))
    return cmds


def _encode_geometry_bytes(geom_type: int, rings: list[list[tuple[int, int]]]) -> bytes:
    """``b"".join(_varint(g) for g in encode_geometry(...))`` fused into one
    bytearray pass — identical bytes (the round-6 hot-path twin; zigzag of
    grid deltas is just ``2v`` for v >= 0 and ``-2v-1`` otherwise, and the
    varint cache covers every value the 4096 grid can produce)."""
    out = bytearray()
    vc = _VARINT_CACHE
    cx = cy = 0
    is_poly = geom_type == GEOM_POLYGON
    is_line = geom_type == GEOM_LINESTRING
    for ring in rings:
        if not ring:
            continue
        x0, y0 = ring[0]
        dx, dy = x0 - cx, y0 - cy
        zx = (dx << 1) if dx >= 0 else ((-dx << 1) - 1)
        zy = (dy << 1) if dy >= 0 else ((-dy << 1) - 1)
        out += b"\x09"  # MoveTo count=1: (1 << 3) | 1 = 9
        out += vc[zx] if zx < 16384 else _varint_slow(zx)
        out += vc[zy] if zy < 16384 else _varint_slow(zy)
        cx, cy = x0, y0
        rest = ring[1:]
        if is_poly and rest and ring[-1] == ring[0]:
            rest = rest[:-1]
        if (is_line or is_poly) and rest:
            n = len(rest)
            cmd = (CMD_LINE_TO & 0x7) | (n << 3)
            out += vc[cmd] if cmd < 16384 else _varint_slow(cmd)
            for x, y in rest:
                dx, dy = x - cx, y - cy
                zx = (dx << 1) if dx >= 0 else ((-dx << 1) - 1)
                zy = (dy << 1) if dy >= 0 else ((-dy << 1) - 1)
                out += vc[zx] if zx < 16384 else _varint_slow(zx)
                out += vc[zy] if zy < 16384 else _varint_slow(zy)
                cx, cy = x, y
        if is_poly:
            out += b"\x0f"  # ClosePath count=1: (1 << 3) | 7 = 15
    return bytes(out)


def _encode_value(v: object) -> bytes:
    if isinstance(v, bool):
        return _varint_field(7, int(v))
    if isinstance(v, int):
        if v >= 0:
            return _varint_field(4, v)
        return _varint_field(6, zigzag(v))
    if isinstance(v, float):
        import struct

        return _tag(3, 1) + struct.pack("<d", v)
    if isinstance(v, bytes):
        return _len_field(1, v)
    return _len_field(1, str(v).encode("utf-8"))


def encode_layer(name: str, features: list[MvtFeature], extent: int = TILE_EXTENT) -> bytes:
    """Encode one layer with deterministic dictionary encoding."""
    feats = sorted(
        features,
        key=lambda f: (f.fid if f.fid is not None else 1 << 62, f.geom_type, f.rings),
    )
    keys: list[str] = []
    key_idx: dict[str, int] = {}
    values: list[bytes] = []
    val_idx: dict[bytes, int] = {}
    feat_bufs: list[bytes] = []
    for f in feats:
        tags: list[int] = []
        for k in sorted(f.props):
            v = f.props[k]
            if v is None:
                continue
            if k not in key_idx:
                key_idx[k] = len(keys)
                keys.append(k)
            vb = _encode_value(v)
            if vb not in val_idx:
                val_idx[vb] = len(values)
                values.append(vb)
            tags.extend((key_idx[k], val_idx[vb]))
        buf = bytearray()
        if f.fid is not None:
            buf += _varint_field(1, f.fid)
        if tags:
            packed = b"".join(_varint(t) for t in tags)
            buf += _len_field(2, packed)
        buf += _varint_field(3, f.geom_type)
        buf += _len_field(4, _encode_geometry_bytes(f.geom_type, f.rings))
        feat_bufs.append(bytes(buf))

    layer = bytearray()
    layer += _varint_field(15, 2)  # version=2
    layer += _len_field(1, name.encode("utf-8"))
    for fb in feat_bufs:
        layer += _len_field(2, fb)
    for k in keys:
        layer += _len_field(3, k.encode("utf-8"))
    for vb in values:
        layer += _len_field(4, vb)
    layer += _varint_field(5, extent)
    return bytes(layer)


def encode_tile(layers: dict[str, list[MvtFeature]], extent: int = TILE_EXTENT) -> bytes:
    """Encode a full MVT blob; layers sorted by name for determinism."""
    return b"".join(_len_field(3, encode_layer(n, layers[n], extent)) for n in sorted(layers))


# ---------------------------------------------------------------------------
# decoder (for tests + downstream transforms like vector_filter_layers)
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    out = 0
    while True:
        b = buf[i]
        out |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return out, i
        shift += 7


def _iter_fields(buf: bytes):
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fieldno, wire = key >> 3, key & 0x7
        if wire == _VARINT:
            v, i = _read_varint(buf, i)
            yield fieldno, v
        elif wire == _LEN:
            ln, i = _read_varint(buf, i)
            yield fieldno, buf[i : i + ln]
            i += ln
        elif wire == 1:  # 64-bit
            yield fieldno, buf[i : i + 8]
            i += 8
        elif wire == 5:  # 32-bit
            yield fieldno, buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


def _decode_value(buf: bytes) -> object:
    import struct

    for fno, v in _iter_fields(buf):
        if fno == 1:
            return v.decode("utf-8")
        if fno == 2:
            return struct.unpack("<f", v)[0]
        if fno == 3:
            return struct.unpack("<d", v)[0]
        if fno == 4:
            return v
        if fno == 5:
            return v
        if fno == 6:
            return unzigzag(v)
        if fno == 7:
            return bool(v)
    return None


def decode_geometry(cmds: list[int]) -> tuple[int | None, list[list[tuple[int, int]]]]:
    """Decode command stream into rings (geometry type inferred by caller)."""
    rings: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i] & 0x7
        count = cmds[i] >> 3
        i += 1
        if cmd == CMD_MOVE_TO:
            for _ in range(count):
                cx += unzigzag(cmds[i])
                cy += unzigzag(cmds[i + 1])
                i += 2
                if cur:
                    rings.append(cur)
                cur = [(cx, cy)]
        elif cmd == CMD_LINE_TO:
            for _ in range(count):
                cx += unzigzag(cmds[i])
                cy += unzigzag(cmds[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd == CMD_CLOSE_PATH:
            if cur:
                cur.append(cur[0])
    if cur:
        rings.append(cur)
    return None, rings


def decode_tile(blob: bytes) -> dict[str, dict]:
    """MVT blob -> {layer_name: {extent, version, features: [MvtFeature]}}."""
    out: dict[str, dict] = {}
    for fno, payload in _iter_fields(blob):
        if fno != 3:
            continue
        name = ""
        version = None
        extent = TILE_EXTENT
        keys: list[str] = []
        values: list[object] = []
        raw_feats: list[bytes] = []
        for lf, lv in _iter_fields(payload):
            if lf == 1:
                name = lv.decode("utf-8")
            elif lf == 2:
                raw_feats.append(lv)
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                values.append(_decode_value(lv))
            elif lf == 5:
                extent = lv
            elif lf == 15:
                version = lv
        feats = []
        for rf in raw_feats:
            fid = None
            gtype = 0
            tags: list[int] = []
            cmds: list[int] = []
            for ff, fv in _iter_fields(rf):
                if ff == 1:
                    fid = fv
                elif ff == 2:
                    j = 0
                    while j < len(fv):
                        t, j = _read_varint(fv, j)
                        tags.append(t)
                elif ff == 3:
                    gtype = fv
                elif ff == 4:
                    j = 0
                    while j < len(fv):
                        c, j = _read_varint(fv, j)
                        cmds.append(c)
            props = {keys[tags[k]]: values[tags[k + 1]] for k in range(0, len(tags), 2)}
            _, rings = decode_geometry(cmds)
            feats.append(MvtFeature(geom_type=gtype, rings=rings, props=props, fid=fid))
        out[name] = {"extent": extent, "version": version, "features": feats}
    return out


# ---------------------------------------------------------------------------
# validation (validator.rs:120 analog)
# ---------------------------------------------------------------------------

# validator parity with versatiles_geometry/src/vector_tile/validator.rs
WINDING_EPSILON = 1e-14  # feature.rs:55


def _ring_area2_signed(ring: list[tuple[float, float]]) -> float:
    """2x signed ring area, trapezoid form (feature.rs:38) — algebraically
    identical to the shoelace used elsewhere; positive = CCW."""
    n = len(ring)
    if n < 3:
        return 0.0
    s = 0.0
    px, py = ring[-1]
    for x, y in ring:
        s += (px - x) * (y + py)
        px, py = x, y
    return s


def _parse_geom_strict(cmds: list[int]) -> list[list[tuple[int, int]]]:
    """Strict command-stream parse (validator.rs MalformedCommandStream
    contract): unknown command ids, zero-count MoveTo/LineTo, ClosePath with
    count != 1, and truncated parameter pairs all raise ValueError."""
    rings: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i] & 0x7
        count = cmds[i] >> 3
        i += 1
        if cmd == CMD_MOVE_TO or cmd == CMD_LINE_TO:
            if count == 0:
                raise ValueError(f"command {cmd} with count 0")
            if i + 2 * count > len(cmds):
                raise ValueError("truncated parameter stream")
            for _ in range(count):
                cx += unzigzag(cmds[i])
                cy += unzigzag(cmds[i + 1])
                i += 2
                if cmd == CMD_MOVE_TO:
                    if cur:
                        rings.append(cur)
                    cur = [(cx, cy)]
                else:
                    if not cur:
                        raise ValueError("LineTo before any MoveTo")
                    cur.append((cx, cy))
        elif cmd == CMD_CLOSE_PATH:
            if count != 1:
                raise ValueError(f"ClosePath with count {count}")
            if not cur:
                raise ValueError("ClosePath before any MoveTo")
            cur.append(cur[0])
        else:
            raise ValueError(f"unknown command id {cmd}")
    if cur:
        rings.append(cur)
    return rings


def _degeneracy_reason(ring: list[tuple[int, int]], is_line: bool = False) -> str | None:
    """validator.rs degeneracy_reason / degeneracy_reason_for_linestring."""
    if is_line:
        if len(ring) < 2:
            return "TooFewVertices"
        if len({(round(x), round(y)) for x, y in ring}) < 2:
            return "SubPixel"
        return None
    n = len(ring) - 1 if len(ring) >= 2 and ring[0] == ring[-1] else len(ring)
    if n < 3:
        return "TooFewVertices"
    pts = ring[:n]
    if len({(round(x), round(y)) for x, y in pts}) < 3:
        return "SubPixel"
    if abs(_ring_area2_signed(pts)) < WINDING_EPSILON:
        return "Collinear"
    return None


def validate_tile(blob: bytes) -> list[str]:
    """Return a list of spec issues (empty == valid). Check-for-check parity
    with versatiles_geometry/src/vector_tile/validator.rs:62-118:

    layer-level — MissingExtent, MissingVersion, DuplicateLayerName;
    feature-level — UnknownGeometryType (type 0 with non-empty geometry),
    MalformedCommandStream, EmptyGeometryForType, OrphanInnerRing (negative-
    area ring before any positive), DegenerateRing(TooFewVertices/SubPixel/
    Collinear). (Unknown, empty) features are the spec's "no geometry" form
    and stay silent, as in the reference."""
    issues: list[str] = []
    seen: set[str] = set()
    for fno, payload in _iter_fields(blob):
        if fno != 3:
            issues.append(f"unexpected top-level field {fno}")
            continue
        name = None
        version = None
        extent = None
        raw_feats: list[bytes] = []
        for lf, lv in _iter_fields(payload):
            if lf == 1:
                name = lv.decode("utf-8")
            elif lf == 2:
                raw_feats.append(lv)
            elif lf == 5:
                extent = lv
            elif lf == 15:
                version = lv
        lname = name or ""
        if not name:
            issues.append("layer with empty name")
        elif name in seen:
            issues.append(f"{lname}: DuplicateLayerName")
        else:
            seen.add(name)
        if version is None:
            issues.append(f"{lname}: MissingVersion")
        if extent is None:
            issues.append(f"{lname}: MissingExtent")

        for fi, rf in enumerate(raw_feats):
            gtype = 0
            cmds: list[int] = []
            for ff, fv in _iter_fields(rf):
                if ff == 3:
                    gtype = fv
                elif ff == 4:
                    j = 0
                    while j < len(fv):
                        c, j = _read_varint(fv, j)
                        cmds.append(c)
            if gtype == 0:
                # (Unknown, empty) is the canonical no-geometry form — silent
                if cmds:
                    issues.append(f"{lname}[{fi}]: UnknownGeometryType")
                continue
            try:
                rings = _parse_geom_strict(cmds)
            except ValueError as e:
                issues.append(f"{lname}[{fi}]: MalformedCommandStream({e})")
                continue
            if all(len(r) == 0 for r in rings) or not rings:
                issues.append(f"{lname}[{fi}]: EmptyGeometryForType({gtype})")
                continue
            if gtype == GEOM_POLYGON:
                saw_outer = False
                for ring in rings:
                    reason = _degeneracy_reason(ring)
                    if reason is not None:
                        issues.append(f"{lname}[{fi}]: DegenerateRing({reason})")
                        continue
                    a2 = _ring_area2_signed(
                        ring[:-1] if len(ring) >= 2 and ring[0] == ring[-1] else ring
                    )
                    if a2 > WINDING_EPSILON:
                        saw_outer = True
                    elif a2 < -WINDING_EPSILON and not saw_outer:
                        issues.append(f"{lname}[{fi}]: OrphanInnerRing")
            elif gtype == GEOM_LINESTRING:
                for ring in rings:
                    reason = _degeneracy_reason(ring, is_line=True)
                    if reason is not None:
                        issues.append(f"{lname}[{fi}]: DegenerateRing({reason})")
    return issues
