"""Geohash cell keys — the fourth cell-index family next to XYZ tiles
(tile_math/coords.py), S2 (tile_math/s2.py) and hex binning
(spatial/hexcells.py).

A precision-p geohash is the base32 rendering of 5p bits that alternate
longitude/latitude halvings starting with longitude (public spec,
geohash.org / Niemeyer 2008). Those bits are exactly the binary
expansions of the scaled fractions X = floor((lon+180)/360 * 2^ceil(5p/2))
and Y = floor((lat+90)/180 * 2^floor(5p/2)) interleaved MSB-first — so
the whole key is pure integer arithmetic on quantized micro-degree
coordinates: no float, no loop, no per-row Python.

Cross-engine by construction: the bit extraction is generated as
div/mod arithmetic (bit j of X = (X div 2^j) % 2) in BOTH the Spark
expression and the DuckDB oracle SQL — only the integer-division token
differs between dialects. At 100 TB the key is one codegen Project.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

#: micro-degree domain constants
_LON_SPAN = 360_000_000
_LAT_SPAN = 180_000_000


def _bits_sql(qlon: str, qlat: str, precision: int, div: str) -> str:
    """Integer expression for the 5*precision geohash bits, MSB-first.

    ``qlon``/``qlat``: SQL expressions for micro-degree integers in
    [-180e6, 180e6) / [-90e6, 90e6). ``div``: the dialect's integer
    division token ('div' for Spark SQL, '//' for DuckDB).
    """
    bits = 5 * precision
    lb = (bits + 1) // 2  # lon bits (lon leads)
    kb = bits // 2
    x = f"((({qlon}) + 180000000) * {1 << lb} {div} {_LON_SPAN})"
    y = f"((({qlat}) + 90000000) * {1 << kb} {div} {_LAT_SPAN})"
    terms = []
    for k in range(bits):
        if k % 2 == 0:  # lon bit
            j = lb - 1 - k // 2
            src = x
        else:
            j = kb - 1 - (k - 1) // 2
            src = y
        terms.append(f"(({src} {div} {1 << j}) % 2) * {1 << (bits - 1 - k)}")
    return "(" + " + ".join(terms) + ")"


def _string_sql(bits_expr: str, precision: int, div: str, substr: str) -> str:
    chars = [
        f"{substr}('{BASE32}', CAST((({bits_expr}) {div} {1 << (5 * (precision - 1 - m))}) % 32 AS INT) + 1, 1)"
        for m in range(precision)
    ]
    return "concat(" + ", ".join(chars) + ")"


def geohash_sql(qlon: str, qlat: str, precision: int = 5) -> str:
    """DuckDB expression rendering the precision-p geohash string."""
    return _string_sql(_bits_sql(qlon, qlat, precision, "//"), precision, "//", "substr")


def geohash_col(qlon: str, qlat: str, precision: int = 5) -> Column:
    """Spark Column rendering the precision-p geohash string from
    micro-degree integer columns/expressions (codegen, zero Python)."""
    return F.expr(
        _string_sql(_bits_sql(qlon, qlat, precision, "div"), precision, "div", "substring")
    )
