"""PII scrubbing for web text — emails, phone numbers, IPv4s, credit-card
numbers replaced by typed placeholder tokens before training.

Same architecture as :mod:`versatiles_rs_spark.pages.html_text`: one rule
list, applied as ``regexp_replace`` Columns JVM-side and emitted verbatim
as DuckDB SQL by ``scrub_pii_sql`` — the oracle verifies the rules
cross-engine instead of trusting a second hand-written copy. Patterns use
the Java-regex/RE2 shared subset (no backreferences, no lookaround), so
boundaries are anchored with explicit non-character classes rather than
lookbehind.

Rule order is significant and fixed: credit cards before phones (both are
digit runs — the longer, more specific pattern must win), emails before
IPv4 (an email's host part may embed a dotted quad).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) — Java regex and RE2 shared subset.
PII_RULES: list[tuple[str, str]] = [
    # email: local part (incl. dots/plus) @ dotted host
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # credit card: 13-19 digits in groups of 4/4/4/1-7 with optional -/space
    (r"\b[0-9]{4}([ -]?[0-9]{4}){2}[ -]?[0-9]{1,7}\b", "<CARD>"),
    # international/US phone: optional +cc, 7-14 digits with separators
    (r"(\+[0-9]{1,3}[ -]?)?(\([0-9]{2,4}\)[ -]?)?\b[0-9]{3,4}[ -][0-9]{3,4}([ -][0-9]{3,4})?\b", "<PHONE>"),
    # IPv4 dotted quad
    (r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]


def scrub_pii(text: Column) -> Column:
    """Apply the PII rule chain as JVM-side Columns (codegen)."""
    t = text
    for pat, rep in PII_RULES:
        t = F.regexp_replace(t, pat, rep)
    return t


def scrub_pii_sql(expr: str) -> str:
    """The identical rule chain as a DuckDB SQL expression."""
    t = expr
    for pat, rep in PII_RULES:
        t = f"regexp_replace({t}, '{pat}', '{rep}', 'g')"
    return t


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind hit counts (for audit dashboards): count of each
    placeholder after scrubbing — pure Column math."""
    scrubbed = scrub_pii(text)
    out = {}
    for token in ("<EMAIL>", "<CARD>", "<PHONE>", "<IP>"):
        name = token.strip("<>").lower()
        out[f"n_{name}"] = (
            (F.length(scrubbed) - F.length(F.replace(scrubbed, F.lit(token), F.lit(""))))
            / len(token)
        ).cast("bigint")
    return out
