"""Generic HTML -> text extraction as a pure Column expression.

Unlike :mod:`versatiles_rs_spark.pages.extract` (which exploits the
synthetic template for the exact byte-identity invariant), this is the
extractor a real Common-Crawl pipeline runs: strip comments, script and
style blocks, drop tags, decode the core character entities, collapse
whitespace. The whole chain is ``regexp_replace``/``replace`` Columns —
JVM-side, whole-stage-codegen, zero Python — and every rule is written in
the regex subset BOTH Java's engine and DuckDB's RE2 accept (inline
``(?is)`` flags, no backreferences, no lookaround), so the DuckDB oracle
runs the *same* rules.

Rule order matters and is fixed: comments, then script/style (their text
content is not document text), then all remaining tags, then entity
decode (after tag-stripping so ``&lt;`` cannot create a fake tag, with
``&amp;`` last per the HTML spec), then whitespace collapse + trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, replacement) — regex subset shared by Java regex and RE2.
_REGEX_RULES: list[tuple[str, str]] = [
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<[^>]*>", " "),
]

# literal entity decodes; &amp; strictly last
_ENTITY_RULES: list[tuple[str, str]] = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
]

_WS = (r"\s+", " ")


def html_to_text(html: Column) -> Column:
    """HTML string Column -> extracted text Column (pure codegen)."""
    t = html
    for pat, rep in _REGEX_RULES:
        t = F.regexp_replace(t, pat, rep)
    for lit, rep in _ENTITY_RULES:
        t = F.replace(t, F.lit(lit), F.lit(rep))
    t = F.regexp_replace(t, _WS[0], _WS[1])
    return F.trim(t)


def html_to_text_sql(expr: str) -> str:
    """The identical rule chain as a DuckDB SQL expression over ``expr``.

    Used verbatim by the driver oracle so Spark and DuckDB extract with
    one shared rule set rather than two hand-kept copies.
    """
    t = expr
    for pat, rep in _REGEX_RULES:
        t = f"regexp_replace({t}, '{pat}', '{rep}', 'g')"
    for lit, rep in _ENTITY_RULES:
        rep_sql = rep.replace("'", "''")
        t = f"replace({t}, '{lit}', '{rep_sql}')"
    t = f"regexp_replace({t}, '{_WS[0]}', '{_WS[1]}', 'g')"
    return f"trim({t})"
