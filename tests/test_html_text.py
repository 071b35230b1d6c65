"""Generic HTML->text extraction (pages/html_text.py)."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from versatiles_rs_spark.pages.html_text import html_to_text, html_to_text_sql

CASES = [
    # (html, expected text)
    ("<p>hello world</p>", "hello world"),
    ("<!-- c --><b>a</b><!-- d -->b", "a b"),
    ('<script>var x = "<b>not text</b>";</script>after', "after"),
    ("<style>p { color: red; }</style>body", "body"),
    ("<SCRIPT SRC='x'>s</SCRIPT>ok<STYLE>s</STYLE>", "ok"),
    ("a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end", 'a & b <tag> "q" \'s\' end'),
    ("  lots\t of\n\n space  ", "lots of space"),
    ("<div class='x' data-a=\"1\">nested <span>text</span></div>", "nested text"),
    # double-escaped entity decodes one level; a bare unclosed < is literal
    ("&amp;lt; decodes to &lt; not <", "&lt; decodes to < not <"),
    ("no markup at all", "no markup at all"),
    ("", ""),
]


def test_html_to_text_cases(spark):
    df = spark.createDataFrame(pd.DataFrame({"html": [c[0] for c in CASES]}))
    got = [r["t"] for r in df.select(html_to_text(F.col("html")).alias("t")).collect()]
    assert got == [c[1] for c in CASES]


def test_sql_mirror_matches_spark(spark):
    """The DuckDB chain produced by html_to_text_sql is rule-for-rule the
    same extractor — verified on the corner-case corpus, not just the
    synthetic pages."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c[0],) for c in CASES])
    want = [r[0] for r in con.sql(f"SELECT {html_to_text_sql('html')} FROM t").fetchall()]
    assert want == [c[1] for c in CASES]


def test_extraction_is_codegen_only(spark):
    """The whole chain stays JVM-side: no Python evals in the plan."""
    df = spark.range(10).select(F.concat(F.lit("<p>x"), F.col("id").cast("string"), F.lit("</p>")).alias("html"))
    plan = df.select(html_to_text(F.col("html")).alias("t"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    # one Project over the scan: the numeric-entity interleave uses
    # higher-order expressions (zip_with/transform) which are JVM-
    # interpreted rather than codegen, so the outer Project may fall out
    # of the WholeStageCodegen span — but it must still be a single
    # Project with zero exchanges and zero Python.
    assert "Exchange" not in plan


NUMERIC_CASES = [
    ("A&#65;B", "AAB"),
    ("comma&#44;sep", "comma,sep"),
    ("hex&#x2C;sep", "hex,sep"),
    ("HEX&#X2c;sep", "HEX,sep"),
    ("euro &#8364; and &#x20AC;", "euro € and €"),
    ("emoji &#x1F4A9;", "emoji 💩"),
    ("surrogate &#55296; fffd", "surrogate � fffd"),
    ("zero &#0; fffd", "zero � fffd"),
    ("too big &#1114112; fffd", "too big � fffd"),
    ("unterminated &#65 stays", "unterminated &#65 stays"),
    ("no digits &#; stays", "no digits &#; stays"),
    ("amp-first &amp;#38; decodes-twice", "amp-first & decodes-twice"),
    ("&#72;&#x65;llo", "Hello"),
    ("tail&#33;", "tail!"),
    ("&#60;p&#62; not a tag after strip", "<p> not a tag after strip"),
]


def test_numeric_entities_spark(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"html": [c[0] for c in NUMERIC_CASES]}))
    got = [r["t"] for r in df.select(html_to_text(F.col("html")).alias("t")).collect()]
    assert got == [c[1] for c in NUMERIC_CASES]


def test_numeric_entities_sql_mirror(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(c[0],) for c in NUMERIC_CASES])
    want = [r[0] for r in con.sql(f"SELECT {html_to_text_sql('html')} FROM t").fetchall()]
    assert want == [c[1] for c in NUMERIC_CASES]


def test_numeric_entities_spark_duckdb_fuzz_parity(spark):
    """Character-for-character parity of the two engines on adversarial
    random mixes of entities, partial entities, and multibyte text."""
    import random

    import pandas as pd

    rng = random.Random(7)
    atoms = ["&#", ";", "x", "6", "5", "&#65;", "&#x410;", "a", "é", "𝄞",
             "&amp;", "&#x;", "&#12", "<b>", "</b>", " ", "&#999999;", "&#xD800;"]
    cases = ["".join(rng.choice(atoms) for _ in range(rng.randint(1, 12)))
             for _ in range(200)]
    df = spark.createDataFrame(pd.DataFrame({"html": cases}))
    got = [r["t"] for r in df.select(html_to_text(F.col("html")).alias("t")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INTEGER, html VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(cases)))
    want = [r[0] for r in con.sql(
        f"SELECT {html_to_text_sql('html')} FROM t ORDER BY i").fetchall()]
    assert got == want
