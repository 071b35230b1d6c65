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
    # the leading '*' marks the Project as inside a WholeStageCodegen span
    assert plan.lstrip().startswith("*(")
