"""CEL parser/evaluator conformance (functions/cel.py).

The corpus mirrors the reference's vector_filter_features.rs tests
(:294-470) plus the documented examples (:29-37): missing-key -> null,
error-to-false, heterogeneous equality, in/matches/has, props map access,
and build-time failure on malformed expressions.
"""

from __future__ import annotations

import pytest

from versatiles_rs_spark.functions.cel import CelParseError, compile_cel


def test_numeric_comparison():
    p = compile_cel("population >= 1000")
    assert not p({"population": 500})
    assert p({"population": 2000})
    assert p({"population": 1000})


def test_missing_property_is_false():
    # vector_filter_features.rs:355 — missing key -> null; null >= 1000 is
    # an evaluation error -> predicate false
    p = compile_cel("population >= 1000")
    assert not p({"other": "x"})


def test_null_check_keeps_missing():
    # :363 — name == null || name == 'Berlin'
    p = compile_cel("name == null || name == 'Berlin'")
    assert p({"other": "x"})          # name missing -> null == null
    assert p({"name": "Berlin"})
    assert not p({"name": "Paris"})


def test_string_equality_and_props_map():
    p = compile_cel("props['addr:street'] == 'Hauptstr.'")
    assert p({"addr:street": "Hauptstr."})
    assert not p({"addr:street": "Nebenstr."})
    assert not p({"other": "x"})      # missing key -> error -> false


def test_key_in_props():
    # :380 — 'key' in props checks presence
    p = compile_cel("'addr:street' in props")
    assert p({"addr:street": "Hauptstr."})
    assert not p({"other": "x"})


def test_has_on_props():
    # :395 — has(props.name)
    p = compile_cel("has(props.name)")
    assert p({"name": "Berlin"})
    assert not p({"other": "x"})


def test_in_list():
    # :420 — highway in ['primary','secondary']
    p = compile_cel("highway in ['primary','secondary']")
    assert p({"highway": "primary"})
    assert p({"highway": "secondary"})
    assert not p({"highway": "residential"})
    assert not p({})                  # null in list -> no member equals null


def test_matches_partial():
    # :437 — name.matches('^St\\.') is a partial (search) match
    p = compile_cel(r"name.matches('^St\.')")
    assert p({"name": "St. Mary"})
    assert p({"name": "St. Gallen"})
    assert not p({"name": "Berlin"})
    mid = compile_cel(r"name.matches('ar')")
    assert mid({"name": "St. Mary"})  # unanchored -> partial match


def test_not_and_parens():
    p = compile_cel("!(name == 'x') && population > 1")
    assert p({"name": "y", "population": 2})
    assert not p({"name": "x", "population": 2})


def test_error_absorption_commutative_logic():
    # true || error -> true; false && error -> false
    assert compile_cel("name == 'a' || population > 1")({"name": "a"})
    assert not compile_cel("name == 'zzz' && population > 1")({"name": "x"})
    # error || false -> error -> false at root
    assert not compile_cel("population > 1 || name == 'zzz'")({"name": "x"})


def test_heterogeneous_equality():
    p = compile_cel("v == 1")
    assert p({"v": 1})
    assert p({"v": 1.0})              # numeric cross-type by value
    assert not p({"v": "1"})          # string vs int -> unequal, not error
    assert not p({"v": True})         # bool is not a number in CEL
    assert not compile_cel("v != v")({"v": 3})


def test_string_functions_and_arith():
    assert compile_cel("name.contains('erl')")({"name": "Berlin"})
    assert compile_cel("name.startsWith('Ber')")({"name": "Berlin"})
    assert compile_cel("name.endsWith('lin')")({"name": "Berlin"})
    assert compile_cel("name.size() == 6")({"name": "Berlin"})
    assert compile_cel("a + b == 3")({"a": 1, "b": 2})
    assert compile_cel("a * 2 - 1 == 5")({"a": 3})
    assert not compile_cel("a / 0 == 1")({"a": 3})  # div-by-zero -> false


def test_ternary():
    p = compile_cel("(population > 100 ? 'big' : 'small') == 'big'")
    assert p({"population": 500})
    assert not p({"population": 50})


@pytest.mark.parametrize("bad", [
    "population >=",           # trailing operator (:474 integration test)
    "name == 'x",              # unterminated string
    "((a == 1)",               # unmatched paren
    "a == 1 extra",            # trailing tokens
    "has(name)",               # has() needs a field selection
    "a ==== b",                # bogus operator
    "",                        # empty
])
def test_malformed_fails_at_compile(bad):
    with pytest.raises(CelParseError):
        compile_cel(bad)


# ---------------------------------------------------------------------------
# Catalyst translation (cel_to_column): exact equivalence with compile_cel
# on the stringified-props surface, and codegen placement of the filter.
# ---------------------------------------------------------------------------

_PUSHDOWN_CORPUS = [
    # (expr, expected translatable?)
    ("kind == 'ferry'", True),
    ("name == null || name == 'Berlin'", True),
    ("props['addr:street'] == 'Hauptstr.'", True),
    ("props['addr:street'] != 'Hauptstr.'", True),  # error (missing key) -> drop
    ("name != 'Berlin'", True),  # null != 'x' -> keep
    ("'addr:street' in props", True),
    ("has(props.name)", True),
    ("has(props['addr:street'])", True),
    ("highway in ['primary', 'secondary']", True),
    ("name.startsWith('Ber')", True),
    ("name.endsWith('lin')", True),
    ("name.contains('erl')", True),
    ("name.matches('^Ber.*')", True),
    ("!(kind == 'ferry')", True),
    ("kind == 'ferry' && name == 'X'", True),
    ("kind == 'ferry' || name == 'Berlin'", True),
    ("name < 'M'", True),
    ("name >= 'B' && name <= 'C'", True),
    ("population >= 1000", True),  # always-error on stringified props
    ("kind == 'a' || population >= 1000", True),  # error absorption
    ("kind == true", True),  # cross-type: constant false
    ("name.size() > 2", False),  # size() not translated
    ("population + 1 == 2", False),  # arithmetic not translated
]

_PROP_DICTS = [
    {},
    {"kind": "ferry"},
    {"kind": "road", "name": "Berlin"},
    {"name": "Bern"},
    {"name": "Ber"},
    {"name": "Munich", "highway": "primary"},
    {"highway": "secondary"},
    {"highway": "tertiary"},
    {"addr:street": "Hauptstr."},
    {"addr:street": "Nebenstr.", "name": "Celle"},
    {"population": "1234", "kind": "a"},
    {"population": "999"},
    {"kind": "true"},
    {"name": "A", "kind": "ferry"},
    {"name": "X", "kind": "ferry"},
]


def test_cel_to_column_equivalence_corpus(spark):
    import pandas as pd

    from versatiles_rs_spark.functions.cel import cel_to_column

    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(_PROP_DICTS)), "props": _PROP_DICTS}),
        schema="i int, props map<string,string>",
    )
    for expr, translatable in _PUSHDOWN_CORPUS:
        col = cel_to_column(expr)
        assert (col is not None) == translatable, expr
        if col is None:
            continue
        got = sorted(r["i"] for r in df.filter(col).collect())
        pred = compile_cel(expr)
        want = sorted(i for i, p in enumerate(_PROP_DICTS) if pred(p))
        assert got == want, f"{expr}: spark={got} python={want}"


def test_cel_to_column_runs_in_codegen(spark):
    """The translated predicate must appear inside the scan/filter stage
    with NO Python evaluation node in the plan."""
    import pandas as pd

    from versatiles_rs_spark.functions.cel import cel_to_column

    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id").alias("i"),
        F.create_map(F.lit("kind"), F.concat(F.lit("k"), F.col("id"))).alias("props"),
    )
    plan = (
        df.filter(cel_to_column("kind == 'k1' && name != 'X'"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # no BatchEvalPython / ArrowEvalPython
    # "*(n)" prefixes mark WholeStageCodegen stages in executedPlan output
    assert "Filter" in plan and ("WholeStageCodegen" in plan or "*(" in plan)


def test_filter_features_cel_fallback_full_semantics(spark):
    """Outside the translatable subset, filter_features_cel must ship the
    REAL evaluator (not the old regex rewriter): size() works, errors
    absorb to false."""
    import pandas as pd

    from versatiles_rs_spark.functions.heuristics import filter_features_cel

    df = spark.createDataFrame(
        pd.DataFrame(
            {"i": [0, 1, 2], "props": [{"name": "Berlin"}, {"name": "Io"}, {}]}
        ),
        schema="i int, props map<string,string>",
    )
    got = sorted(r["i"] for r in filter_features_cel(df, "name.size() > 2").collect())
    assert got == [0]


def test_cel_to_column_nonbool_root_returns_none():
    """A parsable non-boolean root (bare identifier) must return None —
    the caller then falls back to compile_cel, which evaluates such
    predicates to all-False — instead of handing Catalyst a string Column
    wrapped in boolean when/coalesce (plan-time AnalysisException)."""
    from versatiles_rs_spark.functions.cel import cel_to_column

    assert cel_to_column("name") is None
    assert cel_to_column("props['kind']") is None
    assert cel_to_column('"literal"') is None
    # boolean roots still translate
    assert cel_to_column("name == 'x'") is not None
