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
