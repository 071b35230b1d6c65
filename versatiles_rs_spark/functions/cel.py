"""Mini CEL (Common Expression Language) parser + evaluator.

Replaces the earlier regex rewriter with a real tokenizer -> AST ->
evaluator implementing the semantics the reference documents and tests
(vector_filter_features.rs:25-81, 294-470):

- Top-level identifiers resolve to the feature property of that name, or
  null when absent (missing-key -> null, NOT an error).
- ``props`` is a reserved map of all properties: ``props['addr:street']``,
  ``'key' in props``, ``has(props.name)``.
- Heterogeneous equality: values of different types compare unequal
  (``null == null`` is true; ``1 == 1.0`` is true — numerics compare by
  value across int/uint/double like cel-interpreter).
- Ordering comparisons require comparable types (numeric vs numeric or
  string vs string); anything else is an evaluation ERROR.
- Evaluation errors (e.g. ``null >= 1000``) make the whole predicate
  false — matching the reference's ``matches!(execute(), Ok(Bool(true)))``.
- CEL's commutative logic: ``true || <error>`` is true and
  ``false && <error>`` is false (error absorption).
- ``s.matches(re)`` is a partial regex match (RE2 ``Find`` semantics).
- ``x in [list]`` membership with equality semantics; ``'k' in map`` is
  key presence.
- Malformed expressions raise ``CelParseError`` at compile time — the
  build-time contract (vector_filter_features.rs:68-81).

Everything compiles once on the driver; the returned predicate is a plain
python closure shipped to executors inside the Arrow batch transform.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class CelParseError(ValueError):
    """Malformed CEL — raised at plan-build time."""


class _CelEvalError(Exception):
    """Runtime evaluation error — absorbed to False at the predicate root."""


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RX = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+[uU]?)
  | (?P<str>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|&&|\|\||[-+*/%<>!.,()\[\]?:])
    """,
    re.X,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"', "0": "\0"}


def _unescape(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            out.append(_ESCAPES.get(nxt, "\\" + nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


@dataclass
class _Tok:
    kind: str  # 'int' | 'float' | 'str' | 'ident' | 'op'
    value: object


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RX.match(src, pos)
        if m is None:
            raise CelParseError(f"unexpected character {src[pos]!r} at {pos} in CEL: {src!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        if m.lastgroup == "int":
            toks.append(_Tok("int", int(text.rstrip("uU"))))
        elif m.lastgroup == "float":
            toks.append(_Tok("float", float(text)))
        elif m.lastgroup == "str":
            toks.append(_Tok("str", _unescape(text[1:-1])))
        elif m.lastgroup == "ident":
            toks.append(_Tok("ident", text))
        else:
            toks.append(_Tok("op", text))
    return toks


# ---------------------------------------------------------------------------
# parser (precedence climbing, CEL spec order)
# ---------------------------------------------------------------------------

# AST nodes are tuples: ('lit', v) ('var', name) ('list', [nodes])
# ('member', obj, name) ('index', obj, key) ('call', obj, name, [args])
# ('has', node) ('unary', op, node) ('bin', op, l, r) ('cond', c, t, f)


class _Parser:
    def __init__(self, toks: list[_Tok], src: str):
        self.toks = toks
        self.i = 0
        self.src = src

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise CelParseError(f"unexpected end of CEL expression: {self.src!r}")
        self.i += 1
        return t

    def _eat_op(self, op: str) -> None:
        t = self._next()
        if t.kind != "op" or t.value != op:
            raise CelParseError(f"expected {op!r}, got {t.value!r} in CEL: {self.src!r}")

    def _at_op(self, *ops: str) -> bool:
        t = self._peek()
        return t is not None and t.kind == "op" and t.value in ops

    def parse(self):
        node = self._ternary()
        if self.i != len(self.toks):
            raise CelParseError(
                f"trailing tokens after expression at {self.toks[self.i].value!r}: {self.src!r}"
            )
        return node

    def _ternary(self):
        cond = self._or()
        if self._at_op("?"):
            self._next()
            t = self._ternary()
            self._eat_op(":")
            f = self._ternary()
            return ("cond", cond, t, f)
        return cond

    def _or(self):
        node = self._and()
        while self._at_op("||"):
            self._next()
            node = ("bin", "||", node, self._and())
        return node

    def _and(self):
        node = self._rel()
        while self._at_op("&&"):
            self._next()
            node = ("bin", "&&", node, self._rel())
        return node

    def _rel(self):
        node = self._add()
        t = self._peek()
        if self._at_op("==", "!=", "<", "<=", ">", ">="):
            op = self._next().value
            return ("bin", op, node, self._add())
        if t is not None and t.kind == "ident" and t.value == "in":
            self._next()
            return ("bin", "in", node, self._add())
        return node

    def _add(self):
        node = self._mul()
        while self._at_op("+", "-"):
            op = self._next().value
            node = ("bin", op, node, self._mul())
        return node

    def _mul(self):
        node = self._unary()
        while self._at_op("*", "/", "%"):
            op = self._next().value
            node = ("bin", op, node, self._unary())
        return node

    def _unary(self):
        if self._at_op("!"):
            self._next()
            return ("unary", "!", self._unary())
        if self._at_op("-"):
            self._next()
            return ("unary", "-", self._unary())
        return self._postfix()

    def _postfix(self):
        node = self._primary()
        while True:
            if self._at_op("."):
                self._next()
                name_tok = self._next()
                if name_tok.kind != "ident":
                    raise CelParseError(f"expected member name after '.': {self.src!r}")
                if self._at_op("("):
                    self._next()
                    args = []
                    if not self._at_op(")"):
                        args.append(self._ternary())
                        while self._at_op(","):
                            self._next()
                            args.append(self._ternary())
                    self._eat_op(")")
                    node = ("call", node, name_tok.value, args)
                else:
                    node = ("member", node, name_tok.value)
            elif self._at_op("["):
                self._next()
                key = self._ternary()
                self._eat_op("]")
                node = ("index", node, key)
            else:
                return node

    def _primary(self):
        t = self._next()
        if t.kind in ("int", "float", "str"):
            return ("lit", t.value)
        if t.kind == "ident":
            if t.value == "true":
                return ("lit", True)
            if t.value == "false":
                return ("lit", False)
            if t.value == "null":
                return ("lit", None)
            if t.value == "has":
                self._eat_op("(")
                arg = self._ternary()
                self._eat_op(")")
                if arg[0] not in ("member", "index"):
                    raise CelParseError("has() requires a field selection, e.g. has(props.name)")
                return ("has", arg)
            return ("var", t.value)
        if t.kind == "op" and t.value == "(":
            node = self._ternary()
            self._eat_op(")")
            return node
        if t.kind == "op" and t.value == "[":
            items = []
            if not self._at_op("]"):
                items.append(self._ternary())
                while self._at_op(","):
                    self._next()
                    items.append(self._ternary())
            self._eat_op("]")
            return ("list", items)
        raise CelParseError(f"unexpected token {t.value!r} in CEL: {self.src!r}")


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------

_NUM = (int, float)


def _is_num(v) -> bool:
    return isinstance(v, _NUM) and not isinstance(v, bool)


def _eq(a, b) -> bool:
    """CEL heterogeneous equality: cross-type is unequal (not an error);
    numerics compare by value across int/double."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if _is_num(a) and _is_num(b):
        return float(a) == float(b) if (isinstance(a, float) or isinstance(b, float)) else a == b
    if type(a) is type(b):
        return a == b
    return False


def _cmp_pair(a, b) -> tuple:
    """Validate an ordering comparison; error on non-comparable types."""
    if _is_num(a) and _is_num(b):
        return a, b
    if isinstance(a, str) and isinstance(b, str):
        return a, b
    if isinstance(a, bool) and isinstance(b, bool):
        return a, b
    raise _CelEvalError(f"no ordering between {type(a).__name__} and {type(b).__name__}")


class _PropsMap(dict):
    """Marker type so 'key' in props means key presence."""


def _eval(node, props: dict):
    kind = node[0]
    if kind == "lit":
        return node[1]
    if kind == "var":
        name = node[1]
        if name == "props":
            return _PropsMap(props)
        return props.get(name)  # missing -> null
    if kind == "list":
        return [_eval(n, props) for n in node[1]]
    if kind == "member":
        obj = _eval(node[1], props)
        if isinstance(obj, dict):
            if node[2] in obj:
                return obj[node[2]]
            raise _CelEvalError(f"no such key: {node[2]!r}")
        raise _CelEvalError(f"cannot select field {node[2]!r} on {type(obj).__name__}")
    if kind == "index":
        obj = _eval(node[1], props)
        key = _eval(node[2], props)
        if isinstance(obj, dict):
            if key in obj:
                return obj[key]
            raise _CelEvalError(f"no such key: {key!r}")
        if isinstance(obj, list):
            if isinstance(key, int) and 0 <= key < len(obj):
                return obj[key]
            raise _CelEvalError(f"index {key!r} out of range")
        raise _CelEvalError(f"cannot index {type(obj).__name__}")
    if kind == "has":
        sel = node[1]
        try:
            obj = _eval(sel[1], props)
            key = sel[2] if sel[0] == "member" else _eval(sel[2], props)
        except _CelEvalError:
            return False
        return isinstance(obj, dict) and key in obj
    if kind == "call":
        obj = _eval(node[1], props)
        name, args = node[2], node[3]
        if name == "matches":
            if len(args) != 1:
                raise _CelEvalError("matches() takes one regex argument")
            pat = _eval(args[0], props)
            if not isinstance(obj, str) or not isinstance(pat, str):
                raise _CelEvalError("matches() requires string receiver and pattern")
            try:
                return re.search(pat, obj) is not None
            except re.error as e:
                raise _CelEvalError(f"bad regex: {e}") from e
        if name == "contains":
            arg = _eval(args[0], props)
            if isinstance(obj, str) and isinstance(arg, str):
                return arg in obj
            raise _CelEvalError("contains() requires strings")
        if name == "startsWith":
            arg = _eval(args[0], props)
            if isinstance(obj, str) and isinstance(arg, str):
                return obj.startswith(arg)
            raise _CelEvalError("startsWith() requires strings")
        if name == "endsWith":
            arg = _eval(args[0], props)
            if isinstance(obj, str) and isinstance(arg, str):
                return obj.endswith(arg)
            raise _CelEvalError("endsWith() requires strings")
        if name == "size":
            if isinstance(obj, (str, list, dict)):
                return len(obj)
            raise _CelEvalError("size() requires string/list/map")
        raise _CelEvalError(f"unknown function {name!r}")
    if kind == "unary":
        op = node[1]
        v = _eval(node[2], props)
        if op == "!":
            if isinstance(v, bool):
                return not v
            raise _CelEvalError("! requires a bool")
        if op == "-":
            if _is_num(v):
                return -v
            raise _CelEvalError("unary - requires a number")
    if kind == "bin":
        op = node[1]
        if op == "&&":
            return _logic(node[2], node[3], props, want=False)
        if op == "||":
            return _logic(node[2], node[3], props, want=True)
        lv = _eval(node[2], props)
        rv = _eval(node[3], props)
        if op == "==":
            return _eq(lv, rv)
        if op == "!=":
            return not _eq(lv, rv)
        if op == "in":
            if isinstance(rv, _PropsMap) or isinstance(rv, dict):
                return lv in rv
            if isinstance(rv, list):
                return any(_eq(lv, item) for item in rv)
            raise _CelEvalError("'in' requires a list or map on the right")
        if op in ("<", "<=", ">", ">="):
            a, b = _cmp_pair(lv, rv)
            return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        # arithmetic
        if op == "+" and isinstance(lv, str) and isinstance(rv, str):
            return lv + rv
        if not (_is_num(lv) and _is_num(rv)):
            raise _CelEvalError(f"arithmetic {op} requires numbers")
        if op == "+":
            return lv + rv
        if op == "-":
            return lv - rv
        if op == "*":
            return lv * rv
        if op == "/":
            if rv == 0:
                raise _CelEvalError("division by zero")
            return lv / rv if (isinstance(lv, float) or isinstance(rv, float)) else lv // rv
        if op == "%":
            if rv == 0:
                raise _CelEvalError("modulo by zero")
            return lv % rv
    if kind == "cond":
        c = _eval(node[1], props)
        if not isinstance(c, bool):
            raise _CelEvalError("ternary condition must be a bool")
        return _eval(node[2], props) if c else _eval(node[3], props)
    raise _CelEvalError(f"unhandled node {kind}")


def _logic(lnode, rnode, props: dict, want: bool) -> bool:
    """CEL commutative &&/||: errors absorb when the other side decides."""
    lerr = rerr = None
    lv = rv = None
    try:
        lv = _eval(lnode, props)
        if not isinstance(lv, bool):
            raise _CelEvalError("logical operand must be a bool")
    except _CelEvalError as e:
        lerr = e
    try:
        rv = _eval(rnode, props)
        if not isinstance(rv, bool):
            raise _CelEvalError("logical operand must be a bool")
    except _CelEvalError as e:
        rerr = e
    if lerr is None and lv is want:
        return want
    if rerr is None and rv is want:
        return want
    if lerr is not None:
        raise lerr
    if rerr is not None:
        raise rerr
    return bool(lv) if want else (bool(lv and rv))


# ---------------------------------------------------------------------------
# Catalyst translation (pushdown into WholeStageCodegen)
# ---------------------------------------------------------------------------

class _Untranslatable(Exception):
    """AST node outside the Catalyst-expressible subset; caller falls back
    to the Python evaluator."""


# regex characters on which Python re and Java regex agree for rlike
_SAFE_REGEX_RX = re.compile(r"^[A-Za-z0-9_ \t:,/'\^\$\.\*\+\?\(\)\[\]\|\\\-]*$")


def _typeclass(node) -> str:
    """'str' | 'bool' | 'null' | 'other' — static class of a node's value on
    the stringified-props surface, used to refuse Spark implicit casts that
    would diverge from CEL's heterogeneous (cross-type-unequal) equality."""
    kind = node[0]
    if kind == "lit":
        v = node[1]
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, str):
            return "str"
        return "other"
    if kind in ("var", "member", "index"):
        return "str"  # props values are stringified on this surface
    if kind == "has":
        return "bool"
    if kind == "unary":
        return "bool" if node[1] == "!" else "other"
    if kind == "call":
        return "bool" if node[2] in ("matches", "contains", "startsWith", "endsWith") else "other"
    if kind == "bin":
        return "bool" if node[1] in ("==", "!=", "<", "<=", ">", ">=", "in", "&&", "||") else "other"
    return "other"


def _tr(node, props_col):
    """Translate an AST node to (value_col, err_col) against a
    map<string,string> props column.

    The pair mirrors the evaluator exactly: ``err_col`` true means the node
    would raise _CelEvalError (absorbed per CEL's commutative logic);
    ``value_col`` is only meaningful where ``err_col`` is false. The
    translation is EXACT for string-valued props (the explode_features
    surface stringifies every property) — verified against compile_cel by
    the conformance corpus in tests/test_cel.py.
    """
    from pyspark.sql import functions as F

    false = F.lit(False)
    kind = node[0]
    if kind == "lit":
        v = node[1]
        if v is None or isinstance(v, (str, bool)):
            return F.lit(v), false
        raise _Untranslatable(f"literal {v!r}")  # numeric lits: see 'bin' below
    if kind == "var":
        name = node[1]
        if name == "props":
            raise _Untranslatable("bare props map")
        return props_col[name], false  # missing -> NULL == CEL null
    if kind in ("member", "index"):
        # props.k / props['k']: missing key is an ERROR (not null) in CEL
        if node[1] != ("var", "props"):
            raise _Untranslatable("selection on non-props object")
        key = node[2] if kind == "member" else (
            node[2][1] if node[2][0] == "lit" and isinstance(node[2][1], str) else None
        )
        if not isinstance(key, str):
            raise _Untranslatable("non-literal props key")
        col = props_col[key]
        return col, col.isNull()
    if kind == "has":
        sel = node[1]
        if sel[1] != ("var", "props"):
            raise _Untranslatable("has() on non-props object")
        key = sel[2] if sel[0] == "member" else (
            sel[2][1] if sel[2][0] == "lit" and isinstance(sel[2][1], str) else None
        )
        if not isinstance(key, str):
            raise _Untranslatable("non-literal has() key")
        return props_col[key].isNotNull(), false
    if kind == "unary" and node[1] == "!":
        if _typeclass(node[2]) != "bool":
            raise _Untranslatable("! on non-bool")
        v, err = _tr(node[2], props_col)
        return ~v, err
    if kind == "call":
        recv, name, args = node[1], node[2], node[3]
        if _typeclass(recv) != "str":
            raise _Untranslatable("string call on non-string receiver")
        rv, rerr = _tr(recv, props_col)
        if name in ("contains", "startsWith", "endsWith", "matches") and len(args) == 1:
            if _typeclass(args[0]) != "str":
                raise _Untranslatable("string call argument must be a string")
            av, aerr = _tr(args[0], props_col)
            err = rerr | aerr | rv.isNull() | av.isNull()
            if name == "matches":
                if args[0][0] != "lit" or not isinstance(args[0][1], str) or not _SAFE_REGEX_RX.match(args[0][1]):
                    raise _Untranslatable("matches() needs a dialect-safe literal regex")
                return rv.rlike(args[0][1]), err
            fn = {"contains": F.contains, "startsWith": F.startswith, "endsWith": F.endswith}[name]
            return fn(rv, av), err
        raise _Untranslatable(f"call {name}")
    if kind == "bin":
        op = node[1]
        if op in ("&&", "||"):
            if _typeclass(node[2]) != "bool" or _typeclass(node[3]) != "bool":
                raise _Untranslatable("logic on non-bool operand")
            lv, lerr = _tr(node[2], props_col)
            rv, rerr = _tr(node[3], props_col)
            want = F.lit(op == "||")
            l_decides = (~lerr) & lv.eqNullSafe(want)
            r_decides = (~rerr) & rv.eqNullSafe(want)
            decided = l_decides | r_decides
            err = (~decided) & (lerr | rerr)
            other = lv & rv if op == "&&" else lv | rv
            value = F.when(decided, want).otherwise(other)
            return value, err
        if op in ("==", "!="):
            tl, tr_ = _typeclass(node[2]), _typeclass(node[3])
            if "other" in (tl, tr_):
                raise _Untranslatable("equality operand type")
            lv, lerr = _tr(node[2], props_col)
            rv, rerr = _tr(node[3], props_col)
            if tl != tr_ and "null" not in (tl, tr_):
                # cross-type (e.g. string prop vs bool literal): CEL says
                # unequal, never an implicit cast
                eq = F.lit(False)
            else:
                eq = lv.eqNullSafe(rv)  # CEL: null == null true, null == 'a' false
            return (eq if op == "==" else ~eq), lerr | rerr
        if op in ("<", "<=", ">", ">="):
            l, r = node[2], node[3]

            def _is_num_lit(nd):
                return nd[0] == "lit" and _is_num(nd[1]) and not isinstance(nd[1], bool)

            if (_is_num_lit(r) and _typeclass(l) == "str") or (
                _is_num_lit(l) and _typeclass(r) == "str"
            ):
                # numeric literal vs string-valued prop: CEL orders only
                # number/number or string/string, so this ALWAYS errors on
                # the stringified-props surface (matching compile_cel).
                return F.lit(None).cast("boolean"), F.lit(True)
            if _typeclass(l) != "str" or _typeclass(r) != "str":
                raise _Untranslatable("ordering operand type")
            lv, lerr = _tr(l, props_col)
            rv, rerr = _tr(r, props_col)
            err = lerr | rerr | lv.isNull() | rv.isNull()
            cmp = {"<": lv < rv, "<=": lv <= rv, ">": lv > rv, ">=": lv >= rv}[op]
            return cmp, err  # Spark UTF8_BINARY order == Python code points
        if op == "in":
            if _typeclass(node[2]) != "str":
                raise _Untranslatable("'in' lhs must be string-valued")
            lv, lerr = _tr(node[2], props_col)
            r = node[3]
            if r == ("var", "props"):
                if node[2][0] == "lit" and isinstance(node[2][1], str):
                    return props_col[node[2][1]].isNotNull(), lerr
                return F.map_contains_key(props_col, lv), lerr
            if r[0] == "list":
                items = []
                for it in r[1]:
                    if it[0] != "lit" or not isinstance(it[1], (str, bool)) or isinstance(it[1], bool):
                        raise _Untranslatable("in-list supports string literals")
                    items.append(it[1])
                return F.coalesce(lv.isin(items), F.lit(False)), lerr
            raise _Untranslatable("'in' rhs")
    raise _Untranslatable(f"node {kind}")


def cel_to_column(expr: str, props_col="props"):
    """CEL string -> Spark boolean Column over a map<string,string> props
    column, or None when the expression falls outside the translatable
    subset (caller then ships compile_cel's closure instead).

    The returned predicate runs entirely inside Catalyst/WholeStageCodegen
    — no Python in the filter path — and is exactly equivalent to
    ``compile_cel(expr)`` applied to the same stringified props dict,
    including missing-key-vs-error asymmetry (``x != 'a'`` keeps missing
    rows, ``props['x'] != 'a'`` drops them) and commutative error
    absorption (``true || <error>``). Parse failures still raise
    CelParseError at plan-build time."""
    from pyspark.sql import functions as F

    ast = _Parser(_tokenize(expr), expr).parse()
    if _typeclass(ast) != "bool":
        # A non-boolean root (e.g. the bare identifier `name`) evaluates
        # to all-False under compile_cel's error contract; translating it
        # would hand Catalyst a string Column inside when/coalesce and
        # raise AnalysisException at plan time. Fall back instead.
        return None
    if isinstance(props_col, str):
        props_col = F.col(props_col)
    try:
        value, err = _tr(ast, props_col)
    except _Untranslatable:
        return None
    return F.when(err, F.lit(False)).otherwise(F.coalesce(value, F.lit(False)))


def compile_cel(expr: str):
    """CEL string -> predicate(props: dict) -> bool.

    Parsing happens HERE (plan build); malformed CEL raises CelParseError
    before any Spark job starts. Evaluation errors at runtime yield False
    (the reference's Ok(Bool(true)) contract)."""
    ast = _Parser(_tokenize(expr), expr).parse()

    def predicate(props: dict) -> bool:
        try:
            return _eval(ast, props) is True
        except _CelEvalError:
            return False

    return predicate
