"""PromQL parser (subset): selectors, range selectors, function calls,
aggregation operators with by/without, binary ops with on/ignoring.

Grammar mirrors Prometheus's promql/parser (lifted into the reference);
hand-written recursive descent like the InfluxQL front-end.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

DUR_S = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400,
         "w": 604800, "y": 31536000}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<duration>(?:\d+(?:ms|[smhdwy]))+(?![a-zA-Z_0-9]))
  | (?P<number>\d+\.\d+|\d+)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<ident>[a-zA-Z_:][a-zA-Z0-9_:]*)
  | (?P<op>=~|!~|!=|==|<=|>=|[-+*/%^(){}\[\],=<>@])
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    text: str
    value: object = None


def lex(src: str) -> list[Tok]:
    toks, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"PromQL: bad char {src[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "duration":
            total: float = 0
            for v, u in re.findall(r"(\d+)(ms|[smhdwy])", text):
                total += int(v) * DUR_S[u]
            toks.append(Tok("DURATION", text,
                            int(total) if total == int(total) else total))
        elif kind == "number":
            toks.append(Tok("NUMBER", text, float(text)))
        elif kind == "string":
            toks.append(Tok("STRING", text, text[1:-1]))
        elif kind == "ident":
            toks.append(Tok("IDENT", text, text))
        else:
            toks.append(Tok("OP", text, text))
    toks.append(Tok("EOF", ""))
    return toks


# --- AST ---

@dataclass
class Matcher:
    label: str
    op: str          # = != =~ !~
    value: str


@dataclass
class VectorSelector:
    metric: str
    matchers: list[Matcher] = field(default_factory=list)
    range_s: int | None = None       # set for range selectors m[5m]
    offset_s: int = 0                # `offset 5m` modifier
    at_s: float | str | None = None  # `@ ts` / `@ start()` / `@ end()`


@dataclass
class Subquery:
    """``expr[range:step]`` — the inner expression evaluated on the
    absolutely-aligned ``step`` grid, consumed as a range vector
    (Prometheus subqueries; the reference transpiles them in
    promql2influxql/transpiler.go subqueryTimes)."""
    inner: object
    range_s: int
    step_s: int | None = None        # None → default eval interval (1m)
    offset_s: int = 0
    at_s: float | str | None = None


@dataclass
class FuncCall:
    name: str
    args: list


@dataclass
class Aggregate:
    op: str                          # sum avg min max count stddev …
    expr: object
    by: list[str] | None = None      # None = clause absent ([] = "by ()")
    without: list[str] | None = None
    param: float | str | None = None  # quantile φ / topk k / count_values label


@dataclass
class BinOp:
    op: str                          # + - * / == != > < >= <=
    lhs: object
    rhs: object
    on: list[str] | None = None
    ignoring: list[str] | None = None
    group: str | None = None         # 'left' | 'right' (many-to-one matching)
    bool_mod: bool = False           # `== bool`: 0/1 result, no filtering
    carry: list[str] | None = None   # group_left(lbl,…) carried labels


@dataclass
class NumberLit:
    value: float


@dataclass
class StringLit:
    value: str


AGG_OPS = {"sum", "avg", "min", "max", "count", "stddev", "stdvar", "group",
           "quantile", "topk", "bottomk", "count_values"}
FUNCS = {
    "rate", "increase", "delta", "irate", "idelta",
    "avg_over_time", "sum_over_time", "min_over_time", "max_over_time",
    "count_over_time", "last_over_time", "abs", "clamp_min", "clamp_max",
    "histogram_quantile", "round", "floor", "ceil", "scalar",
    "deriv", "predict_linear", "holt_winters",
    "stddev_over_time", "stdvar_over_time", "quantile_over_time",
    "mad_over_time", "present_over_time", "absent_over_time", "absent",
    "changes", "resets", "timestamp", "time", "vector",
    "label_replace", "label_join", "sort", "sort_desc",
    "sort_by_label", "sort_by_label_desc",
    "year", "month", "day_of_month", "day_of_week", "day_of_year", "days_in_month",
    "hour", "minute",
    "exp", "ln", "log2", "log10", "sqrt", "sgn", "clamp",
}

# Inf/NaN are number literals in PromQL's lexer (promql/parser/lex.go
# scanNumber); our lexer emits them as IDENTs, mapped here.
_NUM_IDENTS = {"inf": float("inf"), "nan": float("nan")}


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks, self.i = toks, 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    _KEYWORDS = {"by", "without", "bool", "on", "ignoring",
                 "group_left", "group_right", "or", "and", "unless",
                 "offset"}

    def accept(self, kind: str, text: str | None = None) -> Tok | None:
        t = self.peek()
        if t.kind == kind and (
            text is None
            or t.text == text
            or (
                kind == "IDENT"
                and text in self._KEYWORDS
                and t.text.lower() == text
            )
        ):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.accept(kind, text)
        if t is None:
            raise SyntaxError(f"PromQL: expected {text or kind}, got {self.peek().text!r}")
        return t

    def parse(self):
        e = self.expr()
        self.expect("EOF")
        return e

    _CMP = ("==", "!=", ">", "<", ">=", "<=")

    def expr(self):
        # precedence (loosest → tightest): or | and/unless | cmp | add | mul
        return self._or_level()

    def _or_level(self):
        # Prometheus gives `or` strictly lower precedence than `and`/`unless`:
        # `a or b and c` ≡ `a or (b and c)`.
        lhs = self._and_unless_level()
        while True:
            t = self.peek()
            if t.kind == "IDENT" and t.text == "or":
                self.next()
                on, ignoring, group, carry = self._matching()
                lhs = BinOp(t.text, lhs, self._and_unless_level(), on, ignoring, group, carry=carry)
            else:
                return lhs

    def _and_unless_level(self):
        lhs = self._cmp_level()
        while True:
            t = self.peek()
            if t.kind == "IDENT" and t.text in ("and", "unless"):
                self.next()
                on, ignoring, group, carry = self._matching()
                lhs = BinOp(t.text, lhs, self._cmp_level(), on, ignoring, group, carry=carry)
            else:
                return lhs

    def _cmp_level(self):
        # comparisons are LEFT-associative (`metric > time() < time()` ≡
        # `(metric > time()) < time()` — prom_test.go Comparison_Op_Fix)
        lhs = self.add()
        while True:
            t = self.peek()
            if not (t.kind == "OP" and t.text in self._CMP):
                return lhs
            self.next()
            # `== bool`: the comparison returns 0/1 instead of filtering
            # (required for scalar-scalar comparisons — prom_test.go
            # `up + (1 != bool 2)`)
            bool_mod = self.accept("IDENT", "bool") is not None
            on, ignoring, group, carry = self._matching()
            lhs = BinOp(t.text, lhs, self.add(), on, ignoring, group,
                        bool_mod, carry=carry)

    def add(self):
        lhs = self.mul()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("+", "-"):
                self.next()
                on, ignoring, group, carry = self._matching()
                lhs = BinOp(t.text, lhs, self.mul(), on, ignoring, group, carry=carry)
            else:
                return lhs

    def mul(self):
        lhs = self._unary()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("*", "/", "%"):
                self.next()
                on, ignoring, group, carry = self._matching()
                lhs = BinOp(t.text, lhs, self._unary(), on, ignoring, group, carry=carry)
            else:
                return lhs

    def _unary(self):
        # unary +/- binds tighter than * but LOOSER than ^ per the PromQL
        # grammar (promql/parser.go precedence table): -2^2 == -(2^2) == -4
        t = self.peek()
        if t.kind == "OP" and t.text == "-":
            self.next()
            operand = self._unary()
            if isinstance(operand, NumberLit):
                return NumberLit(-operand.value)
            return BinOp("*", NumberLit(-1.0), operand)
        if t.kind == "OP" and t.text == "+":
            self.next()
            return self._unary()
        return self._pow()

    def _pow(self):
        # ^ binds tighter than unary minus and is RIGHT-associative; its
        # RHS re-admits unary (`2^-2` is valid PromQL)
        lhs = self.primary()
        t = self.peek()
        if t.kind == "OP" and t.text == "^":
            self.next()
            on, ignoring, group, carry = self._matching()
            return BinOp("^", lhs, self._unary(), on, ignoring, group,
                         carry=carry)
        return lhs

    def _matching(self):
        on = ignoring = group = None
        if self.accept("IDENT", "on"):
            on = self._label_list()
        elif self.accept("IDENT", "ignoring"):
            ignoring = self._label_list()
        carry: list[str] | None = None
        if self.accept("IDENT", "group_left"):
            group = "left"
            if self.peek().text == "(":
                carry = self._label_list()
        elif self.accept("IDENT", "group_right"):
            group = "right"
            if self.peek().text == "(":
                carry = self._label_list()
        return on, ignoring, group, carry

    def _label_list(self) -> list[str]:
        self.expect("OP", "(")
        labels = []
        if not self.accept("OP", ")"):
            labels.append(self.expect("IDENT").value)
            while self.accept("OP", ","):
                labels.append(self.expect("IDENT").value)
            self.expect("OP", ")")
        return labels

    def primary(self):
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return NumberLit(t.value)
        if t.kind == "STRING":
            self.next()
            return StringLit(t.value)
        if t.kind == "IDENT" and t.text.lower() in _NUM_IDENTS:
            self.next()
            return NumberLit(_NUM_IDENTS[t.text.lower()])
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self.expr()
            self.expect("OP", ")")
            return self._maybe_subquery(e)
        if t.kind == "IDENT":
            name = self.next().value
            # aggregation keywords are case-insensitive (SUM(...) BY (job)
            # — promql/parser keyword table; prom_test.go Operators1)
            if name.lower() in AGG_OPS and self.peek().text in ("(",) or (
                name.lower() in AGG_OPS
                and self.peek().kind == "IDENT"
                and self.peek().text.lower() in ("by", "without")
            ):
                return self._maybe_subquery(self._aggregate(name.lower()))
            # function names are NOT reserved words: `ln` is only a call
            # when followed by "(" — bare (or with matchers/range) it is a
            # vector selector for a metric of that name (promql/parser
            # grammar: function_call is IDENTIFIER "(", metric_identifier
            # accepts any IDENTIFIER)
            if name in FUNCS and self.peek().text == "(":
                self.expect("OP", "(")
                args = []
                if not self.accept("OP", ")"):
                    args.append(self.expr())
                    while self.accept("OP", ","):
                        args.append(self.expr())
                    self.expect("OP", ")")
                return self._maybe_subquery(FuncCall(name, args))
            return self._selector(name)
        if t.kind == "OP" and t.text == "{":
            # {__name__=~"…", …}: nameless selector — the metric is chosen
            # by matchers alone (prom_test.go regex measurement)
            return self._selector("")
        raise SyntaxError(f"PromQL: unexpected {t.text!r}")

    def _aggregate(self, op: str) -> Aggregate:
        by = without = None
        if self.accept("IDENT", "by"):
            by = self._label_list()
        elif self.accept("IDENT", "without"):
            without = self._label_list()
        self.expect("OP", "(")
        param = None
        if op in ("quantile", "topk", "bottomk"):
            if self.peek().kind == "DURATION":
                param = self.next().value
            else:
                # any scalar expression: a literal, scalar(v), (…) —
                # promql/parser accepts a full expr as the parameter
                p = self.expr()
                param = p.value if isinstance(p, NumberLit) else p
            self.expect("OP", ",")
        elif op == "count_values":
            while self.accept("OP", "("):
                pass                      # tolerate ((("label")))
            param = self.expect("STRING").value
            while self.accept("OP", ")") and self.peek().text != ",":
                pass
            self.expect("OP", ",")
        e = self.expr()
        self.expect("OP", ")")
        if by is None and without is None:
            if self.accept("IDENT", "by"):
                by = self._label_list()
            elif self.accept("IDENT", "without"):
                without = self._label_list()
        return Aggregate(op, e, by, without, param)

    def _selector(self, metric: str) -> VectorSelector:
        matchers = []
        if self.accept("OP", "{"):
            while not self.accept("OP", "}"):
                label = self.expect("IDENT").value
                op = self.expect("OP").text
                if op not in ("=", "!=", "=~", "!~"):
                    raise SyntaxError(f"PromQL: bad matcher op {op}")
                value = self.expect("STRING").value
                matchers.append(Matcher(label, op, value))
                self.accept("OP", ",")
        rng = None
        if self.accept("OP", "["):
            rng = self.expect("DURATION").value
            sub_step = self._subquery_step()
            if sub_step is not False:
                # metric[range:step] — subquery over the instant selector
                self.expect("OP", "]")
                return self._with_offset(
                    Subquery(
                        VectorSelector(metric, matchers, None, 0),
                        rng,
                        sub_step,
                    )
                )
            self.expect("OP", "]")
        off, at = self._modifiers()
        return VectorSelector(metric, matchers, rng, off, at)

    def _modifiers(self):
        """``offset <dur>`` and ``@ <ts|start()|end()>`` in either
        order (promql/parser parses them as repeatable step modifiers)."""
        off, at = 0, None
        while True:
            t = self.peek()
            if t.kind == "IDENT" and t.text == "offset":
                self.next()
                off = self.expect("DURATION").value
            elif t.kind == "OP" and t.text == "@":
                self.next()
                n = self.peek()
                if n.kind == "NUMBER":
                    at = float(self.next().value)
                elif n.kind == "DURATION":
                    # `@ 60` lexes as DURATION(60s)? no — bare ints lex as
                    # NUMBER; a unit-suffixed ts is not valid promql
                    raise SyntaxError("PromQL: @ expects a unix timestamp")
                elif n.kind == "IDENT" and n.text in ("start", "end"):
                    self.next()
                    self.expect("OP", "(")
                    self.expect("OP", ")")
                    at = n.text
                else:
                    raise SyntaxError(f"PromQL: bad @ argument {n.text!r}")
            else:
                return off, at

    def _subquery_step(self):
        """After the range duration inside ``[...]``: a ``:``-led token is
        the subquery step (``:`` lexes as an IDENT because metric names may
        contain colons). Returns False if not a subquery, None for the
        default step, else seconds."""
        t = self.peek()
        if t.kind != "IDENT" or not t.text.startswith(":"):
            return False
        self.next()
        if t.text == ":":
            return None
        m = re.fullmatch(r":(\d+)([smhdw])", t.text)
        if not m:
            raise SyntaxError(f"PromQL: bad subquery step {t.text!r}")
        return int(m.group(1)) * DUR_S[m.group(2)]

    def _with_offset(self, sq: "Subquery") -> "Subquery":
        sq.offset_s, sq.at_s = self._modifiers()
        return sq

    def _maybe_subquery(self, e):
        """Postfix ``[range:step]`` on a non-selector expression
        (``rate(m[5m])[30m:5m]``, ``(a+b)[10m:]``)."""
        t = self.peek()
        if t.kind == "OP" and t.text == "[":
            save = self.i
            self.next()
            if self.peek().kind != "DURATION":
                self.i = save
                return e
            rng = self.next().value
            sub_step = self._subquery_step()
            if sub_step is False:
                self.i = save
                return e
            self.expect("OP", "]")
            return self._with_offset(Subquery(e, rng, sub_step))
        return e


def parse_promql(src: str):
    return Parser(lex(src)).parse()
