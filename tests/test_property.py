"""Property-based tests (hypothesis): parser robustness and operator
invariants — the randomized layer the reference lacks (SURVEY §5)."""

from __future__ import annotations

from hypothesis import example, given, settings, strategies as st

from opengemini_spark.influxql import ast, parse
from opengemini_spark.influxql.lexer import KEYWORDS
from opengemini_spark.sources.line_protocol import parse_line

# --- InfluxQL parser: generated SELECTs always parse into sane ASTs ---

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True).filter(
    lambda s: s not in KEYWORDS
)
_agg = st.sampled_from(["count", "sum", "mean", "min", "max", "median"])
_dur = st.builds(
    lambda n, u: f"{n}{u}", st.integers(1, 500), st.sampled_from(["s", "m", "h", "d"])
)
_num = st.integers(0, 10**6)


@st.composite
def select_queries(draw):
    fld = draw(_ident)
    src = draw(_ident)
    q = f"SELECT {draw(_agg)}({fld}) FROM {src}"
    if draw(st.booleans()):
        q += f" WHERE {draw(_ident)} = '{draw(_ident)}' AND {fld} > {draw(_num)}"
    if draw(st.booleans()):
        q += f" GROUP BY time({draw(_dur)}), {draw(_ident)}"
        if draw(st.booleans()):
            q += f" FILL({draw(st.sampled_from(['null', 'none', 'previous', 'linear', '0']))})"
    if draw(st.booleans()):
        q += " ORDER BY time DESC"
    if draw(st.booleans()):
        q += f" LIMIT {draw(st.integers(1, 1000))}"
    return q


@given(select_queries())
@settings(max_examples=200, deadline=None)
def test_generated_selects_parse(q):
    stmt = parse(q)
    assert isinstance(stmt, ast.SelectStatement)
    assert stmt.fields and isinstance(stmt.fields[0].expr, ast.Call)
    if stmt.group_time is not None:
        assert stmt.group_time.interval_ns > 0


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_parser_never_crashes_unexpectedly(s):
    """Arbitrary input either parses or raises SyntaxError — never anything
    else (matches the reference parser's error contract)."""
    try:
        parse(s)
    except SyntaxError:
        pass


# --- line protocol: round-trip of generated points ---

_tagv = st.from_regex(r"[a-zA-Z0-9_]{1,10}", fullmatch=True)
_fieldnum = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e12, max_value=1e12
)


@st.composite
def lp_points(draw):
    m = draw(_ident)
    tags = draw(st.dictionaries(_ident, _tagv, min_size=0, max_size=3))
    fields = draw(st.dictionaries(_ident, _fieldnum, min_size=1, max_size=3))
    ts = draw(st.integers(0, 2**62))
    tag_part = "".join(f",{k}={v}" for k, v in tags.items())
    field_part = ",".join(f"{k}={v!r}" for k, v in fields.items())
    return m, tags, fields, ts, f"{m}{tag_part} {field_part} {ts}"


@given(lp_points())
@settings(max_examples=200, deadline=None)
def test_line_protocol_roundtrip(point):
    m, tags, fields, ts, line = point
    rows = parse_line(line)
    assert {r["field"] for r in rows} == set(fields)
    for r in rows:
        assert r["measurement"] == m
        assert r["tags"] == tags
        assert r["time_ns"] == ts
        assert r["f_float"] == fields[r["field"]]


# --- PromQL parser fuzz (§5 randomized testing, r3) -------------------------

from hypothesis import strategies as pst

from opengemini_spark.promql import parser as PP

# words that are not bare metric names in PromQL (the lexer reads
# inf/nan as number literals and the rest as operators/modifiers —
# same as the reference's promql-go lexer)
_PROMQL_RESERVED = {
    "nan", "inf", "and", "or", "unless", "by", "without", "on",
    "ignoring", "group_left", "group_right", "offset", "bool", "atan2",
}
_plabel = pst.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True).filter(
    lambda s: s not in _PROMQL_RESERVED
)
_pmetric = pst.from_regex(r"[a-z][a-z0-9_:]{0,8}", fullmatch=True).filter(
    lambda s: s not in _PROMQL_RESERVED
)


@st.composite
def promql_exprs(draw, depth=0):
    """Random well-formed PromQL expressions."""
    if depth >= 2:
        kind = draw(st.sampled_from(["selector", "number"]))
    else:
        kind = draw(st.sampled_from(
            ["selector", "number", "binop", "agg", "func", "range_fn"]
        ))
    if kind == "number":
        return str(draw(st.integers(0, 10**6)))
    if kind == "selector":
        m = draw(_pmetric)
        if draw(st.booleans()):
            lbl = draw(_plabel)
            op = draw(st.sampled_from(["=", "!=", "=~", "!~"]))
            return f'{m}{{{lbl}{op}"v1"}}'
        return m
    if kind == "binop":
        a = draw(promql_exprs(depth + 1))
        b = draw(promql_exprs(depth + 1))
        op = draw(st.sampled_from(["+", "-", "*", "/", "%", "^",
                                   ">", "<", "==", "!=", ">=", "<="]))
        return f"({a}) {op} ({b})"
    if kind == "agg":
        inner = draw(promql_exprs(depth + 1))
        op = draw(st.sampled_from(sorted(PP.AGG_OPS - {
            "quantile", "topk", "bottomk", "count_values"})))
        by = draw(st.sampled_from(["", " by (x)", " without (x)"]))
        return f"{op}({inner}){by}"
    if kind == "func":
        inner = draw(promql_exprs(depth + 1))
        fn = draw(st.sampled_from(["abs", "ceil", "floor", "exp", "sqrt",
                                   "sort", "sort_desc", "sgn"]))
        return f"{fn}({inner})"
    m = draw(_pmetric)
    rng = draw(st.sampled_from(["30s", "5m", "1h", "1m30s", "59999ms"]))
    fn = draw(st.sampled_from(["rate", "increase", "delta", "irate",
                               "avg_over_time", "sum_over_time",
                               "count_over_time", "changes", "resets",
                               "stddev_over_time", "present_over_time"]))
    off = draw(st.sampled_from(["", " offset 5m"]))
    return f"{fn}({m}[{rng}]{off})"


@given(promql_exprs())
@settings(max_examples=300, deadline=None)
@example(q="ln")  # bare function name = vector selector (r9 fuzz find)
def test_promql_generated_exprs_parse(q):
    node = PP.parse_promql(q)
    assert node is not None


@given(st.text(max_size=60))
@settings(max_examples=300, deadline=None)
def test_promql_parser_never_crashes_unexpectedly(s):
    """Arbitrary input either parses or raises SyntaxError/ValueError —
    never an internal exception (the HTTP layer maps these to the
    bad_data envelope)."""
    try:
        PP.parse_promql(s)
    except (SyntaxError, ValueError, KeyError, OverflowError):
        pass
