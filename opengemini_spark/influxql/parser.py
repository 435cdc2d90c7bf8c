"""Recursive-descent InfluxQL parser (subset).

Mirrors the hand-written reference parser
(``lib/util/lifted/influx/influxql/parser.go``) for:

  SELECT <fields> FROM <measurement>
    [WHERE <cond>] [GROUP BY time(<dur>[,<off>])[, <tags…>]] [FILL(<opt>)]
    [ORDER BY time [DESC|ASC]] [LIMIT n] [OFFSET n] [SLIMIT n] [TZ('zone')]

  SHOW MEASUREMENTS | SHOW TAG KEYS [FROM m]
  | SHOW TAG VALUES [FROM m] WITH KEY = k | SHOW FIELD KEYS [FROM m]

Expression grammar: or → and → comparison (=,!=,<,<=,>,>=,=~,!~)
→ additive → multiplicative → unary → primary (call | var | literal |
regex | parens).
"""

from __future__ import annotations

import re

from opengemini_spark.influxql import ast
from opengemini_spark.influxql.lexer import Tok, lex


def _n_is_time(n) -> bool:
    return isinstance(n, ast.VarRef) and n.name.lower() == "time"


def _split_db_segments(raw: str) -> list[str]:
    """Split a raw FROM-clause identifier on dots OUTSIDE double quotes —
    the influxql scanner's db.rp.measurement structure (a quoted segment
    may itself contain dots: ``db0.rp0."SmartServer.mem"``)."""
    segs: list[str] = []
    cur: list[str] = []
    inq = False
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == '"':
            inq = not inq
        elif c == "\\" and inq and i + 1 < len(raw):
            cur.append(raw[i + 1])
            i += 1
        elif c == "." and not inq:
            segs.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    segs.append("".join(cur))
    return segs


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0
        # (db|None, rp|None) per measurement source encountered anywhere
        # in the statement (subqueries/joins included) — the coordinator's
        # db/rp existence checks run over these (server_test.go
        # Query_Common "database not found" / "retention policy not
        # found" / "database name required")
        self.src_meta: list[tuple[str | None, str | None]] = []

    def _record_src(self, tok: Tok) -> None:
        segs = _split_db_segments(tok.text)
        if len(segs) >= 3:
            self.src_meta.append((segs[0], segs[1]))
        elif len(segs) == 2:
            self.src_meta.append((None, segs[0]))
        else:
            self.src_meta.append((None, None))

    # --- token helpers ---
    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Tok | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise SyntaxError(
                f"InfluxQL: expected {text or kind}, got {got.text!r}"
            )
        return t

    def kw(self, word: str) -> Tok | None:
        return self.accept("KEYWORD", word)

    # --- statements ---
    def parse_statement(self) -> ast.Node:
        if self.kw("with"):
            return self.with_statement()
        if self.kw("select"):
            stmt: ast.Node = self.select_statement(sub=True)
            stmt = self._maybe_union(stmt)
            self.expect("EOF")
            return stmt
        if self.kw("show"):
            return self.show_statement()
        if self.kw("graph"):
            return self.graph_statement()
        raise SyntaxError(f"InfluxQL: unsupported statement {self.peek().text!r}")

    def graph_statement(self) -> ast.GraphStatement:
        """GRAPH <hops:int> <start:'uid'> [NODE (<cond>)] [EDGE (<cond>)]
        (reference sql.y:701 GRAPH_STATEMENT; conditions are the restricted
        EQ/NEQ/AND/OR predicate language of engine/executor/graph.go)."""
        hops = self.expect("INTEGER")
        start = self.expect("STRING")
        node_cond = edge_cond = None
        if self.kw("node"):
            node_cond = self.expr()
        if self.kw("edge"):
            edge_cond = self.expr()
        return ast.GraphStatement(
            hop_num=int(hops.value),
            start_node_id=start.value,
            node_condition=node_cond,
            edge_condition=edge_cond,
        )

    def with_statement(self) -> ast.SelectStatement:
        """WITH name AS (SELECT …) [, name2 AS (…)] SELECT … FROM name
        (WithSelectStatement, statement_executor.go:448 / cte_transform.go).
        Definitions may reference each other in any order; a direct or
        indirect self-reference is the reference's 'Unsupported feature:
        recursive call to itself <name>' error (server_test.go CTE_Query)."""
        ctes: dict[str, ast.Node] = {}
        while True:
            name = self.expect("IDENT").value
            self.expect("KEYWORD", "as")
            self.expect("OP", "(")
            if self.kw("graph"):
                # WITH t1 AS (GRAPH n 'start' …): a graph traversal as a
                # CTE body, referenced like a table (Push_Down_Rule_
                # Incondition "SELECT uid FROM t1"; sql.y GRAPH in
                # with-clause)
                ctes[name] = self.graph_statement()
            else:
                self.expect("KEYWORD", "select")
                # a CTE body may itself be a UNION chain (Union_Table
                # "union CTE": with u1 as (select … union all select …) …)
                ctes[name] = self._maybe_union(
                    self.select_statement(sub=True)
                )
            self.expect("OP", ")")
            if not self.accept("OP", ","):
                break
        self.expect("KEYWORD", "select")
        stmt = self._maybe_union(self.select_statement(sub=True))
        self.expect("EOF")
        _resolve_ctes(stmt, ctes, frozenset())
        return stmt

    def show_statement(self) -> ast.ShowStatement:
        if self.kw("measurements"):
            # SHOW MEASUREMENTS [WITH MEASUREMENT =~ /regex/]
            if self.kw("with"):
                t = self.next()   # `measurement` is an IDENT, not a keyword
                if t.text.lower() != "measurement":
                    raise SyntaxError("InfluxQL: expected MEASUREMENT")
                self.expect("OP", "=~")
                return ast.ShowStatement(
                    "measurements", key=self.expect("REGEX").value
                )
            return ast.ShowStatement("measurements")
        if self.peek().kind == "IDENT" and self.peek().text.lower() == "series":
            self.next()
            if self._peek_cardinality():
                exact = self.peek().text.lower() == "exact"
                self._expect_cardinality()
                st = ast.ShowStatement(
                    "series_exact_cardinality" if exact
                    else "series_cardinality"
                )
                self._show_tail(st, with_key=False)
                return st
            st = ast.ShowStatement("series")
            self._show_tail(st, with_key=False)
            return st
        if (
            self.peek().kind == "IDENT"
            and self.peek().text.lower() == "measurement"
        ):
            # SHOW MEASUREMENT [EXACT] CARDINALITY [FROM m | /regex/]
            # [WHERE …]
            self.next()
            self._expect_cardinality()
            st = ast.ShowStatement("measurement_cardinality")
            self._show_tail(st, with_key=False)
            # both forms reject time with the NON-exact name
            # (ShowMeasurementExactCardinality error text)
            self._reject_time_where(st, "SHOW MEASUREMENT CARDINALITY")
            st.key = st.source_pattern
            return st
        if self.kw("tag"):
            if self.kw("keys"):
                st = ast.ShowStatement("tag_keys")
                self._show_tail(st, with_key=False)
                return st
            if self.kw("key"):
                # SHOW TAG KEY [EXACT] CARDINALITY
                self._expect_cardinality()
                st = ast.ShowStatement("tag_key_cardinality")
                self._show_tail(st, with_key=False)
                self._reject_time_where(st, "SHOW TAG KEY EXACT CARDINALITY")
                return st
            self.expect("KEYWORD", "values")
            if self._peek_cardinality():
                self._expect_cardinality()
                st = ast.ShowStatement("tag_values_cardinality")
                self._show_tail(st, with_key=True)
                self._reject_time_where(
                    st, "SHOW TAG VALUES EXACT CARDINALITY"
                )
                return st
            st = ast.ShowStatement("tag_values")
            self._show_tail(st, with_key=True)
            return st
        if self.kw("field"):
            if self.kw("key"):
                self._expect_cardinality()
                st = ast.ShowStatement("field_key_cardinality")
                self._show_tail(st, with_key=False)
                self._reject_time_where(
                    st, "SHOW FIELD KEY EXACT CARDINALITY"
                )
                return st
            self.expect("KEYWORD", "keys")
            st = ast.ShowStatement("field_keys")
            self._show_tail(st, with_key=False)
            return st
        raise SyntaxError("InfluxQL: unsupported SHOW")

    def _peek_cardinality(self) -> bool:
        t = self.peek()
        return t.kind == "IDENT" and t.text.lower() in ("exact", "cardinality")

    def _expect_cardinality(self) -> None:
        """[EXACT] CARDINALITY — exact and sketched forms answer alike
        here (the exact path; statement_executor.go cardinality rows)."""
        t = self.next()
        if t.kind == "IDENT" and t.text.lower() == "exact":
            t = self.next()
        if not (t.kind == "IDENT" and t.text.lower() == "cardinality"):
            raise SyntaxError("InfluxQL: expected CARDINALITY")

    @staticmethod
    def _reject_time_where(st: ast.ShowStatement, what: str) -> None:
        def has_time(n) -> bool:
            if isinstance(n, ast.BinaryExpr):
                if _n_is_time(n.lhs) or _n_is_time(n.rhs):
                    return True
                return has_time(n.lhs) or has_time(n.rhs)
            return False

        if st.where is not None and has_time(st.where):
            raise ValueError(
                f"{what} doesn't support time in WHERE clause"
            )

    def _show_tail(self, st: ast.ShowStatement, with_key: bool) -> None:
        """Common SHOW suffix: [ON db] [FROM m|/re/] [WITH KEY (=|=~) k]
        [WHERE cond] [ORDER BY …] [LIMIT n] [OFFSET n]
        (influxql SHOW grammar; server_test.go ShowTagKeys/ShowTagValues)."""
        if self.kw("on"):
            st.on_db = self.expect("IDENT").value
        if self.kw("from"):
            if self.peek().kind == "REGEX":
                st.source_pattern = self.next().value
            else:
                st.source = self.expect("IDENT").value
        if with_key:
            self.expect("KEYWORD", "with")
            self.expect("KEYWORD", "key")
            if self.accept("OP", "=~"):
                st.key = self.expect("REGEX").value
                st.key_regex = True
            elif self.kw("in"):
                # WITH KEY IN (k1, k2): exact-set match, expressed as an
                # anchored alternation over the names
                self.expect("OP", "(")
                names = [self.expect("IDENT").value]
                while self.accept("OP", ","):
                    names.append(self.expect("IDENT").value)
                self.expect("OP", ")")
                st.key = "^(?:" + "|".join(re.escape(n) for n in names) + ")$"
                st.key_regex = True
            else:
                self.expect("OP", "=")
                st.key = self.expect("IDENT").value
        if self.kw("where"):
            st.where = self.expr()
        if self.kw("order"):
            # ORDER BY value [asc|desc] — an explicit order pins the
            # ascending slice; without it a time-bounded WHERE slices the
            # reverse index order (ShowTagValues_Disorder)
            self.expect("KEYWORD", "by")
            self.next()
            st.order_by_value = True
            t = self.peek()
            if t.kind in ("KEYWORD", "IDENT") and t.text.lower() in (
                "asc", "desc",
            ):
                self.next()
        if self.kw("limit"):
            st.limit = self.expect("INTEGER").value
        if self.kw("offset"):
            st.offset = self.expect("INTEGER").value

    def _opt_from(self) -> str | None:
        if self.kw("from"):
            return self.expect("IDENT").value
        return None

    def select_statement(self, sub: bool = False) -> ast.SelectStatement:
        # `SELECT DISTINCT field` — alternate syntax for distinct(field)
        # (influxql/parser.go parseFields DISTINCT token path)
        if self.kw("distinct"):
            arg = self.field()
            fields = [ast.Field(ast.Call("distinct", [arg.expr]), arg.alias)]
        else:
            fields = [self.field()]
        while self.accept("OP", ","):
            fields.append(self.field())
        into = None
        if self.kw("into"):
            into = self.expect("IDENT").value
        self.expect("KEYWORD", "from")
        source, alias = self._from_source()
        if (
            isinstance(source, str)
            and alias is None
            and self.peek().kind == "OP"
            and self.peek().text == ","
        ):
            names = [source]
            while self.accept("OP", ","):
                # multi-measurement FROM (SELECT … FROM m1, m2): one
                # independent plan + series block per source — expressed
                # as an exact-alternation regex source so the established
                # per-measurement machinery applies unchanged
                tok = self.expect("IDENT")
                self._record_src(tok)
                names.append(tok.value)
            alts = "|".join(
                re.escape(n.rsplit(".", 1)[-1]) for n in names
            )
            source = ast.RegexSource(f"^(?:{alts})$")
        elif (
            isinstance(source, ast.SelectStatement)
            and self.peek().kind == "OP"
            and self.peek().text == ","
        ):
            # FROM (SELECT …), (SELECT …): merged derived-table stream
            legs = [(source, alias)]
            while self.accept("OP", ","):
                legs.append(self._from_source())
            source = ast.MultiSource(legs)
            alias = None
        # JOIN chain (sql.y join grammar): left-nested JoinSource tree
        while self._peek_join():
            jt = self._join_type()
            rsrc, ralias = self._from_source()
            self.expect("KEYWORD", "on")
            cond = self.expr()
            source = ast.JoinSource(
                left=source,
                right=rsrc,
                condition=cond,
                join_type=jt,
                left_alias=None if isinstance(source, ast.JoinSource)
                else alias,
                right_alias=ralias,
            )
            alias = None

        stmt = ast.SelectStatement(fields=fields, source=source, into=into)
        if alias is not None and isinstance(source, ast.SelectStatement):
            # FROM (SELECT …) AS t2: qualified refs t2.x resolve to x
            # (Push_Down_Rule_Incondition "count(t2.additional)")
            stmt.source_alias = alias
        if self.kw("where"):
            stmt.where = self.expr()
        if self.kw("group"):
            self.expect("KEYWORD", "by")
            self._group_by(stmt)
        if self.kw("fill"):
            self.expect("OP", "(")
            t = self.next()
            if t.kind == "KEYWORD" and t.text in ("null", "none", "previous", "linear"):
                stmt.fill = t.text
            elif t.kind in ("NUMBER", "INTEGER"):
                stmt.fill = float(t.value)
            else:
                raise SyntaxError(f"InfluxQL: bad FILL option {t.text!r}")
            self.expect("OP", ")")
        if self.kw("order"):
            self.expect("KEYWORD", "by")
            if self.kw("time"):
                stmt.order_explicit = True
                if self.kw("desc"):
                    stmt.order_desc = True
                else:
                    self.kw("asc")
            else:
                # ORDER BY <column> [ASC|DESC] — columnstore primary-key
                # ordering (server_colstore_test.go Select_PKkey)
                col = self.next()
                stmt.order_by_col = col.value
                stmt.order_col_desc = bool(self.kw("desc"))
                if not stmt.order_col_desc:
                    self.kw("asc")
        if self.kw("limit"):
            stmt.limit = self.expect("INTEGER").value
        if self.kw("offset"):
            stmt.offset = self.expect("INTEGER").value
        if self.kw("slimit"):
            stmt.slimit = self.expect("INTEGER").value
        if self.kw("tz"):
            self.expect("OP", "(")
            stmt.tz = self.expect("STRING").value
            self.expect("OP", ")")
        if not sub:
            self.expect("EOF")
        return stmt

    def _maybe_union(self, left: ast.Node) -> ast.Node:
        """`… UNION [ALL] [BY NAME] <select | ( union-expr )>` chains
        (left-nested). `union` is context-sensitive like the join words."""
        while self.peek().kind == "IDENT" and self.peek().text.lower() == "union":
            self.next()
            all_ = False
            if self.peek().kind == "IDENT" and self.peek().text.lower() == "all":
                self.next()
                all_ = True
            by_name = False
            if self.kw("by"):
                t = self.next()
                if t.text.lower() != "name":
                    raise SyntaxError("InfluxQL: expected NAME after BY")
                by_name = True
            if self.accept("OP", "("):
                self.expect("KEYWORD", "select")
                inner: ast.Node = self.select_statement(sub=True)
                inner = self._maybe_union(inner)
                self.expect("OP", ")")
            else:
                self.expect("KEYWORD", "select")
                inner = self.select_statement(sub=True)
            left = ast.UnionStatement(left, inner, all_, by_name)
        return left

    def _from_source(self) -> tuple[object, str | None]:
        """One FROM item: (SELECT …) | /regex/ | measurement — with an
        optional AS alias."""
        if self.accept("OP", "("):
            self.expect("KEYWORD", "select")
            src: object = self.select_statement(sub=True)
            self.expect("OP", ")")
        elif self.peek().kind == "REGEX":
            return ast.RegexSource(self.next().value), None
        else:
            tok = self.expect("IDENT")
            if tok.text.endswith(".") and self.peek().kind == "REGEX":
                # qualified regex source: FROM db.rp./re/ | rp./re/ |
                # db../re/ (influxql measurement grammar)
                segs = _split_db_segments(tok.text)[:-1]
                if len(segs) >= 2:
                    self.src_meta.append((segs[0] or None, segs[1] or None))
                else:
                    self.src_meta.append((None, segs[0] or None))
                return ast.RegexSource(self.next().value), None
            self._record_src(tok)
            src = tok.value
        alias = None
        if self.kw("as"):
            alias = self.expect("IDENT").value
        return src, alias

    # join words are context-sensitive identifiers, not reserved keywords
    # (a measurement may legally be named `left`); only a FROM clause
    # treats them as syntax
    _JOIN_WORDS = {"inner", "left", "right", "outer", "full", "join"}

    def _peek_join(self) -> bool:
        t = self.peek()
        return t.kind == "IDENT" and t.text.lower() in self._JOIN_WORDS

    def _join_type(self) -> str:
        """INNER JOIN | LEFT [OUTER] JOIN | RIGHT [OUTER] JOIN |
        OUTER JOIN (full-outer, nulls) | FULL [OUTER] JOIN (full-outer,
        type-zero fill) | JOIN (inner)."""
        w = self.next().text.lower()
        if w == "join":
            return "inner"
        if w in ("left", "right", "full"):
            nxt = self.peek()
            if nxt.kind == "IDENT" and nxt.text.lower() == "outer":
                self.next()
        t = self.next()
        if not (t.kind == "IDENT" and t.text.lower() == "join"):
            raise SyntaxError("InfluxQL: expected JOIN")
        return w

    def _group_by(self, stmt: ast.SelectStatement) -> None:
        while True:
            if self.accept("OP", "*"):
                self._type_hint()   # GROUP BY *::tag ≡ GROUP BY *
                stmt.group_tags.append("*")
            elif self.kw("time"):
                self.expect("OP", "(")
                ivl = self.expect("DURATION").value
                off = 0
                if self.accept("OP", ","):
                    # negative offsets shift windows back (GroupByOffset
                    # "group by offset - negative"); -5s ≡ +5s mod 10s at
                    # the bucket layer, matching the reference
                    neg = self.accept("OP", "-") is not None
                    off = self.expect("DURATION").value
                    if neg:
                        off = -off
                self.expect("OP", ")")
                stmt.group_time = ast.TimeDimension(ivl, off)
            else:
                stmt.group_tags.append(self.expect("IDENT").value)
            if not self.accept("OP", ","):
                break

    # (wildcard group tags are expanded against the schema in the planner)

    def field(self) -> ast.Field:
        e = self.expr()
        alias = None
        if self.kw("as"):
            # alias may be quoted with single quotes (`as 'name'` —
            # server_test.go Constant_Column) or double quotes
            t = self.next()
            if t.kind not in ("IDENT", "STRING"):
                raise SyntaxError(f"InfluxQL: bad alias {t.text!r}")
            alias = t.value
        return ast.Field(e, alias)

    # --- expressions ---
    def expr(self) -> ast.Node:
        return self._or()

    def _or(self) -> ast.Node:
        lhs = self._and()
        while self.kw("or"):
            lhs = ast.BinaryExpr("or", lhs, self._and())
        return lhs

    def _and(self) -> ast.Node:
        lhs = self._cmp()
        while self.kw("and"):
            lhs = ast.BinaryExpr("and", lhs, self._cmp())
        return lhs

    _CMP_OPS = ("=", "!=", "<>", "<", "<=", ">", ">=", "=~", "!~")

    def _cmp(self) -> ast.Node:
        lhs = self._add()
        t = self.peek()
        negate = False
        if t.kind == "KEYWORD" and t.text == "not":
            self.next()
            negate = True
            t = self.peek()
        if t.kind == "KEYWORD" and t.text == "in":
            self.next()
            assert isinstance(lhs, ast.VarRef), "IN requires a column reference"
            self.expect("OP", "(")
            self.expect("KEYWORD", "select")
            sub = self.select_statement(sub=True)
            self.expect("OP", ")")
            return ast.InCondition(lhs.name, sub, negate)
        if negate:
            raise SyntaxError("InfluxQL: NOT only supported before IN")
        if t.kind == "OP" and t.text in self._CMP_OPS:
            self.next()
            op = "!=" if t.text == "<>" else t.text
            return ast.BinaryExpr(op, lhs, self._add())
        return lhs

    def _add(self) -> ast.Node:
        lhs = self._mul()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("+", "-"):
                self.next()
                lhs = ast.BinaryExpr(t.text, lhs, self._mul())
            else:
                return lhs

    def _mul(self) -> ast.Node:
        lhs = self._unary()
        while True:
            t = self.peek()
            if t.kind == "OP" and t.text in ("*", "/", "%"):
                self.next()
                lhs = ast.BinaryExpr(t.text, lhs, self._unary())
            else:
                return lhs

    def _unary(self) -> ast.Node:
        if self.accept("OP", "-"):
            return ast.UnaryExpr("-", self._unary())
        if self.kw("not"):
            return ast.UnaryExpr("not", self._unary())
        return self._primary()

    def _type_hint(self) -> str | None:
        """Optional `::tag | ::field | ::<type>` qualifier after a ref."""
        if self.accept("OP", "::"):
            t = self.next()
            if t.kind not in ("IDENT", "KEYWORD"):
                raise SyntaxError(f"InfluxQL: bad type qualifier {t.text!r}")
            return t.text.lower()
        return None

    def _primary(self) -> ast.Node:
        t = self.next()
        if t.kind == "OP" and t.text == "*":
            return ast.VarRef("*", hint=self._type_hint())
        if t.kind == "OP" and t.text == "(":
            e = self.expr()
            self.expect("OP", ")")
            return e
        if t.kind in ("NUMBER", "INTEGER", "STRING", "DURATION"):
            return ast.Literal(t.value)
        if t.kind == "REGEX":
            return ast.RegexLit(t.value)
        if t.kind == "KEYWORD" and t.text in ("time", "distinct"):
            # time as var ref; distinct(x) as call
            if t.text == "distinct":
                if self.accept("OP", "("):
                    arg = self.expr()
                    self.expect("OP", ")")
                    return ast.Call("distinct", [arg])
                if self.peek().kind == "IDENT":
                    # COUNT(DISTINCT x) — keyword form without parens
                    # (parser.go parseCall DISTINCT token path;
                    # server_test.go FloatMany "count distinct - float")
                    return ast.Call(
                        "distinct", [ast.VarRef(self.next().value)]
                    )
            return ast.VarRef("time")
        if t.kind == "KEYWORD" and t.text == "null":
            return ast.Literal(None)
        if t.kind == "IDENT" and t.value.lower() in ("true", "false"):
            # boolean literals (influxql scanner TRUE/FALSE tokens)
            return ast.Literal(t.value.lower() == "true")
        if t.kind == "IDENT":
            if self.accept("OP", "("):
                args: list[ast.Node] = []
                if not self.accept("OP", ")"):
                    args.append(self.expr())
                    while self.accept("OP", ","):
                        args.append(self.expr())
                    self.expect("OP", ")")
                return ast.Call(t.value.lower(), args)
            return ast.VarRef(t.value, hint=self._type_hint())
        raise SyntaxError(f"InfluxQL: unexpected token {t.text!r}")


def _resolve_ctes(stmt, ctes: dict, visiting: frozenset) -> None:
    """Substitute CTE references throughout a statement in place —
    FROM sources (plain, subquery, join legs) and IN-subqueries.
    Each substitution is a deep copy (the planner mutates statements);
    re-entering a name already being resolved is the reference's
    'recursive call to itself' error (cte_transform.go)."""
    import copy

    def resolve_source(src):
        if isinstance(src, str):
            name = src.rsplit(".", 1)[-1]
            if name in ctes:
                if name in visiting:
                    raise ValueError(
                        "Unsupported feature: recursive call to itself "
                        f"{name}"
                    )
                body = copy.deepcopy(ctes[name])
                _resolve_ctes(body, ctes, visiting | {name})
                # a CTE joins like a named table: outer GROUP BY dims
                # compile into it (cte_transform.go), unlike an inline
                # subquery leg whose projection is taken as-is
                body._og_from_cte = True
                return body
            return src
        if isinstance(src, ast.SelectStatement):
            _resolve_ctes(src, ctes, visiting)
            return src
        if isinstance(src, ast.JoinSource):
            # a CTE leg keeps its name as the display alias ("cte1,cte2")
            if (
                isinstance(src.left, str)
                and src.left in ctes
                and src.left_alias is None
            ):
                src.left_alias = src.left
            if (
                isinstance(src.right, str)
                and src.right in ctes
                and src.right_alias is None
            ):
                src.right_alias = src.right
            src.left = resolve_source(src.left)
            src.right = resolve_source(src.right)
            return src
        return src

    def walk_cond(n):
        if isinstance(n, ast.InCondition):
            _resolve_ctes(n.sub, ctes, visiting)
        elif isinstance(n, ast.BinaryExpr):
            walk_cond(n.lhs)
            walk_cond(n.rhs)
        elif isinstance(n, ast.UnaryExpr):
            walk_cond(n.expr)

    if isinstance(stmt, ast.UnionStatement):
        _resolve_ctes(stmt.left, ctes, visiting)
        _resolve_ctes(stmt.right, ctes, visiting)
    if isinstance(stmt, ast.SelectStatement):
        stmt.source = resolve_source(stmt.source)
        if stmt.where is not None:
            walk_cond(stmt.where)


def _fold_now(node, now_ns: int):
    """Replace ``now()`` with the statement-evaluation timestamp and
    constant-fold the surrounding ± duration arithmetic (the reference
    evaluates now() once per statement — condition.go RewriteTimeFields).
    Mutates the tree in place; returns the (possibly replaced) node."""
    if isinstance(node, ast.Call):
        if node.name == "now" and not node.args:
            return ast.Literal(now_ns)
        node.args = [_fold_now(a, now_ns) for a in node.args]
        return node
    if isinstance(node, ast.BinaryExpr):
        node.lhs = _fold_now(node.lhs, now_ns)
        node.rhs = _fold_now(node.rhs, now_ns)
        if (
            node.op in ("+", "-")
            and isinstance(node.lhs, ast.Literal)
            and isinstance(node.rhs, ast.Literal)
        ):
            lv, rv = node.lhs.value, node.rhs.value
            if isinstance(lv, str) and isinstance(rv, int):
                # time-string ± duration ('2000-01-01T…' - 1m) folds to ns
                # like now() arithmetic (condition.go RewriteTimeFields)
                try:
                    from opengemini_spark.influxql.planner import (
                        _parse_time_literal,
                    )

                    lv = _parse_time_literal(lv)
                except (ValueError, ImportError):
                    return node
            if isinstance(lv, int) and isinstance(rv, int):
                return ast.Literal(lv + rv if node.op == "+" else lv - rv)
        return node
    if isinstance(node, ast.UnaryExpr):
        node.expr = _fold_now(node.expr, now_ns)
        return node
    if isinstance(node, ast.SelectStatement):
        if node.where is not None:
            node.where = _fold_now(node.where, now_ns)
        if isinstance(
            node.source, (ast.SelectStatement, ast.UnionStatement)
        ):
            _fold_now(node.source, now_ns)
        return node
    if isinstance(node, ast.UnionStatement):
        _fold_now(node.left, now_ns)
        _fold_now(node.right, now_ns)
        return node
    return node


def parse(src: str, now_ns: int | None = None) -> ast.Node:
    import time as _time

    # optimizer hints (`/*+ full_series */` etc.): captured for the
    # planner (full_series / specific_series / filter_null_column change
    # match-and-emit behavior — server_test.go FullSeries, HintQuery_*),
    # then stripped from the token stream
    hints = {
        h.strip().lower()
        for m in re.findall(r"/\*\+(.*?)\*/", src)
        for h in m.split(",")
        if h.strip()
    }
    src = re.sub(r"/\*.*?\*/", " ", src)
    p = Parser(lex(src))
    stmt = p.parse_statement()
    try:
        stmt._og_src_meta = p.src_meta
    except AttributeError:
        pass
    if isinstance(stmt, ast.SelectStatement):
        stmt._og_hints = hints
    if isinstance(stmt, ast.SelectStatement):
        eff_now = now_ns if now_ns is not None else int(_time.time() * 1e9)
        _fold_now(stmt, eff_now)
        # the statement-evaluation instant also bounds unbounded GROUP BY
        # time spines (Null_Aggregate "LAST(*) group by time(12m) limit 5":
        # buckets run to now(), empty ones null-filled)
        stmt._og_now_ns = eff_now
    return stmt
