"""InfluxQL AST (subset of lib/util/lifted/influx/influxql/ast.go nodes)."""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


@dataclass
class VarRef(Node):
    name: str
    # `ref::tag` / `ref::field` / `*::tag` type qualifier (influxql
    # VarRef.Type; server_test.go HintQuery `select f1,*::tag`)
    hint: str | None = None


@dataclass
class Literal(Node):
    value: object          # str | int | float | bool | None


@dataclass
class RegexLit(Node):
    pattern: str


@dataclass
class Call(Node):
    name: str
    args: list[Node] = field(default_factory=list)


@dataclass
class BinaryExpr(Node):
    op: str                # = != < <= > >= =~ !~ + - * / % and or
    lhs: Node
    rhs: Node


@dataclass
class UnaryExpr(Node):
    op: str
    expr: Node


@dataclass
class InCondition(Node):
    """x [NOT] IN (SELECT f FROM …) — InCondition, influxql/ast.go:7677."""
    column: str
    sub: Node                 # SelectStatement
    negate: bool = False


@dataclass
class Field(Node):
    expr: Node
    alias: str | None = None


@dataclass
class TimeDimension(Node):
    interval_ns: int
    offset_ns: int = 0


@dataclass
class RegexSource(Node):
    """FROM /pattern/ — matches measurement names (influxql regex source,
    e.g. server_test.go:2158 `SELECT * FROM /cpu[13]/`)."""
    pattern: str


@dataclass
class MultiSource(Node):
    """FROM (SELECT …), (SELECT …), … — independent derived tables whose
    rows merge into one stream ordered (time, leg, series key); the series
    is named after the inner measurements joined with ','
    (server_test.go Constant_Column 'multi mst query normal with alias')."""
    legs: list                   # of (SelectStatement, alias | None)


@dataclass
class JoinSource(Node):
    """FROM a [AS x] <jt> JOIN b [AS y] ON <cond> [<jt> JOIN c ON …]
    (reference ast.go Join sources; sql.y JOIN grammar,
    engine/executor/hash_join_transform.go + full_join_transform.go).
    Cascading joins are left-nested: ``JoinSource(JoinSource(a,b), c)``.
    ``join_type``: inner | left | right | outer (full-outer, null fill)
    | full (full-outer, type-zero fill)."""
    left: object                 # str | SelectStatement | JoinSource
    right: object                # str | SelectStatement
    condition: Node              # AND tree of alias.col = alias.col
    join_type: str = "inner"
    left_alias: str | None = None
    right_alias: str | None = None


@dataclass
class SelectStatement(Node):
    fields: list[Field]
    source: object                      # measurement | RegexSource | SelectStatement
    into: str | None = None             # SELECT … INTO target
    where: Node | None = None
    group_time: TimeDimension | None = None
    group_tags: list[str] = field(default_factory=list)
    fill: str | float | None = None     # 'null' 'none' 'previous' 'linear' | number
    source_alias: str | None = None     # FROM (SELECT …) AS <alias>
    order_desc: bool = False
    order_explicit: bool = False        # ORDER BY written out (direction
    order_by_col: str | None = None     # ORDER BY <column> (columnstore PK)
    order_col_desc: bool = False
    # mismatch check: subqueries must sort the same way as the outer query)
    limit: int | None = None
    offset: int | None = None
    slimit: int | None = None
    tz: str | None = None


@dataclass
class UnionStatement(Node):
    """SELECT … UNION [ALL] [BY NAME] SELECT … (reference sql.y UNION
    grammar, engine/executor union transforms; server_test.go
    Union_Distinct_Push_Down_Rule). Plain UNION maps columns positionally
    (left side's names win) and de-duplicates; BY NAME matches columns by
    name with missing ones null; a parenthesized union may itself be an
    operand."""
    left: object                 # SelectStatement | UnionStatement
    right: object
    all: bool = False
    by_name: bool = False


@dataclass
class ShowStatement(Node):
    what: str                           # measurements | tag_keys | tag_values | field_keys
    source: str | None = None
    key: str | None = None              # for TAG VALUES WITH KEY = k
    source_pattern: str | None = None   # FROM /regex/
    key_regex: bool = False             # WITH KEY =~ /re/
    on_db: str | None = None            # SHOW … ON db
    where: Node | None = None           # tag filters (time conds ignored)
    limit: int | None = None            # per-measurement row limit
    offset: int | None = None
    order_by_value: bool = False        # explicit ORDER BY value given


@dataclass
class GraphStatement(Node):
    """GRAPH <hop_num> <start_node_id> [NODE <cond>] [EDGE <cond>]
    (reference ast.go:12282 GraphStatement, grammar sql.y:701)."""
    hop_num: int
    start_node_id: str
    node_condition: Node | None = None
    edge_condition: Node | None = None
