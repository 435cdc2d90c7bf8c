"""Graph multi-hop filter (the reference's 2025 GRAPH statement).

Reference semantics (``engine/executor/graph.go:168`` ``MultiHopFilter``,
AST ``lib/util/lifted/influx/influxql/ast.go:12282`` ``GraphStatement``,
grammar ``lib/util/lifted/influx/influxql/sql.y:701``
``GRAPH <hopNum> <startNodeId> [NODE <cond>] [EDGE <cond>]``):

- level-synchronous BFS from ``startNodeId``, following edges in BOTH
  directions (``graph.go:200-218`` checks outgoing then incoming), at most
  ``hopNum`` levels deep;
- an edge is traversable iff the edge condition matches the edge AND the
  node condition matches the NEIGHBOR endpoint (``graph.go:229-241``
  ``processEdges`` + ``isMatchQueryConditions`` — the node filter is
  evaluated on the far end of the hop, never on the current node);
- every matched edge incident to a processed (level < hopNum) node joins
  the result subgraph, even when the neighbor was already visited
  (``graph.go:264`` adds the edge before the visited check);
- result nodes are the start node plus every neighbor first reached
  through a matched edge.

Spark-first realization: the reference builds in-memory adjacency maps on
one coordinator (``graph.go:174-179``); here the traversal relation is a
DataFrame (both edge directions unioned, conditions applied declaratively
so Catalyst pushes them into the scan) and each BFS level is one hash join
frontier⋈traversal. ``hopNum`` is user-bounded and small (the grammar takes
a literal int), so the loop issues few jobs; ``localCheckpoint`` per level
truncates lineage, keeping round N from re-running rounds 1..N-1. At 100 TB
the per-level join shuffles only the frontier — the edge table is scanned
once into the traversal relation and reused across levels.

Condition compilation for the statement path mirrors the reference's
restricted predicate language (``graph.go:285-360``): EQ/NEQ between a
property name and a string literal, combined with AND/OR; property lookup
falls back over (kind, uid, tags map) and a missing tag satisfies NEQ but
never EQ (``graph.go:333-347``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from opengemini_spark.influxql import ast


def _as_cond(cond: Column | str | None, df: DataFrame) -> DataFrame:
    if cond is None:
        return df
    return df.filter(F.expr(cond) if isinstance(cond, str) else cond)


def multi_hop_filter(
    nodes: DataFrame,
    edges: DataFrame,
    start_uid: str,
    hop_num: int,
    node_cond: Column | str | None = None,
    edge_cond: Column | str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """BFS subgraph filter → ``(nodes + lvl, edges)``.

    ``nodes``: (uid, …props); ``edges``: (uid, src, dst, …props).
    ``node_cond`` / ``edge_cond``: boolean Column or SQL string over the
    respective DataFrame's columns (the GRAPH statement path compiles the
    reference's restricted condition AST down to exactly this).

    Returned nodes carry ``lvl`` = BFS distance (0 = start); returned edges
    are the matched edges whose traversal origin has ``lvl ≤ hop_num-1``.
    """
    spark = nodes.sparkSession
    e_ok = _as_cond(edge_cond, edges)
    nbr_ok = _as_cond(node_cond, nodes).select(F.col("uid").alias("nbr"))
    # traversal relation (cur → nbr via edge uid), both directions; the
    # node condition applies to the far endpoint, matching processEdges.
    trav = (
        e_ok.select(F.col("src").alias("cur"), F.col("dst").alias("nbr"), "uid")
        .unionByName(
            e_ok.select(F.col("dst").alias("cur"), F.col("src").alias("nbr"), "uid")
        )
        .join(nbr_ok, "nbr")
        .select("cur", "nbr", "uid")
    )
    levels = spark.createDataFrame([(start_uid, 0)], "uid string, lvl int")
    frontier = levels.select("uid")
    for hop in range(1, hop_num + 1):
        nxt = (
            trav.join(frontier.withColumnRenamed("uid", "cur"), "cur")
            .select(F.col("nbr").alias("uid"))
            .distinct()
            .join(levels.select("uid"), "uid", "left_anti")
            .withColumn("lvl", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels = levels.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("uid")
    nodes_out = nodes.join(levels, "uid").select(*nodes.columns, "lvl")
    processed = levels.filter(F.col("lvl") <= hop_num - 1).select(
        F.col("uid").alias("cur")
    )
    edge_ids = trav.join(processed, "cur").select("uid").distinct()
    edges_out = edges.join(edge_ids, "uid").select(*edges.columns)
    return nodes_out, edges_out


# ---------------------------------------------------------------------------
# GRAPH statement condition compiler (reference graph.go:285-360 semantics)
# ---------------------------------------------------------------------------

def _prop(df_cols: list[str], name: str) -> Column:
    """Property lookup: a flat column when present, else ``tags[name]``."""
    if name in df_cols:
        return F.col(name)
    return F.col("tags").getItem(name)


def compile_graph_condition(
    expr: ast.Node | None, df: DataFrame
) -> Column | None:
    """Compile the restricted GRAPH condition AST to a boolean Column.

    EQ: property exists and equals the literal (missing tag → false).
    NEQ: property missing OR differs (``graph.go:343-346`` returns true
    when the key is absent). AND/OR recurse; anything else is rejected
    like ``graph.go:298`` ("unsupported operator").
    """
    if expr is None:
        return None
    cols = df.columns
    if isinstance(expr, ast.BinaryExpr):
        op = expr.op.lower()
        if op in ("and", "or"):
            lhs = compile_graph_condition(expr.lhs, df)
            rhs = compile_graph_condition(expr.rhs, df)
            return (lhs & rhs) if op == "and" else (lhs | rhs)
        if op in ("=", "!=", "<>"):
            # either side may be the VarRef (graph.go:288-296)
            if isinstance(expr.lhs, ast.VarRef):
                ref, lit = expr.lhs, expr.rhs
            elif isinstance(expr.rhs, ast.VarRef):
                ref, lit = expr.rhs, expr.lhs
            else:
                raise ValueError("GRAPH condition needs a property reference")
            if not isinstance(lit, ast.Literal) or not isinstance(lit.value, str):
                raise ValueError("GRAPH condition compares to string literals")
            col = _prop(cols, ref.name)
            if op == "=":
                return col.isNotNull() & (col == lit.value)
            return col.isNull() | (col != lit.value)
        raise ValueError(f"GRAPH condition: unsupported operator {expr.op}")
    raise ValueError(f"GRAPH condition: unsupported expression {expr!r}")


def plan_graph(
    spark: SparkSession,
    stmt: "ast.GraphStatement",
    nodes: DataFrame,
    edges: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Execute a parsed GRAPH statement against node/edge DataFrames."""
    return multi_hop_filter(
        nodes,
        edges,
        stmt.start_node_id,
        stmt.hop_num,
        node_cond=compile_graph_condition(stmt.node_condition, nodes),
        edge_cond=compile_graph_condition(stmt.edge_condition, edges),
    )
