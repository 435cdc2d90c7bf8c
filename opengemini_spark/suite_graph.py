"""GRAPH multi-hop filter registrations (reference GraphStatement,
``engine/executor/graph.go:168`` MultiHopFilter).

The graph is derived deterministically from the TPC-H-ish tables:
customers / orders / parts are nodes; ``placed`` (customer→order) and
``contains`` (order→part, one per lineitem) are edges. Every value is a
string or int — no floats — so the DuckDB recursive-CTE oracle reproduces
the BFS bit-exactly: UNION-deduplicated ``(uid, lvl)`` rows bounded by the
hop count, ``MIN(lvl)`` = BFS distance (the walk-length relation and the
level-synchronous BFS agree on shortest distance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengemini_spark.catalog import load_table
from opengemini_spark.operators.graph import multi_hop_filter
from opengemini_spark.suite import register

START = "c1"
HOPS = 3
# contains-edges are traversable only for returned items; customer
# neighbors only in the BUILDING segment (exercises both the edge filter
# and the neighbor-side node filter).
EDGE_COND = "kind = 'placed' OR prop = 'R'"
NODE_COND = "kind != 'customer' OR prop = 'BUILDING'"


def graph_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Canonical (nodes, edges) DataFrames for the GRAPH suite queries."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def uid(prefix: str, col: str):
        return F.concat(F.lit(prefix), F.col(col).cast("string"))

    nodes = (
        cust.select(uid("c", "c_custkey").alias("uid"),
                    F.lit("customer").alias("kind"),
                    F.col("c_mktsegment").alias("prop"))
        .unionByName(orders.select(uid("o", "o_orderkey").alias("uid"),
                                   F.lit("order").alias("kind"),
                                   F.col("o_orderstatus").alias("prop")))
        .unionByName(part.select(uid("p", "p_partkey").alias("uid"),
                                 F.lit("part").alias("kind"),
                                 F.col("p_brand").alias("prop")))
    )
    edges = (
        orders.select(uid("ep", "o_orderkey").alias("uid"),
                      uid("c", "o_custkey").alias("src"),
                      uid("o", "o_orderkey").alias("dst"),
                      F.lit("placed").alias("kind"),
                      F.col("o_orderpriority").alias("prop"))
        .unionByName(
            li.select(
                F.concat(F.lit("el"), F.col("l_orderkey").cast("string"),
                         F.lit("-"), F.col("l_linenumber").cast("string")).alias("uid"),
                uid("o", "l_orderkey").alias("src"),
                uid("p", "l_partkey").alias("dst"),
                F.lit("contains").alias("kind"),
                F.col("l_returnflag").alias("prop"),
            )
        )
    )
    return nodes, edges


_GRAPH_CTE = f"""
    WITH RECURSIVE
    gnodes AS (
      SELECT 'c' || c_custkey AS uid, 'customer' AS kind, c_mktsegment AS prop FROM customer
      UNION ALL
      SELECT 'o' || o_orderkey, 'order', o_orderstatus FROM orders
      UNION ALL
      SELECT 'p' || p_partkey, 'part', p_brand FROM part
    ),
    gedges AS (
      SELECT 'ep' || o_orderkey AS uid, 'c' || o_custkey AS src,
             'o' || o_orderkey AS dst, 'placed' AS kind, o_orderpriority AS prop
      FROM orders
      UNION ALL
      SELECT 'el' || l_orderkey || '-' || l_linenumber, 'o' || l_orderkey,
             'p' || l_partkey, 'contains', l_returnflag
      FROM lineitem
    ),
    eok AS (SELECT * FROM gedges WHERE {EDGE_COND.replace("!=", "<>")}),
    trav AS (
      SELECT src AS cur, dst AS nbr, uid FROM eok
      UNION ALL
      SELECT dst AS cur, src AS nbr, uid FROM eok
    ),
    travok AS (
      SELECT t.cur, t.nbr, t.uid FROM trav t
      JOIN gnodes n ON n.uid = t.nbr
      WHERE n.kind <> 'customer' OR n.prop = 'BUILDING'
    ),
    bfs AS (
      SELECT '{START}' AS uid, 0 AS lvl
      UNION
      SELECT t.nbr, b.lvl + 1 FROM bfs b
      JOIN travok t ON t.cur = b.uid
      WHERE b.lvl < {HOPS}
    ),
    lv AS (SELECT uid, MIN(lvl) AS lvl FROM bfs GROUP BY uid)
"""


@register(
    "graph_multihop_nodes",
    _GRAPH_CTE + """
    SELECT n.uid, n.kind, n.prop, CAST(lv.lvl AS BIGINT) AS lvl
    FROM gnodes n JOIN lv USING (uid)
    """,
)
def q_graph_multihop_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = graph_tables(spark, sf_dir)
    nodes_out, _ = multi_hop_filter(
        nodes, edges, START, HOPS, node_cond=NODE_COND, edge_cond=EDGE_COND
    )
    return nodes_out.withColumn("lvl", F.col("lvl").cast("long"))


@register(
    "graph_multihop_edges",
    _GRAPH_CTE + """,
    m AS (
      SELECT DISTINCT t.uid FROM travok t
      JOIN lv ON lv.uid = t.cur
      WHERE lv.lvl <= """ + str(HOPS - 1) + """
    )
    SELECT e.uid, e.src, e.dst, e.kind, e.prop FROM gedges e JOIN m USING (uid)
    """,
)
def q_graph_multihop_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nodes, edges = graph_tables(spark, sf_dir)
    _, edges_out = multi_hop_filter(
        nodes, edges, START, HOPS, node_cond=NODE_COND, edge_cond=EDGE_COND
    )
    return edges_out
