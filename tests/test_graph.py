"""GRAPH statement / MultiHopFilter tests (reference
engine/executor/graph.go:168, graph_test.go)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opengemini_spark.influxql import parser
from opengemini_spark.influxql import ast
from opengemini_spark.operators.graph import (
    compile_graph_condition,
    multi_hop_filter,
    plan_graph,
)


@pytest.fixture(scope="module")
def tiny_graph(spark):
    #   a --e1-- b --e2-- c --e3-- d     (undirected traversal)
    #   a --e4-> x (kind=bad)            e5: c -> b (parallel back edge)
    nodes = spark.createDataFrame(
        [("a", "ok"), ("b", "ok"), ("c", "ok"), ("d", "ok"), ("x", "bad")],
        "uid string, kind string",
    )
    edges = spark.createDataFrame(
        [
            ("e1", "a", "b", "t"),
            ("e2", "b", "c", "t"),
            ("e3", "c", "d", "t"),
            ("e4", "a", "x", "t"),
            ("e5", "c", "b", "t"),
        ],
        "uid string, src string, dst string, kind string",
    )
    return nodes, edges


def test_bfs_levels_and_hop_bound(tiny_graph):
    nodes, edges = tiny_graph
    nodes_out, edges_out = multi_hop_filter(nodes, edges, "a", 2)
    lv = {r["uid"]: r["lvl"] for r in nodes_out.collect()}
    # d is 3 hops away -> excluded at hop_num=2
    assert lv == {"a": 0, "b": 1, "x": 1, "c": 2}
    # e3 (c->d) is incident to c, but c has lvl 2 = hop_num -> not processed
    assert {r["uid"] for r in edges_out.collect()} == {"e1", "e2", "e4", "e5"}


def test_bfs_traverses_incoming_edges(tiny_graph):
    nodes, edges = tiny_graph
    # start at d: reaches c via e3's *incoming* direction
    nodes_out, _ = multi_hop_filter(nodes, edges, "d", 1)
    lv = {r["uid"]: r["lvl"] for r in nodes_out.collect()}
    assert lv == {"d": 0, "c": 1}


def test_node_condition_blocks_neighbor_not_edge(tiny_graph):
    nodes, edges = tiny_graph
    nodes_out, edges_out = multi_hop_filter(
        nodes, edges, "a", 3, node_cond="kind = 'ok'"
    )
    uids = {r["uid"] for r in nodes_out.collect()}
    assert uids == {"a", "b", "c", "d"}          # x filtered out
    assert "e4" not in {r["uid"] for r in edges_out.collect()}


def test_edge_to_visited_node_is_collected(tiny_graph):
    nodes, edges = tiny_graph
    # processing b (lvl 1) finds e5's incoming direction back from c before
    # c is expanded — graph.go:264 adds the edge to the subgraph regardless
    # of the neighbor's visited state.
    _, edges_out = multi_hop_filter(nodes, edges, "a", 2)
    assert "e5" in {r["uid"] for r in edges_out.collect()}


def test_early_stop_when_frontier_empty(tiny_graph):
    nodes, edges = tiny_graph
    # hop_num far larger than the graph diameter terminates
    nodes_out, _ = multi_hop_filter(nodes, edges, "a", 50)
    assert nodes_out.count() == 5


def test_graph_statement_parse():
    stmt = parser.parse(
        "GRAPH 3 'c1' NODE (kind = 'order' OR seg != 'AUTO') EDGE (kind = 'placed')"
    )
    assert isinstance(stmt, ast.GraphStatement)
    assert stmt.hop_num == 3 and stmt.start_node_id == "c1"
    assert isinstance(stmt.node_condition, ast.BinaryExpr)
    assert stmt.edge_condition.op == "="


def test_condition_missing_tag_neq_semantics(spark):
    # graph.go:343-346 — a missing tag satisfies NEQ, never EQ
    nodes = spark.createDataFrame(
        [("a", "ok", {"seg": "AUTO"}), ("b", "ok", {}), ("c", "ok", {"seg": "B"})],
        "uid string, kind string, tags map<string,string>",
    )
    stmt = parser.parse("GRAPH 1 'a' NODE (seg != 'AUTO')")
    cond = compile_graph_condition(stmt.node_condition, nodes)
    got = {r["uid"] for r in nodes.filter(cond).collect()}
    assert got == {"b", "c"}
    eq = compile_graph_condition(
        parser.parse("GRAPH 1 'a' NODE (seg = 'AUTO')").node_condition, nodes
    )
    assert {r["uid"] for r in nodes.filter(eq).collect()} == {"a"}


def test_plan_graph_end_to_end(spark, tiny_graph):
    nodes, edges = tiny_graph
    stmt = parser.parse("GRAPH 2 'a' NODE (kind != 'bad')")
    nodes_out, edges_out = plan_graph(spark, stmt, nodes, edges)
    assert {r["uid"] for r in nodes_out.collect()} == {"a", "b", "c"}
    # e4's neighbor x fails the node condition; e3's origin c is lvl 2 (not
    # processed at hop_num=2); e5 is incident to processed b.
    assert {r["uid"] for r in edges_out.collect()} == {"e1", "e2", "e5"}


def test_suite_queries_run(spark, sf_dir):
    from opengemini_spark.suite_graph import (
        q_graph_multihop_edges,
        q_graph_multihop_nodes,
    )

    n = q_graph_multihop_nodes(spark, sf_dir)
    assert n.columns == ["uid", "kind", "prop", "lvl"]
    rows = n.collect()
    assert any(r["uid"] == "c1" and r["lvl"] == 0 for r in rows)
    assert all(r["lvl"] <= 3 for r in rows)
    e = q_graph_multihop_edges(spark, sf_dir)
    assert e.columns == ["uid", "src", "dst", "kind", "prop"]
    assert e.count() > 0


def test_graph_cte_statement(spark, sf_dir, tmp_path):
    """WITH t1 AS (GRAPH …) — a traversal as a CTE body, projected like a
    table and usable in IN subqueries (Push_Down_Rule_Incondition
    'WITH t1 AS (GRAPH 3 'ELB') … uid IN (SELECT uid FROM t1)')."""
    import json

    from opengemini_spark.api import handle_query, handle_write

    got = handle_query(
        spark, sf_dir,
        "WITH t1 AS (GRAPH 1 'c1') SELECT uid, kind FROM t1",
        epoch=None,
    )
    vals = got["results"][0]["series"][0]["values"]
    uids = {v[0] for v in vals}
    assert "c1" in uids and all(
        u == "c1" or u.startswith("o") for u in uids
    )

    # IN-subquery over graph uids: semi-join keeps only rows whose uid
    # is in the 1-hop neighborhood of c1
    root = str(tmp_path / "gcte")
    handle_write(spark, [
        "alarm,host=a additional=1,uid=\"c1\" 946684800000000000",
        "alarm,host=b additional=2,uid=\"zzz\" 946684800000000001",
    ], root)
    got2 = handle_query(
        spark, sf_dir,
        "WITH t1 AS (GRAPH 1 'c1') SELECT count(additional) FROM alarm "
        "WHERE uid IN (SELECT uid FROM t1)",
        epoch=None, data_root=root,
    )
    exp = json.loads(
        '{"results":[{"statement_id":0,"series":[{"name":"alarm",'
        '"columns":["time","count"],"values":[["1970-01-01T00:00:00Z",1]]}]}]}'
    )
    assert got2 == exp
