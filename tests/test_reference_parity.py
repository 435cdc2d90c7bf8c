"""Reference-suite parity: cases transcribed from the openGemini e2e suite
(`/root/reference/tests/server_test.go` — TestServer_Query_Count:1339,
Aggregates_IntMany:~2400), run end-to-end through OUR stack: line-protocol
write → storage → InfluxQL parse/plan → InfluxDB JSON, compared EXACTLY
against the reference's expected responses.

`now()`-relative timestamps in the original are pinned to fixed instants
(the reference computes `hour_ago` at runtime; semantics are identical).
"""

from __future__ import annotations

import pytest

from opengemini_spark.api import handle_query, handle_write

T0 = "946684800000000000"  # 2000-01-01T00:00:00Z ns

INTMANY = [
    f"intmany,host=server01 value=2.0 {946684800000000000}",
    f"intmany,host=server02 value=4.0 {946684810000000000}",
    f"intmany,host=server03 value=4.0 {946684820000000000}",
    f"intmany,host=server04 value=4.0 {946684830000000000}",
    f"intmany,host=server05 value=5.0 {946684840000000000}",
    f"intmany,host=server06 value=5.0 {946684850000000000}",
    f"intmany,host=server07 value=7.0 {946684860000000000}",
    f"intmany,host=server08 value=9.0 {946684870000000000}",
]

CASES = [
    # --- TestServer_Query_Count (server_test.go:1339) ---
    (
        "count(value)",
        "SELECT count(value) FROM db0.rp0.cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","count"],"values":[["1970-01-01T00:00:00Z",1]]}]}]}',
    ),
    (
        "count with where time",
        "SELECT count(value) FROM db0.rp0.cpu WHERE time >= '1999-12-31T23:00:00Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","count"],"values":[["1999-12-31T23:00:00Z",1]]}]}]}',
    ),
    (
        "count with excluding filter returns empty",
        "SELECT count(value) FROM db0.rp0.cpu WHERE value = 100 AND time >= '1999-12-31T23:00:00Z'",
        '{"results":[{"statement_id":0}]}',
    ),
    (
        "count(value1) with matching filter against value2",
        "SELECT count(value1) FROM db0.rp0.ram WHERE value2 = 2 AND time >= '1999-12-31T23:00:00Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"ram","columns":["time","count"],"values":[["1999-12-31T23:00:00Z",1]]}]}]}',
    ),
    (
        "count(value1) with non-matching filter",
        "SELECT count(value1) FROM db0.rp0.ram WHERE value2 = 3 AND time >= '1999-12-31T23:00:00Z'",
        '{"results":[{"statement_id":0}]}',
    ),
    (
        "count(*) expands the wildcard",
        "SELECT count(*) FROM db0.rp0.cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","count_value"],"values":[["1970-01-01T00:00:00Z",1]]}]}]}',
    ),
    # --- TestServer_Query_Aggregates_IntMany (server_test.go:~2400) ---
    (
        "first - int",
        "SELECT FIRST(value) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","first"],"values":[["2000-01-01T00:00:00Z",2.0]]}]}]}',
    ),
    (
        "last - int",
        "SELECT LAST(value) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","last"],"values":[["2000-01-01T00:01:10Z",9.0]]}]}]}',
    ),
    (
        "median - even count - int",
        "SELECT MEDIAN(value) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","median"],"values":[["1970-01-01T00:00:00Z",4.5]]}]}]}',
    ),
    (
        "median - odd count - int",
        "SELECT MEDIAN(value) FROM intmany WHERE time < '2000-01-01T00:01:10Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","median"],"values":[["1970-01-01T00:00:00Z",4.0]]}]}]}',
    ),
    (
        "distinct as call - int",
        "SELECT DISTINCT(value) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","distinct"],"values":[["1970-01-01T00:00:00Z",2.0],["1970-01-01T00:00:00Z",4.0],["1970-01-01T00:00:00Z",5.0],["1970-01-01T00:00:00Z",7.0],["1970-01-01T00:00:00Z",9.0]]}]}]}',
    ),
    (
        "mean and spread group by time",
        "SELECT SPREAD(value) FROM intmany WHERE time >= '2000-01-01' AND time < '2000-01-01T00:02:00Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","spread"],"values":[["2000-01-01T00:00:00Z",7.0]]}]}]}',
    ),
    # --- r2: text-path function parity (server_test.go:2369-2380 mode;
    # elapsed semantics per :3627 — emitted at the later point's time) ---
    (
        "mode - single - int",
        "SELECT MODE(value) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","mode"],"values":[["1970-01-01T00:00:00Z",4.0]]}]}]}',
    ),
    (
        "mode - bounded - int",
        "SELECT MODE(value) FROM intmany WHERE time < '2000-01-01T00:01:10Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","mode"],"values":[["1970-01-01T00:00:00Z",4.0]]}]}]}',
    ),
    (
        "elapsed in 10s units",
        "SELECT ELAPSED(value, 10s) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","elapsed"],"values":['
        '["2000-01-01T00:00:10Z",1],["2000-01-01T00:00:20Z",1],["2000-01-01T00:00:30Z",1],'
        '["2000-01-01T00:00:40Z",1],["2000-01-01T00:00:50Z",1],["2000-01-01T00:01:00Z",1],'
        '["2000-01-01T00:01:10Z",1]]}]}]}',
    ),
    (
        "integral trapezoid in 10s units",
        # points 2,4,4,4,5,5,7,9 at 10s spacing: trapezoids sum to 34.5
        "SELECT INTEGRAL(value, 10s) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","integral"],"values":[["1970-01-01T00:00:00Z",34.5]]}]}]}',
    ),
    (
        "sample of the full set is every point in time order",
        "SELECT SAMPLE(value, 8) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","sample"],"values":['
        '["2000-01-01T00:00:00Z",2.0],["2000-01-01T00:00:10Z",4.0],["2000-01-01T00:00:20Z",4.0],'
        '["2000-01-01T00:00:30Z",4.0],["2000-01-01T00:00:40Z",5.0],["2000-01-01T00:00:50Z",5.0],'
        '["2000-01-01T00:01:00Z",7.0],["2000-01-01T00:01:10Z",9.0]]}]}]}',
    ),
    (
        "distinct alt syntax - int",
        "SELECT DISTINCT value FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","distinct"],"values":[["1970-01-01T00:00:00Z",2.0],["1970-01-01T00:00:00Z",4.0],["1970-01-01T00:00:00Z",5.0],["1970-01-01T00:00:00Z",7.0],["1970-01-01T00:00:00Z",9.0]]}]}]}',
    ),
    # --- TestServer_Query_Aggregates_IntMany_GroupBy (server_test.go:2458) ---
    (
        "max group by 10s",
        "SELECT max(value) FROM intmany where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:14Z' group by time(10s)",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","max"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:10Z",4],["2000-01-01T00:00:20Z",4],["2000-01-01T00:00:30Z",4],["2000-01-01T00:00:40Z",5],["2000-01-01T00:00:50Z",5],["2000-01-01T00:01:00Z",7],["2000-01-01T00:01:10Z",9]]}]}]}',
    ),
    (
        "max group by 10s with bare time projection",
        "SELECT time, max(value) FROM intmany where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:14Z' group by time(10s)",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","max"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:10Z",4],["2000-01-01T00:00:20Z",4],["2000-01-01T00:00:30Z",4],["2000-01-01T00:00:40Z",5],["2000-01-01T00:00:50Z",5],["2000-01-01T00:01:00Z",7],["2000-01-01T00:01:10Z",9]]}]}]}',
    ),
    (
        "max group by 30s",
        "SELECT max(value) FROM intmany where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:14Z' group by time(30s)",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","max"],"values":[["2000-01-01T00:00:00Z",4],["2000-01-01T00:00:30Z",5],["2000-01-01T00:01:00Z",9]]}]}]}',
    ),
    (
        "min group by 15s",
        "SELECT min(value) FROM intmany where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:14Z' group by time(15s)",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","min"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:15Z",4],["2000-01-01T00:00:30Z",4],["2000-01-01T00:00:45Z",5],["2000-01-01T00:01:00Z",7]]}]}]}',
    ),
    (
        "min group by 15s with bare time projection",
        "SELECT time, min(value) FROM intmany where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:14Z' group by time(15s)",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","min"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:15Z",4],["2000-01-01T00:00:30Z",4],["2000-01-01T00:00:45Z",5],["2000-01-01T00:01:00Z",7]]}]}]}',
    ),
    (
        "first group by 15s",
        "SELECT first(value) FROM intmany where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:14Z' group by time(15s)",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","first"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:15Z",4],["2000-01-01T00:00:30Z",4],["2000-01-01T00:00:45Z",5],["2000-01-01T00:01:00Z",7]]}]}]}',
    ),
    (
        "last group by 15s",
        "SELECT last(value) FROM intmany where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:14Z' group by time(15s)",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","last"],"values":[["2000-01-01T00:00:00Z",4],["2000-01-01T00:00:15Z",4],["2000-01-01T00:00:30Z",5],["2000-01-01T00:00:45Z",5],["2000-01-01T00:01:00Z",9]]}]}]}',
    ),
    (
        "aggregate order by time desc",
        "SELECT max(value) FROM intmany where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:00Z' group by time(10s) order by time desc",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","max"],"values":[["2000-01-01T00:01:00Z",7],["2000-01-01T00:00:50Z",5],["2000-01-01T00:00:40Z",5],["2000-01-01T00:00:30Z",4],["2000-01-01T00:00:20Z",4],["2000-01-01T00:00:10Z",4],["2000-01-01T00:00:00Z",2]]}]}]}',
    ),
    (
        "rate over the full span",
        # (9-2) / 70s = 0.1 per second
        "SELECT RATE(value) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","rate"],"values":[["1970-01-01T00:00:00Z",0.1]]}]}]}',
    ),
    (
        "irate is the last-two-point slope",
        # (9-7) / 10s = 0.2 per second
        "SELECT IRATE(value) FROM intmany",
        '{"results":[{"statement_id":0,"series":[{"name":"intmany","columns":["time","irate"],"values":[["1970-01-01T00:00:00Z",0.2]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def data_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata"))
    handle_write(
        spark,
        [
            f"cpu,host=server01 value=1.0 {T0}",
            f"ram value1=1.0,value2=2.0 {T0}",
            *INTMANY,
        ],
        root,
    )
    return root


@pytest.mark.parametrize("name,q,exp", CASES, ids=[c[0] for c in CASES])
def test_reference_case(spark, sf_dir, data_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=data_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_TopBottomInt (server_test.go:5703) ---
TB_WRITES = [
    # cpu: overlapping duplicate values across three hours
    "cpu,host=server01 value=2.0 946684800000000000",   # 00:00:00
    "cpu,host=server02 value=3.0 946684810000000000",   # 00:00:10
    "cpu,host=server03 value=4.0 946684820000000000",   # 00:00:20
    "cpu,host=server04 value=3.0 946688400000000000",   # 01:00:00
    "cpu,host=server05 value=7.0 946688410000000000",   # 01:00:10
    "cpu,host=server06 value=6.0 946688420000000000",   # 01:00:20
    "cpu,host=server07 value=7.0 946692000000000000",   # 02:00:00
    "cpu,host=server08 value=9.0 946692010000000000",   # 02:00:10
    # memory: two tags
    "memory,host=a,service=redis value=1000i 946684800000000000",
    "memory,host=b,service=mysql value=2000i 946684800000000000",
    "memory,host=b,service=redis value=1500i 946684800000000000",
    "memory,host=a,service=redis value=1001i 946688400000000000",
    "memory,host=b,service=mysql value=2001i 946688400000000000",
    "memory,host=b,service=redis value=1501i 946688400000000000",
    "memory,host=a,service=redis value=1002i 946692000000000000",
    "memory,host=b,service=mysql value=2002i 946692000000000000",
    "memory,host=b,service=redis value=1502i 946692000000000000",
]

TB_CASES = [
    (
        "top - cpu",
        "SELECT TOP(value, 1) FROM cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","top"],"values":[["2000-01-01T02:00:10Z",9]]}]}]}',
    ),
    (
        "bottom - cpu",
        "SELECT BOTTOM(value, 1) FROM cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","bottom"],"values":[["2000-01-01T00:00:00Z",2]]}]}]}',
    ),
    (
        "top - cpu - 2 values",
        "SELECT TOP(value, 2) FROM cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","top"],"values":[["2000-01-01T01:00:10Z",7],["2000-01-01T02:00:10Z",9]]}]}]}',
    ),
    (
        "bottom - cpu - 2 values",
        "SELECT BOTTOM(value, 2) FROM cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","bottom"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:10Z",3]]}]}]}',
    ),
    (
        "top - cpu - 3 values - sorts on tie properly",
        "SELECT TOP(value, 3) FROM cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","top"],"values":[["2000-01-01T01:00:10Z",7],["2000-01-01T02:00:00Z",7],["2000-01-01T02:00:10Z",9]]}]}]}',
    ),
    (
        "bottom - cpu - 3 values - sorts on tie properly",
        "SELECT BOTTOM(value, 3) FROM cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","bottom"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:10Z",3],["2000-01-01T01:00:00Z",3]]}]}]}',
    ),
    (
        "top - cpu - with tag",
        "SELECT TOP(value, host, 2) FROM cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","top","host"],"values":[["2000-01-01T01:00:10Z",7,"server05"],["2000-01-01T02:00:10Z",9,"server08"]]}]}]}',
    ),
    (
        "bottom - cpu - with tag",
        "SELECT BOTTOM(value, host, 2) FROM cpu",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","bottom","host"],"values":[["2000-01-01T00:00:00Z",2,"server01"],["2000-01-01T00:00:10Z",3,"server02"]]}]}]}',
    ),
    (
        "top - cpu - 3 values with limit 2 errors",
        "SELECT TOP(value, 3) FROM cpu limit 2",
        '{"results":[{"statement_id":0,"error":"limit (3) in top function can not be larger than the LIMIT (2) in the select statement"}]}',
    ),
    (
        "top - cpu - hourly",
        "SELECT TOP(value, 1) FROM cpu where time >= '2000-01-01T00:00:00Z' and time <= '2000-01-01T02:00:10Z' group by time(1h)",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","top"],"values":[["2000-01-01T00:00:20Z",4],["2000-01-01T01:00:10Z",7],["2000-01-01T02:00:10Z",9]]}]}]}',
    ),
    (
        "bottom - cpu - hourly",
        "SELECT BOTTOM(value, 1) FROM cpu where time >= '2000-01-01T00:00:00Z' and time <= '2000-01-01T02:00:10Z' group by time(1h)",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","bottom"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T01:00:00Z",3],["2000-01-01T02:00:00Z",7]]}]}]}',
    ),
    (
        "top - cpu - 2 values hourly",
        "SELECT TOP(value, 2) FROM cpu where time >= '2000-01-01T00:00:00Z' and time <= '2000-01-01T02:00:10Z' group by time(1h)",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","top"],"values":[["2000-01-01T00:00:10Z",3],["2000-01-01T00:00:20Z",4],["2000-01-01T01:00:10Z",7],["2000-01-01T01:00:20Z",6],["2000-01-01T02:00:00Z",7],["2000-01-01T02:00:10Z",9]]}]}]}',
    ),
    (
        "top - cpu - 3 values hourly - buckets may underfill",
        "SELECT TOP(value, 3) FROM cpu where time >= '2000-01-01T00:00:00Z' and time <= '2000-01-01T02:00:10Z' group by time(1h)",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","top"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:10Z",3],["2000-01-01T00:00:20Z",4],["2000-01-01T01:00:00Z",3],["2000-01-01T01:00:10Z",7],["2000-01-01T01:00:20Z",6],["2000-01-01T02:00:00Z",7],["2000-01-01T02:00:10Z",9]]}]}]}',
    ),
    (
        "top - memory - 2 values, two tags",
        "SELECT TOP(value, 2), host, service FROM memory",
        '{"results":[{"statement_id":0,"series":[{"name":"memory","columns":["time","top","host","service"],"values":[["2000-01-01T01:00:00Z",2001,"b","mysql"],["2000-01-01T02:00:00Z",2002,"b","mysql"]]}]}]}',
    ),
    (
        "bottom - memory - 2 values, two tags",
        "SELECT BOTTOM(value, 2), host, service FROM memory",
        '{"results":[{"statement_id":0,"series":[{"name":"memory","columns":["time","bottom","host","service"],"values":[["2000-01-01T00:00:00Z",1000,"a","redis"],["2000-01-01T01:00:00Z",1001,"a","redis"]]}]}]}',
    ),
    (
        "top - memory - host tag with limit 2",
        "SELECT TOP(value, host, 2) FROM memory",
        '{"results":[{"statement_id":0,"series":[{"name":"memory","columns":["time","top","host"],"values":[["2000-01-01T02:00:00Z",2002,"b"],["2000-01-01T02:00:00Z",1002,"a"]]}]}]}',
    ),
    (
        "bottom - memory - host tag with limit 2",
        "SELECT BOTTOM(value, host, 2) FROM memory",
        '{"results":[{"statement_id":0,"series":[{"name":"memory","columns":["time","bottom","host"],"values":[["2000-01-01T00:00:00Z",1000,"a"],["2000-01-01T00:00:00Z",1500,"b"]]}]}]}',
    ),
    (
        "top - memory - host tag with limit 2, service in select",
        "SELECT TOP(value, host, 2), service FROM memory",
        '{"results":[{"statement_id":0,"series":[{"name":"memory","columns":["time","top","host","service"],"values":[["2000-01-01T02:00:00Z",2002,"b","mysql"],["2000-01-01T02:00:00Z",1002,"a","redis"]]}]}]}',
    ),
    (
        "top - memory - service tag with limit 2, host in select",
        "SELECT TOP(value, service, 2), host FROM memory",
        '{"results":[{"statement_id":0,"series":[{"name":"memory","columns":["time","top","service","host"],"values":[["2000-01-01T02:00:00Z",2002,"mysql","b"],["2000-01-01T02:00:00Z",1502,"redis","b"]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def tb_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_tb"))
    handle_write(spark, TB_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", TB_CASES, ids=[c[0] for c in TB_CASES])
def test_topbottom_case(spark, sf_dir, tb_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=tb_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- wildcard transform family over mst (server_test.go:3270-3281 fixture,
# :3574-3636 expectations) — tags country,name; fields age (float),
# height (int), address (string), alive (bool); holes in every field ---
MST_WRITES = [
    'mst,country=china,name=azhu age=12.3,height=70i,address="shenzhen",alive=TRUE 1629129600000000000',
    'mst,country=american,name=alan age=20.5,height=80i,address="shanghai",alive=FALSE 1629129601000000000',
    'mst,country=germany,name=alang age=3.4,height=90i,address="beijin",alive=TRUE 1629129602000000000',
    'mst,country=japan,name=ahui age=30,height=121i,address="guangzhou",alive=FALSE 1629129603000000000',
    'mst,country=canada,name=aqiu age=35,height=138i,address="chengdu",alive=TRUE 1629129604000000000',
    'mst,country=china,name=agang age=48.8,height=149i,address="wuhan" 1629129605000000000',
    'mst,country=american,name=agan age=52.7,height=153i,alive=TRUE 1629129606000000000',
    'mst,country=germany,name=alin age=28.3,address="anhui",alive=FALSE 1629129607000000000',
    'mst,country=japan,name=ali height=179i,address="xian",alive=TRUE 1629129608000000000',
    'mst,country=canada age=60.8,height=180i,address="hangzhou",alive=FALSE 1629129609000000000',
    'mst,name=ahuang age=102,height=191i,address="nanjin",alive=TRUE 1629129610000000000',
    'mst,country=china,name=ayin age=123,height=203i,address="zhengzhou",alive=FALSE 1629129611000000000',
]

MST_CASES = [
    (
        "DIFFERENCE(*)",
        "SELECT DIFFERENCE(*) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","difference_age","difference_height"],"values":[["2021-08-16T16:00:01Z",8.2,10],["2021-08-16T16:00:02Z",-17.1,10],["2021-08-16T16:00:03Z",26.6,31],["2021-08-16T16:00:04Z",5,17],["2021-08-16T16:00:05Z",13.799999999999997,11],["2021-08-16T16:00:06Z",3.9000000000000057,4],["2021-08-16T16:00:07Z",-24.400000000000002,null],["2021-08-16T16:00:08Z",null,26],["2021-08-16T16:00:09Z",32.5,1],["2021-08-16T16:00:10Z",41.2,11],["2021-08-16T16:00:11Z",21,12]]}]}]}',
    ),
    (
        "DIFFERENCE(*, front)",
        "SELECT DIFFERENCE(*, 'front') FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","difference_age","difference_height"],"values":[["2021-08-16T16:00:01Z",-8.2,-10],["2021-08-16T16:00:02Z",17.1,-10],["2021-08-16T16:00:03Z",-26.6,-31],["2021-08-16T16:00:04Z",-5,-17],["2021-08-16T16:00:05Z",-13.799999999999997,-11],["2021-08-16T16:00:06Z",-3.9000000000000057,-4],["2021-08-16T16:00:07Z",24.400000000000002,null],["2021-08-16T16:00:08Z",null,-26],["2021-08-16T16:00:09Z",-32.5,-1],["2021-08-16T16:00:10Z",-41.2,-11],["2021-08-16T16:00:11Z",-21,-12]]}]}]}',
    ),
    (
        "DIFFERENCE(*, absolute)",
        "SELECT DIFFERENCE(*, 'absolute') FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","difference_age","difference_height"],"values":[["2021-08-16T16:00:01Z",8.2,10],["2021-08-16T16:00:02Z",17.1,10],["2021-08-16T16:00:03Z",26.6,31],["2021-08-16T16:00:04Z",5,17],["2021-08-16T16:00:05Z",13.799999999999997,11],["2021-08-16T16:00:06Z",3.9000000000000057,4],["2021-08-16T16:00:07Z",24.400000000000002,null],["2021-08-16T16:00:08Z",null,26],["2021-08-16T16:00:09Z",32.5,1],["2021-08-16T16:00:10Z",41.2,11],["2021-08-16T16:00:11Z",21,12]]}]}]}',
    ),
    (
        "NON_NEGATIVE_DIFFERENCE(*)",
        "SELECT NON_NEGATIVE_DIFFERENCE(*) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","non_negative_difference_age","non_negative_difference_height"],"values":[["2021-08-16T16:00:01Z",8.2,10],["2021-08-16T16:00:02Z",null,10],["2021-08-16T16:00:03Z",26.6,31],["2021-08-16T16:00:04Z",5,17],["2021-08-16T16:00:05Z",13.799999999999997,11],["2021-08-16T16:00:06Z",3.9000000000000057,4],["2021-08-16T16:00:08Z",null,26],["2021-08-16T16:00:09Z",32.5,1],["2021-08-16T16:00:10Z",41.2,11],["2021-08-16T16:00:11Z",21,12]]}]}]}',
    ),
    (
        "DERIVATIVE(*)",
        "SELECT DERIVATIVE(*) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","derivative_age","derivative_height"],"values":[["2021-08-16T16:00:01Z",8.2,10],["2021-08-16T16:00:02Z",-17.1,10],["2021-08-16T16:00:03Z",26.6,31],["2021-08-16T16:00:04Z",5,17],["2021-08-16T16:00:05Z",13.799999999999997,11],["2021-08-16T16:00:06Z",3.9000000000000057,4],["2021-08-16T16:00:07Z",-24.400000000000002,null],["2021-08-16T16:00:08Z",null,13],["2021-08-16T16:00:09Z",16.25,1],["2021-08-16T16:00:10Z",41.2,11],["2021-08-16T16:00:11Z",21,12]]}]}]}',
    ),
    (
        "NON_NEGATIVE_DERIVATIVE(*)",
        "SELECT NON_NEGATIVE_DERIVATIVE(*) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","non_negative_derivative_age","non_negative_derivative_height"],"values":[["2021-08-16T16:00:01Z",8.2,10],["2021-08-16T16:00:02Z",null,10],["2021-08-16T16:00:03Z",26.6,31],["2021-08-16T16:00:04Z",5,17],["2021-08-16T16:00:05Z",13.799999999999997,11],["2021-08-16T16:00:06Z",3.9000000000000057,4],["2021-08-16T16:00:08Z",null,13],["2021-08-16T16:00:09Z",16.25,1],["2021-08-16T16:00:10Z",41.2,11],["2021-08-16T16:00:11Z",21,12]]}]}]}',
    ),
    (
        "ELAPSED(*)",
        "SELECT ELAPSED(*) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","elapsed_address","elapsed_age","elapsed_alive","elapsed_height"],"values":[["2021-08-16T16:00:01Z",1000000000,1000000000,1000000000,1000000000],["2021-08-16T16:00:02Z",1000000000,1000000000,1000000000,1000000000],["2021-08-16T16:00:03Z",1000000000,1000000000,1000000000,1000000000],["2021-08-16T16:00:04Z",1000000000,1000000000,1000000000,1000000000],["2021-08-16T16:00:05Z",1000000000,1000000000,null,1000000000],["2021-08-16T16:00:06Z",null,1000000000,2000000000,1000000000],["2021-08-16T16:00:07Z",2000000000,1000000000,1000000000,null],["2021-08-16T16:00:08Z",1000000000,null,1000000000,2000000000],["2021-08-16T16:00:09Z",1000000000,2000000000,1000000000,1000000000],["2021-08-16T16:00:10Z",1000000000,1000000000,1000000000,1000000000],["2021-08-16T16:00:11Z",1000000000,1000000000,1000000000,1000000000]]}]}]}',
    ),
    (
        "MOVING_AVERAGE(*, 2)",
        "SELECT MOVING_AVERAGE(* ,2) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","moving_average_age","moving_average_height"],"values":[["2021-08-16T16:00:01Z",16.4,75],["2021-08-16T16:00:02Z",11.949999999999998,85],["2021-08-16T16:00:03Z",16.699999999999996,105.5],["2021-08-16T16:00:04Z",32.5,129.5],["2021-08-16T16:00:05Z",41.9,143.5],["2021-08-16T16:00:06Z",50.75,151],["2021-08-16T16:00:07Z",40.5,null],["2021-08-16T16:00:08Z",null,166],["2021-08-16T16:00:09Z",44.55,179.5],["2021-08-16T16:00:10Z",81.4,185.5],["2021-08-16T16:00:11Z",112.5,197]]}]}]}',
    ),
    (
        "CUMULATIVE_SUM(*)",
        "SELECT CUMULATIVE_SUM(*) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","cumulative_sum_age","cumulative_sum_height"],"values":[["2021-08-16T16:00:00Z",12.3,70],["2021-08-16T16:00:01Z",32.8,150],["2021-08-16T16:00:02Z",36.199999999999996,240],["2021-08-16T16:00:03Z",66.19999999999999,361],["2021-08-16T16:00:04Z",101.19999999999999,499],["2021-08-16T16:00:05Z",150,648],["2021-08-16T16:00:06Z",202.7,801],["2021-08-16T16:00:07Z",231,null],["2021-08-16T16:00:08Z",null,980],["2021-08-16T16:00:09Z",291.8,1160],["2021-08-16T16:00:10Z",393.8,1351],["2021-08-16T16:00:11Z",516.8,1554]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def mst_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_mst"))
    handle_write(spark, MST_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", MST_CASES, ids=[c[0] for c in MST_CASES])
def test_wildcard_transform_case(spark, sf_dir, mst_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=mst_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Subqueries (server_test.go:6260) ---
SUBQ_WRITES = [
    "cpu,host=server01 usage_user=70i,usage_system=30i 946684800000000000",
    "cpu,host=server01 usage_user=45i,usage_system=55i 946684810000000000",
    "cpu,host=server01 usage_user=23i,usage_system=77i 946684820000000000",
    "cpu,host=server02 usage_user=11i,usage_system=89i 946684800000000000",
    "cpu,host=server02 usage_user=28i,usage_system=72i 946684810000000000",
    "cpu,host=server02 usage_user=12i,usage_system=53i 946684820000000000",
]

SUBQ_WHERE = "WHERE time >= '2000-01-01T00:00:00Z' AND time < '2000-01-01T00:00:30Z'"

SUBQ_CASES = [
    (
        "raw over mean subquery",
        f"SELECT value FROM (SELECT mean(usage_user) AS value FROM cpu) {SUBQ_WHERE}",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","value"],"values":[["2000-01-01T00:00:00Z",31.5]]}]}]}',
    ),
    (
        "mean over arithmetic subquery",
        f"SELECT mean(usage) FROM (SELECT 100 - usage_user AS usage FROM cpu) {SUBQ_WHERE}",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",68.5]]}]}]}',
    ),
    (
        "mean over grouped min subquery",
        f"SELECT mean(min) FROM (SELECT min(usage_user) FROM cpu GROUP BY host) {SUBQ_WHERE}",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",17]]}]}]}',
    ),
    (
        "max with companion over grouped min subquery",
        f"SELECT max(min), host FROM (SELECT min(usage_user) FROM cpu GROUP BY host) {SUBQ_WHERE}",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","max","host"],"values":[["2000-01-01T00:00:20Z",23,"server01"]]}]}]}',
    ),
    (
        "min of top with tag over subquery",
        f"SELECT min(top), host FROM (SELECT top(usage_user, host, 2) FROM cpu) {SUBQ_WHERE}",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","min","host"],"values":[["2000-01-01T00:00:10Z",28,"server02"]]}]}]}',
    ),
    (
        "count of tag column over top subquery",
        f"SELECT count(host) FROM (SELECT top(usage_user, host, 2) FROM cpu) {SUBQ_WHERE}",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","count"],"values":[["2000-01-01T00:00:00Z",2]]}]}]}',
    ),
]


# --- TestServer_Query_Null_Aggregate (server_test.go:3501): selectors
# with tag / expression companions over data with null tags and fields ---
NULLAGG_CASES = [
    (
        "top with tag companion incl null tag",
        "SELECT top(age, 2), country FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","top","country"],"values":[["2021-08-16T16:00:10Z",102,null],["2021-08-16T16:00:11Z",123,"china"]]}]}]}',
    ),
    (
        "top with expression companion",
        "SELECT top(age, 2), age - height AS value FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","top","value"],"values":[["2021-08-16T16:00:10Z",102,-89],["2021-08-16T16:00:11Z",123,-80]]}]}]}',
    ),
    (
        "max with expression companion group by tag incl empty tag",
        "SELECT max(age), age - height AS value FROM mst GROUP BY country",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"country":""},"columns":["time","max","value"],"values":[["2021-08-16T16:00:10Z",102,-89]]},{"name":"mst","tags":{"country":"american"},"columns":["time","max","value"],"values":[["2021-08-16T16:00:06Z",52.7,-100.3]]},{"name":"mst","tags":{"country":"canada"},"columns":["time","max","value"],"values":[["2021-08-16T16:00:09Z",60.8,-119.2]]},{"name":"mst","tags":{"country":"china"},"columns":["time","max","value"],"values":[["2021-08-16T16:00:11Z",123,-80]]},{"name":"mst","tags":{"country":"germany"},"columns":["time","max","value"],"values":[["2021-08-16T16:00:07Z",28.3,null]]},{"name":"mst","tags":{"country":"japan"},"columns":["time","max","value"],"values":[["2021-08-16T16:00:03Z",30,-91]]}]}]}',
    ),
]


NULLAGG_CASES.append(
    (
        "count of time counts every point",
        "SELECT COUNT(TIME) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","count"],"values":[["1970-01-01T00:00:00Z",12]]}]}]}',
    )
)
NULLAGG_CASES.append(
    (
        "bottom of bottom-with-expression subquery",
        "SELECT BOTTOM(value, 2) FROM (SELECT BOTTOM(age, 3), age - height AS value FROM mst GROUP BY country) WHERE time >= '2021-08-16T16:00:00Z' AND time < '2021-08-16T16:00:11Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","bottom"],"values":[["2021-08-16T16:00:04Z",-103],["2021-08-16T16:00:09Z",-119.2]]}]}]}',
    )
)


@pytest.mark.parametrize(
    "name,q,exp", NULLAGG_CASES, ids=[c[0] for c in NULLAGG_CASES]
)
def test_null_aggregate_case(spark, sf_dir, mst_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=mst_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Aggregates_GroupByOffset (server_test.go:2959) ---
OFFSET_WRITES = [
    "offsetm,region=us-east,host=serverA value=20.0 946684800000000000",
    "offsetm,region=us-east,host=serverB value=30.0 946684810000000000",
    "offsetm,region=us-west,host=serverC value=100.0 946684800000000000",
]

OFFSET_CASES = [
    (
        "group by offset standard",
        "SELECT sum(value) FROM offsetm WHERE time >= '1999-12-31T23:59:55Z' AND time < '2000-01-01T00:00:15Z' GROUP BY time(10s, 5s) FILL(0)",
        '{"results":[{"statement_id":0,"series":[{"name":"offsetm","columns":["time","sum"],"values":[["1999-12-31T23:59:55Z",120],["2000-01-01T00:00:05Z",30]]}]}]}',
    ),
    (
        "group by offset misaligned window",
        "SELECT sum(value) FROM offsetm WHERE time >= '2000-01-01T00:00:00Z' AND time < '2000-01-01T00:00:20Z' GROUP BY time(10s, 5s) FILL(0)",
        '{"results":[{"statement_id":0,"series":[{"name":"offsetm","columns":["time","sum"],"values":[["1999-12-31T23:59:55Z",120],["2000-01-01T00:00:05Z",30],["2000-01-01T00:00:15Z",0]]}]}]}',
    ),
    (
        "group by offset negative",
        "SELECT sum(value) FROM offsetm WHERE time >= '1999-12-31T23:59:55Z' AND time < '2000-01-01T00:00:15Z' GROUP BY time(10s, -5s) FILL(0)",
        '{"results":[{"statement_id":0,"series":[{"name":"offsetm","columns":["time","sum"],"values":[["1999-12-31T23:59:55Z",120],["2000-01-01T00:00:05Z",30]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def offset_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_offset"))
    handle_write(spark, OFFSET_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", OFFSET_CASES, ids=[c[0] for c in OFFSET_CASES])
def test_group_by_offset_case(spark, sf_dir, offset_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=offset_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_TimeCluster (server_test.go:4176): int-ns time
# literals, aliased sums, fill(none), tag-filtered ungrouped sums ---
TC_WRITES = [
    'tmst,country=china,name=azhu age=12i,height=70,address="shenzhen",alive=TRUE 1629129600000000000',
    'tmst,country=american,name=alan age=20i,height=80,address="shanghai",alive=FALSE 1629129601000000000',
    'tmst,country=germany,name=alang age=3i,height=90,address="beijin",alive=TRUE 1629129602000000000',
    'tmst,country=japan,name=ahui age=30i,height=121,address="guangzhou",alive=FALSE 1629129603000000000',
    'tmst,country=canada,name=aqiu age=35i,height=138,address="chengdu",alive=TRUE 1629129604000000000',
    'tmst,country=china,name=agang age=48i,height=149,address="wuhan",alive=TRUE 1629129605000000000',
    'tmst,country=american,name=agan age=52i,height=153,address="wuhan",alive=TRUE 1629129606000000000',
    'tmst,country=germany,name=alin age=28i,height=163,address="anhui",alive=FALSE 1629129607000000000',
    'tmst,country=japan,name=ali age=32i,height=173,address="xian",alive=TRUE 1629129608000000000',
    'tmst,country=canada,name=ali age=60i,height=180,address="hangzhou",alive=FALSE 1629129609000000000',
    'tmst,country=canada,name=ahuang age=102i,height=191,address="nanjin",alive=TRUE 1629129610000000000',
    'tmst,country=china,name=ayin age=123i,height=203,address="zhengzhou",alive=FALSE 1629129611000000000',
]

TC_CASES = [
    (
        "ns literals inner range fill(none)",
        "select sum(age) as sum_age, sum(height) as sum_height from tmst where time >= 1629129600000000000 and time <= 1629129604000000000 group by time(1s) fill(none)",
        '{"results":[{"statement_id":0,"series":[{"name":"tmst","columns":["time","sum_age","sum_height"],"values":[["2021-08-16T16:00:00Z",12,70],["2021-08-16T16:00:01Z",20,80],["2021-08-16T16:00:02Z",3,90],["2021-08-16T16:00:03Z",30,121],["2021-08-16T16:00:04Z",35,138]]}]}]}',
    ),
    (
        "tag filter china ungrouped",
        "select sum(age) as sum_age, sum(height) as sum_height from tmst where country = 'china'",
        '{"results":[{"statement_id":0,"series":[{"name":"tmst","columns":["time","sum_age","sum_height"],"values":[["1970-01-01T00:00:00Z",183,422]]}]}]}',
    ),
    (
        "tag filter germany ungrouped",
        "select sum(age) as sum_age, sum(height) as sum_height from tmst where country = 'germany'",
        '{"results":[{"statement_id":0,"series":[{"name":"tmst","columns":["time","sum_age","sum_height"],"values":[["1970-01-01T00:00:00Z",31,253]]}]}]}',
    ),
    (
        "tag filter canada ungrouped",
        "select sum(age) as sum_age, sum(height) as sum_height from tmst where country = 'canada'",
        '{"results":[{"statement_id":0,"series":[{"name":"tmst","columns":["time","sum_age","sum_height"],"values":[["1970-01-01T00:00:00Z",197,509]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def tc_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_tc"))
    handle_write(spark, TC_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", TC_CASES, ids=[c[0] for c in TC_CASES])
def test_timecluster_case(spark, sf_dir, tc_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=tc_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Sliding_Window_Aggregate (server_test.go:3390) ---
SLIDE_RANGE = (
    "where time >= '2021-08-16T16:00:00Z' and time < '2021-08-16T16:00:11Z'"
    " group by time(1s)"
)

SLIDING_CASES = [
    (
        "sliding_window max star",
        f"select sliding_window(max(*), 5) from mst {SLIDE_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","sliding_window_age","sliding_window_alive","sliding_window_height"],"values":[["2021-08-16T16:00:00Z",35,true,138],["2021-08-16T16:00:01Z",48.8,true,149],["2021-08-16T16:00:02Z",52.7,true,153],["2021-08-16T16:00:03Z",52.7,true,153],["2021-08-16T16:00:04Z",52.7,true,179],["2021-08-16T16:00:05Z",60.8,true,180],["2021-08-16T16:00:06Z",102,true,191]]}]}]}',
    ),
    (
        "sliding_window min star",
        f"select sliding_window(min(*), 5) from mst {SLIDE_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","sliding_window_age","sliding_window_alive","sliding_window_height"],"values":[["2021-08-16T16:00:00Z",3.4,false,70],["2021-08-16T16:00:01Z",3.4,false,80],["2021-08-16T16:00:02Z",3.4,false,90],["2021-08-16T16:00:03Z",28.3,false,121],["2021-08-16T16:00:04Z",28.3,false,138],["2021-08-16T16:00:05Z",28.3,false,149],["2021-08-16T16:00:06Z",28.3,false,153]]}]}]}',
    ),
    (
        "sliding_window count star",
        f"select sliding_window(count(*), 5) from mst {SLIDE_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","sliding_window_address","sliding_window_age","sliding_window_alive","sliding_window_height"],"values":[["2021-08-16T16:00:00Z",5,5,5,5],["2021-08-16T16:00:01Z",5,5,4,5],["2021-08-16T16:00:02Z",4,5,4,5],["2021-08-16T16:00:03Z",4,5,4,4],["2021-08-16T16:00:04Z",4,4,4,4],["2021-08-16T16:00:05Z",4,4,4,4],["2021-08-16T16:00:06Z",4,4,5,4]]}]}]}',
    ),
    (
        "sliding_window sum",
        f"select sliding_window(sum(height), 5) from mst {SLIDE_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","sliding_window"],"values":[["2021-08-16T16:00:00Z",499],["2021-08-16T16:00:01Z",578],["2021-08-16T16:00:02Z",651],["2021-08-16T16:00:03Z",561],["2021-08-16T16:00:04Z",619],["2021-08-16T16:00:05Z",661],["2021-08-16T16:00:06Z",703]]}]}]}',
    ),
    (
        "sliding_window mean",
        f"select sliding_window(mean(height), 5) from mst {SLIDE_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","sliding_window"],"values":[["2021-08-16T16:00:00Z",99.8],["2021-08-16T16:00:01Z",115.6],["2021-08-16T16:00:02Z",130.2],["2021-08-16T16:00:03Z",140.25],["2021-08-16T16:00:04Z",154.75],["2021-08-16T16:00:05Z",165.25],["2021-08-16T16:00:06Z",175.75]]}]}]}',
    ),
    (
        "sliding_window spread star",
        f"select sliding_window(spread(*), 5) from mst {SLIDE_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","sliding_window_age","sliding_window_height"],"values":[["2021-08-16T16:00:00Z",31.6,68],["2021-08-16T16:00:01Z",45.4,69],["2021-08-16T16:00:02Z",49.300000000000004,63],["2021-08-16T16:00:03Z",24.400000000000002,32],["2021-08-16T16:00:04Z",24.400000000000002,41],["2021-08-16T16:00:05Z",32.5,31],["2021-08-16T16:00:06Z",73.7,38]]}]}]}',
    ),
]


@pytest.mark.parametrize(
    "name,q,exp", SLIDING_CASES, ids=[c[0] for c in SLIDING_CASES]
)
def test_sliding_window_case(spark, sf_dir, mst_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=mst_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Blank_Row (server_test.go:3895): wildcard
# non-negative transforms drop rows where every expanded field is null ---
BLANK_WRITES = [
    "bmst,t=di f1=1,f2=3i 1579415564528082073",
    "bmst,t=di1 f1=-2,f2=-1i 1579415565558082073",
    "bmst,t=di f1=3 1579415566558082073",
    "bmst,t=di f1=2,f2=4i 1579415567558882073",
]

BLANK_CASES = [
    (
        "non_negative_difference star blank rows",
        "select non_negative_difference(*) from bmst",
        '{"results":[{"statement_id":0,"series":[{"name":"bmst","columns":["time","non_negative_difference_f1","non_negative_difference_f2"],"values":[["2020-01-19T06:32:46.558082073Z",5,null],["2020-01-19T06:32:47.558882073Z",null,5]]}]}]}',
    ),
    (
        "non_negative_derivative star blank rows",
        "select non_negative_derivative(*) from bmst",
        '{"results":[{"statement_id":0,"series":[{"name":"bmst","columns":["time","non_negative_derivative_f1","non_negative_derivative_f2"],"values":[["2020-01-19T06:32:46.558082073Z",5,null],["2020-01-19T06:32:47.558882073Z",null,2.4990003998400643]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def blank_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_blank"))
    handle_write(spark, BLANK_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", BLANK_CASES, ids=[c[0] for c in BLANK_CASES])
def test_blank_row_case(spark, sf_dir, blank_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=blank_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_SubqueryMath (server_test.go:7502) ---
SUBQM_WRITES = [
    "m0 f2=4,f3=2 946684800000000000",
    "m0 f1=5,f3=8 946684810000000000",
    "m0 f1=5,f2=3,f3=6 946684820000000000",
    "counter value=12 946684800000000000",
    "counter value=34 946684810000000000",
    "counter value=78 946684820000000000",
    "counter value=89 946684830000000000",
    "counter value=101 946684840000000000",
]

SUBQM_CASES = [
    (
        "sum of three fields with holes",
        "SELECT sum FROM (SELECT f1 + f2 + f3 AS sum FROM m0)",
        '{"results":[{"statement_id":0,"series":[{"name":"m0","columns":["time","sum"],"values":[["2000-01-01T00:00:00Z",null],["2000-01-01T00:00:10Z",null],["2000-01-01T00:00:20Z",14]]}]}]}',
    ),
    (
        "nth percentile of derivative",
        "SELECT percentile(derivative, 95) FROM (SELECT derivative(value, 1s) FROM counter) WHERE time >= '2000-01-01T00:00:00Z' AND time < '2000-01-01T00:00:50Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"counter","columns":["time","percentile"],"values":[["2000-01-01T00:00:20Z",4.4]]}]}]}',
    ),
]


@pytest.mark.parametrize("name,q,exp", SUBQM_CASES, ids=[c[0] for c in SUBQM_CASES])
def test_subquery_math_case(spark, sf_dir, subq_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=subq_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_SubqueryWithGroupBy (server_test.go:6422) ---
SUBQGB_WRITES = [
    "gcpu,host=server01,region=uswest value=1i 946684800000000000",
    "gcpu,host=server01,region=uswest value=2i 946684801000000000",
    "gcpu,host=server01,region=uswest value=3i 946684802000000000",
    "gcpu,host=server01,region=uswest value=4i 946684803000000000",
    "gcpu,host=server02,region=uswest value=5i 946684800000000000",
    "gcpu,host=server02,region=uswest value=6i 946684801000000000",
    "gcpu,host=server02,region=uswest value=7i 946684802000000000",
    "gcpu,host=server02,region=uswest value=8i 946684803000000000",
    "gcpu,host=server01,region=useast value=9i 946684800000000000",
    "gcpu,host=server01,region=useast value=10i 946684801000000000",
    "gcpu,host=server01,region=useast value=11i 946684802000000000",
    "gcpu,host=server01,region=useast value=12i 946684803000000000",
    "gcpu,host=server02,region=useast value=13i 946684800000000000",
    "gcpu,host=server02,region=useast value=14i 946684801000000000",
    "gcpu,host=server02,region=useast value=15i 946684802000000000",
    "gcpu,host=server02,region=useast value=16i 946684803000000000",
]

SUBQGB_WHERE = "WHERE time >= '2000-01-01T00:00:00Z' AND time < '2000-01-01T00:00:04Z'"

SUBQGB_CASES = [
    (
        "re-agg time(2s) over time(2s),host",
        f"SELECT mean(mean) FROM (SELECT mean(value) FROM gcpu GROUP BY time(2s), host) {SUBQGB_WHERE} GROUP BY time(2s)",
        '{"results":[{"statement_id":0,"series":[{"name":"gcpu","columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",7.5],["2000-01-01T00:00:02Z",9.5]]}]}]}',
    ),
    (
        "re-agg time(4s),host over time(2s),host",
        f"SELECT mean(mean) FROM (SELECT mean(value) FROM gcpu GROUP BY time(2s), host) {SUBQGB_WHERE} GROUP BY time(4s), host",
        '{"results":[{"statement_id":0,"series":[{"name":"gcpu","tags":{"host":"server01"},"columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",6.5]]},{"name":"gcpu","tags":{"host":"server02"},"columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",10.5]]}]}]}',
    ),
    (
        "re-agg time(2s),host over time(2s),host,region",
        f"SELECT mean(mean) FROM (SELECT mean(value) FROM gcpu GROUP BY time(2s), host, region) {SUBQGB_WHERE} GROUP BY time(2s), host",
        '{"results":[{"statement_id":0,"series":[{"name":"gcpu","tags":{"host":"server01"},"columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",5.5],["2000-01-01T00:00:02Z",7.5]]},{"name":"gcpu","tags":{"host":"server02"},"columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",9.5],["2000-01-01T00:00:02Z",11.5]]}]}]}',
    ),
]


@pytest.mark.parametrize(
    "name,q,exp", SUBQGB_CASES, ids=[c[0] for c in SUBQGB_CASES]
)
def test_subquery_groupby_case(spark, sf_dir, subq_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=subq_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def subq_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_subq"))
    handle_write(spark, SUBQ_WRITES + SUBQGB_WRITES + SUBQM_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", SUBQ_CASES, ids=[c[0] for c in SUBQ_CASES])
def test_subqueries_case(spark, sf_dir, subq_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=subq_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Fill_Bug_List (server_test.go:3948): fill(null)
# time spine per tag-set, ascending and ORDER BY time DESC emission ---
FILLBUG_WRITES = [
    "fmst,tag1=1 count=0 0",
    "fmst,tag1=2 count=4 4000000000",
    "fmst,tag1=3 count=2 2000000000",
    "fmst,tag1=4 count=0 0",
    "fmst,tag1=4 count=1 1000000000",
    "fmst,tag1=5 count=3 3000000000",
    "fmst,tag1=5 count=4 4000000000",
    "fmst,tag1=6 count=0 0",
    "fmst,tag1=6 count=4 4000000000",
]

FILLBUG_CASES = [
    (
        "fill(null) spine per tag-set",
        "select sum(count) from fmst where time >= 0 and time < 5000000000 group by time(1s),tag1",
        '{"results":[{"statement_id":0,"series":[{"name":"fmst","tags":{"tag1":"1"},"columns":["time","sum"],"values":[["1970-01-01T00:00:00Z",0],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:04Z",null]]},{"name":"fmst","tags":{"tag1":"2"},"columns":["time","sum"],"values":[["1970-01-01T00:00:00Z",null],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:04Z",4]]},{"name":"fmst","tags":{"tag1":"3"},"columns":["time","sum"],"values":[["1970-01-01T00:00:00Z",null],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:02Z",2],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:04Z",null]]},{"name":"fmst","tags":{"tag1":"4"},"columns":["time","sum"],"values":[["1970-01-01T00:00:00Z",0],["1970-01-01T00:00:01Z",1],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:04Z",null]]},{"name":"fmst","tags":{"tag1":"5"},"columns":["time","sum"],"values":[["1970-01-01T00:00:00Z",null],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:03Z",3],["1970-01-01T00:00:04Z",4]]},{"name":"fmst","tags":{"tag1":"6"},"columns":["time","sum"],"values":[["1970-01-01T00:00:00Z",0],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:04Z",4]]}]}]}',
    ),
    (
        "fill(null) spine order by time desc",
        "select sum(count) from fmst where time >= 0 and time < 5000000000 group by time(1s),tag1 order by time desc",
        '{"results":[{"statement_id":0,"series":[{"name":"fmst","tags":{"tag1":"6"},"columns":["time","sum"],"values":[["1970-01-01T00:00:04Z",4],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:00Z",0]]},{"name":"fmst","tags":{"tag1":"5"},"columns":["time","sum"],"values":[["1970-01-01T00:00:04Z",4],["1970-01-01T00:00:03Z",3],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:00Z",null]]},{"name":"fmst","tags":{"tag1":"4"},"columns":["time","sum"],"values":[["1970-01-01T00:00:04Z",null],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:01Z",1],["1970-01-01T00:00:00Z",0]]},{"name":"fmst","tags":{"tag1":"3"},"columns":["time","sum"],"values":[["1970-01-01T00:00:04Z",null],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:02Z",2],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:00Z",null]]},{"name":"fmst","tags":{"tag1":"2"},"columns":["time","sum"],"values":[["1970-01-01T00:00:04Z",4],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:00Z",null]]},{"name":"fmst","tags":{"tag1":"1"},"columns":["time","sum"],"values":[["1970-01-01T00:00:04Z",null],["1970-01-01T00:00:03Z",null],["1970-01-01T00:00:02Z",null],["1970-01-01T00:00:01Z",null],["1970-01-01T00:00:00Z",0]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def fillbug_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_fillbug"))
    handle_write(spark, FILLBUG_WRITES, root)
    return root


@pytest.mark.parametrize(
    "name,q,exp", FILLBUG_CASES, ids=[c[0] for c in FILLBUG_CASES]
)
def test_fillbug_case(spark, sf_dir, fillbug_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=fillbug_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_AggregateSelectors (server_test.go:5239) —
# selector + companion under GROUP BY time, bucketed distinct in
# first-occurrence order, tag/field distinction in SELECT * ---
NETWORK_WRITES = [
    "network,host=server01,region=west,cores=1 rx=10i,tx=20i,core=2i 946684800000000000",
    "network,host=server02,region=west,cores=2 rx=40i,tx=50i,core=3i 946684810000000000",
    "network,host=server03,region=east,cores=3 rx=40i,tx=55i,core=4i 946684820000000000",
    "network,host=server04,region=east,cores=4 rx=40i,tx=60i,core=1i 946684830000000000",
    "network,host=server05,region=west,cores=1 rx=50i,tx=70i,core=2i 946684840000000000",
    "network,host=server06,region=east,cores=2 rx=50i,tx=40i,core=3i 946684850000000000",
    "network,host=server07,region=west,cores=3 rx=70i,tx=30i,core=4i 946684860000000000",
    "network,host=server08,region=east,cores=4 rx=90i,tx=10i,core=1i 946684870000000000",
    "network,host=server09,region=east,cores=1 rx=5i,tx=4i,core=2i 946684880000000000",
]

AGGSEL_RANGE = (
    "where time >= '2000-01-01T00:00:00Z' AND time <= '2000-01-01T00:01:29Z'"
    " group by time(30s)"
)

AGGSEL_CASES = [
    (
        "baseline select star distinguishes tags from fields",
        "SELECT * FROM network",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","core","cores","host","region","rx","tx"],"values":[["2000-01-01T00:00:00Z",2,"1","server01","west",10,20],["2000-01-01T00:00:10Z",3,"2","server02","west",40,50],["2000-01-01T00:00:20Z",4,"3","server03","east",40,55],["2000-01-01T00:00:30Z",1,"4","server04","east",40,60],["2000-01-01T00:00:40Z",2,"1","server05","west",50,70],["2000-01-01T00:00:50Z",3,"2","server06","east",50,40],["2000-01-01T00:01:00Z",4,"3","server07","west",70,30],["2000-01-01T00:01:10Z",1,"4","server08","east",90,10],["2000-01-01T00:01:20Z",2,"1","server09","east",5,4]]}]}]}',
    ),
    (
        "max - baseline 30s",
        f"SELECT max(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","max"],"values":[["2000-01-01T00:00:00Z",40],["2000-01-01T00:00:30Z",50],["2000-01-01T00:01:00Z",90]]}]}]}',
    ),
    (
        "max - companion tx",
        f"SELECT tx, max(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","tx","max"],"values":[["2000-01-01T00:00:00Z",50,40],["2000-01-01T00:00:30Z",70,50],["2000-01-01T00:01:00Z",10,90]]}]}]}',
    ),
    (
        "max - time and tx",
        f"SELECT time, tx, max(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","tx","max"],"values":[["2000-01-01T00:00:00Z",50,40],["2000-01-01T00:00:30Z",70,50],["2000-01-01T00:01:00Z",10,90]]}]}]}',
    ),
    (
        "min - baseline 30s",
        f"SELECT min(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","min"],"values":[["2000-01-01T00:00:00Z",10],["2000-01-01T00:00:30Z",40],["2000-01-01T00:01:00Z",5]]}]}]}',
    ),
    (
        "first - companion tx",
        f"SELECT time, tx, first(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","tx","first"],"values":[["2000-01-01T00:00:00Z",20,10],["2000-01-01T00:00:30Z",60,40],["2000-01-01T00:01:00Z",30,70]]}]}]}',
    ),
    (
        "last - companion tx",
        f"SELECT tx, last(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","tx","last"],"values":[["2000-01-01T00:00:00Z",55,40],["2000-01-01T00:00:30Z",40,50],["2000-01-01T00:01:00Z",4,5]]}]}]}',
    ),
    (
        "max,min - baseline 30s",
        f"SELECT max(rx), min(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","max","min"],"values":[["2000-01-01T00:00:00Z",40,10],["2000-01-01T00:00:30Z",50,40],["2000-01-01T00:01:00Z",90,5]]}]}]}',
    ),
    (
        "count - baseline 30s",
        f"SELECT count(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","count"],"values":[["2000-01-01T00:00:00Z",3],["2000-01-01T00:00:30Z",3],["2000-01-01T00:01:00Z",3]]}]}]}',
    ),
    (
        "count with companion is an error",
        f"SELECT tx, count(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"error":"mixing aggregate and non-aggregate queries is not supported"}]}',
    ),
    (
        "distinct - baseline 30s first-occurrence order",
        f"SELECT distinct(rx) FROM network {AGGSEL_RANGE}",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","distinct"],"values":[["2000-01-01T00:00:00Z",10],["2000-01-01T00:00:00Z",40],["2000-01-01T00:00:30Z",40],["2000-01-01T00:00:30Z",50],["2000-01-01T00:01:00Z",70],["2000-01-01T00:01:00Z",90],["2000-01-01T00:01:00Z",5]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def network_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_network"))
    handle_write(spark, NETWORK_WRITES, root)
    return root


AGGSEL_CASES += [
    # TestServer_Query_Aggregates_Math (server_test.go:3192)
    (
        "math over two selectors stamps lower bound",
        "SELECT max(rx) * 1, min(rx) * 1 FROM network WHERE time >= '2000-01-01T00:00:00Z' AND time < '2000-01-01T00:01:30Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","max","min"],"values":[["2000-01-01T00:00:00Z",90,5]]}]}]}',
    ),
    (
        "math over a single selector keeps the row time",
        "SELECT max(rx) * 1 FROM network WHERE time >= '2000-01-01T00:00:00Z' AND time < '2000-01-01T00:01:30Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","max"],"values":[["2000-01-01T00:01:10Z",90]]}]}]}',
    ),
    (
        "count of distinct call",
        "SELECT COUNT(DISTINCT(rx)) FROM network",
        '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","count"],"values":[["1970-01-01T00:00:00Z",6]]}]}]}',
    ),
]


@pytest.mark.parametrize(
    "name,q,exp", AGGSEL_CASES, ids=[c[0] for c in AGGSEL_CASES]
)
def test_aggregate_selector_case(spark, sf_dir, network_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=network_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Math integer/string extensions (server_test.go:1178,
# :3114) — complements the existing floatm math block below with integer
# arithmetic, mixed-type multiplication, and string-field selectors ---
MATH2_WRITES = [
    "integer value=42i 946684800000000000",
    'stringdata value="first" 946684803000000000',
    'stringdata value="last" 946684804000000000',
]

MATH2_CASES = [
    (
        "multiple of integer value",
        "SELECT value * 2 from integer",
        '{"results":[{"statement_id":0,"series":[{"name":"integer","columns":["time","value"],"values":[["2000-01-01T00:00:00Z",84]]}]}]}',
    ),
    (
        "float multiple of integer value",
        "SELECT value * 2.0 from integer",
        '{"results":[{"statement_id":0,"series":[{"name":"integer","columns":["time","value"],"values":[["2000-01-01T00:00:00Z",84]]}]}]}',
    ),
    (
        "square and value",
        "SELECT value * value,value from integer",
        '{"results":[{"statement_id":0,"series":[{"name":"integer","columns":["time","value_value","value"],"values":[["2000-01-01T00:00:00Z",1764,42]]}]}]}',
    ),
    (
        "square of enclosed value",
        "SELECT ((value) * (value)) from integer",
        '{"results":[{"statement_id":0,"series":[{"name":"integer","columns":["time","value_value"],"values":[["2000-01-01T00:00:00Z",1764]]}]}]}',
    ),
    (
        "COUNT on string data",
        "SELECT COUNT(value) FROM stringdata",
        '{"results":[{"statement_id":0,"series":[{"name":"stringdata","columns":["time","count"],"values":[["1970-01-01T00:00:00Z",2]]}]}]}',
    ),
    (
        "FIRST on string data",
        "SELECT FIRST(value) FROM stringdata",
        '{"results":[{"statement_id":0,"series":[{"name":"stringdata","columns":["time","first"],"values":[["2000-01-01T00:00:03Z","first"]]}]}]}',
    ),
    (
        "LAST on string data",
        "SELECT LAST(value) FROM stringdata",
        '{"results":[{"statement_id":0,"series":[{"name":"stringdata","columns":["time","last"],"values":[["2000-01-01T00:00:04Z","last"]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def math2_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_math2"))
    handle_write(spark, MATH2_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", MATH2_CASES, ids=[c[0] for c in MATH2_CASES])
def test_math2_case(spark, sf_dir, math2_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=math2_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# difference modes over a GROUP BY country subquery, ORDER BY time DESC
# (server_test.go:3594-3604)
MST_SUBQ_CASES = [
    (
        "difference front over subquery",
        "select difference(age, 'front') from ( select * from mst group by country) group by country order by time desc",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"country":"germany"},"columns":["time","difference"],"values":[["2021-08-16T16:00:02Z",24.900000000000002]]},{"name":"mst","tags":{"country":"china"},"columns":["time","difference"],"values":[["2021-08-16T16:00:05Z",74.2],["2021-08-16T16:00:00Z",36.5]]},{"name":"mst","tags":{"country":"canada"},"columns":["time","difference"],"values":[["2021-08-16T16:00:04Z",25.799999999999997]]},{"name":"mst","tags":{"country":"american"},"columns":["time","difference"],"values":[["2021-08-16T16:00:01Z",32.2]]}]}]}',
    ),
    (
        "difference behind over subquery",
        "select difference(age, 'behind') from ( select * from mst group by country) group by country order by time desc",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"country":"germany"},"columns":["time","difference"],"values":[["2021-08-16T16:00:02Z",-24.900000000000002]]},{"name":"mst","tags":{"country":"china"},"columns":["time","difference"],"values":[["2021-08-16T16:00:05Z",-74.2],["2021-08-16T16:00:00Z",-36.5]]},{"name":"mst","tags":{"country":"canada"},"columns":["time","difference"],"values":[["2021-08-16T16:00:04Z",-25.799999999999997]]},{"name":"mst","tags":{"country":"american"},"columns":["time","difference"],"values":[["2021-08-16T16:00:01Z",-32.2]]}]}]}',
    ),
]


@pytest.mark.parametrize(
    "name,q,exp", MST_SUBQ_CASES, ids=[c[0] for c in MST_SUBQ_CASES]
)
def test_subquery_difference_case(spark, sf_dir, mst_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=mst_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


AGG_WILDCARD_CASES = [
    # server_test.go:3567 (BUG2021121702512) — selector wildcard over a
    # subquery; all four field types expand, null-skipping first per field
    (
        "FIRST(*) over subquery",
        "SELECT FIRST(*) FROM (SELECT * FROM mst)",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","first_address","first_age","first_alive","first_height"],"values":[["1970-01-01T00:00:00Z","shenzhen",12.3,true,70]]}]}]}',
    ),
    (
        "FIRST(*) direct",
        "SELECT FIRST(*) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","first_address","first_age","first_alive","first_height"],"values":[["1970-01-01T00:00:00Z","shenzhen",12.3,true,70]]}]}]}',
    ),
    (
        "LAST(*) direct",
        "SELECT LAST(*) FROM mst",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","last_address","last_age","last_alive","last_height"],"values":[["1970-01-01T00:00:00Z","zhengzhou",123,false,203]]}]}]}',
    ),
    (
        "MEAN(*) expands numeric fields only",
        "SELECT MEAN(*) FROM mst",
        # age: sum 516.8 over 11 non-null; height: 1554 over 11
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","mean_age","mean_height"],"values":[["1970-01-01T00:00:00Z",46.98181818181818,141.27272727272728]]}]}]}',
    ),
]


@pytest.mark.parametrize(
    "name,q,exp", AGG_WILDCARD_CASES, ids=[c[0] for c in AGG_WILDCARD_CASES]
)
def test_agg_wildcard_case(spark, sf_dir, mst_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=mst_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


GROUPED_CASES = [
    # TestServer_Query_SelectGroupByTime_MultipleAggregates (server_test.go:1987)
    (
        "two aggregates with a group by host",
        "SELECT mean(x) as x, mean(y) as y from db0.rp0.test where time >= 1s and time < 4s group by t, time(1s)",
        '{"results":[{"statement_id":0,"series":['
        '{"name":"test","tags":{"t":"a"},"columns":["time","x","y"],"values":[["1970-01-01T00:00:01Z",1,null],["1970-01-01T00:00:02Z",2,null],["1970-01-01T00:00:03Z",3,null]]},'
        '{"name":"test","tags":{"t":"b"},"columns":["time","x","y"],"values":[["1970-01-01T00:00:01Z",null,1],["1970-01-01T00:00:02Z",null,2],["1970-01-01T00:00:03Z",null,3]]}]}]}',
    ),
    # TestServer_Query_MathWithFill (server_test.go:2031)
    (
        "multiplication with fill previous",
        "SELECT 4*mean(value) FROM db0.rp0.cpu2 WHERE time >= '2010-07-01 18:47:00' AND time < '2010-07-01 18:48:30' GROUP BY time(30s) FILL(previous)",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu2","columns":["time","mean"],"values":[["2010-07-01T18:47:00Z",60],["2010-07-01T18:47:30Z",60],["2010-07-01T18:48:00Z",60]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def grouped_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata2"))
    handle_write(
        spark,
        [
            "test,t=a x=1i 1000000000",
            "test,t=b y=1i 1000000000",
            "test,t=a x=2i 2000000000",
            "test,t=b y=2i 2000000000",
            "test,t=a x=3i 3000000000",
            "test,t=b y=3i 3000000000",
            "cpu2 value=15 1278010020000000000",
        ],
        root,
    )
    return root


@pytest.mark.parametrize(
    "name,q,exp", GROUPED_CASES, ids=[c[0] for c in GROUPED_CASES]
)
def test_reference_grouped_case(spark, sf_dir, grouped_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=grouped_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


MATH_CASES = [
    # TestServer_Query_Math (server_test.go:1178); the reference marks the
    # value*value / alias variants skip:true (its engine can't run them) —
    # ours passes them against the documented expected outputs.
    (
        "multiple of float value",
        "SELECT value * 2 from db.rp.floatm",
        '{"results":[{"statement_id":0,"series":[{"name":"floatm","columns":["time","value"],"values":[["2000-01-01T00:00:00Z",84.0]]}]}]}',
    ),
    (
        "literal-first multiple",
        "SELECT 2 * value from db.rp.floatm",
        '{"results":[{"statement_id":0,"series":[{"name":"floatm","columns":["time","value"],"values":[["2000-01-01T00:00:00Z",84.0]]}]}]}',
    ),
    (
        "square of value",
        "SELECT value * value from db.rp.floatm",
        '{"results":[{"statement_id":0,"series":[{"name":"floatm","columns":["time","value_value"],"values":[["2000-01-01T00:00:00Z",1764.0]]}]}]}',
    ),
    (
        "square with alias",
        "SELECT value * value as square from db.rp.floatm",
        '{"results":[{"statement_id":0,"series":[{"name":"floatm","columns":["time","square"],"values":[["2000-01-01T00:00:00Z",1764.0]]}]}]}',
    ),
    (
        "sum of aggregates",
        "SELECT max(value) + min(value) from db.rp.floatm",
        '{"results":[{"statement_id":0,"series":[{"name":"floatm","columns":["time","max_min"],"values":[["1970-01-01T00:00:00Z",84.0]]}]}]}',
    ),
    (
        "enclosed square",
        "SELECT (value * value) from db.rp.floatm",
        '{"results":[{"statement_id":0,"series":[{"name":"floatm","columns":["time","value_value"],"values":[["2000-01-01T00:00:00Z",1764.0]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def math_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata3"))
    handle_write(spark, [f"floatm value=42 {T0}"], root)
    return root


@pytest.mark.parametrize("name,q,exp", MATH_CASES, ids=[c[0] for c in MATH_CASES])
def test_reference_math_case(spark, sf_dir, math_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=math_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


TAGS_CASES = [
    # TestServer_Query_Tags (server_test.go:1585)
    (
        "field with tag",
        "SELECT host, value FROM db0.rp0.cput",
        '{"results":[{"statement_id":0,"series":[{"name":"cput","columns":["time","host","value"],"values":[["2000-01-01T00:00:00Z","server01",100.0],["2000-01-01T00:00:00.000000001Z","server02",50.0]]}]}]}',
    ),
    (
        "field with tag and GROUP BY",
        "SELECT host, value FROM db0.rp0.cput GROUP BY host",
        '{"results":[{"statement_id":0,"series":[{"name":"cput","tags":{"host":"server01"},"columns":["time","host","value"],"values":[["2000-01-01T00:00:00Z","server01",100.0]]},{"name":"cput","tags":{"host":"server02"},"columns":["time","host","value"],"values":[["2000-01-01T00:00:00.000000001Z","server02",50.0]]}]}]}',
    ),
    (
        "group by tag",
        "SELECT value FROM db0.rp0.cput GROUP BY host",
        '{"results":[{"statement_id":0,"series":[{"name":"cput","tags":{"host":"server01"},"columns":["time","value"],"values":[["2000-01-01T00:00:00Z",100.0]]},{"name":"cput","tags":{"host":"server02"},"columns":["time","value"],"values":[["2000-01-01T00:00:00.000000001Z",50.0]]}]}]}',
    ),
    (
        "select * with tags",
        "SELECT * FROM db0.rp0.cput",
        '{"results":[{"statement_id":0,"series":[{"name":"cput","columns":["time","core","host","value"],"values":[["2000-01-01T00:00:00Z",4.0,"server01",100.0],["2000-01-01T00:00:00.000000001Z",2.0,"server02",50.0]]}]}]}',
    ),
    (
        "select * with GROUP BY *",
        "SELECT * FROM db0.rp0.cput GROUP BY *",
        '{"results":[{"statement_id":0,"series":[{"name":"cput","tags":{"host":"server01"},"columns":["time","core","value"],"values":[["2000-01-01T00:00:00Z",4.0,100.0]]},{"name":"cput","tags":{"host":"server02"},"columns":["time","core","value"],"values":[["2000-01-01T00:00:00.000000001Z",2.0,50.0]]}]}]}',
    ),
    (
        "single field EQ tag",
        "SELECT value FROM db0.rp0.cpu1 WHERE host = 'server01'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu1","columns":["time","value"],"values":[["2015-02-28T01:03:36.703820946Z",100.0]]}]}]}',
    ),
    (
        "two EQ tags",
        "SELECT value FROM db0.rp0.cpu1 WHERE host = 'server01' AND region = 'us-west'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu1","columns":["time","value"],"values":[["2015-02-28T01:03:36.703820946Z",100.0]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def tags_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata4"))
    handle_write(spark, [
        f"cput,host=server01 value=100,core=4 {T0}",
        f"cput,host=server02 value=50,core=2 {946684800000000001}",
        "cpu1,host=server01,region=us-west value=100 1425085416703820946",
        "cpu1,host=server02 value=200 1267319017703820946",
        "cpu1,host=server03 value=300 1330391018703820946",
    ], root)
    return root


@pytest.mark.parametrize("name,q,exp", TAGS_CASES, ids=[c[0] for c in TAGS_CASES])
def test_reference_tags_case(spark, sf_dir, tags_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=tags_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# TestServer_Query_EpochPrecision (server_test.go:1515): epoch param scaling
EPOCHS = [("n", 946684800000000000), ("u", 946684800000000), ("ms", 946684800000),
          ("s", 946684800), ("m", 15778080), ("h", 262968)]


@pytest.mark.parametrize("epoch,t", EPOCHS, ids=[e for e, _ in EPOCHS])
def test_reference_epoch_precision(spark, sf_dir, tags_root, epoch, t):
    got = handle_query(
        spark, sf_dir,
        "SELECT * FROM db0.rp0.cput GROUP BY * ", epoch=epoch,
        data_root=tags_root,
    )
    blk = got["results"][0]["series"][0]
    assert blk["tags"] == {"host": "server01"}
    assert blk["values"][0][0] == t


# --- TestServer_Query_Fill (server_test.go:8773): fill spine semantics —
# empty-match suppression, count zero-fill, implicit start time ---
FILL_WRITES = [
    "fills val=3 1257894002000000000",   # 2009-11-10T23:00:02Z
    "fills val=5 1257894003000000000",   # 23:00:03
    "fills val=4 1257894006000000000",   # 23:00:06
    "fills val=10 1257894016000000000",  # 23:00:16
]

_FR = "where time >= '2009-11-10T23:00:00Z' and time < '2009-11-10T23:00:20Z'"

FILL_CASES = [
    (
        "fill with value",
        f"select mean(val) from fills {_FR} group by time(5s) FILL(1)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","mean"],"values":[["2009-11-10T23:00:00Z",4],["2009-11-10T23:00:05Z",4],["2009-11-10T23:00:10Z",1],["2009-11-10T23:00:15Z",10]]}]}]}',
    ),
    (
        "fill with value, WHERE all values match condition",
        f"select mean(val) from fills {_FR} and val < 50 group by time(5s) FILL(1)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","mean"],"values":[["2009-11-10T23:00:00Z",4],["2009-11-10T23:00:05Z",4],["2009-11-10T23:00:10Z",1],["2009-11-10T23:00:15Z",10]]}]}]}',
    ),
    (
        "fill with value, WHERE no values match condition",
        f"select mean(val) from fills {_FR} and val > 50 group by time(5s) FILL(1)",
        '{"results":[{"statement_id":0}]}',
    ),
    (
        "fill with previous",
        f"select mean(val) from fills {_FR} group by time(5s) FILL(previous)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","mean"],"values":[["2009-11-10T23:00:00Z",4],["2009-11-10T23:00:05Z",4],["2009-11-10T23:00:10Z",4],["2009-11-10T23:00:15Z",10]]}]}]}',
    ),
    (
        "fill with none, i.e. clear out nulls",
        f"select mean(val) from fills {_FR} group by time(5s) FILL(none)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","mean"],"values":[["2009-11-10T23:00:00Z",4],["2009-11-10T23:00:05Z",4],["2009-11-10T23:00:15Z",10]]}]}]}',
    ),
    (
        "fill defaults to null",
        f"select mean(val) from fills {_FR} group by time(5s)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","mean"],"values":[["2009-11-10T23:00:00Z",4],["2009-11-10T23:00:05Z",4],["2009-11-10T23:00:10Z",null],["2009-11-10T23:00:15Z",10]]}]}]}',
    ),
    (
        "fill defaults to 0 for count",
        f"select count(val) from fills {_FR} group by time(5s)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","count"],"values":[["2009-11-10T23:00:00Z",2],["2009-11-10T23:00:05Z",1],["2009-11-10T23:00:10Z",0],["2009-11-10T23:00:15Z",1]]}]}]}',
    ),
    (
        "fill none drops 0s for count",
        f"select count(val) from fills {_FR} group by time(5s) fill(none)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","count"],"values":[["2009-11-10T23:00:00Z",2],["2009-11-10T23:00:05Z",1],["2009-11-10T23:00:15Z",1]]}]}]}',
    ),
    (
        "fill previous overwrites 0s for count",
        f"select count(val) from fills {_FR} group by time(5s) fill(previous)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","count"],"values":[["2009-11-10T23:00:00Z",2],["2009-11-10T23:00:05Z",1],["2009-11-10T23:00:10Z",1],["2009-11-10T23:00:15Z",1]]}]}]}',
    ),
    (
        "fill with implicit start time",
        "select mean(val) from fills where time < '2009-11-10T23:00:20Z' group by time(5s)",
        '{"results":[{"statement_id":0,"series":[{"name":"fills","columns":["time","mean"],"values":[["2009-11-10T23:00:00Z",4],["2009-11-10T23:00:05Z",4],["2009-11-10T23:00:10Z",null],["2009-11-10T23:00:15Z",10]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def fill_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_fill"))
    handle_write(spark, FILL_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", FILL_CASES, ids=[c[0] for c in FILL_CASES])
def test_fill_case(spark, sf_dir, fill_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=fill_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_LimitAndOffset (server_test.go:8658): raw + GROUP BY
# time LIMIT/OFFSET; raw GROUP BY tag limit is GLOBAL over the tag-major
# stream (SingleRowIgnoreTagLimit, schema.go:1265) ---
LIMITED_WRITES = [
    "limited,tennant=paul foo=2 1257894002000000000",
    "limited,tennant=paul foo=3 1257894003000000000",
    "limited,tennant=paul foo=4 1257894004000000000",
    "limited,tennant=todd foo=5 1257894005000000000",
]

_LR = "WHERE time >= '2009-11-10T23:00:02Z' AND time < '2009-11-10T23:00:06Z'"

LIMITED_CASES = [
    (
        "limit on points",
        'select foo from "limited" LIMIT 2',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","columns":["time","foo"],"values":[["2009-11-10T23:00:02Z",2],["2009-11-10T23:00:03Z",3]]}]}]}',
    ),
    (
        "limit higher than the number of data points",
        'select foo from "limited" LIMIT 20',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","columns":["time","foo"],"values":[["2009-11-10T23:00:02Z",2],["2009-11-10T23:00:03Z",3],["2009-11-10T23:00:04Z",4],["2009-11-10T23:00:05Z",5]]}]}]}',
    ),
    (
        "limit and offset",
        'select foo from "limited" LIMIT 2 OFFSET 1',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","columns":["time","foo"],"values":[["2009-11-10T23:00:03Z",3],["2009-11-10T23:00:04Z",4]]}]}]}',
    ),
    (
        "limit + offset equal to total number of points",
        'select foo from "limited" LIMIT 3 OFFSET 3',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","columns":["time","foo"],"values":[["2009-11-10T23:00:05Z",5]]}]}]}',
    ),
    (
        "limit - offset higher than number of points",
        'select foo from "limited" LIMIT 2 OFFSET 20',
        '{"results":[{"statement_id":0}]}',
    ),
    (
        "limit on points with group by time",
        f'select mean(foo) from "limited" {_LR} GROUP BY TIME(1s) LIMIT 2',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","columns":["time","mean"],"values":[["2009-11-10T23:00:02Z",2],["2009-11-10T23:00:03Z",3]]}]}]}',
    ),
    (
        "limit higher than points with group by time",
        f'select mean(foo) from "limited" {_LR} GROUP BY TIME(1s) LIMIT 20',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","columns":["time","mean"],"values":[["2009-11-10T23:00:02Z",2],["2009-11-10T23:00:03Z",3],["2009-11-10T23:00:04Z",4],["2009-11-10T23:00:05Z",5]]}]}]}',
    ),
    (
        "limit and offset with group by time",
        f'select mean(foo) from "limited" {_LR} GROUP BY TIME(1s) LIMIT 2 OFFSET 1',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","columns":["time","mean"],"values":[["2009-11-10T23:00:03Z",3],["2009-11-10T23:00:04Z",4]]}]}]}',
    ),
    (
        "limit + offset equal to points with group by time",
        f'select mean(foo) from "limited" {_LR} GROUP BY TIME(1s) LIMIT 3 OFFSET 3',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","columns":["time","mean"],"values":[["2009-11-10T23:00:05Z",5]]}]}]}',
    ),
    (
        "limit - offset higher than points with group by time",
        f'select mean(foo) from "limited" {_LR} GROUP BY TIME(1s) LIMIT 2 OFFSET 20',
        '{"results":[{"statement_id":0}]}',
    ),
    (
        "limit - group by tennant",
        'select foo from "limited" group by tennant limit 1',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","tags":{"tennant":"paul"},"columns":["time","foo"],"values":[["2009-11-10T23:00:02Z",2]]}]}]}',
    ),
    (
        "limit and offset - group by tennant",
        'select foo from "limited" group by tennant limit 1 offset 1',
        '{"results":[{"statement_id":0,"series":[{"name":"limited","tags":{"tennant":"paul"},"columns":["time","foo"],"values":[["2009-11-10T23:00:03Z",3]]}]}]}',
    ),
]


@pytest.fixture(scope="module")
def limited_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_limited"))
    handle_write(spark, LIMITED_WRITES, root)
    return root


@pytest.mark.parametrize(
    "name,q,exp", LIMITED_CASES, ids=[c[0] for c in LIMITED_CASES]
)
def test_limit_offset_case(spark, sf_dir, limited_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=limited_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Where_Fields (server_test.go:8173): typed field
# predicates (string/float/int/bool), missing-measurement error,
# boolean literals ---
WF_WRITES = [
    'cpu alert_id="alert",tenant_id="tenant",_cust="johnson brothers" 1425085416703820946',
    'cpu alert_id="alert",tenant_id="tenant",_cust="johnson brothers" 1425085416703820946',
    "cpu load=100.0,core=4 1257894002000000000",
    "cpu load=80.0,core=2 1257894062000000000",
    "clicks local=true 1415660401000000000",
    "clicks local=false 1415660402000000000",
]

WF_CASES = [
    (
        "missing measurement with group by",
        "SELECT load from missing group by *",
        '{"results":[{"statement_id":0,"error":"measurement not found"}]}',
    ),
    (
        "single string field",
        "SELECT alert_id FROM cpu WHERE alert_id='alert'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","alert_id"],"values":[["2015-02-28T01:03:36.703820946Z","alert"]]}]}]}',
    ),
    (
        "string AND query, all fields in SELECT",
        "SELECT alert_id,tenant_id,_cust FROM cpu WHERE alert_id='alert' AND tenant_id='tenant'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","alert_id","tenant_id","_cust"],"values":[["2015-02-28T01:03:36.703820946Z","alert","tenant","johnson brothers"]]}]}]}',
    ),
    (
        "string AND query, one in parenthesis",
        "SELECT alert_id,tenant_id FROM cpu WHERE alert_id='alert' AND (tenant_id='tenant')",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","alert_id","tenant_id"],"values":[["2015-02-28T01:03:36.703820946Z","alert","tenant"]]}]}]}',
    ),
    (
        "string underscored field",
        "SELECT alert_id FROM cpu WHERE _cust='johnson brothers'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","alert_id"],"values":[["2015-02-28T01:03:36.703820946Z","alert"]]}]}]}',
    ),
    (
        "string no match",
        "SELECT alert_id FROM cpu WHERE _cust='acme'",
        '{"results":[{"statement_id":0}]}',
    ),
    ("float64 GT no match", "select load from cpu where load > 100",
     '{"results":[{"statement_id":0}]}'),
    ("float64 GTE match one", "select load from cpu where load >= 100",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","load"],"values":[["2009-11-10T23:00:02Z",100]]}]}]}'),
    ("float64 EQ match upper bound", "select load from cpu where load = 100",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","load"],"values":[["2009-11-10T23:00:02Z",100]]}]}]}'),
    ("float64 LTE match two", "select load from cpu where load <= 100",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","load"],"values":[["2009-11-10T23:00:02Z",100],["2009-11-10T23:01:02Z",80]]}]}]}'),
    ("float64 GT match one", "select load from cpu where load > 99",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","load"],"values":[["2009-11-10T23:00:02Z",100]]}]}]}'),
    ("float64 EQ no match", "select load from cpu where load = 99",
     '{"results":[{"statement_id":0}]}'),
    ("float64 LT match one", "select load from cpu where load < 99",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","load"],"values":[["2009-11-10T23:01:02Z",80]]}]}]}'),
    ("float64 LT no match", "select load from cpu where load < 80",
     '{"results":[{"statement_id":0}]}'),
    ("float64 NE match one", "select load from cpu where load != 100",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","load"],"values":[["2009-11-10T23:01:02Z",80]]}]}]}'),
    ("int64 GT no match", "select core from cpu where core > 4",
     '{"results":[{"statement_id":0}]}'),
    ("int64 GTE match one", "select core from cpu where core >= 4",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","core"],"values":[["2009-11-10T23:00:02Z",4]]}]}]}'),
    ("int64 EQ match upper bound", "select core from cpu where core = 4",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","core"],"values":[["2009-11-10T23:00:02Z",4]]}]}]}'),
    ("int64 LTE match two", "select core from cpu where core <= 4",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","core"],"values":[["2009-11-10T23:00:02Z",4],["2009-11-10T23:01:02Z",2]]}]}]}'),
    ("int64 GT match one", "select core from cpu where core > 3",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","core"],"values":[["2009-11-10T23:00:02Z",4]]}]}]}'),
    ("int64 EQ no match", "select core from cpu where core = 3",
     '{"results":[{"statement_id":0}]}'),
    ("int64 LT match one", "select core from cpu where core < 3",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","core"],"values":[["2009-11-10T23:01:02Z",2]]}]}]}'),
    ("int64 LT no match", "select core from cpu where core < 2",
     '{"results":[{"statement_id":0}]}'),
    ("int64 NE match one", "select core from cpu where core != 4",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","core"],"values":[["2009-11-10T23:01:02Z",2]]}]}]}'),
    ("bool EQ match true", "select local from clicks where local = true",
     '{"results":[{"statement_id":0,"series":[{"name":"clicks","columns":["time","local"],"values":[["2014-11-10T23:00:01Z",true]]}]}]}'),
    ("bool EQ match false", "select local from clicks where local = false",
     '{"results":[{"statement_id":0,"series":[{"name":"clicks","columns":["time","local"],"values":[["2014-11-10T23:00:02Z",false]]}]}]}'),
    ("bool NE match one", "select local from clicks where local != true",
     '{"results":[{"statement_id":0,"series":[{"name":"clicks","columns":["time","local"],"values":[["2014-11-10T23:00:02Z",false]]}]}]}'),
]


@pytest.fixture(scope="module")
def wf_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_wf"))
    handle_write(spark, WF_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", WF_CASES, ids=[c[0] for c in WF_CASES])
def test_where_fields_case(spark, sf_dir, wf_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=wf_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Where_With_Tags (server_test.go:8393): tag/field
# predicate mixes, nonexistent-column comparisons are FALSE, tag-vs-field
# comparison ---
WT_WRITES = [
    'where_events,tennant=paul foo="bar" 1257894002000000000',
    'where_events,tennant=paul foo="baz" 1257894003000000000',
    'where_events,tennant=paul foo="bat" 1257894004000000000',
    'where_events,tennant=todd foo="bar" 1257894005000000000',
    'where_events,tennant=david foo="bap" 1257894006000000000',
]

_WT4 = '[["2009-11-10T23:00:02Z","bar"],["2009-11-10T23:00:03Z","baz"],["2009-11-10T23:00:04Z","bat"],["2009-11-10T23:00:05Z","bar"]]'
_WT3 = '[["2009-11-10T23:00:02Z","bar"],["2009-11-10T23:00:03Z","baz"],["2009-11-10T23:00:05Z","bar"]]'


def _wt_series(v):
    return (
        '{"results":[{"statement_id":0,"series":[{"name":"where_events",'
        '"columns":["time","foo"],"values":' + v + "}]}]}"
    )


WT_CASES = [
    ("tag field and time",
     "select foo from where_events where (tennant = 'paul' OR tennant = 'david') AND time > 1s AND (foo = 'bar' OR foo = 'baz' OR foo = 'bap')",
     _wt_series('[["2009-11-10T23:00:02Z","bar"],["2009-11-10T23:00:03Z","baz"],["2009-11-10T23:00:06Z","bap"]]')),
    ("tag or field", "select foo from where_events where tennant = 'paul' OR foo = 'bar'", _wt_series(_WT4)),
    ("field or tag", "select foo from where_events where foo = 'bar' OR tennant = 'paul'", _wt_series(_WT4)),
    ("tag or tag", "select foo from where_events where tennant = 'todd' OR tennant = 'paul'", _wt_series(_WT4)),
    ("field or field", "select foo from where_events where foo = 'bar' OR foo = 'baz'", _wt_series(_WT3)),
    ("tag or parent field", "select foo from where_events where foo = 'bar' OR ((foo = 'baz'))", _wt_series(_WT3)),
    ("parent field or tag", "select foo from where_events where ((foo = 'baz')) OR foo = 'bar'", _wt_series(_WT3)),
    ("parent field or parent field", "select foo from where_events where ((foo = 'bar')) OR ((foo = 'baz'))", _wt_series(_WT3)),
    ("tag and field", "select foo from where_events where tennant = 'paul' AND foo = 'bar'",
     _wt_series('[["2009-11-10T23:00:02Z","bar"]]')),
    ("field and tag", "select foo from where_events where foo = 'bar' AND tennant = 'paul'",
     _wt_series('[["2009-11-10T23:00:02Z","bar"]]')),
    ("field and field", "select foo from where_events where foo = 'bar' AND foo = 'bat'",
     '{"results":[{"statement_id":0}]}'),
    ("tag and parent field", "select foo from where_events where tennant = 'paul' AND ((foo = 'bar'))",
     _wt_series('[["2009-11-10T23:00:02Z","bar"]]')),
    ("parent field and tag", "select foo from where_events where ((foo = 'bar')) AND tennant = 'paul'",
     _wt_series('[["2009-11-10T23:00:02Z","bar"]]')),
    ("parent field and parent field", "select foo from where_events where ((foo = 'bar')) AND ((foo = 'bat'))",
     '{"results":[{"statement_id":0}]}'),
    ("non-existant tag and field", "select foo from where_events where tenant != 'paul' AND foo = 'bar'",
     '{"results":[{"statement_id":0}]}'),
    ("non-existant tag or field", "select foo from where_events where tenant != 'paul' OR foo = 'bar'",
     _wt_series('[["2009-11-10T23:00:02Z","bar"],["2009-11-10T23:00:05Z","bar"]]')),
    ("where comparing tag and field", "select foo from where_events where tennant != foo",
     _wt_series('[["2009-11-10T23:00:02Z","bar"],["2009-11-10T23:00:03Z","baz"],["2009-11-10T23:00:04Z","bat"],["2009-11-10T23:00:05Z","bar"],["2009-11-10T23:00:06Z","bap"]]')),
]


@pytest.fixture(scope="module")
def wt_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_wt"))
    handle_write(spark, WT_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", WT_CASES, ids=[c[0] for c in WT_CASES])
def test_where_with_tags_case(spark, sf_dir, wt_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=wt_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Selectors (server_test.go:5623) + DivByZero
# (server_test.go:1281): bare selectors over ints; Go float division
# (x/0 → ±Inf/NaN) surfacing as the reference's JSON marshal error ---
SEL_CASES = [
    ("max - tx", "SELECT max(tx) FROM network",
     '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","max"],"values":[["2000-01-01T00:00:40Z",70]]}]}]}'),
    ("min - tx", "SELECT min(tx) FROM network",
     '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","min"],"values":[["2000-01-01T00:01:20Z",4]]}]}]}'),
    ("selector first", "SELECT first(tx) FROM network",
     '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","first"],"values":[["2000-01-01T00:00:00Z",20]]}]}]}'),
    ("selector last", "SELECT last(tx) FROM network",
     '{"results":[{"statement_id":0,"series":[{"name":"network","columns":["time","last"],"values":[["2000-01-01T00:01:20Z",4]]}]}]}'),
]

_GO_NAN_ERR = (
    'struct { Results []*query.Result "json:\\"results,omitempty\\""; '
    'Err string "json:\\"error,omitempty\\"" }.Results: []*query.Result: '
    "json: unsupported value: NaN or ±Infinite"
)


@pytest.mark.parametrize("name,q,exp", SEL_CASES, ids=[c[0] for c in SEL_CASES])
def test_selectors_case(spark, sf_dir, network_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=network_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def divzero_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_divzero"))
    handle_write(spark, [
        "inf value=42 946684800000000000",
        "negativeInf value=-42 946684800000000000",
        "nan value=0 946684800000000000",
    ], root)
    return root


@pytest.mark.parametrize("m", ["inf", "negativeInf", "nan"])
def test_div_by_zero_marshal_error(spark, sf_dir, divzero_root, m):
    got = handle_query(
        spark, sf_dir, f"SELECT value / 0 from {m}", epoch=None,
        data_root=divzero_root,
    )
    assert got == {"error": _GO_NAN_ERR}


# --- TestServer_Query_IdenticalTagValues (server_test.go:1040): sparse
# tag-sets (missing tag renders "") forming distinct series ---
IDTAG_CASES = [
    ("identical tag values - SELECT *, GROUP BY *", "SELECT * FROM db0.rp0.cpu GROUP BY *",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","tags":{"t1":"","t2":"val2"},"columns":["time","value"],"values":[["2000-01-01T00:01:00Z",2]]},{"name":"cpu","tags":{"t1":"val1","t2":""},"columns":["time","value"],"values":[["2000-01-01T00:00:00Z",1]]},{"name":"cpu","tags":{"t1":"val2","t2":""},"columns":["time","value"],"values":[["2000-01-01T00:02:00Z",3]]}]}]}'),
    ("identical tag values - GROUP BY t1,t2", "SELECT value FROM db0.rp0.cpu GROUP BY t1,t2",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","tags":{"t1":"","t2":"val2"},"columns":["time","value"],"values":[["2000-01-01T00:01:00Z",2]]},{"name":"cpu","tags":{"t1":"val1","t2":""},"columns":["time","value"],"values":[["2000-01-01T00:00:00Z",1]]},{"name":"cpu","tags":{"t1":"val2","t2":""},"columns":["time","value"],"values":[["2000-01-01T00:02:00Z",3]]}]}]}'),
    ("identical tag values - no GROUP BY", "SELECT value FROM db0.rp0.cpu",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","value"],"values":[["2000-01-01T00:00:00Z",1],["2000-01-01T00:01:00Z",2],["2000-01-01T00:02:00Z",3]]}]}]}'),
]


@pytest.fixture(scope="module")
def idtag_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_idtag"))
    handle_write(spark, [
        "cpu,t1=val1 value=1 946684800000000000",
        "cpu,t2=val2 value=2 946684860000000000",
        "cpu,t1=val2 value=3 946684920000000000",
    ], root)
    return root


@pytest.mark.parametrize("name,q,exp", IDTAG_CASES, ids=[c[0] for c in IDTAG_CASES])
def test_identical_tag_values_case(spark, sf_dir, idtag_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=idtag_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_GroupByTimeCutoffs (server_test.go:6101): bucket
# boundaries under tight/inclusive time ranges ---
CUT_CASES = [
    ("sum all time", "SELECT SUM(value) FROM cpu",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","sum"],"values":[["1970-01-01T00:00:00Z",21]]}]}]}'),
    ("sum grouped by time 5s", "SELECT SUM(value) FROM cpu where time >= '2000-01-01T00:00:00Z' and time <= '2000-01-01T00:00:10Z' group by time(5s)",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","sum"],"values":[["2000-01-01T00:00:00Z",3],["2000-01-01T00:00:05Z",12],["2000-01-01T00:00:10Z",6]]}]}]}'),
    ("missing first point", "SELECT SUM(value) FROM cpu where time >= '2000-01-01T00:00:01Z' and time <= '2000-01-01T00:00:10Z' group by time(5s)",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","sum"],"values":[["2000-01-01T00:00:00Z",2],["2000-01-01T00:00:05Z",12],["2000-01-01T00:00:10Z",6]]}]}]}'),
    ("null for first bucket", "SELECT SUM(value) FROM cpu where time >= '2000-01-01T00:00:02Z' and time <= '2000-01-01T00:00:10Z' group by time(5s)",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","sum"],"values":[["2000-01-01T00:00:00Z",null],["2000-01-01T00:00:05Z",12],["2000-01-01T00:00:10Z",6]]}]}]}'),
    ("missing last point", "SELECT SUM(value) FROM cpu where time >= '2000-01-01T00:00:00Z' and time <= '2000-01-01T00:00:09Z' group by time(5s)",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","sum"],"values":[["2000-01-01T00:00:00Z",3],["2000-01-01T00:00:05Z",12]]}]}]}'),
    ("missing last 2 points", "SELECT SUM(value) FROM cpu where time >= '2000-01-01T00:00:00Z' and time <= '2000-01-01T00:00:08Z' group by time(5s)",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","sum"],"values":[["2000-01-01T00:00:00Z",3],["2000-01-01T00:00:05Z",7]]}]}]}'),
]


@pytest.fixture(scope="module")
def cutoffs_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_cutoffs"))
    b = 946684800
    handle_write(spark, [
        f"cpu,host=server01 value=1i {b*10**9}",
        f"cpu,host=server01 value=2i {(b+1)*10**9}",
        f"cpu,host=server01 value=3i {(b+5)*10**9}",
        f"cpu,host=server01 value=4i {(b+8)*10**9}",
        f"cpu,host=server01 value=5i {(b+9)*10**9}",
        f"cpu,host=server01 value=6i {(b+10)*10**9}",
    ], root)
    return root


@pytest.mark.parametrize("name,q,exp", CUT_CASES, ids=[c[0] for c in CUT_CASES])
def test_groupby_time_cutoffs_case(spark, sf_dir, cutoffs_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=cutoffs_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_OrderByTime (server_test.go:10481) + ExactTimeRange
# (server_test.go:5568): DESC emission incl. same-timestamp sparse series,
# nanosecond-exact time equality (RFC3339Nano + int literal) ---
OBT_WRITES = [
    "cpu,host=server1 value=1 946684801000000000",
    "cpu,host=server1 value=2 946684802000000000",
    "cpu,host=server1 value=3 946684803000000000",
    "power,presence=true value=1 946684801000000000",
    "power,presence=true value=2 946684802000000000",
    "power,presence=true value=3 946684803000000000",
    "power,presence=false value=4 946684804000000000",
    "mem,host=server1 free=1 946684801000000000",
    "mem,host=server1 free=2 946684802000000000",
    "mem,host=server2 used=3 946684801000000000",
    "mem,host=server2 used=4 946684802000000000",
]

OBT_CASES = [
    ("order on points", 'select value from "cpu" ORDER BY time DESC',
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","value"],"values":[["2000-01-01T00:00:03Z",3],["2000-01-01T00:00:02Z",2],["2000-01-01T00:00:01Z",1]]}]}]}'),
    ("order desc with tags", 'select value from "power" ORDER BY time DESC',
     '{"results":[{"statement_id":0,"series":[{"name":"power","columns":["time","value"],"values":[["2000-01-01T00:00:04Z",4],["2000-01-01T00:00:03Z",3],["2000-01-01T00:00:02Z",2],["2000-01-01T00:00:01Z",1]]}]}]}'),
    ("order desc with sparse data", 'select used, free from "mem" ORDER BY time DESC',
     '{"results":[{"statement_id":0,"series":[{"name":"mem","columns":["time","used","free"],"values":[["2000-01-01T00:00:02Z",null,2],["2000-01-01T00:00:02Z",4,null],["2000-01-01T00:00:01Z",null,1],["2000-01-01T00:00:01Z",3,null]]}]}]}'),
    ("order desc with an aggregate and sparse data",
     'select first("used") AS "used", first("free") AS "free" from "mem" WHERE time >= \'2000-01-01T00:00:01Z\' AND time <= \'2000-01-01T00:00:02Z\' GROUP BY host, time(1s) FILL(none) ORDER BY time DESC',
     '{"results":[{"statement_id":0,"series":[{"name":"mem","tags":{"host":"server2"},"columns":["time","used","free"],"values":[["2000-01-01T00:00:02Z",4,null],["2000-01-01T00:00:01Z",3,null]]},{"name":"mem","tags":{"host":"server1"},"columns":["time","used","free"],"values":[["2000-01-01T00:00:02Z",null,2],["2000-01-01T00:00:01Z",null,1]]}]}]}'),
]


@pytest.fixture(scope="module")
def obt_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_obt"))
    handle_write(spark, OBT_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", OBT_CASES, ids=[c[0] for c in OBT_CASES])
def test_order_by_time_case(spark, sf_dir, obt_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=obt_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def exact_time_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_exact"))
    handle_write(spark, [
        "cpu value=1 946684800000000000",
        "cpu value=2 946684800000000001",
        "cpu value=3 946684800000000002",
    ], root)
    return root


@pytest.mark.parametrize("q", [
    "SELECT * FROM cpu WHERE time = '2000-01-01T00:00:00.000000001Z'",
    "SELECT * FROM cpu WHERE time = 946684800000000001",
], ids=["rfc3339nano", "ns-literal"])
def test_exact_time_range_case(spark, sf_dir, exact_time_root, q):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=exact_time_root)
    exp = '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","value"],"values":[["2000-01-01T00:00:00.000000001Z",2]]}]}]}'
    assert got == json.loads(exp), json.dumps(got)


# --- TestServer_Query_Wildcards (server_test.go:7756): star expansion,
# mixed explicit+star with _1 dedup suffix, GROUP BY * dedup ---
WC_WRITES = [
    "wildcard,region=us-east value=10 946684800000000000",
    "wildcard,region=us-east valx=20 946684810000000000",
    "wildcard,region=us-east value=30,valx=40 946684820000000000",
    "wgroup,region=us-east value=10.0 946684800000000000",
    "wgroup,region=us-east value=20.0 946684810000000000",
    "wgroup,region=us-west value=30.0 946684820000000000",
]

WC_CASES = [
    ("wildcard", "SELECT * FROM wildcard",
     '{"results":[{"statement_id":0,"series":[{"name":"wildcard","columns":["time","region","value","valx"],"values":[["2000-01-01T00:00:00Z","us-east",10,null],["2000-01-01T00:00:10Z","us-east",null,20],["2000-01-01T00:00:20Z","us-east",30,40]]}]}]}'),
    ("wildcard with group by", "SELECT * FROM wildcard GROUP BY *",
     '{"results":[{"statement_id":0,"series":[{"name":"wildcard","tags":{"region":"us-east"},"columns":["time","value","valx"],"values":[["2000-01-01T00:00:00Z",10,null],["2000-01-01T00:00:10Z",null,20],["2000-01-01T00:00:20Z",30,40]]}]}]}'),
    ("GROUP BY queries", "SELECT mean(value) FROM wgroup GROUP BY *",
     '{"results":[{"statement_id":0,"series":[{"name":"wgroup","tags":{"region":"us-east"},"columns":["time","mean"],"values":[["1970-01-01T00:00:00Z",15]]},{"name":"wgroup","tags":{"region":"us-west"},"columns":["time","mean"],"values":[["1970-01-01T00:00:00Z",30]]}]}]}'),
    ("GROUP BY queries with time", "SELECT mean(value) FROM wgroup WHERE time >= '2000-01-01T00:00:00Z' AND time < '2000-01-01T00:01:00Z' GROUP BY *,TIME(1m)",
     '{"results":[{"statement_id":0,"series":[{"name":"wgroup","tags":{"region":"us-east"},"columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",15]]},{"name":"wgroup","tags":{"region":"us-west"},"columns":["time","mean"],"values":[["2000-01-01T00:00:00Z",30]]}]}]}'),
    ("wildcard and field in select", "SELECT value, * FROM wildcard",
     '{"results":[{"statement_id":0,"series":[{"name":"wildcard","columns":["time","value","region","value_1","valx"],"values":[["2000-01-01T00:00:00Z",10,"us-east",10,null],["2000-01-01T00:00:10Z",null,"us-east",null,20],["2000-01-01T00:00:20Z",30,"us-east",30,40]]}]}]}'),
    ("field and wildcard in group by", "SELECT * FROM wildcard GROUP BY region, *",
     '{"results":[{"statement_id":0,"series":[{"name":"wildcard","tags":{"region":"us-east"},"columns":["time","value","valx"],"values":[["2000-01-01T00:00:00Z",10,null],["2000-01-01T00:00:10Z",null,20],["2000-01-01T00:00:20Z",30,40]]}]}]}'),
    ("wildcard and field in group by", "SELECT * FROM wildcard GROUP BY *, region",
     '{"results":[{"statement_id":0,"series":[{"name":"wildcard","tags":{"region":"us-east"},"columns":["time","value","valx"],"values":[["2000-01-01T00:00:00Z",10,null],["2000-01-01T00:00:10Z",null,20],["2000-01-01T00:00:20Z",30,40]]}]}]}'),
]


@pytest.fixture(scope="module")
def wc_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_wc"))
    handle_write(spark, WC_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", WC_CASES, ids=[c[0] for c in WC_CASES])
def test_wildcards_case(spark, sf_dir, wc_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=wc_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_UnderscoreMeasurement (server_test.go:7597) +
# FieldWithMultiplePeriods (server_test.go:10559): leading-underscore
# measurement names, dotted field names end to end ---
@pytest.fixture(scope="module")
def underscore_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_us"))
    handle_write(spark, ["_cpu value=1i 946684800000000000"], root)
    return root


def test_underscore_measurement(spark, sf_dir, underscore_root):
    import json

    got = handle_query(
        spark, sf_dir, "SELECT * FROM _cpu", epoch=None,
        data_root=underscore_root,
    )
    exp = '{"results":[{"statement_id":0,"series":[{"name":"_cpu","columns":["time","value"],"values":[["2000-01-01T00:00:00Z",1]]}]}]}'
    assert got == json.loads(exp), json.dumps(got)


@pytest.fixture(scope="module")
def periods_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_periods"))
    handle_write(spark, ["cpu foo.bar.baz=1 946684800000000000"], root)
    return root


@pytest.mark.parametrize("q", [
    "select * from cpu",
    'select "foo.bar.baz" from cpu',
], ids=["baseline", "quoted-dotted-field"])
def test_field_with_multiple_periods(spark, sf_dir, periods_root, q):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=periods_root)
    exp = '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","foo.bar.baz"],"values":[["2000-01-01T00:00:00Z",1]]}]}]}'
    assert got == json.loads(exp), json.dumps(got)


# --- TestServer_Query_MergeMany (server_test.go:2074): many-series merge
# counts; GROUP BY over a FIELD renders as a missing tag ("") ---
@pytest.fixture(scope="module")
def mergemany_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_mm"))
    writes = []
    for i in range(1, 11):
        for j in range(1, 5 + i % 3):
            writes.append(f"cpu,host=server_{i} value=22 {j*10**9}")
    handle_write(spark, writes, root)
    return root


MM_CASES = [
    ("GROUP by time", "SELECT count(value) FROM db0.rp0.cpu WHERE time >= '1970-01-01T00:00:01Z' AND time <= '1970-01-01T00:00:06Z' GROUP BY time(1s)",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","count"],"values":[["1970-01-01T00:00:01Z",10],["1970-01-01T00:00:02Z",10],["1970-01-01T00:00:03Z",10],["1970-01-01T00:00:04Z",10],["1970-01-01T00:00:05Z",7],["1970-01-01T00:00:06Z",3]]}]}]}'),
    ("GROUP by field", "SELECT count(value) FROM db0.rp0.cpu group by value",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","tags":{"value":""},"columns":["time","count"],"values":[["1970-01-01T00:00:00Z",50]]}]}]}'),
]


@pytest.mark.parametrize("name,q,exp", MM_CASES, ids=[c[0] for c in MM_CASES])
def test_merge_many_case(spark, sf_dir, mergemany_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=mergemany_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_Query_Null_Group (server_test.go:5141): percentile(*) with
# all-null field groups (empty collect → null, never an error); GROUP BY *
# uses the CleanSchema tag sidecar (string FIELD v4 is not a series key) ---
@pytest.fixture(scope="module")
def nullgroup_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_ng"))
    writes = []
    for i in range(6):
        for j in range(0, 2048, 8):   # 1-in-8 stride keeps the shape, 1536 rows
            k = i * 2048 + j
            t = k * 10**9
            parts = []
            if i != 2:
                parts.append(f"v1={k}i")
            if i != 3:
                parts.append(f"v2={float(k):f}")
            if i != 4:
                parts.append("v3=" + ("true" if k % 2 == 0 else "false"))
            if i != 5:
                parts.append(f'v4="abc{k}"')
            writes.append(
                f"cpu,region=region_{i},az=az_{i} {','.join(parts)} {t}"
            )
    handle_write(spark, writes, root)
    return root


def test_null_group_percentile_star(spark, sf_dir, nullgroup_root):
    """percentile(*,95) GROUP BY *: numeric wildcard only (v1,v2), null for
    the all-null group, v4 stays a field (absent from the series key)."""
    import json

    got = handle_query(
        spark, sf_dir, "SELECT percentile(*,95) FROM cpu group by *",
        epoch=None, data_root=nullgroup_root,
    )
    series = got["results"][0]["series"]
    assert len(series) == 6
    for s in series:
        assert set(s["tags"]) == {"az", "region"}, json.dumps(s["tags"])
        assert s["columns"] == ["time", "percentile_v1", "percentile_v2"]
    by_region = {s["tags"]["region"]: s["values"][0] for s in series}
    assert by_region["region_2"][1] is None      # v1 all null
    assert by_region["region_3"][2] is None      # v2 all null
    assert by_region["region_0"][1] is not None


# --- TestServer_SubQuery_Top_Min (server_test.go:4008) +
# top_bottom_nul_column (server_test.go:4119): outer dimensions propagate
# into the derived table (top() selects per country); top/bottom over a
# windowed-aggregate subquery with null windows ---
@pytest.fixture(scope="module")
def submst_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_submst"))
    handle_write(spark, [
        "mst,country=china,name=azhu age=1,height=11i 1629129600000000000",
        "mst,country=american,name=alan age=2,height=12i 1629129601000000000",
        "mst,country=germany,name=alang age=3,height=13i 1629129602000000000",
        "mst,country=china,name=azhu age=4,height=24i 1629129603000000000",
        "mst,country=american,name=alan age=5,height=25i 1629129604000000000",
        "mst,country=germany,name=alang age=6,height=26i 1629129605000000000",
    ], root)
    return root


@pytest.fixture(scope="module")
def subnul_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_subnul"))
    handle_write(spark, [
        "mst,country=china,name=azhu height=11i 1629129600000000000",
        "mst,country=american,name=alan age=2,height=12i 1629129601000000000",
        "mst,country=germany,name=alang height=13i 1629129602000000000",
        "mst,country=china,name=azhu age=4,height=24i 1629129603000000000",
        "mst,country=american,name=alan age=5,height=25i 1629129604000000000",
        "mst,country=germany,name=alang height=26i 1629129605000000000",
    ], root)
    return root


def test_subquery_top_min(spark, sf_dir, submst_root):
    import json

    got = handle_query(
        spark, sf_dir,
        "SELECT min(value) FROM (SELECT top(age, 2), age - height AS value FROM db0.rp0.mst) GROUP BY country",
        epoch=None, data_root=submst_root,
    )
    exp = '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"country":"american"},"columns":["time","min"],"values":[["2021-08-16T16:00:04Z",-20]]},{"name":"mst","tags":{"country":"china"},"columns":["time","min"],"values":[["2021-08-16T16:00:03Z",-20]]},{"name":"mst","tags":{"country":"germany"},"columns":["time","min"],"values":[["2021-08-16T16:00:05Z",-20]]}]}]}'
    assert got == json.loads(exp), json.dumps(got)


_SUBNUL = (
    "(select sum(age) as sum_age, sum(height) as sum_height from db0.rp0.mst "
    "where time >= 1629129600000000000 and time <= 1629129605000000000 "
    "group by time(1s)) "
    "where time >= 1629129600000000000 and time <= 1629129605000000000"
)


@pytest.mark.parametrize("fn", ["top", "bottom"])
def test_top_bottom_nul_column(spark, sf_dir, subnul_root, fn):
    import json

    got = handle_query(
        spark, sf_dir, f"select {fn}(sum_age, 3) from {_SUBNUL}",
        epoch=None, data_root=subnul_root,
    )
    exp = (
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","' + fn + '"],'
        '"values":[["2021-08-16T16:00:01Z",2],["2021-08-16T16:00:03Z",4],["2021-08-16T16:00:04Z",5]]}]}]}'
    )
    assert got == json.loads(exp), json.dumps(got)


# --- TestServer_Query_TagOrder (server_test.go:10384) + EvilIdentifiers
# (server_test.go:10439) + NilColumn (server_test.go:6770) +
# Aggregates_String (server_test.go:3114) ---
@pytest.fixture(scope="module")
def tagorder_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_tagorder"))
    handle_write(spark, [
        "cpu,host=server03 field1=100 1257894000000000000",
        "cpu,host=server01,region=uswest field1=200,field2=300,field3=400 1257894000000000000",
        "cpu,host=server01,region=useast field1=200,field2=300,field3=400 1257894000000000000",
        "cpu,host=server02,region=useast field1=200,field2=300,field3=400 1257894000000000000",
    ], root)
    return root


TAGORDER_CASES = [
    ("group by tag1,tag2", "select * from cpu group by host,region",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","tags":{"host":"server01","region":"useast"},"columns":["time","field1","field2","field3"],"values":[["2009-11-10T23:00:00Z",200,300,400]]},{"name":"cpu","tags":{"host":"server01","region":"uswest"},"columns":["time","field1","field2","field3"],"values":[["2009-11-10T23:00:00Z",200,300,400]]},{"name":"cpu","tags":{"host":"server02","region":"useast"},"columns":["time","field1","field2","field3"],"values":[["2009-11-10T23:00:00Z",200,300,400]]},{"name":"cpu","tags":{"host":"server03","region":""},"columns":["time","field1","field2","field3"],"values":[["2009-11-10T23:00:00Z",100,null,null]]}]}]}'),
    ("group by tag2,tag1 duplicate", "select * from cpu group by region,region",
     '{"results":[{"statement_id":0,"series":[{"name":"cpu","tags":{"region":""},"columns":["time","field1","field2","field3","host"],"values":[["2009-11-10T23:00:00Z",100,null,null,"server03"]]},{"name":"cpu","tags":{"region":"useast"},"columns":["time","field1","field2","field3","host"],"values":[["2009-11-10T23:00:00Z",200,300,400,"server01"],["2009-11-10T23:00:00Z",200,300,400,"server02"]]},{"name":"cpu","tags":{"region":"uswest"},"columns":["time","field1","field2","field3","host"],"values":[["2009-11-10T23:00:00Z",200,300,400,"server01"]]}]}]}'),
]


@pytest.mark.parametrize(
    "name,q,exp", TAGORDER_CASES, ids=[c[0] for c in TAGORDER_CASES]
)
def test_tag_order_case(spark, sf_dir, tagorder_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=tagorder_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


def test_evil_identifiers(spark, sf_dir, tmp_path_factory):
    import json

    root = str(tmp_path_factory.mktemp("refdata_evil"))
    handle_write(spark, ["cpu select=1,in-bytes=2 946684800000000000"], root)
    got = handle_query(
        spark, sf_dir, 'SELECT "select", "in-bytes" FROM cpu', epoch=None,
        data_root=root,
    )
    exp = '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","select","in-bytes"],"values":[["2000-01-01T00:00:00Z",1,2]]}]}]}'
    assert got == json.loads(exp), json.dumps(got)


def test_nil_column_overwrite_across_writes(spark, sf_dir, tmp_path_factory):
    """A later write of the same (series, timestamp) REPLACES the whole
    row — the first write's address field is gone (out-of-order overwrite;
    the reference flushes between the two writes)."""
    import json

    root = str(tmp_path_factory.mktemp("refdata_nilcol"))
    handle_write(spark, [
        'mst,country=china,name=ada age=15,address="chengdu" 1625558240121000000',
    ], root)
    handle_write(spark, [
        "mst,country=china,name=ada age=15 1625558240121000000",
        'mst,country=china,name=bcb height=10,age=15,address="chongqing" 1625558240122000000',
    ], root)
    got = handle_query(
        spark, sf_dir, "SELECT count(*) FROM mst", epoch=None, data_root=root,
    )
    exp = '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","count_address","count_age","count_height"],"values":[["1970-01-01T00:00:00Z",1,2,1]]}]}]}'
    assert got == json.loads(exp), json.dumps(got)


@pytest.fixture(scope="module")
def stringdata_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("refdata_stringdata"))
    handle_write(spark, [
        'stringdata value="first" 946684803000000000',
        'stringdata value="last" 946684804000000000',
    ], root)
    return root


STRING_AGG_CASES = [
    ("COUNT on string data", "SELECT COUNT(value) FROM stringdata",
     '{"results":[{"statement_id":0,"series":[{"name":"stringdata","columns":["time","count"],"values":[["1970-01-01T00:00:00Z",2]]}]}]}'),
    ("FIRST on string data", "SELECT FIRST(value) FROM stringdata",
     '{"results":[{"statement_id":0,"series":[{"name":"stringdata","columns":["time","first"],"values":[["2000-01-01T00:00:03Z","first"]]}]}]}'),
    ("LAST on string data", "SELECT LAST(value) FROM stringdata",
     '{"results":[{"statement_id":0,"series":[{"name":"stringdata","columns":["time","last"],"values":[["2000-01-01T00:00:04Z","last"]]}]}]}'),
]


@pytest.mark.parametrize(
    "name,q,exp", STRING_AGG_CASES, ids=[c[0] for c in STRING_AGG_CASES]
)
def test_string_aggregates_case(spark, sf_dir, stringdata_root, name, q, exp):
    import json

    got = handle_query(spark, sf_dir, q, epoch=None, data_root=stringdata_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"
