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
