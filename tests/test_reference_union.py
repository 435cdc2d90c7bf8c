"""Reference-suite parity: UNION [ALL] [BY NAME] statement surface.

Cases transcribed verbatim from /root/reference/tests/server_test.go
TestServer_Union_Distinct_Push_Down_Rule:14312.
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

UN_WRITES = [
    "table1,t1=a,t2=h f1=1,f2=11 1629129600000000000",
    "table1,t1=b,t2=h f1=2,f2=12 1629129600000000000",
    "table2,t1=b,t2=i f1=3,f3=21 1629129600000000000",
    "table2,t1=c,t2=i f1=4,f3=22 1629129600000000000",
    "table3,t1=b,t2=j f1=3,f2=\"a\",f3=31 1629129600000000000",
    "table3,t1=c,t2=k f1=4,f2=\"b\",f3=32 1629129600000000000",
    "event_table,entity_id=vm1,name=m1 forwarded_id=\"forward1\",forwarded_service=\"ELB1\"  1629129600000000000",
    "event_table,entity_id=vm2,name=m2 forwarded_id=\"forward2\",forwarded_service=\"ELB2\"  1629129600000000000",
    "event_table,entity_id=vm3,name=m2 forwarded_id=\"forward3\",forwarded_service=\"ELB3\"  1629129600000000000",
    "event_table,entity_id=vm4,name=m3 forwarded_id=\"forward4\",forwarded_service=\"ELB4\"  1629129600000000000",
    "event_table,entity_id=vm5,name=m4 forwarded_id=\"forward5\",forwarded_service=\"ELB5\"  1629129600000000000",
    "alarm_table,entity_id=vm6,name=m2 matadata=\"{}\",additional=\"add1\" 1629129600000000000",
    "alarm_table,entity_id=vm7,name=m3 matadata=\"{}\",additional=\"add2\" 1629129600000000000",
    "alarm_table,entity_id=vm8,name=m5 matadata=\"{}\",additional=\"add3\" 1629129600000000000",
    "alarm_table,entity_id=vm9,name=m5 matadata=\"{}\",additional=\"add2\" 1629129600000000000",
    "alarm_table,entity_id=vm10,name=m6 matadata=\"{}\",additional=\"add3\" 1629129600000000000",
    "CPU,entity_id=vm11,name=m5 parent_entity_id=\"1dd\",entity_type=1,forwarded_service=\"ELB1\" 1629129600000000000",
    "CPU,entity_id=vm12,name=m7 parent_entity_id=\"2dd\",entity_type=1,forwarded_service=\"ELB1\" 1629129600000000000",
    "CPU,entity_id=vm13,name=m7 parent_entity_id=\"3dd\",entity_type=1,forwarded_service=\"ELB1\" 1629129600000000000",
    "CPU,entity_id=vm14,name=m8 parent_entity_id=\"4dd\",entity_type=1,forwarded_service=\"ELB1\" 1629129600000000000",
    "CPU,entity_id=vm15,name=m9 parent_entity_id=\"5dd\",entity_type=1,forwarded_service=\"ELB1\" 1629129600000000000",
]

UN_CASES = [
    (
        "union same columns count",
        "select * from table1 union select * from table2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"columns\":[\"time\",\"f1\",\"f2\",\"t1\",\"t2\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,\"a\",\"h\"],[\"2021-08-16T16:00:00Z\",2,12,\"b\",\"h\"],[\"2021-08-16T16:00:00Z\",3,21,\"b\",\"i\"],[\"2021-08-16T16:00:00Z\",4,22,\"c\",\"i\"]]}]}]}",
    ),
    (
        "unionbyname same columns count(not same name)",
        "select * from table1 union by name select * from table2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"columns\":[\"time\",\"f1\",\"f2\",\"f3\",\"t1\",\"t2\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,null,\"a\",\"h\"],[\"2021-08-16T16:00:00Z\",2,12,null,\"b\",\"h\"],[\"2021-08-16T16:00:00Z\",3,null,21,\"b\",\"i\"],[\"2021-08-16T16:00:00Z\",4,null,22,\"c\",\"i\"]]}]}]}",
    ),
    (
        "union agg",
        "select count(f1) as v1, sum(f2) as v2  from table1 union select count(f1) as v1, sum(f3) as v2 from table3",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table3\",\"columns\":[\"time\",\"v1\",\"v2\"],\"values\":[[\"1970-01-01T00:00:00Z\",2,23],[\"1970-01-01T00:00:00Z\",2,63]]}]}]}",
    ),
    (
        "unionbyname agg",
        "select count(f1) as v1, sum(f2) as v2  from table1 union by name select count(f1) as v1 from table3",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table3\",\"columns\":[\"time\",\"v1\",\"v2\"],\"values\":[[\"1970-01-01T00:00:00Z\",2,23],[\"1970-01-01T00:00:00Z\",2,null]]}]}]}",
    ),
    (
        "union group by",
        "select * from table1 group by t1, t2 union select f1, f3 from table3 group by t1, t2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table3\",\"columns\":[\"time\",\"f1\",\"f2\",\"t1\",\"t2\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,\"a\",\"h\"],[\"2021-08-16T16:00:00Z\",2,12,\"b\",\"h\"],[\"2021-08-16T16:00:00Z\",3,31,\"b\",\"j\"],[\"2021-08-16T16:00:00Z\",4,32,\"c\",\"k\"]]}]}]}",
    ),
    (
        "unionbyname group by",
        "select f1,f2 from table1 group by t1 union by name select f1 from table3 group by t2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table3\",\"columns\":[\"time\",\"f1\",\"f2\",\"t1\",\"t2\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,\"a\",null],[\"2021-08-16T16:00:00Z\",2,12,\"b\",null],[\"2021-08-16T16:00:00Z\",3,null,null,\"j\"],[\"2021-08-16T16:00:00Z\",4,null,null,\"k\"]]}]}]}",
    ),
    (
        "union|unionallbyname limit",
        "select entity_id,forwarded_id from event_table union by name (select entity_id,additional from alarm_table union select entity_id,forwarded_service from CPU limit 1)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"CPU,alarm_table,event_table\",\"columns\":[\"time\",\"additional\",\"entity_id\",\"forwarded_id\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"ELB1\",\"vm11\",null],[\"2021-08-16T16:00:00Z\",\"add1\",\"vm6\",null],[\"2021-08-16T16:00:00Z\",\"add2\",\"vm7\",null],[\"2021-08-16T16:00:00Z\",\"add2\",\"vm9\",null],[\"2021-08-16T16:00:00Z\",\"add3\",\"vm10\",null],[\"2021-08-16T16:00:00Z\",\"add3\",\"vm8\",null],[\"2021-08-16T16:00:00Z\",null,\"vm1\",\"forward1\"],[\"2021-08-16T16:00:00Z\",null,\"vm2\",\"forward2\"],[\"2021-08-16T16:00:00Z\",null,\"vm3\",\"forward3\"],[\"2021-08-16T16:00:00Z\",null,\"vm4\",\"forward4\"],[\"2021-08-16T16:00:00Z\",null,\"vm5\",\"forward5\"]]}]}]}",
    ),
]

@pytest.fixture(scope="module")
def un_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("p2_union"))
    handle_write(spark, UN_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", UN_CASES, ids=[c[0] for c in UN_CASES])
def test_union_case(spark, sf_dir, un_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=un_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"
