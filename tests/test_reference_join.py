"""Reference-suite parity: the JOIN / CTE statement surface.

Cases transcribed verbatim from /root/reference/tests/server_test.go —
TestServer_FullJoin:11623, TestServer_Join_Table:11661,
TestServer_HashJoin_Table:11904, TestServer_Cascading_Join_Table:12000,
TestServer_Join_Table_With_Empty_Tag:12150, TestServer_fullJoin_SubQuery:12219,
TestServer_CTE_Query:12510 — run end-to-end through our stack
(line-protocol write -> storage -> InfluxQL parse/plan -> InfluxDB JSON)
and compared EXACTLY against the reference's expected responses.
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

JT_WRITES = [
    "table1,tk=a value=1,value1=11 1629129600000000000",
    "table1,tk=b value=2,value1=22 1629129600000000000",
    "table1,tk=c value=4,value1=44 1629129600000000000",
    "table2,tk=b value=10 1629129600000000000",
    "table2,tk=c value=20 1629129600000000000",
    "table2,tk=c value=40 1629129600000000000",
    "table2,tk=d value=50 1629129600000000000",
    "table3,tk=a value=1 1629129600000000000",
    "table3,tk=b value=2 1629129600000000000",
    "table3,tk=b value=3 1629129610000000000",
    "table4,tk=b value=4 1629129600000000000",
    "table4,tk=b value=5 1629129610000000000",
    "table4,tk=c value=6 1629129600000000000",
]

FJ_WRITES = [
    "mst,tk1=tv1 f1=1i 1610380800000000000",
]

HJ_WRITES = [
    "server_metrics,device_id=001,region=CN cpu=78,mem=3.2 1715068800000000000",
    "server_metrics,device_id=001,region=CN cpu=44,mem=5.1 1715068801000000000",
    "server_metrics,device_id=002,region=US cpu=92,mem=4.1 1715068801000000000",
    "server_metrics,device_id=003,region=EU cpu=65,mem=2.8 1715068802000000000",
    "server_metrics,device_id=004,region=CN cpu=85,mem=3.9 1715068803000000000",
    "network_metrics,device_id=001,location=DC1 latency=12,throughput=950 1715068800000000000",
    "network_metrics,device_id=002,location=DC2 latency=25,throughput=820 1715068801000000000",
    "network_metrics,device_id=002,location=DC2 latency=16,throughput=888 1715068801100000000",
    "network_metrics,device_id=005,location=DC3 latency=8,throughput=1100 1715068802000000000",
    "network_metrics,device_id=006,location=DC4 latency=18,throughput=780 1715068803000000000",
]

CA_WRITES = [
    "table1,t1=a,t2=1 value=1,value1=11 1629129600000000000",
    "table1,t1=b,t2=2 value=2,value1=22 1629129600000000000",
    "table1,t1=c,t2=3 value=4,value1=44 1629129600000000000",
    "table2,t1=b,t2=4 value=10 1629129600000000000",
    "table2,t1=c,t2=5 value=20 1629129600000000000",
    "table2,t1=c,t2=6 value=40 1629129600000000000",
    "table2,t1=d,t2=7 value=50 1629129600000000000",
    "table3,t1=b,t2=8 value=31 1629129600000000000",
    "table3,t1=c,t2=9 value=32 1629129600000000000",
    "table3,t1=c,t2=10 value=33 1629129600000000000",
    "table3,t1=d,t2=11 value=34 1629129600000000000",
]

ET_WRITES = [
    "table1,t2=b value=1 1629129600000000000",
    "table1,t1=a value=2 1629129600000000000",
    "table1,t1=b,t2=c value=3 1629129600000000000",
    "table1,t1=c,t2=d value=4 1629129600000000000",
    "table2,t2=b value=5 1629129600000000000",
    "table2,t1=a,t2=c value=6 1629129600000000000",
    "table2,t1=b value=7 1629129600000000000",
    "table2,t1=d,t2=e value=8 1629129600000000000",
]

FS_WRITES = [
    "flow_scope_post_agg_1,direction=in,bgpType=bgpType,businessType=businessType,campus=campus,exportType=exportType,isp=isp,region=region,service=service bps=1 1629129600000000000",
    "flow_scope_post_agg_1,direction=out,bgpType=bgpType,businessType=businessType,campus=campus,exportType=exportType,isp=isp,region=region,service=service bps=1 1629129600000000000",
]

CTE_WRITES = [
    "mst,tag=t1 f1=4 1715068800000000000",
    "mst,tag=t3 f1=1 1715068800000000000",
    "mst,tag=t4 f1=3 1715068800000000000",
    "mst,tag=t2 f1=2 1715068800000000000",
    "tmst,tag=t1,tag001=t01 f1=1,ff1=1,ff2=2,ff3=3 1715068800000000000",
    "tmst,tag=t3,tag001=t03 f1=3,ff1=2,ff2=12,ff3=0 1715068800000000000",
    "tmst,tag=t4,tag001=t04 f1=2,ff1=4,ff2=3,ff3=0 1715068800000000000",
    "tmst,tag=t2,tag001=t02 f1=4,ff1=4,ff2=3,ff3=0 1715068800000000000",
]

FJ_CASES = [
    (
        "full join on one tag",
        "select m1.f1, m2.f1 from (select f1 from mst) as m1 full join (select f1 from mst) as m2 on (m1.tk1 = m2.tk1) group by tk1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m1,m2\",\"tags\":{\"tk1\":\"tv1\"},\"columns\":[\"time\",\"m1.f1\",\"m2.f1\"],\"values\":[[\"2021-01-11T16:00:00Z\",1,1]]}]}]}",
    ),
]

JT_CASES = [
    (
        "select field innerjoin",
        "select table1.value,table2.value from table1 inner join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,40]]}]}]}",
    ),
    (
        "select * innerjoin",
        "select * from table1 inner join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]}]}]}",
    ),
    (
        "select field innerjoin as ",
        "select t1.value1,t2.value from table1 as t1 inner join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",44,40]]}]}]}",
    ),
    (
        "select * innerjoin as",
        "select * from table1 as t1 inner join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]}]}]}",
    ),
    (
        "select field leftjoin",
        "select  table1.value,table2.value from table1 left outer join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,null]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,40]]}]}]}",
    ),
    (
        "select * leftjoin",
        "select * from table1 left outer join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,null]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]}]}]}",
    ),
    (
        "select field leftjoin as",
        "select t1.value1,t2.value from table1 as t1 left outer join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",11,null]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",44,40]]}]}]}",
    ),
    (
        "select *  leftjoin as",
        "select * from table1 as t1 left outer join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,null]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]}]}]}",
    ),
    (
        "select field rightjoin",
        "select table1.value,table2.value from table1 right outer join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,40]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,50]]}]}]}",
    ),
    (
        "select * rightjoin",
        "select * from table1 right outer join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,null,50]]}]}]}",
    ),
    (
        "select field rightjoin as",
        "select t1.value1,t2.value from table1 as t1 right outer join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",44,40]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,50]]}]}]}",
    ),
    (
        "select *  rightjoin as",
        "select * from table1 as t1 right outer join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,null,50]]}]}]}",
    ),
    (
        "select field outerjoin",
        "select table1.value,table2.value from table1 outer join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,null]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,40]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,50]]}]}]}",
    ),
    (
        "select * outerjoin",
        "select * from table1 outer join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,null]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,null,50]]}]}]}",
    ),
    (
        "select field outerjoin as",
        "select t1.value1,t2.value from table1 as t1 outer join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",11,null]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",44,40]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,50]]}]}]}",
    ),
    (
        "select *  outerjoin as",
        "select * from table1 as t1 outer join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,null]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,null,50]]}]}]}",
    ),
    (
        "select field fulljoin",
        "select table1.value,table2.value from table1 full join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,0]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,40]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",0,50]]}]}]}",
    ),
    (
        "select * fulljoin",
        "select * from table1 full join table2 on table1.tk=table2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,0]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]},{\"name\":\"table1,table2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"table1.value\",\"table1.value1\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",0,0,50]]}]}]}",
    ),
    (
        "select field fulljoin as",
        "select t1.value1,t2.value from table1 as t1 full join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",11,0]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",44,40]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",0,50]]}]}]}",
    ),
    (
        "select *  fulljoin as",
        "select * from table1 as t1 full join table2 as t2 on t1.tk=t2.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,11,0]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,22,10]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,44,40]]},{\"name\":\"t1,t2\",\"tags\":{\"tk\":\"d\"},\"columns\":[\"time\",\"t1.value\",\"t1.value1\",\"t2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",0,0,50]]}]}]}",
    ),
    (
        "join field not in select clause: inner join",
        "select table1.value,table2.value from table1 inner join table2 on table1.tk=table2.tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10],[\"2021-08-16T16:00:00Z\",4,40]]}]}]}",
    ),
    (
        "join field not in select clause: left join",
        "select table1.value,table2.value from table1 left join table2 on table1.tk=table2.tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,null],[\"2021-08-16T16:00:00Z\",2,10],[\"2021-08-16T16:00:00Z\",4,40]]}]}]}",
    ),
    (
        "join field not in select clause: right join",
        "select table1.value,table2.value from table1 right join table2 on table1.tk=table2.tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10],[\"2021-08-16T16:00:00Z\",4,40],[\"2021-08-16T16:00:00Z\",null,50]]}]}]}",
    ),
    (
        "join field not in select clause: outer join",
        "select table1.value,table2.value from table1 outer join table2 on table1.tk=table2.tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2\",\"columns\":[\"time\",\"table1.value\",\"table2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,null],[\"2021-08-16T16:00:00Z\",2,10],[\"2021-08-16T16:00:00Z\",4,40],[\"2021-08-16T16:00:00Z\",null,50]]}]}]}",
    ),
    (
        "select innerjoin match time",
        "select * from table3 inner join table4 on table3.tk=table4.tk and table3.time=table4.time group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,4],[\"2021-08-16T16:00:10Z\",3,5]]}]}]}",
    ),
    (
        "select innerjoin not match time",
        "select * from table3 inner join table4 on table3.tk=table4.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,4],[\"2021-08-16T16:00:00Z\",2,5],[\"2021-08-16T16:00:10Z\",3,4],[\"2021-08-16T16:00:10Z\",3,5]]}]}]}",
    ),
    (
        "select leftjoin match time",
        "select * from table3 left join table4 on table3.tk=table4.tk and table3.time=table4.time group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,null]]},{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,4],[\"2021-08-16T16:00:10Z\",3,5]]}]}]}",
    ),
    (
        "select leftjoin not match time",
        "select * from table3 left join table4 on table3.tk=table4.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,null]]},{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,4],[\"2021-08-16T16:00:00Z\",2,5],[\"2021-08-16T16:00:10Z\",3,4],[\"2021-08-16T16:00:10Z\",3,5]]}]}]}",
    ),
    (
        "select rightjoin match time",
        "select * from table3 right join table4 on table3.tk=table4.tk and table3.time=table4.time group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,4],[\"2021-08-16T16:00:10Z\",3,5]]},{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,6]]}]}]}",
    ),
    (
        "select rightjoin not match time",
        "select * from table3 right join table4 on table3.tk=table4.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,4],[\"2021-08-16T16:00:10Z\",2,5],[\"2021-08-16T16:00:00Z\",3,4],[\"2021-08-16T16:00:10Z\",3,5]]},{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,6]]}]}]}",
    ),
    (
        "select outerjoin match time",
        "select * from table3 outer join table4 on table3.tk=table4.tk and table3.time=table4.time group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,null]]},{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,4],[\"2021-08-16T16:00:10Z\",3,5]]},{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,6]]}]}]}",
    ),
    (
        "select outerjoin not match time",
        "select * from table3 outer join table4 on table3.tk=table4.tk group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"a\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,null]]},{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,4],[\"2021-08-16T16:00:00Z\",2,5],[\"2021-08-16T16:00:10Z\",3,4],[\"2021-08-16T16:00:10Z\",3,5]]},{\"name\":\"table3,table4\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"table3.value\",\"table4.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,6]]}]}]}",
    ),
]

HJ_CASES = [
    (
        "hash inner join on time",
        "SELECT * FROM server_metrics as t1 inner join network_metrics as t2 ON (t1.device_id = t2.device_id and t1.time=t2.time)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"columns\":[\"time\",\"t1.cpu\",\"t1.device_id\",\"t1.mem\",\"t1.region\",\"t2.device_id\",\"t2.latency\",\"t2.location\",\"t2.throughput\"],\"values\":[[\"2024-05-07T08:00:00Z\",78,\"001\",3.2,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",25,\"DC2\",820]]}]}]}",
    ),
    (
        "hash inner join product",
        "SELECT * FROM server_metrics as t1 inner join network_metrics as t2 ON (t1.device_id = t2.device_id)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"columns\":[\"time\",\"t1.cpu\",\"t1.device_id\",\"t1.mem\",\"t1.region\",\"t2.device_id\",\"t2.latency\",\"t2.location\",\"t2.throughput\"],\"values\":[[\"2024-05-07T08:00:00Z\",78,\"001\",3.2,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",44,\"001\",5.1,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",25,\"DC2\",820],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",16,\"DC2\",888]]}]}]}",
    ),
    (
        "hash left join on time",
        "SELECT * FROM server_metrics as t1 left outer join network_metrics as t2 ON (t1.device_id = t2.device_id and t1.time=t2.time)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"columns\":[\"time\",\"t1.cpu\",\"t1.device_id\",\"t1.mem\",\"t1.region\",\"t2.device_id\",\"t2.latency\",\"t2.location\",\"t2.throughput\"],\"values\":[[\"2024-05-07T08:00:00Z\",78,\"001\",3.2,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",44,\"001\",5.1,\"CN\",null,null,null,null],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",25,\"DC2\",820],[\"2024-05-07T08:00:02Z\",65,\"003\",2.8,\"EU\",null,null,null,null],[\"2024-05-07T08:00:03Z\",85,\"004\",3.9,\"CN\",null,null,null,null]]}]}]}",
    ),
    (
        "hash left join product",
        "SELECT * FROM server_metrics as t1 left outer join network_metrics as t2 ON (t1.device_id = t2.device_id)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"columns\":[\"time\",\"t1.cpu\",\"t1.device_id\",\"t1.mem\",\"t1.region\",\"t2.device_id\",\"t2.latency\",\"t2.location\",\"t2.throughput\"],\"values\":[[\"2024-05-07T08:00:00Z\",78,\"001\",3.2,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",44,\"001\",5.1,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",25,\"DC2\",820],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",16,\"DC2\",888],[\"2024-05-07T08:00:02Z\",65,\"003\",2.8,\"EU\",null,null,null,null],[\"2024-05-07T08:00:03Z\",85,\"004\",3.9,\"CN\",null,null,null,null]]}]}]}",
    ),
    (
        "hash right join on time",
        "SELECT * FROM server_metrics as t1 right outer join network_metrics as t2 ON (t1.device_id = t2.device_id and t1.time=t2.time)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"columns\":[\"time\",\"t1.cpu\",\"t1.device_id\",\"t1.mem\",\"t1.region\",\"t2.device_id\",\"t2.latency\",\"t2.location\",\"t2.throughput\"],\"values\":[[\"2024-05-07T08:00:00Z\",78,\"001\",3.2,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",25,\"DC2\",820],[\"2024-05-07T08:00:01.1Z\",null,null,null,null,\"002\",16,\"DC2\",888],[\"2024-05-07T08:00:02Z\",null,null,null,null,\"005\",8,\"DC3\",1100],[\"2024-05-07T08:00:03Z\",null,null,null,null,\"006\",18,\"DC4\",780]]}]}]}",
    ),
    (
        "hash right join product",
        "SELECT * FROM server_metrics as t1 right outer join network_metrics as t2 ON (t1.device_id = t2.device_id)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"columns\":[\"time\",\"t1.cpu\",\"t1.device_id\",\"t1.mem\",\"t1.region\",\"t2.device_id\",\"t2.latency\",\"t2.location\",\"t2.throughput\"],\"values\":[[\"2024-05-07T08:00:00Z\",78,\"001\",3.2,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:00Z\",44,\"001\",5.1,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",25,\"DC2\",820],[\"2024-05-07T08:00:01.1Z\",92,\"002\",4.1,\"US\",\"002\",16,\"DC2\",888],[\"2024-05-07T08:00:02Z\",null,null,null,null,\"005\",8,\"DC3\",1100],[\"2024-05-07T08:00:03Z\",null,null,null,null,\"006\",18,\"DC4\",780]]}]}]}",
    ),
    (
        "hash outer join on time",
        "SELECT * FROM server_metrics as t1 outer join network_metrics as t2 ON (t1.device_id = t2.device_id and t1.time=t2.time)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"columns\":[\"time\",\"t1.cpu\",\"t1.device_id\",\"t1.mem\",\"t1.region\",\"t2.device_id\",\"t2.latency\",\"t2.location\",\"t2.throughput\"],\"values\":[[\"2024-05-07T08:00:00Z\",78,\"001\",3.2,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",44,\"001\",5.1,\"CN\",null,null,null,null],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",25,\"DC2\",820],[\"2024-05-07T08:00:02Z\",65,\"003\",2.8,\"EU\",null,null,null,null],[\"2024-05-07T08:00:03Z\",85,\"004\",3.9,\"CN\",null,null,null,null],[\"2024-05-07T08:00:01.1Z\",null,null,null,null,\"002\",16,\"DC2\",888],[\"2024-05-07T08:00:02Z\",null,null,null,null,\"005\",8,\"DC3\",1100],[\"2024-05-07T08:00:03Z\",null,null,null,null,\"006\",18,\"DC4\",780]]}]}]}",
    ),
    (
        "hash outer join product",
        "SELECT * FROM server_metrics as t1 outer join network_metrics as t2 ON (t1.device_id = t2.device_id)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"columns\":[\"time\",\"t1.cpu\",\"t1.device_id\",\"t1.mem\",\"t1.region\",\"t2.device_id\",\"t2.latency\",\"t2.location\",\"t2.throughput\"],\"values\":[[\"2024-05-07T08:00:00Z\",78,\"001\",3.2,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",44,\"001\",5.1,\"CN\",\"001\",12,\"DC1\",950],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",25,\"DC2\",820],[\"2024-05-07T08:00:01Z\",92,\"002\",4.1,\"US\",\"002\",16,\"DC2\",888],[\"2024-05-07T08:00:02Z\",65,\"003\",2.8,\"EU\",null,null,null,null],[\"2024-05-07T08:00:03Z\",85,\"004\",3.9,\"CN\",null,null,null,null],[\"2024-05-07T08:00:02Z\",null,null,null,null,\"005\",8,\"DC3\",1100],[\"2024-05-07T08:00:03Z\",null,null,null,null,\"006\",18,\"DC4\",780]]}]}]}",
    ),
]

CA_CASES = [
    (
        "innerjoin cascading innerjoin",
        "select * from table1 inner join table2 on table1.t1=table2.t1 inner join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32]]}]}]}",
    ),
    (
        "innerjoin cascading innerjoin subquery",
        "select * from (select * from table1) as m1 inner join (select * from table2) as m2 on m1.t1=m2.t1 inner join table3 as m3 on m1.t1=m3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m1,m2,m3\",\"columns\":[\"time\",\"m1.t1\",\"m1.t2\",\"m1.value\",\"m1.value1\",\"m2.t1\",\"m2.t2\",\"m2.value\",\"m3.t1\",\"m3.t2\",\"m3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32]]}]}]}",
    ),
    (
        "innerjoin cascading leftjoin",
        "select * from table1 inner join table2 on table1.t1=table2.t1 left join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32]]}]}]}",
    ),
    (
        "innerjoin cascading rightjoin",
        "select * from table1 inner join table2 on table1.t1=table2.t1 right join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,null,null,null,\"d\",\"11\",34]]}]}]}",
    ),
    (
        "innerjoin cascading outerjoin",
        "select * from table1 inner join table2 on table1.t1=table2.t1 outer join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,null,null,null,\"d\",\"11\",34]]}]}]}",
    ),
    (
        "leftjoin cascading innerjoin",
        "select * from table1 left join table2 on table1.t1=table2.t1 inner join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32]]}]}]}",
    ),
    (
        "leftjoin cascading leftjoin",
        "select * from table1 left join table2 on table1.t1=table2.t1 left join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"a\",\"1\",1,11,null,null,null,null,null,null],[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32]]}]}]}",
    ),
    (
        "leftjoin cascading rightjoin",
        "select * from table1 left join table2 on table1.t1=table2.t1 right join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,null,null,null,\"d\",\"11\",34]]}]}]}",
    ),
    (
        "leftjoin cascading outerjoin",
        "select * from table1 left join table2 on table1.t1=table2.t1 outer join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"a\",\"1\",1,11,null,null,null,null,null,null],[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,null,null,null,\"d\",\"11\",34]]}]}]}",
    ),
    (
        "rightjoin cascading innerjoin",
        "select * from table1 right join table2 on table1.t1=table2.t1 inner join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32]]}]}]}",
    ),
    (
        "rightjoin cascading leftjoin",
        "select * from table1 right join table2 on table1.t1=table2.t1 left join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,\"d\",\"7\",50,null,null,null]]}]}]}",
    ),
    (
        "rightjoin cascading rightjoin",
        "select * from table1 right join table2 on table1.t1=table2.t1 right join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,null,null,null,\"d\",\"11\",34]]}]}]}",
    ),
    (
        "rightjoin cascading outerjoin",
        "select * from table1 right join table2 on table1.t1=table2.t1 outer join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,\"d\",\"7\",50,null,null,null],[\"2021-08-16T16:00:00Z\",null,null,null,null,null,null,null,\"d\",\"11\",34]]}]}]}",
    ),
    (
        "outerjoin cascading innerjoin",
        "select * from table1 outer join table2 on table1.t1=table2.t1 inner join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32]]}]}]}",
    ),
    (
        "outerjoin cascading leftjoin",
        "select * from table1 outer join table2 on table1.t1=table2.t1 left join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"a\",\"1\",1,11,null,null,null,null,null,null],[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,\"d\",\"7\",50,null,null,null]]}]}]}",
    ),
    (
        "outerjoin cascading rightjoin",
        "select * from table1 outer join table2 on table1.t1=table2.t1 right join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,null,null,null,\"d\",\"11\",34]]}]}]}",
    ),
    (
        "outerjoin cascading outerjoin",
        "select * from table1 outer join table2 on table1.t1=table2.t1 outer join table3 on table1.t1=table3.t1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"table1.t1\",\"table1.t2\",\"table1.value\",\"table1.value1\",\"table2.t1\",\"table2.t2\",\"table2.value\",\"table3.t1\",\"table3.t2\",\"table3.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"a\",\"1\",1,11,null,null,null,null,null,null],[\"2021-08-16T16:00:00Z\",\"b\",\"2\",2,22,\"b\",\"4\",10,\"b\",\"8\",31],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"5\",20,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"10\",33],[\"2021-08-16T16:00:00Z\",\"c\",\"3\",4,44,\"c\",\"6\",40,\"c\",\"9\",32],[\"2021-08-16T16:00:00Z\",null,null,null,null,\"d\",\"7\",50,null,null,null],[\"2021-08-16T16:00:00Z\",null,null,null,null,null,null,null,\"d\",\"11\",34]]}]}]}",
    ),
]

ET_CASES = [
    (
        "inner join with empty tag",
        "select * from (select * from table1 group by t1,t2) as m1 join (Select * from table2 group by t1,t2) as m2 on m1.t1=m2.t1 group by t1,t2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"\",\"t2\":\"b\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,5]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"a\",\"t2\":\"\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,6]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"b\",\"t2\":\"c\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",3,7]]}]}]}",
    ),
    (
        "left join with empty tag",
        "select * from (select * from table1 group by t1,t2) as m1 left join (Select * from table2 group by t1,t2) as m2 on m1.t1=m2.t1 group by t1,t2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"\",\"t2\":\"b\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,5]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"a\",\"t2\":\"\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,6]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"b\",\"t2\":\"c\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",3,7]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"c\",\"t2\":\"d\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,null]]}]}]}",
    ),
    (
        "right join with empty tag",
        "select * from (select * from table1 group by t1,t2) as m1 right join (Select * from table2 group by t1,t2) as m2 on m1.t1=m2.t1 group by t1,t2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"\",\"t2\":\"b\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,5]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"a\",\"t2\":\"\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,6]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"b\",\"t2\":\"c\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",3,7]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"d\",\"t2\":\"e\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,8]]}]}]}",
    ),
    (
        "outer join with empty tag",
        "select * from (select * from table1 group by t1,t2) as m1 outer join (Select * from table2 group by t1,t2) as m2 on m1.t1=m2.t1 group by t1,t2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"\",\"t2\":\"b\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",1,5]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"a\",\"t2\":\"\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,6]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"b\",\"t2\":\"c\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",3,7]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"c\",\"t2\":\"d\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,null]]},{\"name\":\"m1,m2\",\"tags\":{\"t1\":\"d\",\"t2\":\"e\"},\"columns\":[\"time\",\"m1.value\",\"m2.value\"],\"values\":[[\"2021-08-16T16:00:00Z\",null,8]]}]}]}",
    ),
]

FS_CASES = [
    (
        "select field full join subquery",
        "select *  from (select * from flow_scope_post_agg_1 where direction = 'in'  limit 3) as m1 full join (select * from flow_scope_post_agg_1 where direction = 'out' limit 3) as m2 on (m1.bgpType=m2.bgpType and m1.businessType=m2.businessType and m1.campus=m2.campus and m1.exportType=m2.exportType and m1.isp=m2.isp and m1.region=m2.region and m1.service=m2.service) group by bgpType, businessType, campus, exportType, isp, region, service",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m1,m2\",\"tags\":{\"bgpType\":\"bgpType\",\"businessType\":\"businessType\",\"campus\":\"campus\",\"exportType\":\"exportType\",\"isp\":\"isp\",\"region\":\"region\",\"service\":\"service\"},\"columns\":[\"time\",\"m1.bgpType\",\"m1.bps\",\"m1.businessType\",\"m1.campus\",\"m1.direction\",\"m1.exportType\",\"m1.isp\",\"m1.region\",\"m1.service\",\"m2.bgpType\",\"m2.bps\",\"m2.businessType\",\"m2.campus\",\"m2.direction\",\"m2.exportType\",\"m2.isp\",\"m2.region\",\"m2.service\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"bgpType\",1,\"businessType\",\"campus\",\"in\",\"exportType\",\"isp\",\"region\",\"service\",\"bgpType\",1,\"businessType\",\"campus\",\"out\",\"exportType\",\"isp\",\"region\",\"service\"]]}]}]}",
    ),
]

CTE_CASES = [
    (
        "simple query with cte",
        "with t1 as (select * from tmst limit 10) select * from (select ff2 from t1)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"tmst\",\"columns\":[\"time\",\"ff2\"],\"values\":[[\"2024-05-07T08:00:00Z\",2],[\"2024-05-07T08:00:00Z\",3],[\"2024-05-07T08:00:00Z\",12],[\"2024-05-07T08:00:00Z\",3]]}]}]}",
    ),
    (
        "in query with cte",
        "with t1 as (select * from tmst limit 10) select * from (select ff2 from t1)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"tmst\",\"columns\":[\"time\",\"ff2\"],\"values\":[[\"2024-05-07T08:00:00Z\",2],[\"2024-05-07T08:00:00Z\",3],[\"2024-05-07T08:00:00Z\",12],[\"2024-05-07T08:00:00Z\",3]]}]}]}",
    ),
    (
        "subquery with cte",
        "with t2 as (select * from mst where f1 in (select f1 from t1)), t1 as (select * from mst where f1 >3) select * from t2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"tag\"],\"values\":[[\"2024-05-07T08:00:00Z\",4,\"t1\"]]}]}]}",
    ),
    (
        "inner join with cte",
        "with cte1 as (select * from mst), cte2 as (select * from tmst) select * from cte1 INNER JOIN cte2 on cte1.\"tag\"=cte2.\"tag\" group by \"tag\"",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cte1,cte2\",\"tags\":{\"tag\":\"t1\"},\"columns\":[\"time\",\"cte1.f1\",\"cte2.f1\",\"cte2.ff1\",\"cte2.ff2\",\"cte2.ff3\",\"cte2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",4,1,1,2,3,\"t01\"]]},{\"name\":\"cte1,cte2\",\"tags\":{\"tag\":\"t2\"},\"columns\":[\"time\",\"cte1.f1\",\"cte2.f1\",\"cte2.ff1\",\"cte2.ff2\",\"cte2.ff3\",\"cte2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",2,4,4,3,0,\"t02\"]]},{\"name\":\"cte1,cte2\",\"tags\":{\"tag\":\"t3\"},\"columns\":[\"time\",\"cte1.f1\",\"cte2.f1\",\"cte2.ff1\",\"cte2.ff2\",\"cte2.ff3\",\"cte2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",1,3,2,12,0,\"t03\"]]},{\"name\":\"cte1,cte2\",\"tags\":{\"tag\":\"t4\"},\"columns\":[\"time\",\"cte1.f1\",\"cte2.f1\",\"cte2.ff1\",\"cte2.ff2\",\"cte2.ff3\",\"cte2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",3,2,4,3,0,\"t04\"]]}]}]}",
    ),
    (
        "inner join with cte alias",
        "with cte1 as (select * from mst), cte2 as (select * from tmst) select * from cte1 as t1 INNER JOIN cte2 as t2 on t1.\"tag\"=t2.\"tag\" group by \"tag\"",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tag\":\"t1\"},\"columns\":[\"time\",\"t1.f1\",\"t2.f1\",\"t2.ff1\",\"t2.ff2\",\"t2.ff3\",\"t2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",4,1,1,2,3,\"t01\"]]},{\"name\":\"t1,t2\",\"tags\":{\"tag\":\"t2\"},\"columns\":[\"time\",\"t1.f1\",\"t2.f1\",\"t2.ff1\",\"t2.ff2\",\"t2.ff3\",\"t2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",2,4,4,3,0,\"t02\"]]},{\"name\":\"t1,t2\",\"tags\":{\"tag\":\"t3\"},\"columns\":[\"time\",\"t1.f1\",\"t2.f1\",\"t2.ff1\",\"t2.ff2\",\"t2.ff3\",\"t2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",1,3,2,12,0,\"t03\"]]},{\"name\":\"t1,t2\",\"tags\":{\"tag\":\"t4\"},\"columns\":[\"time\",\"t1.f1\",\"t2.f1\",\"t2.ff1\",\"t2.ff2\",\"t2.ff3\",\"t2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",3,2,4,3,0,\"t04\"]]}]}]}",
    ),
    (
        "inner join with cte and reality table",
        "with cte1 as (select * from mst) select * from cte1 as t1 INNER JOIN tmst as t2 on t1.\"tag\"=t2.\"tag\" group by \"tag\"",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"tag\":\"t1\"},\"columns\":[\"time\",\"t1.f1\",\"t2.f1\",\"t2.ff1\",\"t2.ff2\",\"t2.ff3\",\"t2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",4,1,1,2,3,\"t01\"]]},{\"name\":\"t1,t2\",\"tags\":{\"tag\":\"t2\"},\"columns\":[\"time\",\"t1.f1\",\"t2.f1\",\"t2.ff1\",\"t2.ff2\",\"t2.ff3\",\"t2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",2,4,4,3,0,\"t02\"]]},{\"name\":\"t1,t2\",\"tags\":{\"tag\":\"t3\"},\"columns\":[\"time\",\"t1.f1\",\"t2.f1\",\"t2.ff1\",\"t2.ff2\",\"t2.ff3\",\"t2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",1,3,2,12,0,\"t03\"]]},{\"name\":\"t1,t2\",\"tags\":{\"tag\":\"t4\"},\"columns\":[\"time\",\"t1.f1\",\"t2.f1\",\"t2.ff1\",\"t2.ff2\",\"t2.ff3\",\"t2.tag001\"],\"values\":[[\"2024-05-07T08:00:00Z\",3,2,4,3,0,\"t04\"]]}]}]}",
    ),
    (
        "recursive call to itself of cte1",
        "with cte1 as (select * from cte1) select * from cte1",
        "{\"results\":[{\"statement_id\":0,\"error\":\"Unsupported feature: recursive call to itself cte1\"}]}",
    ),
    (
        "Indirect recursive call to itself of t2",
        "with t2 as (select * from mst where f1 in (select f1 from t2)) select * from t2",
        "{\"results\":[{\"statement_id\":0,\"error\":\"Unsupported feature: recursive call to itself t2\"}]}",
    ),
]


def _mkroot(spark, tmp_path_factory, name, writes):
    root = str(tmp_path_factory.mktemp(name))
    handle_write(spark, writes, root)
    return root


@pytest.fixture(scope="module")
def fj_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "join_fj", FJ_WRITES)


@pytest.mark.parametrize("name,q,exp", FJ_CASES, ids=[c[0] for c in FJ_CASES])
def test_fj_case(spark, sf_dir, fj_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=fj_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def jt_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "join_jt", JT_WRITES)


@pytest.mark.parametrize("name,q,exp", JT_CASES, ids=[c[0] for c in JT_CASES])
def test_jt_case(spark, sf_dir, jt_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=jt_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def hj_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "join_hj", HJ_WRITES)


@pytest.mark.parametrize("name,q,exp", HJ_CASES, ids=[c[0] for c in HJ_CASES])
def test_hj_case(spark, sf_dir, hj_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=hj_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def ca_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "join_ca", CA_WRITES)


@pytest.mark.parametrize("name,q,exp", CA_CASES, ids=[c[0] for c in CA_CASES])
def test_ca_case(spark, sf_dir, ca_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=ca_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def et_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "join_et", ET_WRITES)


@pytest.mark.parametrize("name,q,exp", ET_CASES, ids=[c[0] for c in ET_CASES])
def test_et_case(spark, sf_dir, et_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=et_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def fs_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "join_fs", FS_WRITES)


@pytest.mark.parametrize("name,q,exp", FS_CASES, ids=[c[0] for c in FS_CASES])
def test_fs_case(spark, sf_dir, fs_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=fs_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def cte_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "join_cte", CTE_WRITES)


@pytest.mark.parametrize("name,q,exp", CTE_CASES, ids=[c[0] for c in CTE_CASES])
def test_cte_case(spark, sf_dir, cte_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=cte_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


