"""Reference-suite parity, batch 2: time-range inclusivity, sample with
limit/offset, constant columns + multi-subquery FROM, cast_* and ip_mask
string functions, compare() time-shift, nested multi-table joins.

Cases transcribed verbatim from /root/reference/tests/server_test.go --
TestServer_WhereTimeInclusive:10768, TestServer_Query_Sample_LimitOffset:10977,
TestServer_Query_Constant_Column:14129, TestServer_Cast_For_String_Functions:13856,
TestServer_Query_IP_For_String_Functions:13783,
TestServer_Query_Compare_Functions:13919, TestServer_Query_Multi_Table_Join:14029,
TestServer_Field_Not_In_Condition:12772, TestServer_DuplicateField:12726,
TestServer_Query_LargeTimestamp:10718.
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

WTI_WRITES = [
    "cpu value=1 946684801000000000",
    "cpu value=2 946684802000000000",
    "cpu value=3 946684803000000000",
]

SLO_WRITES = [
    "cpu float=1,int=1i 946684800000000000",
    "cpu float=2,int=2i 946684860000000000",
    "cpu float=3,int=3i 946684920000000000",
]

CC_WRITES = [
    "table1,tk=a value=1 1629129600000000000",
    "table1,tk=b value=2 1629129600000000000",
    "table1,tk=c value=4 1629129600000000000",
    "table2,tk=b value=10 1629129600000000000",
    "table2,tk=c value=20 1629129600000000000",
    "table2,tk=c value=40 1629129600000000001",
    "table2,tk=d value=50 1629129600000000000",
    "table3,tk=b value=10 1629129600000000000",
    "table3,tk=c value=20 1629129600000000000",
    "table3,tk=c value=40 1629129600000000001",
    "table3,tk=d value=50 1629129600000000000",
]

CAST_WRITES = [
    "mst,t1=a f1=12i,f2=13,f3=0,f4=\"14\",f5=\"15.3\",f6=true,f7=false,f8=\"a\",f9=\"0\" 1",
]

IP_WRITES = [
    "ip_test,location=us-me ip=\"101.44.55.66\",len=12 1741058850000000000",
    "ip_test,location=us-me ip=\"102.66.55.44\",len=16 1741058860000000000",
    "ip_test,location=us-me ip=\"300.66.55.44\",len=16 1741058870000000000",
    "ip_test,location=us-me ip=\"ff02::1\",len=16 1741058880000000000",
    "ip_test,location=us-me ip=\"fd12:3456:789a:bcde:f012:3456:789a:bcde\",len=16 1741058890000000000",
]

CMP_WRITES = [
    "mst,country=china,name=azhu age=12.3,height=70i,address=\"shenzhen\",alive=TRUE 1629129600000000000",
    "mst,country=american,name=alan age=20.5,height=80i,address=\"shanghai\",alive=FALSE 1629129601000000000",
    "mst,country=germany,name=alang age=3.4,height=90i,address=\"beijin\",alive=TRUE 1629129602000000000",
    "mst,country=japan,name=ahui age=30,height=121i,address=\"guangzhou\",alive=FALSE 1629129603000000000",
    "mst,country=canada,name=aqiu age=35,height=138i,address=\"chengdu\",alive=TRUE 1629129604000000000",
    "mst,country=china,name=agang age=48.8,height=149i,address=\"wuhan\" 1629129605000000000",
    "mst,country=american,name=agan age=52.7,height=153i,alive=TRUE 1629129606000000000",
    "mst,country=germany,name=alin age=28.3,address=\"anhui\",alive=FALSE 1629129607000000000",
    "mst,country=japan,name=ali height=179i,address=\"xian\",alive=TRUE 1629129608000000000",
    "mst,country=canada age=60.8,height=180i,address=\"hangzhou\",alive=FALSE 1629129609000000000",
    "mst,name=ahuang age=102,height=191i,address=\"nanjin\",alive=TRUE 1629129610000000000",
    "mst,country=china,name=ayin age=123,height=203i,address=\"zhengzhou\",alive=FALSE 1629129611000000000",
]

MTJ_WRITES = [
    "table1,tk=a value=1 1629129600000000000",
    "table1,tk=b value=2 1629129600000000000",
    "table1,tk=c value=4 1629129600000000000",
    "table2,tk=b value=10 1629129600000000000",
    "table2,tk=c value=20 1629129600000000000",
    "table2,tk=c value=40 1629129600000000001",
    "table2,tk=d value=50 1629129600000000000",
    "table3,tk=b value=10 1629129600000000000",
    "table3,tk=c value=20 1629129600000000000",
    "table3,tk=c value=40 1629129600000000001",
    "table3,tk=d value=50 1629129600000000000",
]

FNC_WRITES = [
    "mst,tk1=tv9 f1=9i 1610380800000000000",
    "mst,tk1=tv2 f1=2i 1610380800000000000",
    "mst,tk1=tv3 f1=3i 1610380800000000000",
    "mst,tk1=tv4 f1=4i 1610380800000000000",
    "mst,tk1=tv5 f1=5i 1610380800000000000",
    "mst,tk1=tv6 f1=6i 1610380800000000000",
    "mst,tk1=tv7 f1=7i 1610380800000000000",
    "mst,tk1=tv8 f1=8i 1610380800000000000",
    "mst,tk1=tv1 f1=1i 1610380800000000000",
]

DUP_WRITES = [
    "mst,tk1=tv1 f1=0,f1=2 1654898400000000000",
    "mst,tk3=tv4 f3=99 1654902000000000000",
]

WTI_CASES = [
    (
        "all GTE/LTE",
        "SELECT * from cpu where time >= '2000-01-01T00:00:01Z' and time <= '2000-01-01T00:00:03Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:01Z\",1],[\"2000-01-01T00:00:02Z\",2],[\"2000-01-01T00:00:03Z\",3]]}]}]}",
    ),
    (
        "all GTE",
        "SELECT * from cpu where time >= '2000-01-01T00:00:01Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:01Z\",1],[\"2000-01-01T00:00:02Z\",2],[\"2000-01-01T00:00:03Z\",3]]}]}]}",
    ),
    (
        "all LTE",
        "SELECT * from cpu where time <= '2000-01-01T00:00:03Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:01Z\",1],[\"2000-01-01T00:00:02Z\",2],[\"2000-01-01T00:00:03Z\",3]]}]}]}",
    ),
    (
        "first GTE/LTE",
        "SELECT * from cpu where time >= '2000-01-01T00:00:01Z' and time <= '2000-01-01T00:00:01Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:01Z\",1]]}]}]}",
    ),
    (
        "last GTE/LTE",
        "SELECT * from cpu where time >= '2000-01-01T00:00:03Z' and time <= '2000-01-01T00:00:03Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:03Z\",3]]}]}]}",
    ),
    (
        "before GTE/LTE",
        "SELECT * from cpu where time <= '2000-01-01T00:00:00Z'",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "all GT/LT",
        "SELECT * from cpu where time > '2000-01-01T00:00:00Z' and time < '2000-01-01T00:00:04Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:01Z\",1],[\"2000-01-01T00:00:02Z\",2],[\"2000-01-01T00:00:03Z\",3]]}]}]}",
    ),
    (
        "first GT/LT",
        "SELECT * from cpu where time > '2000-01-01T00:00:00Z' and time < '2000-01-01T00:00:02Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:01Z\",1]]}]}]}",
    ),
    (
        "last GT/LT",
        "SELECT * from cpu where time > '2000-01-01T00:00:02Z' and time < '2000-01-01T00:00:04Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:03Z\",3]]}]}]}",
    ),
    (
        "all GT",
        "SELECT * from cpu where time > '2000-01-01T00:00:00Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:01Z\",1],[\"2000-01-01T00:00:02Z\",2],[\"2000-01-01T00:00:03Z\",3]]}]}]}",
    ),
    (
        "all LT",
        "SELECT * from cpu where time < '2000-01-01T00:00:04Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:01Z\",1],[\"2000-01-01T00:00:02Z\",2],[\"2000-01-01T00:00:03Z\",3]]}]}]}",
    ),
]

SLO_CASES = [
    (
        "sample() with limit 1",
        "SELECT sample(float, 3), int FROM cpu LIMIT 1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"sample\",\"int\"],\"values\":[[\"2000-01-01T00:00:00Z\",1,1]]}]}]}",
    ),
    (
        "sample() with limit 1 offset 1",
        "SELECT sample(float, 3), int FROM cpu LIMIT 1 OFFSET 1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"sample\",\"int\"],\"values\":[[\"2000-01-01T00:01:00Z\",2,2]]}]}]}",
    ),
]

CC_CASES = [
    (
        "multi mst query normal with alias",
        "select * from (select 'table1' as 'name', value from db0.rp0.table1), (select 'table2' as 'name', value from db0.rp0.table2), (select 'table3' as 'name', value from db0.rp0.table3)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1,table2,table3\",\"columns\":[\"time\",\"name\",\"value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"table1\",1],[\"2021-08-16T16:00:00Z\",\"table1\",2],[\"2021-08-16T16:00:00Z\",\"table1\",4],[\"2021-08-16T16:00:00Z\",\"table2\",10],[\"2021-08-16T16:00:00Z\",\"table2\",20],[\"2021-08-16T16:00:00Z\",\"table2\",50],[\"2021-08-16T16:00:00Z\",\"table3\",10],[\"2021-08-16T16:00:00Z\",\"table3\",20],[\"2021-08-16T16:00:00Z\",\"table3\",50],[\"2021-08-16T16:00:00.000000001Z\",\"table2\",40],[\"2021-08-16T16:00:00.000000001Z\",\"table3\",40]]}]}]}",
    ),
    (
        "query normal with alias",
        "select 'table1' as 'name', value from db0.rp0.table1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"table1\",\"columns\":[\"time\",\"name\",\"value\"],\"values\":[[\"2021-08-16T16:00:00Z\",\"table1\",1],[\"2021-08-16T16:00:00Z\",\"table1\",2],[\"2021-08-16T16:00:00Z\",\"table1\",4]]}]}]}",
    ),
    (
        "raise err without alias",
        "select 'table1', value from db0.rp0.table1",
        "{\"results\":[{\"statement_id\":0,\"error\":\"field must contain at least one variable\"}]}",
    ),
    (
        "no result is returned with alias",
        "select 'table1' as 'name' from db0.rp0.table1",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "err is returned without alias",
        "select 'table1' from db0.rp0.table1",
        "{\"results\":[{\"statement_id\":0,\"error\":\"field must contain at least one variable\"}]}",
    ),
]

CAST_CASES = [
    (
        "cast_int64",
        "SELECT cast_int64(f1) as f1, cast_int64(f2) as f2, cast_int64(f3) as f3, cast_int64(f4) as f4, cast_int64(f5) as f5, cast_int64(f6) as f6, cast_int64(f7) as f7, cast_int64(f8) as f8, cast_int64(f9) as f9 from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"f2\",\"f3\",\"f4\",\"f5\",\"f6\",\"f7\",\"f8\",\"f9\"],\"values\":[[\"1970-01-01T00:00:00.000000001Z\",12,13,0,14,null,1,0,null,0]]}]}]}",
    ),
    (
        "cast_float64",
        "SELECT cast_float64(f1) as f1, cast_float64(f2) as f2, cast_float64(f3) as f3, cast_float64(f4) as f4, cast_float64(f5) as f5, cast_float64(f6) as f6, cast_float64(f7) as f7, cast_float64(f8) as f8, cast_float64(f9) as f9 from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"f2\",\"f3\",\"f4\",\"f5\",\"f6\",\"f7\",\"f8\",\"f9\"],\"values\":[[\"1970-01-01T00:00:00.000000001Z\",12,13,0,14,15.3,1,0,null,0]]}]}]}",
    ),
    (
        "cast_bool",
        "SELECT cast_bool(f1) as f1, cast_bool(f2) as f2, cast_bool(f3) as f3, cast_bool(f4) as f4, cast_bool(f5) as f5, cast_bool(f6) as f6, cast_bool(f7) as f7, cast_bool(f8) as f8, cast_bool(f9) as f9 from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"f2\",\"f3\",\"f4\",\"f5\",\"f6\",\"f7\",\"f8\",\"f9\"],\"values\":[[\"1970-01-01T00:00:00.000000001Z\",true,true,false,true,true,true,false,true,false]]}]}]}",
    ),
    (
        "cast_string",
        "SELECT cast_string(f1) as f1, cast_string(f2) as f2, cast_string(f3) as f3, cast_string(f4) as f4, cast_string(f5) as f5, cast_string(f6) as f6, cast_string(f7) as f7, cast_string(f8) as f8, cast_string(f9) as f9 from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"f2\",\"f3\",\"f4\",\"f5\",\"f6\",\"f7\",\"f8\",\"f9\"],\"values\":[[\"1970-01-01T00:00:00.000000001Z\",\"12\",\"13\",\"0\",\"14\",\"15.3\",\"true\",\"false\",\"a\",\"0\"]]}]}]}",
    ),
]

IP_CASES = [
    (
        "invalid argument number",
        "SELECT ip_mask(ip) FROM db0.rp0.ip_test",
        "{\"results\":[{\"statement_id\":0,\"error\":\"invalid number of arguments for ip_mask, expected 2-3, got 1\"}]}",
    ),
    (
        "invalid first argument type",
        "SELECT ip_mask(12, 12) FROM db0.rp0.ip_test",
        "{\"results\":[{\"statement_id\":0,\"error\":\"invalid argument type for the first argument in ip_mask(): 12\"}]}",
    ),
    (
        "invalid second argument type",
        "SELECT ip_mask(ip, '12') FROM db0.rp0.ip_test",
        "{\"results\":[{\"statement_id\":0,\"error\":\"invalid argument type for the 2nd argument in ip_mask(): '12'\"}]}",
    ),
    (
        "invalid third argument type",
        "SELECT ip_mask(ip, 12, '12') FROM db0.rp0.ip_test",
        "{\"results\":[{\"statement_id\":0,\"error\":\"invalid argument type for the 3rd argument in ip_mask(): '12'\"}]}",
    ),
    (
        "two params test",
        "SELECT ip_mask(ip, 12) FROM db0.rp0.ip_test",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"ip_test\",\"columns\":[\"time\",\"ip_mask\"],\"values\":[[\"2025-03-04T03:27:30Z\",\"101.32.0.0\"],[\"2025-03-04T03:27:40Z\",\"102.64.0.0\"],[\"2025-03-04T03:27:50Z\",null],[\"2025-03-04T03:28:00Z\",\"ff00::\"],[\"2025-03-04T03:28:10Z\",\"fd10::\"]]}]}]}",
    ),
    (
        "three params test",
        "SELECT ip_mask(ip, 12, 40) FROM db0.rp0.ip_test",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"ip_test\",\"columns\":[\"time\",\"ip_mask\"],\"values\":[[\"2025-03-04T03:27:30Z\",\"101.32.0.0\"],[\"2025-03-04T03:27:40Z\",\"102.64.0.0\"],[\"2025-03-04T03:27:50Z\",null],[\"2025-03-04T03:28:00Z\",\"ff02::\"],[\"2025-03-04T03:28:10Z\",\"fd12:3456:7800::\"]]}]}]}",
    ),
]

CMP_CASES = [
    (
        "select count age compare with 5s before",
        "SELECT compare(PV, 5) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst) WHERE TIME  >= 1629129607000000000 AND TIME <= 1629129611000000000",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",4,5,0.8]]}]}]}",
    ),
    (
        "select age with 5s before",
        "SELECT compare(age, 5) FROM db0.rp0.mst WHERE TIME  >= 1629129607000000000 AND TIME <= 1629129611000000000",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"age1\",\"age2\",\"age1/age2\"],\"values\":[[\"2021-08-16T16:00:07Z\",28.3,3.4,8.323529411764707]]}]}]}",
    ),
    (
        "select count age group by country compare with 5s before",
        "SELECT compare(PV, 5) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst GROUP BY country) WHERE TIME  >= 1629129607000000000 AND TIME <= 1629129611000000000 GROUP BY country",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"country\":\"\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",1,null,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"american\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",null,1,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"canada\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",1,1,1]]},{\"name\":\"mst\",\"tags\":{\"country\":\"china\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",1,1,1]]},{\"name\":\"mst\",\"tags\":{\"country\":\"germany\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",1,1,1]]},{\"name\":\"mst\",\"tags\":{\"country\":\"japan\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",null,1,null]]}]}]}",
    ),
    (
        "select count age group by country,name compare with 5s before",
        "SELECT compare(PV, 5) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst GROUP BY country, \"name\") WHERE TIME  >= 1629129607000000000 AND TIME <= 1629129611000000000 GROUP BY country, \"name\"",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"country\":\"\",\"name\":\"ahuang\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",1,null,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"american\",\"name\":\"agan\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",null,1,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"canada\",\"name\":\"\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",1,null,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"canada\",\"name\":\"aqiu\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",null,1,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"china\",\"name\":\"agang\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",null,1,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"china\",\"name\":\"ayin\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",1,null,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"germany\",\"name\":\"alang\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",null,1,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"germany\",\"name\":\"alin\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",1,null,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"japan\",\"name\":\"ahui\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",null,1,null]]}]}]}",
    ),
    (
        "select count age compare with 2s, 4s, 6s before",
        "SELECT compare(PV, 2, 4, 6) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst) WHERE TIME  >= 1629129610000000000 AND TIME <= 1629129611000000000",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV3\",\"PV4\",\"PV1/PV2\",\"PV1/PV3\",\"PV1/PV4\"],\"values\":[[\"2021-08-16T16:00:10Z\",2,1,2,2,2,1,1]]}]}]}",
    ),
    (
        "select count age group by time(2s) compare with 2s, 4s, 6s before",
        "SELECT compare(PV, 2, 4, 6) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst GROUP BY time(2s)) WHERE TIME  >= 1629129610000000000 AND TIME <= 1629129611000000000 GROUP BY time(2s)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV3\",\"PV4\",\"PV1/PV2\",\"PV1/PV3\",\"PV1/PV4\"],\"values\":[[\"2021-08-16T16:00:10Z\",2,1,2,2,2,1,1]]}]}]}",
    ),
    (
        "select count age group by time(2s) compare with 4s, 8s before",
        "SELECT compare(PV, 4, 8) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst GROUP BY time(2s)) WHERE TIME  >= 1629129608000000000 AND TIME <= 1629129611000000000 GROUP BY time(2s)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV3\",\"PV1/PV2\",\"PV1/PV3\"],\"values\":[[\"2021-08-16T16:00:08Z\",1,2,2,0.5,0.5],[\"2021-08-16T16:00:10Z\",2,2,2,1,1]]}]}]}",
    ),
    (
        "select count age group by time(2s), country compare with 2s, 4s, 6s before",
        "SELECT compare(PV, 2, 4, 6) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst GROUP BY country, time(2s)) WHERE TIME  >= 1629129610000000000 AND TIME <= 1629129611000000000 GROUP BY country, time(2s)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"country\":\"\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV3\",\"PV4\",\"PV1/PV2\",\"PV1/PV3\",\"PV1/PV4\"],\"values\":[[\"2021-08-16T16:00:10Z\",1,null,null,null,null,null,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"american\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV3\",\"PV4\",\"PV1/PV2\",\"PV1/PV3\",\"PV1/PV4\"],\"values\":[[\"2021-08-16T16:00:10Z\",null,null,1,null,null,null,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"canada\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV3\",\"PV4\",\"PV1/PV2\",\"PV1/PV3\",\"PV1/PV4\"],\"values\":[[\"2021-08-16T16:00:10Z\",null,1,null,1,null,null,null]]},{\"name\":\"mst\",\"tags\":{\"country\":\"china\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV3\",\"PV4\",\"PV1/PV2\",\"PV1/PV3\",\"PV1/PV4\"],\"values\":[[\"2021-08-16T16:00:10Z\",1,null,null,1,null,null,1]]},{\"name\":\"mst\",\"tags\":{\"country\":\"germany\"},\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV3\",\"PV4\",\"PV1/PV2\",\"PV1/PV3\",\"PV1/PV4\"],\"values\":[[\"2021-08-16T16:00:10Z\",null,null,1,null,null,null,null]]}]}]}",
    ),
    (
        "get error when compare only one parameter",
        "SELECT compare(PV) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst GROUP BY country) WHERE TIME  >= 1629129610000000000 AND TIME <= 1629129611000000000 GROUP BY country",
        "{\"results\":[{\"statement_id\":0,\"error\":\"invalid number of arguments for compare, expected more than one arguments, got 1\"}]}",
    ),
    (
        "get error when compare only one parameter (2)",
        "SELECT compare(PV) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst GROUP BY country) WHERE TIME  >= 1629129610000000000 AND TIME <= 1629129611000000000 GROUP BY country",
        "{\"results\":[{\"statement_id\":0,\"error\":\"invalid number of arguments for compare, expected more than one arguments, got 1\"}]}",
    ),
    (
        "select count age group by time 2s compare with 2s before",
        "SELECT compare(PV, 2) FROM (SELECT COUNT(age) as PV FROM db0.rp0.mst GROUP BY time(2s)) WHERE TIME  >= 1629129609000000000 AND TIME <= 1629129610000000000 GROUP BY time(2s)",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:09Z\",2,1,2]]}]}]}",
    ),
    (
        "select min age compare with 5s before",
        "SELECT compare(PV, 5) FROM (SELECT MIN(age) as PV FROM db0.rp0.mst) WHERE TIME  >= 1629129607000000000 AND TIME <= 1629129611000000000",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"PV1\",\"PV2\",\"PV1/PV2\"],\"values\":[[\"2021-08-16T16:00:07Z\",28.3,3.4,8.323529411764707]]}]}]}",
    ),
]

MTJ_CASES = [
    (
        "select m4, table3 from (table1 inner join table2) as m4 inner join table3",
        "select m4.m1.value as value1, m4.m2.value as value2, m3.value as value3 from (select m1.value, m2.value from (select value from db0.rp0.table1 group by tk) as m1 inner join (select value from db0.rp0.table2 group by tk) as m2 on (m1.tk = m2.tk) group by tk) as m4 inner join (select value from db0.rp0.table3 group by tk) as m3 on (m3.tk = m4.tk) group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m4,m3\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"value1\",\"value2\",\"value3\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10,10]]},{\"name\":\"m4,m3\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"value1\",\"value2\",\"value3\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,20,20],[\"2021-08-16T16:00:00Z\",4,20,40],[\"2021-08-16T16:00:00Z\",4,40,20],[\"2021-08-16T16:00:00Z\",4,40,40]]}]}]}",
    ),
    (
        "select table1, m4 table1 inner join (table2 inner join table3) as m4",
        "select m1.value as value1, m4.m2.value as value2, m4.m3.value as value3 from (select value from db0.rp0.table1 group by tk) as m1 inner join (select m2.value, m3.value from (select value from db0.rp0.table2 group by tk) as m2 inner join (select value from db0.rp0.table3 group by tk) as m3 on (m2.tk = m3.tk) group by tk) as m4  on(m1.tk = m4.tk) group by tk",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m1,m4\",\"tags\":{\"tk\":\"b\"},\"columns\":[\"time\",\"value1\",\"value2\",\"value3\"],\"values\":[[\"2021-08-16T16:00:00Z\",2,10,10]]},{\"name\":\"m1,m4\",\"tags\":{\"tk\":\"c\"},\"columns\":[\"time\",\"value1\",\"value2\",\"value3\"],\"values\":[[\"2021-08-16T16:00:00Z\",4,20,20],[\"2021-08-16T16:00:00Z\",4,20,40],[\"2021-08-16T16:00:00Z\",4,40,20],[\"2021-08-16T16:00:00Z\",4,40,40]]}]}]}",
    ),
]

FNC_CASES = [
    (
        "field condition exists",
        "select sum(*) from mst where f1= 2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"sum_f1\"],\"values\":[[\"1970-01-01T00:00:00Z\",2]]}]}]}",
    ),
    (
        "field condition not exist",
        "select sum(*) from mst where f2=3",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
]

DUP_CASES = [
    (
        "select count(*) from mst",
        "select count(*) from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"count_f1\",\"count_f3\"],\"values\":[[\"1970-01-01T00:00:00Z\",1,1]]}]}]}",
    ),
    (
        "select * from mst",
        "select * from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"f3\",\"tk1\",\"tk3\"],\"values\":[[\"2022-06-10T22:00:00Z\",2,null,\"tv1\",null],[\"2022-06-10T23:00:00Z\",null,99,null,\"tv4\"]]}]}]}",
    ),
]


def _mkroot(spark, tmp_path_factory, name, writes):
    root = str(tmp_path_factory.mktemp(name))
    handle_write(spark, writes, root)
    return root


@pytest.fixture(scope="module")
def p2_wti_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_wti", WTI_WRITES)


@pytest.mark.parametrize("name,q,exp", WTI_CASES, ids=[c[0] for c in WTI_CASES])
def test_wti_case(spark, sf_dir, p2_wti_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_wti_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p2_slo_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_slo", SLO_WRITES)


@pytest.mark.parametrize("name,q,exp", SLO_CASES, ids=[c[0] for c in SLO_CASES])
def test_slo_case(spark, sf_dir, p2_slo_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_slo_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p2_cc_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_cc", CC_WRITES)


@pytest.mark.parametrize("name,q,exp", CC_CASES, ids=[c[0] for c in CC_CASES])
def test_cc_case(spark, sf_dir, p2_cc_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_cc_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p2_cast_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_cast", CAST_WRITES)


@pytest.mark.parametrize("name,q,exp", CAST_CASES, ids=[c[0] for c in CAST_CASES])
def test_cast_case(spark, sf_dir, p2_cast_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_cast_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p2_ip_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_ip", IP_WRITES)


@pytest.mark.parametrize("name,q,exp", IP_CASES, ids=[c[0] for c in IP_CASES])
def test_ip_case(spark, sf_dir, p2_ip_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_ip_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p2_cmp_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_cmp", CMP_WRITES)


@pytest.mark.parametrize("name,q,exp", CMP_CASES, ids=[c[0] for c in CMP_CASES])
def test_cmp_case(spark, sf_dir, p2_cmp_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_cmp_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p2_mtj_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_mtj", MTJ_WRITES)


@pytest.mark.parametrize("name,q,exp", MTJ_CASES, ids=[c[0] for c in MTJ_CASES])
def test_mtj_case(spark, sf_dir, p2_mtj_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_mtj_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p2_fnc_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_fnc", FNC_WRITES)


@pytest.mark.parametrize("name,q,exp", FNC_CASES, ids=[c[0] for c in FNC_CASES])
def test_fnc_case(spark, sf_dir, p2_fnc_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_fnc_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p2_dup_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p2_dup", DUP_WRITES)


@pytest.mark.parametrize("name,q,exp", DUP_CASES, ids=[c[0] for c in DUP_CASES])
def test_dup_case(spark, sf_dir, p2_dup_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p2_dup_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


def test_large_timestamp(spark, sf_dir, tmp_path_factory):
    # TestServer_Query_LargeTimestamp: a point at models.MaxNanoTime
    # (int64 max - 1) survives the write path and renders RFC3339Nano
    root = _mkroot(
        spark, tmp_path_factory, "p2_maxnano",
        ["cpu value=100 9223372036854775806"],
    )
    got = handle_query(
        spark, sf_dir,
        "SELECT value FROM cpu WHERE time <= 9223372036854775806",
        epoch=None, data_root=root,
    )
    exp = (
        '{"results":[{"statement_id":0,"series":[{"name":"cpu",'
        '"columns":["time","value"],"values":'
        '[["2262-04-11T23:47:16.854775806Z",100]]}]}]}'
    )
    assert got == json.loads(exp), json.dumps(got)
