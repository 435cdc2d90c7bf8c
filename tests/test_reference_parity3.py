"""Reference-suite parity, batch 3: out-of-order reads, full/specific
series, hint queries, map type, chunk tag lists, pre-agg paths, detect
aggregates, bug-list pins, wildcard expansion, tag filters, cross-shard
ordering, relative-time windows.

Cases transcribed verbatim from /root/reference/tests/server_test.go
(TestServer_Query_OutOfOrder:11218, _FullSeries:11295,
_SpecificSeries:11362, _HintQuery*:11429, _HintLimit:11571,
_MapType:6180, _NewChunkTagCheckList:6592, _OutOfOrder_Overlap:6891,
_PreAgg_*:6966-7305,13663, _Detect_Aggregate:3743, _For_BugList:3823,
_WildcardExpansion:7877, _TagFilter:7955, _AcrossShardsAndFields:8023,
_OrderedAcrossShards:8101, _SelectRelativeTime1:11092).
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

OOO_WRITES = [
    "cpu,host=server1 value=1 946857601000000000",
    "cpu,host=server1 value=2 946857602000000000",
    "cpu,host=server1 value=3 946857603000000000",
    "cpu,host=server1 value=11 946771201000000000",
    "cpu,host=server1 value=22 946771202000000000",
    "cpu,host=server1 value=33 946771203000000000",
    "cpu,host=server1 value=111 946771201000000000",
    "cpu,host=server1 value=222 946771202000000000",
    "cpu,host=server1 value=333 946771203000000000",
]

OOO_CASES = [
    (
        "out of order query",
        "select value from \"cpu\"",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-02T00:00:01Z\",111],[\"2000-01-02T00:00:02Z\",222],[\"2000-01-02T00:00:03Z\",333],[\"2000-01-03T00:00:01Z\",1],[\"2000-01-03T00:00:02Z\",2],[\"2000-01-03T00:00:03Z\",3]]}]}]}",
    ),
    (
        "out of order query desc",
        "select value from \"cpu\" order by time desc",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-03T00:00:03Z\",3],[\"2000-01-03T00:00:02Z\",2],[\"2000-01-03T00:00:01Z\",1],[\"2000-01-02T00:00:03Z\",333],[\"2000-01-02T00:00:02Z\",222],[\"2000-01-02T00:00:01Z\",111]]}]}]}",
    ),
]

FS_WRITES = [
    "cpu,host=server01 value=100 1257894000000000000",
    "cpu,host=server01,region=uswest value=101 1257894000000000000",
    "cpu,host=server01,region=useast value=102 1257894000000000000",
    "cpu,host=server02,region=useast value=103 1257894000000000000",
]

FS_CASES = [
    (
        "full series and no result",
        "select /*+ full_series */ value from cpu where (host = 'server05' AND region = 'uswest')",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "full series and single tag",
        "select /*+ full_series */ value from cpu where (host = 'server01')",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2009-11-10T23:00:00Z\",100]]}]}]}",
    ),
    (
        "full series normal",
        "select /*+ full_series */ value from cpu where (host = 'server01' AND region = 'uswest')",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2009-11-10T23:00:00Z\",101]]}]}]}",
    ),
]

SS_WRITES = [
    "cpu,host=server01 value=100 1257894000000000000",
    "cpu,host=server01,region=uswest value=101 1257894000000000000",
    "cpu,host=server01,region=useast value=102 1257894000000000000",
    "cpu,host=server02,region=useast value=103 1257894000000000000",
]

SS_CASES = [
    (
        "specific series and no result",
        "select /*+ specific_series */ value from cpu where (host = 'server05' AND region = 'uswest')",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "specific series and single tag",
        "select /*+ specific_series */ value from cpu where (host = 'server01')",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2009-11-10T23:00:00Z\",100],[\"2009-11-10T23:00:00Z\",101],[\"2009-11-10T23:00:00Z\",102]]}]}]}",
    ),
    (
        "specific series normal",
        "select /*+ specific_series */ value from cpu where (host = 'server01' AND region = 'uswest')",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2009-11-10T23:00:00Z\",101]]}]}]}",
    ),
]

HFN_WRITES = [
    "mst,tk1=tv1 f1=0i 1610380800000000000",
    "mst,tk1=tv2 f1=1i    1610467200000000000",
    "mst,tk2=tv3 f2=false 1610553600000000000",
    "mst,tk2=tv4 f2=true  1610640000000000000",
]

HFN_CASES = [
    (
        "show series",
        "show series",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"columns\":[\"key\"],\"values\":[[\"mst,tk1=tv1\"],[\"mst,tk1=tv2\"],[\"mst,tk2=tv3\"],[\"mst,tk2=tv4\"]]}]}]}",
    ),
    (
        "single field with tag",
        "select /*+ Filter_Null_Column */ f1,*::tag from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"tk1\"],\"values\":[[\"2021-01-11T16:00:00Z\",0,\"tv1\"],[\"2021-01-12T16:00:00Z\",1,\"tv2\"]]}]}]}",
    ),
    (
        "single field group by tag",
        "select /*+ Filter_Null_Column */ f1,*::tag from mst group by *::tag",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"tk1\":\"tv1\",\"tk2\":\"\"},\"columns\":[\"time\",\"f1\"],\"values\":[[\"2021-01-11T16:00:00Z\",0]]},{\"name\":\"mst\",\"tags\":{\"tk1\":\"tv2\",\"tk2\":\"\"},\"columns\":[\"time\",\"f1\"],\"values\":[[\"2021-01-12T16:00:00Z\",1]]}]}]}",
    ),
    (
        "single field with tag",
        "select /*+ Filter_Null_Column */ f2,*::tag from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f2\",\"tk2\"],\"values\":[[\"2021-01-13T16:00:00Z\",false,\"tv3\"],[\"2021-01-14T16:00:00Z\",true,\"tv4\"]]}]}]}",
    ),
    (
        "single field group tag",
        "select /*+ Filter_Null_Column */ f2,*::tag from mst group by *::tag",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"tk1\":\"\",\"tk2\":\"tv3\"},\"columns\":[\"time\",\"f2\"],\"values\":[[\"2021-01-13T16:00:00Z\",false]]},{\"name\":\"mst\",\"tags\":{\"tk1\":\"\",\"tk2\":\"tv4\"},\"columns\":[\"time\",\"f2\"],\"values\":[[\"2021-01-14T16:00:00Z\",true]]}]}]}",
    ),
]

HMN_WRITES = [
    "mst,tk1=tv1 f1=0i 1610380800000000000",
    "mst,tk1=tv2 f1=1i    1610467200000000000",
    "mst,tk2=tv3 f2=2i 1610553600000000000",
    "mst,tk3=tv4 f3=true  1610640000000000000",
]

HMN_CASES = [
    (
        "show series",
        "show series",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"columns\":[\"key\"],\"values\":[[\"mst,tk1=tv1\"],[\"mst,tk1=tv2\"],[\"mst,tk2=tv3\"],[\"mst,tk3=tv4\"]]}]}]}",
    ),
    (
        "single field f1 with tag",
        "select /*+ Filter_Null_Column */ f1,*::tag from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"tk1\"],\"values\":[[\"2021-01-11T16:00:00Z\",0,\"tv1\"],[\"2021-01-12T16:00:00Z\",1,\"tv2\"]]}]}]}",
    ),
    (
        "single field f1 group by tag",
        "select /*+ Filter_Null_Column */ f1,*::tag from mst group by *::tag",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"tk1\":\"tv1\",\"tk2\":\"\",\"tk3\":\"\"},\"columns\":[\"time\",\"f1\"],\"values\":[[\"2021-01-11T16:00:00Z\",0]]},{\"name\":\"mst\",\"tags\":{\"tk1\":\"tv2\",\"tk2\":\"\",\"tk3\":\"\"},\"columns\":[\"time\",\"f1\"],\"values\":[[\"2021-01-12T16:00:00Z\",1]]}]}]}",
    ),
    (
        "single field f2 with tag",
        "select /*+ Filter_Null_Column */ f2,*::tag from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f2\",\"tk2\"],\"values\":[[\"2021-01-13T16:00:00Z\",2,\"tv3\"]]}]}]}",
    ),
    (
        "single field f2 group tag",
        "select /*+ Filter_Null_Column */ f2,*::tag from mst group by *::tag",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"tk1\":\"\",\"tk2\":\"tv3\",\"tk3\":\"\"},\"columns\":[\"time\",\"f2\"],\"values\":[[\"2021-01-13T16:00:00Z\",2]]}]}]}",
    ),
    (
        "exact count query",
        "select /*+ Exact_Statistic_Query */ count(*) from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"count_f1\",\"count_f2\",\"count_f3\"],\"values\":[[\"1970-01-01T00:00:00Z\",2,1,1]]}]}]}",
    ),
    (
        "exact first query",
        "select /*+ Exact_Statistic_Query */ first(*) from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"first_f1\",\"first_f2\",\"first_f3\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,2,true]]}]}]}",
    ),
]

HL_WRITES = [
    "mst,tk1=tv9 f1=9i 1610380800000000000",
    "mst,tk1=tv2 f1=2i    1610380800000000000",
    "mst,tk1=tv3 f1=3i 1610380800000000000",
    "mst,tk1=tv4 f1=4i  1610380800000000000",
    "mst,tk1=tv5 f1=5i 1610380800000000000",
    "mst,tk1=tv6 f1=6i 1610380800000000000",
    "mst,tk1=tv7 f1=7i 1610380800000000000",
    "mst,tk1=tv8 f1=8i 1610380800000000000",
    "mst,tk1=tv1 f1=1i 1610380800000000000",
]

HL_CASES = [
    (
        "exact limit * query",
        "select /*+ Exact_Statistic_Query */ * from mst limit 1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\",\"tk1\"],\"values\":[[\"2021-01-11T16:00:00Z\",1,\"tv1\"]]}]}]}",
    ),
    (
        "exact limit field query",
        "select /*+ Exact_Statistic_Query */ f1 from mst limit 1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"f1\"],\"values\":[[\"2021-01-11T16:00:00Z\",1]]}]}]}",
    ),
]

MT_WRITES = [
    "cpu,host=server01 value=2 946684800000000000",
    "gpu,host=server02 speed=25 946684800000000000",
]

MT_CASES = [
    (
        "query value with a single measurement",
        "SELECT value FROM cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2000-01-01T00:00:00Z\",2]]}]}]}",
    ),
    (
        "query wildcard with a single measurement",
        "SELECT * FROM cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"host\",\"value\"],\"values\":[[\"2000-01-01T00:00:00Z\",\"server01\",2]]}]}]}",
    ),
]

NCT_WRITES = [
    "mem,t1=10.172.161.227:31533\\,10.172.161.227:31533 value=1 1625558240121000000",
    "mem,t1=10.172.161.227:31533 value=1 1625558240122000000",
    "mem,t1=10.172.161.227:31533\\,10.172.161.227:31533\\,10.172.161.227:31533 value=1 1625558240123000000",
    "mst,country=china,name=azhu no=1i,age=12.3,height=70i,address=\"shenzhen\",alive=TRUE 1629129600000000000",
    "mst,country=american,name=alan no=2i,age=20.5,height=80i,address=\"shanghai\",alive=FALSE 1629129601000000000",
    "mst,country=germany,name=alang no=3i,age=3.4,height=90i,address=\"beijin\",alive=TRUE 1629129602000000000",
    "mst,country=japan,name=ahui no=4i,age=30,height=121i,address=\"guangzhou\",alive=FALSE 1629129603000000000",
    "mst,country=canada,name=aqiu no=5i,age=35,height=138i,address=\"chengdu\",alive=TRUE 1629129604000000000",
    "mst,country=china,name=agang no=6i,age=48.8,height=149i,address=\"wuhan\" 1629129605000000000",
    "mst,country=american,name=agan no=7i,age=52.7,height=153i,alive=TRUE 1629129606000000000",
    "mst,country=germany,name=alin no=8i,age=28.3,address=\"anhui\",alive=FALSE 1629129607000000000",
    "mst,country=japan,name=ali no=9i,height=179i,address=\"xian\",alive=TRUE 1629129608000000000",
    "mst,country=canada no=10i,age=60.8,height=180i,address=\"hangzhou\",alive=FALSE 1629129609000000000",
    "mst,name=ahuang no=11i,age=102,height=191i,address=\"nanjin\",alive=TRUE 1629129610000000000",
    "mst,country=china,name=ayin no=12i,age=123,height=203i,address=\"zhengzhou\",alive=FALSE 1629129611000000000",
]

NCT_CASES = [
    (
        "select *  group by * ",
        "select * from mem group by *::tag",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mem\",\"tags\":{\"t1\":\"10.172.161.227:31533\"},\"columns\":[\"time\",\"value\"],\"values\":[[\"2021-07-06T07:57:20.122Z\",1]]},{\"name\":\"mem\",\"tags\":{\"t1\":\"10.172.161.227:31533,10.172.161.227:31533\"},\"columns\":[\"time\",\"value\"],\"values\":[[\"2021-07-06T07:57:20.121Z\",1]]},{\"name\":\"mem\",\"tags\":{\"t1\":\"10.172.161.227:31533,10.172.161.227:31533,10.172.161.227:31533\"},\"columns\":[\"time\",\"value\"],\"values\":[[\"2021-07-06T07:57:20.123Z\",1]]}]}]}",
    ),
    (
        "select min(*) group by * ",
        "select min(*) from mst group by *::tag",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"country\":\"\",\"name\":\"ahuang\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",102,true,191,11]]},{\"name\":\"mst\",\"tags\":{\"country\":\"american\",\"name\":\"agan\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",52.7,true,153,7]]},{\"name\":\"mst\",\"tags\":{\"country\":\"american\",\"name\":\"alan\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",20.5,false,80,2]]},{\"name\":\"mst\",\"tags\":{\"country\":\"canada\",\"name\":\"\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",60.8,false,180,10]]},{\"name\":\"mst\",\"tags\":{\"country\":\"canada\",\"name\":\"aqiu\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",35,true,138,5]]},{\"name\":\"mst\",\"tags\":{\"country\":\"china\",\"name\":\"agang\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",48.8,null,149,6]]},{\"name\":\"mst\",\"tags\":{\"country\":\"china\",\"name\":\"ayin\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",123,false,203,12]]},{\"name\":\"mst\",\"tags\":{\"country\":\"china\",\"name\":\"azhu\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",12.3,true,70,1]]},{\"name\":\"mst\",\"tags\":{\"country\":\"germany\",\"name\":\"alang\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",3.4,true,90,3]]},{\"name\":\"mst\",\"tags\":{\"country\":\"germany\",\"name\":\"alin\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",28.3,false,null,8]]},{\"name\":\"mst\",\"tags\":{\"country\":\"japan\",\"name\":\"ahui\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",30,false,121,4]]},{\"name\":\"mst\",\"tags\":{\"country\":\"japan\",\"name\":\"ali\"},\"columns\":[\"time\",\"min_age\",\"min_alive\",\"min_height\",\"min_no\"],\"values\":[[\"1970-01-01T00:00:00Z\",null,true,179,9]]}]}]}",
    ),
]

OOC_WRITES = [
    "mst,country=china,name=azhu no=1i,age=12.3,height=70i,address=\"shenzhen\",alive=TRUE 1629129600000000000",
    "mst,country=american,name=alan no=2i,age=20.5,height=80i,address=\"shanghai\",alive=FALSE 1629129601000000000",
    "mst,country=germany,name=alang no=3i,age=3.4,height=90i,address=\"beijin\",alive=TRUE 1629129602000000000",
    "mst,country=japan,name=ahui no=4i,age=30,height=121i,address=\"guangzhou\",alive=FALSE 1629129603000000000",
    "mst,country=canada,name=aqiu no=5i,age=35,height=138i,address=\"chengdu\",alive=TRUE 1629129604000000000",
    "mst,country=china,name=agang no=6i,age=48.8,height=149i,address=\"wuhan\" 1629129605000000000",
    "mst,country=american,name=agan no=7i,age=52.7,height=153i,alive=TRUE 1629129606000000000",
    "mst,country=germany,name=alin no=8i,age=28.3,address=\"anhui\",alive=FALSE 1629129607000000000",
    "mst,country=japan,name=ali no=9i,height=179i,address=\"xian\",alive=TRUE 1629129608000000000",
    "mst,country=canada no=10i,age=60.8,height=180i,address=\"hangzhou\",alive=FALSE 1629129609000000000",
    "mst,name=ahuang no=11i,age=102,height=191i,address=\"nanjin\",alive=TRUE 1629129610000000000",
    "mst,country=china,name=ayin no=12i,height=203i,address=\"zhengzhou\",alive=FALSE 1629129611000000000",
]

OOC_CASES = [
    (
        "select last(height),age from mst",
        "select last(height),age from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"last\",\"age\"],\"values\":[[\"2021-08-16T16:00:11Z\",203,null]]}]}]}",
    ),
    (
        "select max(height),age from mst",
        "select max(height),age from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"max\",\"age\"],\"values\":[[\"2021-08-16T16:00:11Z\",203,null]]}]}]}",
    ),
]

PSA_WRITES = [
    "mst,host=server19900,region=tagval2_19900,core_tag=spring core=\"field-*_values _1_19900\",tx=19900i,yx=19900,rx=True 1648190516508400896",
    "mst,host=server19901,region=tagval2_19901,core_tag=summer core=\"field-*_values _1_19901\",tx=19901i,yx=19901,rx=False 1648190516509400896",
    "mst,host=server19902,region=tagval2_19902 yx=19902,rx=True 1648190516510400896",
    "mst,host=server19903,region=tagval2_19903,core_tag=winter core=\"field-*_values _1_19903\",tx=19903i,yx=19903,rx=False 1648190516511400896",
    "mst,host=server19904,region=tagval2_19904,core_tag=spring core=\"field-*_values _1_19904\",tx=19904i,yx=19904,rx=True 1648190516512400896",
    "mst,host=server19905,region=tagval2_19905 yx=19905,rx=False 1648190516513400896",
    "mst,host=server19906,region=tagval2_19906,core_tag=autumn core=\"field-*_values _1_19906\",tx=19906i,yx=19906,rx=True 1648190516514400896",
    "mst,host=server19907,region=tagval2_19907,core_tag=winter core=\"field-*_values _1_19907\",tx=19907i,yx=19907,rx=False 1648190516515400896",
    "mst,host=server19908,region=tagval2_19908 yx=19908,rx=True 1648190516516400896",
    "mst,host=server19909,region=tagval2_19909,core_tag=summer core=\"field-*_values _1_19909\",tx=19909i,yx=19909,rx=False 1648190516517400896",
    "mst,host=server19910,region=tagval2_19910,core_tag=autumn core=\"field-*_values _1_19910\",tx=19910i,yx=19910,rx=True 1648190516518400896",
    "mst,host=server19911,region=tagval2_19911 yx=19911,rx=False 1648190516519400896",
    "mst,host=server19912,region=tagval2_19912,core_tag=spring core=\"field-*_values _1_19912\",tx=19912i,yx=19912,rx=True 1648190516520400896",
    "mst,host=server19913,region=tagval2_19913,core_tag=summer core=\"field-*_values _1_19913\",tx=19913i,yx=19913,rx=False 1648190516521400896",
    "mst,host=server19914,region=tagval2_19914 yx=19914,rx=True 1648190516522400896",
    "mst,host=server19915,region=tagval2_19915,core_tag=winter core=\"field-*_values _1_19915\",tx=19915i,yx=19915,rx=False 1648190516523400896",
    "mst,host=server19916,region=tagval2_19916,core_tag=spring core=\"field-*_values _1_19916\",tx=19916i,yx=19916,rx=True 1648190516524400896",
    "mst,host=server19917,region=tagval2_19917 yx=19917,rx=False 1648190516525400896",
    "mst,host=server19918,region=tagval2_19918,core_tag=autumn core=\"field-*_values _1_19918\",tx=19918i,yx=19918,rx=True 1648190516526400896",
    "mst,host=server19919,region=tagval2_19919,core_tag=winter core=\"field-*_values _1_19919\",tx=19919i,yx=19919,rx=False 1648190516527400896",
    "mst,host=server19920,region=tagval2_19920 yx=19920,rx=True 1648190516528400896",
    "mst,host=server19921,region=tagval2_19921,core_tag=summer core=\"field-*_values _1_19921\",tx=19921i,yx=19921,rx=False 1648190516529400896",
    "mst,host=server19922,region=tagval2_19922,core_tag=autumn core=\"field-*_values _1_19922\",tx=19922i,yx=19922,rx=True 1648190516530400896",
    "mst,host=server19923,region=tagval2_19923 yx=19923,rx=False 1648190516531400896",
    "mst,host=server19924,region=tagval2_19924,core_tag=spring core=\"field-*_values _1_19924\",tx=19924i,yx=19924,rx=True 1648190516532400896",
    "mst,host=server19925,region=tagval2_19925,core_tag=summer core=\"field-*_values _1_19925\",tx=19925i,yx=19925,rx=False 1648190516533400896",
    "mst,host=server19926,region=tagval2_19926 yx=19926,rx=True 1648190516534400896",
    "mst,host=server19927,region=tagval2_19927,core_tag=winter core=\"field-*_values _1_19927\",tx=19927i,yx=19927,rx=False 1648190516535400896",
    "mst,host=server19928,region=tagval2_19928,core_tag=spring core=\"field-*_values _1_19928\",tx=19928i,yx=19928,rx=True 1648190516536400896",
    "mst,host=server19929,region=tagval2_19929 yx=19929,rx=False 1648190516537400896",
    "mst,host=server19930,region=tagval2_19930,core_tag=autumn core=\"field-*_values _1_19930\",tx=19930i,yx=19930,rx=True 1648190516538400896",
    "mst,host=server19931,region=tagval2_19931,core_tag=winter core=\"field-*_values _1_19931\",tx=19931i,yx=19931,rx=False 1648190516539400896",
    "mst,host=server19932,region=tagval2_19932 yx=19932,rx=True 1648190516540400896",
    "mst,host=server19933,region=tagval2_19933,core_tag=summer core=\"field-*_values _1_19933\",tx=19933i,yx=19933,rx=False 1648190516541400896",
    "mst,host=server19934,region=tagval2_19934,core_tag=autumn core=\"field-*_values _1_19934\",tx=19934i,yx=19934,rx=True 1648190516542400896",
    "mst,host=server19935,region=tagval2_19935 yx=19935,rx=False 1648190516543400896",
    "mst,host=server19936,region=tagval2_19936,core_tag=spring core=\"field-*_values _1_19936\",tx=19936i,yx=19936,rx=True 1648190516544400896",
    "mst,host=server19937,region=tagval2_19937,core_tag=summer core=\"field-*_values _1_19937\",tx=19937i,yx=19937,rx=False 1648190516545400896",
    "mst,host=server19938,region=tagval2_19938 yx=19938,rx=True 1648190516546400896",
    "mst,host=server19939,region=tagval2_19939,core_tag=winter core=\"field-*_values _1_19939\",tx=19939i,yx=19939,rx=False 1648190516547400896",
    "mst,host=server19940,region=tagval2_19940,core_tag=spring core=\"field-*_values _1_19940\",tx=19940i,yx=19940,rx=True 1648190516548400896",
    "mst,host=server19941,region=tagval2_19941 yx=19941,rx=False 1648190516549400896",
    "mst,host=server19942,region=tagval2_19942,core_tag=autumn core=\"field-*_values _1_19942\",tx=19942i,yx=19942,rx=True 1648190516550400896",
    "mst,host=server19943,region=tagval2_19943,core_tag=winter core=\"field-*_values _1_19943\",tx=19943i,yx=19943,rx=False 1648190516551400896",
    "mst,host=server19944,region=tagval2_19944 yx=19944,rx=True 1648190516552400896",
    "mst,host=server19945,region=tagval2_19945,core_tag=summer core=\"field-*_values _1_19945\",tx=19945i,yx=19945,rx=False 1648190516553400896",
    "mst,host=server19946,region=tagval2_19946,core_tag=autumn core=\"field-*_values _1_19946\",tx=19946i,yx=19946,rx=True 1648190516554400896",
    "mst,host=server19947,region=tagval2_19947 yx=19947,rx=False 1648190516555400896",
    "mst,host=server19948,region=tagval2_19948,core_tag=spring core=\"field-*_values _1_19948\",tx=19948i,yx=19948,rx=True 1648190516556400896",
    "mst,host=server19949,region=tagval2_19949,core_tag=summer core=\"field-*_values _1_19949\",tx=19949i,yx=19949,rx=False 1648190516557400896",
    "mst,host=server19950,region=tagval2_19950 yx=19950,rx=True 1648190516558400896",
    "mst,host=server19951,region=tagval2_19951,core_tag=winter core=\"field-*_values _1_19951\",tx=19951i,yx=19951,rx=False 1648190516559400896",
    "mst,host=server19952,region=tagval2_19952,core_tag=spring core=\"field-*_values _1_19952\",tx=19952i,yx=19952,rx=True 1648190516560400896",
    "mst,host=server19953,region=tagval2_19953 yx=19953,rx=False 1648190516561400896",
    "mst,host=server19954,region=tagval2_19954,core_tag=autumn core=\"field-*_values _1_19954\",tx=19954i,yx=19954,rx=True 1648190516562400896",
    "mst,host=server19955,region=tagval2_19955,core_tag=winter core=\"field-*_values _1_19955\",tx=19955i,yx=19955,rx=False 1648190516563400896",
    "mst,host=server19956,region=tagval2_19956 yx=19956,rx=True 1648190516564400896",
    "mst,host=server19957,region=tagval2_19957,core_tag=summer core=\"field-*_values _1_19957\",tx=19957i,yx=19957,rx=False 1648190516565400896",
    "mst,host=server19958,region=tagval2_19958,core_tag=autumn core=\"field-*_values _1_19958\",tx=19958i,yx=19958,rx=True 1648190516566400896",
    "mst,host=server19959,region=tagval2_19959 yx=19959,rx=False 1648190516567400896",
    "mst,host=server19960,region=tagval2_19960,core_tag=spring core=\"field-*_values _1_19960\",tx=19960i,yx=19960,rx=True 1648190516568400896",
    "mst,host=server19961,region=tagval2_19961,core_tag=summer core=\"field-*_values _1_19961\",tx=19961i,yx=19961,rx=False 1648190516569400896",
    "mst,host=server19962,region=tagval2_19962 yx=19962,rx=True 1648190516570400896",
    "mst,host=server19963,region=tagval2_19963,core_tag=winter core=\"field-*_values _1_19963\",tx=19963i,yx=19963,rx=False 1648190516571400896",
    "mst,host=server19964,region=tagval2_19964,core_tag=spring core=\"field-*_values _1_19964\",tx=19964i,yx=19964,rx=True 1648190516572400896",
    "mst,host=server19965,region=tagval2_19965 yx=19965,rx=False 1648190516573400896",
    "mst,host=server19966,region=tagval2_19966,core_tag=autumn core=\"field-*_values _1_19966\",tx=19966i,yx=19966,rx=True 1648190516574400896",
    "mst,host=server19967,region=tagval2_19967,core_tag=winter core=\"field-*_values _1_19967\",tx=19967i,yx=19967,rx=False 1648190516575400896",
    "mst,host=server19968,region=tagval2_19968 yx=19968,rx=True 1648190516576400896",
    "mst,host=server19969,region=tagval2_19969,core_tag=summer core=\"field-*_values _1_19969\",tx=19969i,yx=19969,rx=False 1648190516577400896",
    "mst,host=server19970,region=tagval2_19970,core_tag=autumn core=\"field-*_values _1_19970\",tx=19970i,yx=19970,rx=True 1648190516578400896",
    "mst,host=server19971,region=tagval2_19971 yx=19971,rx=False 1648190516579400896",
    "mst,host=server19972,region=tagval2_19972,core_tag=spring core=\"field-*_values _1_19972\",tx=19972i,yx=19972,rx=True 1648190516580400896",
    "mst,host=server19973,region=tagval2_19973,core_tag=summer core=\"field-*_values _1_19973\",tx=19973i,yx=19973,rx=False 1648190516581400896",
    "mst,host=server19974,region=tagval2_19974 yx=19974,rx=True 1648190516582400896",
    "mst,host=server19975,region=tagval2_19975,core_tag=winter core=\"field-*_values _1_19975\",tx=19975i,yx=19975,rx=False 1648190516583400896",
    "mst,host=server19976,region=tagval2_19976,core_tag=spring core=\"field-*_values _1_19976\",tx=19976i,yx=19976,rx=True 1648190516584400896",
    "mst,host=server19977,region=tagval2_19977 yx=19977,rx=False 1648190516585400896",
    "mst,host=server19978,region=tagval2_19978,core_tag=autumn core=\"field-*_values _1_19978\",tx=19978i,yx=19978,rx=True 1648190516586400896",
    "mst,host=server19979,region=tagval2_19979,core_tag=winter core=\"field-*_values _1_19979\",tx=19979i,yx=19979,rx=False 1648190516587400896",
    "mst,host=server19980,region=tagval2_19980 yx=19980,rx=True 1648190516588400896",
    "mst,host=server19981,region=tagval2_19981,core_tag=summer core=\"field-*_values _1_19981\",tx=19981i,yx=19981,rx=False 1648190516589400896",
    "mst,host=server19982,region=tagval2_19982,core_tag=autumn core=\"field-*_values _1_19982\",tx=19982i,yx=19982,rx=True 1648190516590400896",
    "mst,host=server19983,region=tagval2_19983 yx=19983,rx=False 1648190516591400896",
    "mst,host=server19984,region=tagval2_19984,core_tag=spring core=\"field-*_values _1_19984\",tx=19984i,yx=19984,rx=True 1648190516592400896",
    "mst,host=server19985,region=tagval2_19985,core_tag=summer core=\"field-*_values _1_19985\",tx=19985i,yx=19985,rx=False 1648190516593400896",
    "mst,host=server19986,region=tagval2_19986 yx=19986,rx=True 1648190516594400896",
    "mst,host=server19987,region=tagval2_19987,core_tag=winter core=\"field-*_values _1_19987\",tx=19987i,yx=19987,rx=False 1648190516595400896",
    "mst,host=server19988,region=tagval2_19988,core_tag=spring core=\"field-*_values _1_19988\",tx=19988i,yx=19988,rx=True 1648190516596400896",
    "mst,host=server19989,region=tagval2_19989 yx=19989,rx=False 1648190516597400896",
    "mst,host=server19990,region=tagval2_19990,core_tag=autumn core=\"field-*_values _1_19990\",tx=19990i,yx=19990,rx=True 1648190516598400896",
    "mst,host=server19991,region=tagval2_19991,core_tag=winter core=\"field-*_values _1_19991\",tx=19991i,yx=19991,rx=False 1648190516599400896",
    "mst,host=server19992,region=tagval2_19992 yx=19992,rx=True 1648190516600400896",
    "mst,host=server19993,region=tagval2_19993,core_tag=summer core=\"field-*_values _1_19993\",tx=19993i,yx=19993,rx=False 1648190516601400896",
    "mst,host=server19994,region=tagval2_19994,core_tag=autumn core=\"field-*_values _1_19994\",tx=19994i,yx=19994,rx=True 1648190516602400896",
    "mst,host=server19995,region=tagval2_19995 yx=19995,rx=False 1648190516603400896",
    "mst,host=server19996,region=tagval2_19996,core_tag=spring core=\"field-*_values _1_19996\",tx=19996i,yx=19996,rx=True 1648190516604400896",
    "mst,host=server19997,region=tagval2_19997,core_tag=summer core=\"field-*_values _1_19997\",tx=19997i,yx=19997,rx=False 1648190516605400896",
    "mst,host=server19998,region=tagval2_19998 yx=19998,rx=True 1648190516606400896",
    "mst,host=server19999,region=tagval2_19999,core_tag=winter core=\"field-*_values _1_19999\",tx=19999i,yx=19999,rx=False 1648190516607400896",
]

PSA_CASES = [
    (
        "select max(yx),core,tx,rx from mst",
        "select max(yx),core,tx,rx from mst",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"max\",\"core\",\"tx\",\"rx\"],\"values\":[[\"2022-03-25T06:41:56.607400896Z\",19999,\"field-*_values _1_19999\",19999,false]]}]}]}",
    ),
]

POO_WRITES = [
    "cpu,host=serverA,region=uswest val=23.1,no=2i,alive=TRUE 1637931600000000000",
    "cpu,host=serverB,region=uswest val=23,no=3i,alive=FALSE 1637935200000000000",
    "cpu,host=serverB,region=uswest val=23,no=4i 1637845200000000000",
    "cpu,host=serverA,region=uswest val=23.4,no=5i,alive=FALSE 1637848800000000000",
    "cpu,host=serverA,region=uswest val=105,no=6i,alive=TRUE 1638003600000000000",
    "cpu,host=serverB,region=uswest val=200,no=7i,alive=FALSE 1637834400000000000",
    "cpu,host=serverA,region=uswest val=100,no=8i,alive=TRUE 1637917200000000000",
    "cpu,host=serverB,region=uswest val=200,no=9i,alive=TRUE 1637920800000000000",
]

POO_CASES = [
    (
        "create database with shard group duration and index duration should succeed",
        "CREATE DATABASE db3 WITH SHARD DURATION 12h index duration 24h name rp3",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "select count(time) should success",
        "select count(time) from db3.rp3.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"count\"],\"values\":[[\"1970-01-01T00:00:00Z\",8]]}]}]}",
    ),
    (
        "select count(*)",
        "select count(*) from db3.rp3.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"count_alive\",\"count_no\",\"count_val\"],\"values\":[[\"1970-01-01T00:00:00Z\",7,8,8]]}]}]}",
    ),
    (
        "select min(val)",
        "select min(val) from db3.rp3.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-11-25T13:00:00Z\",23]]}]}]}",
    ),
    (
        "select min(val),host,region,aliv",
        "select min(val),host,region,alive from db3.rp3.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"min\",\"host\",\"region\",\"alive\"],\"values\":[[\"2021-11-25T13:00:00Z\",23,\"serverB\",\"uswest\",null]]}]}]}",
    ),
    (
        "select max(val)",
        "select max(val) from db3.rp3.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-11-25T10:00:00Z\",200]]}]}]}",
    ),
    (
        "select first(val)",
        "select first(val) from db3.rp3.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-11-25T10:00:00Z\",200]]}]}]}",
    ),
    (
        "select last(val)",
        "select last(val) from db3.rp3.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-11-27T09:00:00Z\",105]]}]}]}",
    ),
    (
        "select sum(val)",
        "select sum(val) from db3.rp3.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"sum\"],\"values\":[[\"1970-01-01T00:00:00Z\",697.5]]}]}]}",
    ),
]

PED_WRITES = [
    "mst,k=1 f1=1,f2=1,f3=1i,f4=true    1629129601000000000",
    "mst,k=1 f1=2                       1629129602000000000",
    "mst,k=1 f1=3                       1629129603000000000",
    "mst,k=1 f1=4,f2=4,f3=4i,f4=false   1629129604000000000",
]

PED_CASES = [
    (
        "max float",
        "select max(f2) from mst where time>=1629129602000000000 and time < 1629129603000000000",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "max int",
        "select max(f3) from mst where time>=1629129602000000000 and time < 1629129603000000000",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "max bool",
        "select max(f4) from mst where time>=1629129602000000000 and time < 1629129603000000000",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "min float",
        "select min(f2) from mst where time>=1629129602000000000 and time < 1629129603000000000",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "min int",
        "select min(f3) from mst where time>=1629129602000000000 and time < 1629129603000000000",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "min bool",
        "select min(f4) from mst where time>=1629129602000000000 and time < 1629129603000000000",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
]

PF_WRITES = [
    "mst,country=China,city=Chengdu age=1 1625558240120000000",
    "mst,country=China,city=Chengdu age=2 1625558240130000000",
    "mst,country=China,city=Hangzhou age=3 1625558240120000000",
    "mst,country=China,city=Hangzhou age=4 1625558240130000000",
    "mst,country=China,city=Nanjing age=5 1625558240120000000",
    "mst,country=China,city=Nanjing age=6 1625558240130000000",
    "mst,country=China,city=Beijing age=7 1625558240120000000",
    "mst,country=China,city=Beijing age=8 1625558240130000000",
    "mst,country=China,city=Shanghai age=9 1625558240120000000",
    "mst,country=China,city=Shanghai age=10 1625558240130000000",
    "mst,country=China,city=Guangzhou age=11 1625558240120000000",
    "mst,country=China,city=Guangzhou age=12 1625558240130000000",
    "mst,country=China,city=Shenzheng age=13 1625558240120000000",
    "mst,country=China,city=Shenzheng age=14 1625558240130000000",
    "mst,country=China,city=Yantai age=15 1625558240120000000",
    "mst,country=China,city=Yantai age=16 1625558240130000000",
    "mst,country=China,city=Heilongjiang age=17 1625558240120000000",
    "mst,country=China,city=Heilongjiang age=18 1625558240130000000",
    "mst,country=China,city=Changsha age=19 1625558240119000000",
    "mst,country=China,city=Changsha age=20 1625558240130000000",
    "mst,country=China,city=Xizhang age=21 1625558240119000000",
    "mst,country=China,city=Xizhang age=22 1625558240130000000",
]

PF_CASES = [
    (
        "max age group by *",
        "select max(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"city\":\"Beijing\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",7]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Chengdu\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Guangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",11]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Hangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",3]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Heilongjiang\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",17]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Nanjing\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",5]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shanghai\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",9]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shenzheng\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",13]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Yantai\",\"country\":\"China\"},\"columns\":[\"time\",\"max\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",15]]}]}]}",
    ),
    (
        "min age group by *",
        "select min(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"city\":\"Beijing\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",7]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Chengdu\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Guangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",11]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Hangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",3]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Heilongjiang\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",17]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Nanjing\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",5]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shanghai\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",9]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shenzheng\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",13]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Yantai\",\"country\":\"China\"},\"columns\":[\"time\",\"min\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",15]]}]}]}",
    ),
    (
        "first age group by *",
        "select first(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"city\":\"Beijing\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",7]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Chengdu\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Guangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",11]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Hangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",3]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Heilongjiang\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",17]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Nanjing\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",5]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shanghai\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",9]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shenzheng\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",13]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Yantai\",\"country\":\"China\"},\"columns\":[\"time\",\"first\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",15]]}]}]}",
    ),
    (
        "last age group by *",
        "select last(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"city\":\"Beijing\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",7]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Chengdu\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Guangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",11]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Hangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",3]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Heilongjiang\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",17]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Nanjing\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",5]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shanghai\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",9]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shenzheng\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",13]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Yantai\",\"country\":\"China\"},\"columns\":[\"time\",\"last\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",15]]}]}]}",
    ),
    (
        "count age group by *",
        "select count(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"city\":\"Beijing\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Chengdu\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Guangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Hangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Heilongjiang\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Nanjing\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shanghai\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shenzheng\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Yantai\",\"country\":\"China\"},\"columns\":[\"time\",\"count\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]}]}]}",
    ),
    (
        "sum age group by *",
        "select sum(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"city\":\"Beijing\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",7]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Chengdu\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",1]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Guangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",11]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Hangzhou\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",3]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Heilongjiang\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",17]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Nanjing\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",5]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shanghai\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",9]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Shenzheng\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",13]]},{\"name\":\"mst\",\"tags\":{\"city\":\"Yantai\",\"country\":\"China\"},\"columns\":[\"time\",\"sum\"],\"values\":[[\"2021-07-06T07:57:20.12Z\",15]]}]}]}",
    ),
]

PMM_WRITES = [
    "m_DDB8BA70_20240820193222_jsli,thing_id=DDB8BA70_20240820193222-T01 /ProductModel#string=\"test_string01\",/OverdriveState#integer=1024,/RotationsPerSecond#double=1.7976931348623157e+308 1724182346000000000",
    "m_DDB8BA70_20240820193222_jsli,thing_id=DDB8BA70_20240820193222-T01 /ProductModel#string=\"test_string02\",/OverdriveState#integer=10240,/RotationsPerSecond#double=-1.7976931348623157e+308 1724182347000000000",
    "m_DDB8BA70_20240820193222_jsli,thing_id=DDB8BA70_20240820193222-T01 /ProductModel#string=\"test_string03\",/OverdriveState#integer=102400,/RotationsPerSecond#double=1.7976931348623157e+308 1724182348000000000",
    "m_DDB8BA70_20240820193222_jsli,thing_id=DDB8BA70_20240820193222-T01 /ProductModel#string=\"test_string04\",/OverdriveState#integer=9007199254740991,/RotationsPerSecond#double=1.7976931348623157e+308 1724183132000000000",
]

PMM_CASES = [
    (
        "exact agg: min + max",
        "select /*+ Exact_Statistic_Query */ count(\"/ProductModel#string\"),sum(\"/OverdriveState#integer\"),max(\"/RotationsPerSecond#double\"),min(\"/RotationsPerSecond#double\"),mean(\"/RotationsPerSecond#double\") from \"m_DDB8BA70_20240820193222_jsli\" where time >= '2024-08-20T19:45:00.000Z' and time < '2024-08-20T20:00:00.000Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m_DDB8BA70_20240820193222_jsli\",\"columns\":[\"time\",\"count\",\"sum\",\"max\",\"min\",\"mean\"],\"values\":[[\"2024-08-20T19:45:00Z\",1,9007199254740991,1.7976931348623157e+308,1.7976931348623157e+308,1.7976931348623157e+308]]}]}]}",
    ),
    (
        "pre agg: min + max",
        "select count(\"/ProductModel#string\"),sum(\"/OverdriveState#integer\"),max(\"/RotationsPerSecond#double\"),min(\"/RotationsPerSecond#double\"),mean(\"/RotationsPerSecond#double\") from \"m_DDB8BA70_20240820193222_jsli\" where time >= '2024-08-20T19:45:00.000Z' and time < '2024-08-20T20:00:00.000Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"m_DDB8BA70_20240820193222_jsli\",\"columns\":[\"time\",\"count\",\"sum\",\"max\",\"min\",\"mean\"],\"values\":[[\"2024-08-20T19:45:00Z\",1,9007199254740991,1.7976931348623157e+308,1.7976931348623157e+308,1.7976931348623157e+308]]}]}]}",
    ),
]

DET_WRITES = [
    "mst,agent=A,ns=m1 metric_v=10,metric_v1=15.0 1740963600000000000",
    "mst,agent=A,ns=m1 metric_v=10,metric_v1=15.0 1740963660000000000",
    "mst,agent=A,ns=m1 metric_v=40,metric_v1=25 1740963720000000000",
    "mst,agent=A,ns=m1 metric_v=40,metric_v1=25 1740963780000000000",
    "mst,agent=A,ns=m2 metric_v=20,metric_v1=10 1740963840000000000",
    "mst,agent=A,ns=m2 metric_v=20,metric_v1=15.5 1740963900000000000",
    "mst,agent=A,ns=m2 metric_v=30,metric_v1=16.5 1740963960000000000",
    "mst,agent=A,ns=m2 metric_v=50,metric_v1=22.2 1740964020000000000",
    "mst,agent=A,ns=m2 metric_v=50,metric_v1=28.9 1740964080000000000",
    "mst,agent=B,ns=m1 metric_v=25,metric_v1=5 1740964140000000000",
    "mst,agent=B,ns=m1 metric_v=35,metric_v1=11.6 1740964200000000000",
    "mst,agent=B,ns=m1 metric_v=45,metric_v1=12.8 1740964260000000000",
    "mst,agent=B,ns=m1 metric_v=55,metric_v1=24.3 1740964320000000000",
    "mst,agent=B,ns=m1 metric_v=65,metric_v1=25.6 1740964380000000000",
    "mst,agent=B,ns=m1 metric_v=75,metric_v1=30.8 1740964440000000000",
    "mst,agent=B,ns=m2 metric_v=10 1740964500000000000",
    "mst,agent=B,ns=m2 metric_v2=\"a\" 1740964560000000000",
    "mst,agent=B,ns=m2 metric_v=30 1740964620000000000",
    "mst,agent=B,ns=m2 metric_v2=\"b\" 1740964680000000000",
]

DET_CASES = [
    (
        "ad_rmse_ext string",
        "SELECT ad_rmse_ext(metric_v2) FROM db0.rp0.mst",
        "{\"results\":[{\"statement_id\":0,\"error\":\"unsupported (ad_rmse_ext) iterator type: (string)\"}]}",
    ),
    (
        "ad_rmse_ext null",
        "SELECT ad_rmse_ext(metric_v3) FROM db0.rp0.mst",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "ad_rmse_ext with null row",
        "SELECT ad_rmse_ext(metric_v) FROM db0.rp0.mst where agent='B' and ns='m2'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"columns\":[\"time\",\"ad_rmse_ext\"],\"values\":[[\"2025-03-03T01:15:00Z\",2]]}]}]}",
    ),
    (
        "ad_rmse_ext int",
        "SELECT ad_rmse_ext(metric_v) FROM db0.rp0.mst group by agent,ns",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"agent\":\"A\",\"ns\":\"m1\"},\"columns\":[\"time\",\"ad_rmse_ext\"],\"values\":[[\"2025-03-03T01:00:00Z\",3]]},{\"name\":\"mst\",\"tags\":{\"agent\":\"A\",\"ns\":\"m2\"},\"columns\":[\"time\",\"ad_rmse_ext\"],\"values\":[[\"2025-03-03T01:04:00Z\",1.5]]},{\"name\":\"mst\",\"tags\":{\"agent\":\"B\",\"ns\":\"m1\"},\"columns\":[\"time\",\"ad_rmse_ext\"],\"values\":[[\"2025-03-03T01:09:00Z\",0.8571428571428571]]},{\"name\":\"mst\",\"tags\":{\"agent\":\"B\",\"ns\":\"m2\"},\"columns\":[\"time\",\"ad_rmse_ext\"],\"values\":[[\"2025-03-03T01:15:00Z\",2]]}]}]}",
    ),
    (
        "ad_rmse_ext float",
        "SELECT ad_rmse_ext(metric_v1) FROM db0.rp0.mst group by agent,ns",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"mst\",\"tags\":{\"agent\":\"A\",\"ns\":\"m1\"},\"columns\":[\"time\",\"ad_rmse_ext\"],\"values\":[[\"2025-03-03T01:00:00Z\",0.6666666666666666]]},{\"name\":\"mst\",\"tags\":{\"agent\":\"A\",\"ns\":\"m2\"},\"columns\":[\"time\",\"ad_rmse_ext\"],\"values\":[[\"2025-03-03T01:04:00Z\",1.0050239046049472]]},{\"name\":\"mst\",\"tags\":{\"agent\":\"B\",\"ns\":\"m1\"},\"columns\":[\"time\",\"ad_rmse_ext\"],\"values\":[[\"2025-03-03T01:09:00Z\",1.760009355294258]]}]}]}",
    ),
]

BUG_WRITES = [
    "cpu,tag1=1 field1=1 1566786536000000000",
    "cpu,tag1=2 field1=2 1566786537000000000",
    "cpu,tag2=3 field1=3 1566786538000000000",
    "cpu,tag2=4 field1=4 1566786539000000000",
]

BUG_CASES = [
    (
        "select * from db0.rp0.cpu",
        "SELECT * FROM db0.rp0.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"field1\",\"tag1\",\"tag2\"],\"values\":[[\"2019-08-26T02:28:56Z\",1,\"1\",null],[\"2019-08-26T02:28:57Z\",2,\"2\",null],[\"2019-08-26T02:28:58Z\",3,null,\"3\"],[\"2019-08-26T02:28:59Z\",4,null,\"4\"]]}]}]}",
    ),
    (
        "select min(field1),field1 from db0.rp0.cpu",
        "SELECT MIN(field1),field1 FROM db0.rp0.cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"min\",\"field1\"],\"values\":[[\"2019-08-26T02:28:56Z\",1,1]]}]}]}",
    ),
    (
        "SELECT TOP(field1, 2),* FROM db0.rp0.cpu LIMIT 2",
        "SELECT TOP(field1, 2),* FROM db0.rp0.cpu LIMIT 2",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"top\",\"field1\",\"tag1\",\"tag2\"],\"values\":[[\"2019-08-26T02:28:58Z\",3,3,null,\"3\"],[\"2019-08-26T02:28:59Z\",4,4,null,\"4\"]]}]}]}",
    ),
    (
        "SELECT multi-agg(field1) FROM db0.rp0.cpu LIMIT 1",
        "select MOVING_AVERAGE(field2,2) as f8, NON_NEGATIVE_DERIVATIVE(field2) as f1, NON_NEGATIVE_DIFFERENCE(field2) as f2, CUMULATIVE_SUM(field2) as f3, CUMULATIVE_SUM(field2) as f4, DERIVATIVE(field2) as f5, DIFFERENCE(field2) as f6, ELAPSED(field2) as f7, MOVING_AVERAGE(field1,2) as ax, INTEGRAL(field2) as f9 from db0.rp0.cpu limit 1",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"f8\",\"f1\",\"f2\",\"f3\",\"f4\",\"f5\",\"f6\",\"f7\",\"ax\",\"f9\"],\"values\":[[\"2019-08-26T02:28:57Z\",null,null,null,null,null,null,null,null,1.5,null]]}]}]}",
    ),
    (
        "SELECT multi-agg(*) FROM db0.rp0.cpu LIMIT 1",
        "select ax, ay from ( select ax , f3 from (select  NON_NEGATIVE_DERIVATIVE(field2) as f1, NON_NEGATIVE_DIFFERENCE(field2) as f2, CUMULATIVE_SUM(field2) as f3, CUMULATIVE_SUM(field2) as f4, DERIVATIVE(field2) as f5, DIFFERENCE(field2) as f6, ELAPSED(field2) as f7, MOVING_AVERAGE(field1,2) as ax, MOVING_AVERAGE(field2,2) as f8, INTEGRAL(field2) as f9 from db0.rp0.cpu limit 1))",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"ax\",\"ay\"],\"values\":[[\"2019-08-26T02:28:57Z\",1.5,null]]}]}]}",
    ),
]

WE_WRITES = [
    "wildcard,region=us-east,host=A value=10,cpu=80 946684800000000000",
    "wildcard,region=us-east,host=B value=20,cpu=90 946684810000000000",
    "wildcard,region=us-west,host=B value=30,cpu=70 946684820000000000",
    "wildcard,region=us-east,host=A value=40,cpu=60 946684830000000000",
    "dupnames,region=us-east,days=1 value=10,day=3i 946684800000000000",
    "dupnames,region=us-east,days=2 value=20,day=2i 946684810000000000",
    "dupnames,region=us-west,days=3 value=30,day=1i 946684820000000000",
]

WE_CASES = [
    (
        "wildcard",
        "SELECT * FROM wildcard",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"wildcard\",\"columns\":[\"time\",\"cpu\",\"host\",\"region\",\"value\"],\"values\":[[\"2000-01-01T00:00:00Z\",80,\"A\",\"us-east\",10],[\"2000-01-01T00:00:10Z\",90,\"B\",\"us-east\",20],[\"2000-01-01T00:00:20Z\",70,\"B\",\"us-west\",30],[\"2000-01-01T00:00:30Z\",60,\"A\",\"us-east\",40]]}]}]}",
    ),
    (
        "no wildcard in select",
        "SELECT cpu, host, region, value  FROM wildcard",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"wildcard\",\"columns\":[\"time\",\"cpu\",\"host\",\"region\",\"value\"],\"values\":[[\"2000-01-01T00:00:00Z\",80,\"A\",\"us-east\",10],[\"2000-01-01T00:00:10Z\",90,\"B\",\"us-east\",20],[\"2000-01-01T00:00:20Z\",70,\"B\",\"us-west\",30],[\"2000-01-01T00:00:30Z\",60,\"A\",\"us-east\",40]]}]}]}",
    ),
    (
        "no wildcard in select, preserve column order",
        "SELECT host, cpu, region, value  FROM wildcard",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"wildcard\",\"columns\":[\"time\",\"host\",\"cpu\",\"region\",\"value\"],\"values\":[[\"2000-01-01T00:00:00Z\",\"A\",80,\"us-east\",10],[\"2000-01-01T00:00:10Z\",\"B\",90,\"us-east\",20],[\"2000-01-01T00:00:20Z\",\"B\",70,\"us-west\",30],[\"2000-01-01T00:00:30Z\",\"A\",60,\"us-east\",40]]}]}]}",
    ),
    (
        "no wildcard with alias",
        "SELECT cpu as c, host as h, region, value  FROM wildcard",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"wildcard\",\"columns\":[\"time\",\"c\",\"h\",\"region\",\"value\"],\"values\":[[\"2000-01-01T00:00:00Z\",80,\"A\",\"us-east\",10],[\"2000-01-01T00:00:10Z\",90,\"B\",\"us-east\",20],[\"2000-01-01T00:00:20Z\",70,\"B\",\"us-west\",30],[\"2000-01-01T00:00:30Z\",60,\"A\",\"us-east\",40]]}]}]}",
    ),
    (
        "duplicate tag and field key",
        "SELECT * FROM dupnames",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"dupnames\",\"columns\":[\"time\",\"day\",\"days\",\"region\",\"value\"],\"values\":[[\"2000-01-01T00:00:00Z\",3,\"1\",\"us-east\",10],[\"2000-01-01T00:00:10Z\",2,\"2\",\"us-east\",20],[\"2000-01-01T00:00:20Z\",1,\"3\",\"us-west\",30]]}]}]}",
    ),
]

TF_WRITES = [
    "test,tag1=1,tag2=2 value=1 1709258312955000000",
    "test,tag1=1,tag2=2 value=2 1709258327955000000",
    "test,tag1=1,tag2=2 value=3 1709258342955000000",
    "test,tag1=1,tag2=2 value=4 1709258357955000000",
    "test,tag1=1,tag2=3 value=5 1709258372955000000",
]

TF_CASES = [
    (
        "tag1=1 and tag2=2,with agg",
        "select sum(value) from test where tag1=1 and tag2=2",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "tag1=1 and tag2=2,not with agg",
        "select value from test where tag1=1 and tag2=2",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "tag1='1' and tag2='2',with agg",
        "select sum(value) from test where tag1='1' and tag2='2'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"test\",\"columns\":[\"time\",\"sum\"],\"values\":[[\"1970-01-01T00:00:00Z\",10]]}]}]}",
    ),
    (
        "tag1='1' and tag2='2',not with agg",
        "select value from test where tag1='1' and tag2='2'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"test\",\"columns\":[\"time\",\"value\"],\"values\":[[\"2024-03-01T01:58:32.955Z\",1],[\"2024-03-01T01:58:47.955Z\",2],[\"2024-03-01T01:59:02.955Z\",3],[\"2024-03-01T01:59:17.955Z\",4]]}]}]}",
    ),
]

ASF_WRITES = [
    "cpu load=100 946684800000000000",
    "cpu load=200 1262304000000000000",
    "cpu core=4 1420070400000000000",
]

ASF_CASES = [
    (
        "two results for cpu",
        "SELECT load FROM cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"load\"],\"values\":[[\"2000-01-01T00:00:00Z\",100],[\"2010-01-01T00:00:00Z\",200]]}]}]}",
    ),
    (
        "two results for cpu, multi-select",
        "SELECT core,load FROM cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"core\",\"load\"],\"values\":[[\"2000-01-01T00:00:00Z\",null,100],[\"2010-01-01T00:00:00Z\",null,200],[\"2015-01-01T00:00:00Z\",4,null]]}]}]}",
    ),
    (
        "two results for cpu, wildcard select",
        "SELECT * FROM cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"core\",\"load\"],\"values\":[[\"2000-01-01T00:00:00Z\",null,100],[\"2010-01-01T00:00:00Z\",null,200],[\"2015-01-01T00:00:00Z\",4,null]]}]}]}",
    ),
    (
        "one result for core",
        "SELECT core FROM cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"core\"],\"values\":[[\"2015-01-01T00:00:00Z\",4]]}]}]}",
    ),
    (
        "empty result set from non-existent field",
        "SELECT foo FROM cpu",
        "{\"results\":[{\"statement_id\":0}]}",
    ),
    (
        "select existent and non-existent field",
        "SELECT foo,load FROM cpu",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"foo\",\"load\"],\"values\":[[\"2000-01-01T00:00:00Z\",null,100],[\"2010-01-01T00:00:00Z\",null,200]]}]}]}",
    ),
]

OAS_WRITES = [
    "cpu value=7 1262304000000000000",
    "cpu value=14 1262908800000000000",
    "cpu value=28 1263513600000000000",
    "cpu value=56 1264118400000000000",
    "cpu value=112 1264723200000000000",
]

OAS_CASES = [
]

SRT1_WRITES = [
    "cpu,region=region_0,az=az_0 v1=0i,v2=0.000000,v3=true 1610380800000000000",
    "cpu,region=region_0,az=az_0 v1=1i,v2=1.000000,v3=false 1610467200000000000",
    "cpu,region=region_0,az=az_0 v1=2i,v2=2.000000,v3=true 1610553600000000000",
    "cpu,region=region_0,az=az_0 v1=3i,v2=3.000000,v3=false 1610640000000000000",
]

SRT1_CASES = [
    (
        "single point with time pre-calculated for past time queries yesterday",
        "select v3 from db0.rp0.cpu where time>='2021-01-12T16:00:00Z'",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"cpu\",\"columns\":[\"time\",\"v3\"],\"values\":[[\"2021-01-12T16:00:00Z\",false],[\"2021-01-13T16:00:00Z\",true],[\"2021-01-14T16:00:00Z\",false]]}]}]}",
    ),
]

def _mkroot(spark, tmp_path_factory, name, writes):
    root = str(tmp_path_factory.mktemp(name))
    handle_write(spark, writes, root)
    return root


@pytest.fixture(scope="module")
def p3_ooo_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_ooo", OOO_WRITES)


@pytest.mark.parametrize("name,q,exp", OOO_CASES, ids=[c[0] for c in OOO_CASES])
def test_ooo_case(spark, sf_dir, p3_ooo_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_ooo_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_fs_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_fs", FS_WRITES)


@pytest.mark.parametrize("name,q,exp", FS_CASES, ids=[c[0] for c in FS_CASES])
def test_fs_case(spark, sf_dir, p3_fs_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_fs_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_ss_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_ss", SS_WRITES)


@pytest.mark.parametrize("name,q,exp", SS_CASES, ids=[c[0] for c in SS_CASES])
def test_ss_case(spark, sf_dir, p3_ss_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_ss_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_hfn_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_hfn", HFN_WRITES)


@pytest.mark.parametrize("name,q,exp", HFN_CASES, ids=[c[0] for c in HFN_CASES])
def test_hfn_case(spark, sf_dir, p3_hfn_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_hfn_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_hmn_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_hmn", HMN_WRITES)


@pytest.mark.parametrize("name,q,exp", HMN_CASES, ids=[c[0] for c in HMN_CASES])
def test_hmn_case(spark, sf_dir, p3_hmn_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_hmn_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_hl_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_hl", HL_WRITES)


@pytest.mark.parametrize("name,q,exp", HL_CASES, ids=[c[0] for c in HL_CASES])
def test_hl_case(spark, sf_dir, p3_hl_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_hl_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_mt_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_mt", MT_WRITES)


@pytest.mark.parametrize("name,q,exp", MT_CASES, ids=[c[0] for c in MT_CASES])
def test_mt_case(spark, sf_dir, p3_mt_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_mt_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_nct_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_nct", NCT_WRITES)


@pytest.mark.parametrize("name,q,exp", NCT_CASES, ids=[c[0] for c in NCT_CASES])
def test_nct_case(spark, sf_dir, p3_nct_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_nct_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_ooc_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_ooc", OOC_WRITES)


@pytest.mark.parametrize("name,q,exp", OOC_CASES, ids=[c[0] for c in OOC_CASES])
def test_ooc_case(spark, sf_dir, p3_ooc_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_ooc_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_psa_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_psa", PSA_WRITES)


@pytest.mark.parametrize("name,q,exp", PSA_CASES, ids=[c[0] for c in PSA_CASES])
def test_psa_case(spark, sf_dir, p3_psa_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_psa_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_poo_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_poo", POO_WRITES)


@pytest.mark.parametrize("name,q,exp", POO_CASES, ids=[c[0] for c in POO_CASES])
def test_poo_case(spark, sf_dir, p3_poo_root, name, q, exp, tmp_path):
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    ddl = DDLExecutor(spark, MetaStore(str(tmp_path / "meta")))
    got = handle_query(
        spark, sf_dir, q, epoch=None, data_root=p3_poo_root, ddl=ddl
    )
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_ped_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_ped", PED_WRITES)


@pytest.mark.parametrize("name,q,exp", PED_CASES, ids=[c[0] for c in PED_CASES])
def test_ped_case(spark, sf_dir, p3_ped_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_ped_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_pf_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_pf", PF_WRITES)


@pytest.mark.parametrize("name,q,exp", PF_CASES, ids=[c[0] for c in PF_CASES])
def test_pf_case(spark, sf_dir, p3_pf_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_pf_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_pmm_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_pmm", PMM_WRITES)


@pytest.mark.parametrize("name,q,exp", PMM_CASES, ids=[c[0] for c in PMM_CASES])
def test_pmm_case(spark, sf_dir, p3_pmm_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_pmm_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_det_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_det", DET_WRITES)


@pytest.mark.parametrize("name,q,exp", DET_CASES, ids=[c[0] for c in DET_CASES])
def test_det_case(spark, sf_dir, p3_det_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_det_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_bug_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_bug", BUG_WRITES)


@pytest.mark.parametrize("name,q,exp", BUG_CASES, ids=[c[0] for c in BUG_CASES])
def test_bug_case(spark, sf_dir, p3_bug_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_bug_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_we_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_we", WE_WRITES)


@pytest.mark.parametrize("name,q,exp", WE_CASES, ids=[c[0] for c in WE_CASES])
def test_we_case(spark, sf_dir, p3_we_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_we_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_tf_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_tf", TF_WRITES)


@pytest.mark.parametrize("name,q,exp", TF_CASES, ids=[c[0] for c in TF_CASES])
def test_tf_case(spark, sf_dir, p3_tf_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_tf_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_asf_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_asf", ASF_WRITES)


@pytest.mark.parametrize("name,q,exp", ASF_CASES, ids=[c[0] for c in ASF_CASES])
def test_asf_case(spark, sf_dir, p3_asf_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_asf_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_oas_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_oas", OAS_WRITES)


@pytest.mark.parametrize("name,q,exp", OAS_CASES, ids=[c[0] for c in OAS_CASES])
def test_oas_case(spark, sf_dir, p3_oas_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_oas_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


@pytest.fixture(scope="module")
def p3_srt1_root(spark, tmp_path_factory):
    return _mkroot(spark, tmp_path_factory, "p3_srt1", SRT1_WRITES)


@pytest.mark.parametrize("name,q,exp", SRT1_CASES, ids=[c[0] for c in SRT1_CASES])
def test_srt1_case(spark, sf_dir, p3_srt1_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=p3_srt1_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


