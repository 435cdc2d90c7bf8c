"""Reference-suite parity, batch 8: pre-aggregation pushdown shapes,
hint queries over null columns, field-index GROUP BY, drop series,
out-of-order writes, write compatibility, and SHOW DATABASES.

Cases transcribed from /root/reference/tests/server_test.go
(TestServer_Query_PreAgg_{Filter,WithEmptyData,Min_Max_ExtremeValue,
OutOfOrderData,StringAux_WithNullValue}, TestServer_HintQuery_
{FilterNullColumn,ManyNullColumns}, TestServer_FieldIndex_Query,
TestServer_Query_OutOfOrder_Overlap_Column,
TestServer_Query_MultiMeasurementsInDifferentRp,
TestServer_Query_SelectRelativeTime1, TestServer_DropSeries,
TestServer_Write_OutOfOrder, TestServer_Write_Compatible,
TestServer_ShowDatabases_NoAuth). Go-skipped cases are omitted, and the
Write_Compatible "time tag" case's write is excluded from the batch
(the reference never lands it — its test case is skipped, so the
queried data must not contain it). MultiMeasurementsInDifferentRp's
first point is written WITHOUT a timestamp: the engine stamps it with
write-time now() (handler.go → models.ParsePoints default), which the
query's `time < 2024-12-31` bound excludes.
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

# --- TestServer_Query_PreAgg_Filter (server_test.go:7305) ---
Q_PA_F_WRITES = [
    'mst,country=China,city=Chengdu age=1 1625558240120000000',
    'mst,country=China,city=Chengdu age=2 1625558240130000000',
    'mst,country=China,city=Hangzhou age=3 1625558240120000000',
    'mst,country=China,city=Hangzhou age=4 1625558240130000000',
    'mst,country=China,city=Nanjing age=5 1625558240120000000',
    'mst,country=China,city=Nanjing age=6 1625558240130000000',
    'mst,country=China,city=Beijing age=7 1625558240120000000',
    'mst,country=China,city=Beijing age=8 1625558240130000000',
    'mst,country=China,city=Shanghai age=9 1625558240120000000',
    'mst,country=China,city=Shanghai age=10 1625558240130000000',
    'mst,country=China,city=Guangzhou age=11 1625558240120000000',
    'mst,country=China,city=Guangzhou age=12 1625558240130000000',
    'mst,country=China,city=Shenzheng age=13 1625558240120000000',
    'mst,country=China,city=Shenzheng age=14 1625558240130000000',
    'mst,country=China,city=Yantai age=15 1625558240120000000',
    'mst,country=China,city=Yantai age=16 1625558240130000000',
    'mst,country=China,city=Heilongjiang age=17 1625558240120000000',
    'mst,country=China,city=Heilongjiang age=18 1625558240130000000',
    'mst,country=China,city=Changsha age=19 1625558240119000000',
    'mst,country=China,city=Changsha age=20 1625558240130000000',
    'mst,country=China,city=Xizhang age=21 1625558240119000000',
    'mst,country=China,city=Xizhang age=22 1625558240130000000',
]

Q_PA_F_CASES = [
    (    # params: '"db": []string{"db0"'
        'max age group by *',
        'select max(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"city":"Beijing","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",7]]},{"name":"mst","tags":{"city":"Chengdu","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Guangzhou","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",11]]},{"name":"mst","tags":{"city":"Hangzhou","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",3]]},{"name":"mst","tags":{"city":"Heilongjiang","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",17]]},{"name":"mst","tags":{"city":"Nanjing","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",5]]},{"name":"mst","tags":{"city":"Shanghai","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",9]]},{"name":"mst","tags":{"city":"Shenzheng","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",13]]},{"name":"mst","tags":{"city":"Yantai","country":"China"},"columns":["time","max"],"values":[["2021-07-06T07:57:20.12Z",15]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'min age group by *',
        'select min(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"city":"Beijing","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",7]]},{"name":"mst","tags":{"city":"Chengdu","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Guangzhou","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",11]]},{"name":"mst","tags":{"city":"Hangzhou","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",3]]},{"name":"mst","tags":{"city":"Heilongjiang","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",17]]},{"name":"mst","tags":{"city":"Nanjing","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",5]]},{"name":"mst","tags":{"city":"Shanghai","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",9]]},{"name":"mst","tags":{"city":"Shenzheng","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",13]]},{"name":"mst","tags":{"city":"Yantai","country":"China"},"columns":["time","min"],"values":[["2021-07-06T07:57:20.12Z",15]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'first age group by *',
        'select first(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"city":"Beijing","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",7]]},{"name":"mst","tags":{"city":"Chengdu","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Guangzhou","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",11]]},{"name":"mst","tags":{"city":"Hangzhou","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",3]]},{"name":"mst","tags":{"city":"Heilongjiang","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",17]]},{"name":"mst","tags":{"city":"Nanjing","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",5]]},{"name":"mst","tags":{"city":"Shanghai","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",9]]},{"name":"mst","tags":{"city":"Shenzheng","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",13]]},{"name":"mst","tags":{"city":"Yantai","country":"China"},"columns":["time","first"],"values":[["2021-07-06T07:57:20.12Z",15]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'last age group by *',
        'select last(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"city":"Beijing","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",7]]},{"name":"mst","tags":{"city":"Chengdu","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Guangzhou","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",11]]},{"name":"mst","tags":{"city":"Hangzhou","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",3]]},{"name":"mst","tags":{"city":"Heilongjiang","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",17]]},{"name":"mst","tags":{"city":"Nanjing","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",5]]},{"name":"mst","tags":{"city":"Shanghai","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",9]]},{"name":"mst","tags":{"city":"Shenzheng","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",13]]},{"name":"mst","tags":{"city":"Yantai","country":"China"},"columns":["time","last"],"values":[["2021-07-06T07:57:20.12Z",15]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'count age group by *',
        'select count(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"city":"Beijing","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Chengdu","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Guangzhou","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Hangzhou","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Heilongjiang","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Nanjing","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Shanghai","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Shenzheng","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Yantai","country":"China"},"columns":["time","count"],"values":[["2021-07-06T07:57:20.12Z",1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'sum age group by *',
        'select sum(age) from mst where time >=1625558240120000000 and time < 1625558240130000000 group by *',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"city":"Beijing","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",7]]},{"name":"mst","tags":{"city":"Chengdu","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",1]]},{"name":"mst","tags":{"city":"Guangzhou","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",11]]},{"name":"mst","tags":{"city":"Hangzhou","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",3]]},{"name":"mst","tags":{"city":"Heilongjiang","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",17]]},{"name":"mst","tags":{"city":"Nanjing","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",5]]},{"name":"mst","tags":{"city":"Shanghai","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",9]]},{"name":"mst","tags":{"city":"Shenzheng","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",13]]},{"name":"mst","tags":{"city":"Yantai","country":"China"},"columns":["time","sum"],"values":[["2021-07-06T07:57:20.12Z",15]]}]}]}',
    ),
]
# --- TestServer_Query_PreAgg_WithEmptyData (server_test.go:7223) ---
Q_PA_WED_WRITES = [
    'mst,k=1 f1=1,f2=1,f3=1i,f4=true    1629129601000000000',
    'mst,k=1 f1=2                       1629129602000000000',
    'mst,k=1 f1=3                       1629129603000000000',
    'mst,k=1 f1=4,f2=4,f3=4i,f4=false   1629129604000000000',
]

Q_PA_WED_CASES = [
    (    # params: '"db": []string{"db0"'
        'max float',
        'select max(f2) from mst where time>=1629129602000000000 and time < 1629129603000000000',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'max int',
        'select max(f3) from mst where time>=1629129602000000000 and time < 1629129603000000000',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'max bool',
        'select max(f4) from mst where time>=1629129602000000000 and time < 1629129603000000000',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'min float',
        'select min(f2) from mst where time>=1629129602000000000 and time < 1629129603000000000',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'min int',
        'select min(f3) from mst where time>=1629129602000000000 and time < 1629129603000000000',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'min bool',
        'select min(f4) from mst where time>=1629129602000000000 and time < 1629129603000000000',
        '{"results":[{"statement_id":0}]}',
    ),
]
# --- TestServer_Query_PreAgg_Min_Max_ExtremeValue (server_test.go:13663) ---
Q_PA_M_M_EV_WRITES = [
    'm_DDB8BA70_20240820193222_jsli,thing_id=DDB8BA70_20240820193222-T01 /ProductModel#string="test_string01",/OverdriveState#integer=1024,/RotationsPerSecond#double=1.7976931348623157e+308 1724182346000000000',
    'm_DDB8BA70_20240820193222_jsli,thing_id=DDB8BA70_20240820193222-T01 /ProductModel#string="test_string02",/OverdriveState#integer=10240,/RotationsPerSecond#double=-1.7976931348623157e+308 1724182347000000000',
    'm_DDB8BA70_20240820193222_jsli,thing_id=DDB8BA70_20240820193222-T01 /ProductModel#string="test_string03",/OverdriveState#integer=102400,/RotationsPerSecond#double=1.7976931348623157e+308 1724182348000000000',
    'm_DDB8BA70_20240820193222_jsli,thing_id=DDB8BA70_20240820193222-T01 /ProductModel#string="test_string04",/OverdriveState#integer=9007199254740991,/RotationsPerSecond#double=1.7976931348623157e+308 1724183132000000000',
]

Q_PA_M_M_EV_CASES = [
    (    # params: '"db": []string{"db0"'
        'exact agg: min + max',
        'select /*+ Exact_Statistic_Query */ count("/ProductModel#string"),sum("/OverdriveState#integer"),max("/RotationsPerSecond#double"),min("/RotationsPerSecond#double"),mean("/RotationsPerSecond#double") from "m_DDB8BA70_20240820193222_jsli" where time >= \'2024-08-20T19:45:00.000Z\' and time < \'2024-08-20T20:00:00.000Z\'',
        '{"results":[{"statement_id":0,"series":[{"name":"m_DDB8BA70_20240820193222_jsli","columns":["time","count","sum","max","min","mean"],"values":[["2024-08-20T19:45:00Z",1,9007199254740991,1.7976931348623157e+308,1.7976931348623157e+308,1.7976931348623157e+308]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'pre agg: min + max',
        'select count("/ProductModel#string"),sum("/OverdriveState#integer"),max("/RotationsPerSecond#double"),min("/RotationsPerSecond#double"),mean("/RotationsPerSecond#double") from "m_DDB8BA70_20240820193222_jsli" where time >= \'2024-08-20T19:45:00.000Z\' and time < \'2024-08-20T20:00:00.000Z\'',
        '{"results":[{"statement_id":0,"series":[{"name":"m_DDB8BA70_20240820193222_jsli","columns":["time","count","sum","max","min","mean"],"values":[["2024-08-20T19:45:00Z",1,9007199254740991,1.7976931348623157e+308,1.7976931348623157e+308,1.7976931348623157e+308]]}]}]}',
    ),
]
# --- TestServer_Query_PreAgg_OutOfOrderData (server_test.go:7112) ---
Q_PA_OOOD_WRITES = [
    'cpu,host=serverA,region=uswest val=23.1,no=2i,alive=TRUE 1637931600000000000',
    'cpu,host=serverB,region=uswest val=23,no=3i,alive=FALSE 1637935200000000000',
    'cpu,host=serverB,region=uswest val=23,no=4i 1637845200000000000',
    'cpu,host=serverA,region=uswest val=23.4,no=5i,alive=FALSE 1637848800000000000',
    'cpu,host=serverA,region=uswest val=105,no=6i,alive=TRUE 1638003600000000000',
    'cpu,host=serverB,region=uswest val=200,no=7i,alive=FALSE 1637834400000000000',
    'cpu,host=serverA,region=uswest val=100,no=8i,alive=TRUE 1637917200000000000',
    'cpu,host=serverB,region=uswest val=200,no=9i,alive=TRUE 1637920800000000000',
]

Q_PA_OOOD_CASES = [
    (  
        'create database with shard group duration and index duration should succeed',
        'CREATE DATABASE db3 WITH SHARD DURATION 12h index duration 24h name rp3',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'select count(time) should success',
        'select count(time) from db3.rp3.cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","count"],"values":[["1970-01-01T00:00:00Z",8]]}]}]}',
    ),
    (  
        'select count(*)',
        'select count(*) from db3.rp3.cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","count_alive","count_no","count_val"],"values":[["1970-01-01T00:00:00Z",7,8,8]]}]}]}',
    ),
    (  
        'select min(val)',
        'select min(val) from db3.rp3.cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","min"],"values":[["2021-11-25T13:00:00Z",23]]}]}]}',
    ),
    (  
        'select min(val),host,region,aliv',
        'select min(val),host,region,alive from db3.rp3.cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","min","host","region","alive"],"values":[["2021-11-25T13:00:00Z",23,"serverB","uswest",null]]}]}]}',
    ),
    (  
        'select max(val)',
        'select max(val) from db3.rp3.cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","max"],"values":[["2021-11-25T10:00:00Z",200]]}]}]}',
    ),
    (  
        'select first(val)',
        'select first(val) from db3.rp3.cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","first"],"values":[["2021-11-25T10:00:00Z",200]]}]}]}',
    ),
    (  
        'select last(val)',
        'select last(val) from db3.rp3.cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","last"],"values":[["2021-11-27T09:00:00Z",105]]}]}]}',
    ),
    (  
        'select sum(val)',
        'select sum(val) from db3.rp3.cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","sum"],"values":[["1970-01-01T00:00:00Z",697.5]]}]}]}',
    ),
]
# --- TestServer_Query_PreAgg_StringAux_WithNullValue (server_test.go:6966) ---
Q_PA_SA_WNV_WRITES = [
    'mst,host=server19900,region=tagval2_19900,core_tag=spring core="field-*_values _1_19900",tx=19900i,yx=19900,rx=True 1648190516508400896',
    'mst,host=server19901,region=tagval2_19901,core_tag=summer core="field-*_values _1_19901",tx=19901i,yx=19901,rx=False 1648190516509400896',
    'mst,host=server19902,region=tagval2_19902 yx=19902,rx=True 1648190516510400896',
    'mst,host=server19903,region=tagval2_19903,core_tag=winter core="field-*_values _1_19903",tx=19903i,yx=19903,rx=False 1648190516511400896',
    'mst,host=server19904,region=tagval2_19904,core_tag=spring core="field-*_values _1_19904",tx=19904i,yx=19904,rx=True 1648190516512400896',
    'mst,host=server19905,region=tagval2_19905 yx=19905,rx=False 1648190516513400896',
    'mst,host=server19906,region=tagval2_19906,core_tag=autumn core="field-*_values _1_19906",tx=19906i,yx=19906,rx=True 1648190516514400896',
    'mst,host=server19907,region=tagval2_19907,core_tag=winter core="field-*_values _1_19907",tx=19907i,yx=19907,rx=False 1648190516515400896',
    'mst,host=server19908,region=tagval2_19908 yx=19908,rx=True 1648190516516400896',
    'mst,host=server19909,region=tagval2_19909,core_tag=summer core="field-*_values _1_19909",tx=19909i,yx=19909,rx=False 1648190516517400896',
    'mst,host=server19910,region=tagval2_19910,core_tag=autumn core="field-*_values _1_19910",tx=19910i,yx=19910,rx=True 1648190516518400896',
    'mst,host=server19911,region=tagval2_19911 yx=19911,rx=False 1648190516519400896',
    'mst,host=server19912,region=tagval2_19912,core_tag=spring core="field-*_values _1_19912",tx=19912i,yx=19912,rx=True 1648190516520400896',
    'mst,host=server19913,region=tagval2_19913,core_tag=summer core="field-*_values _1_19913",tx=19913i,yx=19913,rx=False 1648190516521400896',
    'mst,host=server19914,region=tagval2_19914 yx=19914,rx=True 1648190516522400896',
    'mst,host=server19915,region=tagval2_19915,core_tag=winter core="field-*_values _1_19915",tx=19915i,yx=19915,rx=False 1648190516523400896',
    'mst,host=server19916,region=tagval2_19916,core_tag=spring core="field-*_values _1_19916",tx=19916i,yx=19916,rx=True 1648190516524400896',
    'mst,host=server19917,region=tagval2_19917 yx=19917,rx=False 1648190516525400896',
    'mst,host=server19918,region=tagval2_19918,core_tag=autumn core="field-*_values _1_19918",tx=19918i,yx=19918,rx=True 1648190516526400896',
    'mst,host=server19919,region=tagval2_19919,core_tag=winter core="field-*_values _1_19919",tx=19919i,yx=19919,rx=False 1648190516527400896',
    'mst,host=server19920,region=tagval2_19920 yx=19920,rx=True 1648190516528400896',
    'mst,host=server19921,region=tagval2_19921,core_tag=summer core="field-*_values _1_19921",tx=19921i,yx=19921,rx=False 1648190516529400896',
    'mst,host=server19922,region=tagval2_19922,core_tag=autumn core="field-*_values _1_19922",tx=19922i,yx=19922,rx=True 1648190516530400896',
    'mst,host=server19923,region=tagval2_19923 yx=19923,rx=False 1648190516531400896',
    'mst,host=server19924,region=tagval2_19924,core_tag=spring core="field-*_values _1_19924",tx=19924i,yx=19924,rx=True 1648190516532400896',
    'mst,host=server19925,region=tagval2_19925,core_tag=summer core="field-*_values _1_19925",tx=19925i,yx=19925,rx=False 1648190516533400896',
    'mst,host=server19926,region=tagval2_19926 yx=19926,rx=True 1648190516534400896',
    'mst,host=server19927,region=tagval2_19927,core_tag=winter core="field-*_values _1_19927",tx=19927i,yx=19927,rx=False 1648190516535400896',
    'mst,host=server19928,region=tagval2_19928,core_tag=spring core="field-*_values _1_19928",tx=19928i,yx=19928,rx=True 1648190516536400896',
    'mst,host=server19929,region=tagval2_19929 yx=19929,rx=False 1648190516537400896',
    'mst,host=server19930,region=tagval2_19930,core_tag=autumn core="field-*_values _1_19930",tx=19930i,yx=19930,rx=True 1648190516538400896',
    'mst,host=server19931,region=tagval2_19931,core_tag=winter core="field-*_values _1_19931",tx=19931i,yx=19931,rx=False 1648190516539400896',
    'mst,host=server19932,region=tagval2_19932 yx=19932,rx=True 1648190516540400896',
    'mst,host=server19933,region=tagval2_19933,core_tag=summer core="field-*_values _1_19933",tx=19933i,yx=19933,rx=False 1648190516541400896',
    'mst,host=server19934,region=tagval2_19934,core_tag=autumn core="field-*_values _1_19934",tx=19934i,yx=19934,rx=True 1648190516542400896',
    'mst,host=server19935,region=tagval2_19935 yx=19935,rx=False 1648190516543400896',
    'mst,host=server19936,region=tagval2_19936,core_tag=spring core="field-*_values _1_19936",tx=19936i,yx=19936,rx=True 1648190516544400896',
    'mst,host=server19937,region=tagval2_19937,core_tag=summer core="field-*_values _1_19937",tx=19937i,yx=19937,rx=False 1648190516545400896',
    'mst,host=server19938,region=tagval2_19938 yx=19938,rx=True 1648190516546400896',
    'mst,host=server19939,region=tagval2_19939,core_tag=winter core="field-*_values _1_19939",tx=19939i,yx=19939,rx=False 1648190516547400896',
    'mst,host=server19940,region=tagval2_19940,core_tag=spring core="field-*_values _1_19940",tx=19940i,yx=19940,rx=True 1648190516548400896',
    'mst,host=server19941,region=tagval2_19941 yx=19941,rx=False 1648190516549400896',
    'mst,host=server19942,region=tagval2_19942,core_tag=autumn core="field-*_values _1_19942",tx=19942i,yx=19942,rx=True 1648190516550400896',
    'mst,host=server19943,region=tagval2_19943,core_tag=winter core="field-*_values _1_19943",tx=19943i,yx=19943,rx=False 1648190516551400896',
    'mst,host=server19944,region=tagval2_19944 yx=19944,rx=True 1648190516552400896',
    'mst,host=server19945,region=tagval2_19945,core_tag=summer core="field-*_values _1_19945",tx=19945i,yx=19945,rx=False 1648190516553400896',
    'mst,host=server19946,region=tagval2_19946,core_tag=autumn core="field-*_values _1_19946",tx=19946i,yx=19946,rx=True 1648190516554400896',
    'mst,host=server19947,region=tagval2_19947 yx=19947,rx=False 1648190516555400896',
    'mst,host=server19948,region=tagval2_19948,core_tag=spring core="field-*_values _1_19948",tx=19948i,yx=19948,rx=True 1648190516556400896',
    'mst,host=server19949,region=tagval2_19949,core_tag=summer core="field-*_values _1_19949",tx=19949i,yx=19949,rx=False 1648190516557400896',
    'mst,host=server19950,region=tagval2_19950 yx=19950,rx=True 1648190516558400896',
    'mst,host=server19951,region=tagval2_19951,core_tag=winter core="field-*_values _1_19951",tx=19951i,yx=19951,rx=False 1648190516559400896',
    'mst,host=server19952,region=tagval2_19952,core_tag=spring core="field-*_values _1_19952",tx=19952i,yx=19952,rx=True 1648190516560400896',
    'mst,host=server19953,region=tagval2_19953 yx=19953,rx=False 1648190516561400896',
    'mst,host=server19954,region=tagval2_19954,core_tag=autumn core="field-*_values _1_19954",tx=19954i,yx=19954,rx=True 1648190516562400896',
    'mst,host=server19955,region=tagval2_19955,core_tag=winter core="field-*_values _1_19955",tx=19955i,yx=19955,rx=False 1648190516563400896',
    'mst,host=server19956,region=tagval2_19956 yx=19956,rx=True 1648190516564400896',
    'mst,host=server19957,region=tagval2_19957,core_tag=summer core="field-*_values _1_19957",tx=19957i,yx=19957,rx=False 1648190516565400896',
    'mst,host=server19958,region=tagval2_19958,core_tag=autumn core="field-*_values _1_19958",tx=19958i,yx=19958,rx=True 1648190516566400896',
    'mst,host=server19959,region=tagval2_19959 yx=19959,rx=False 1648190516567400896',
    'mst,host=server19960,region=tagval2_19960,core_tag=spring core="field-*_values _1_19960",tx=19960i,yx=19960,rx=True 1648190516568400896',
    'mst,host=server19961,region=tagval2_19961,core_tag=summer core="field-*_values _1_19961",tx=19961i,yx=19961,rx=False 1648190516569400896',
    'mst,host=server19962,region=tagval2_19962 yx=19962,rx=True 1648190516570400896',
    'mst,host=server19963,region=tagval2_19963,core_tag=winter core="field-*_values _1_19963",tx=19963i,yx=19963,rx=False 1648190516571400896',
    'mst,host=server19964,region=tagval2_19964,core_tag=spring core="field-*_values _1_19964",tx=19964i,yx=19964,rx=True 1648190516572400896',
    'mst,host=server19965,region=tagval2_19965 yx=19965,rx=False 1648190516573400896',
    'mst,host=server19966,region=tagval2_19966,core_tag=autumn core="field-*_values _1_19966",tx=19966i,yx=19966,rx=True 1648190516574400896',
    'mst,host=server19967,region=tagval2_19967,core_tag=winter core="field-*_values _1_19967",tx=19967i,yx=19967,rx=False 1648190516575400896',
    'mst,host=server19968,region=tagval2_19968 yx=19968,rx=True 1648190516576400896',
    'mst,host=server19969,region=tagval2_19969,core_tag=summer core="field-*_values _1_19969",tx=19969i,yx=19969,rx=False 1648190516577400896',
    'mst,host=server19970,region=tagval2_19970,core_tag=autumn core="field-*_values _1_19970",tx=19970i,yx=19970,rx=True 1648190516578400896',
    'mst,host=server19971,region=tagval2_19971 yx=19971,rx=False 1648190516579400896',
    'mst,host=server19972,region=tagval2_19972,core_tag=spring core="field-*_values _1_19972",tx=19972i,yx=19972,rx=True 1648190516580400896',
    'mst,host=server19973,region=tagval2_19973,core_tag=summer core="field-*_values _1_19973",tx=19973i,yx=19973,rx=False 1648190516581400896',
    'mst,host=server19974,region=tagval2_19974 yx=19974,rx=True 1648190516582400896',
    'mst,host=server19975,region=tagval2_19975,core_tag=winter core="field-*_values _1_19975",tx=19975i,yx=19975,rx=False 1648190516583400896',
    'mst,host=server19976,region=tagval2_19976,core_tag=spring core="field-*_values _1_19976",tx=19976i,yx=19976,rx=True 1648190516584400896',
    'mst,host=server19977,region=tagval2_19977 yx=19977,rx=False 1648190516585400896',
    'mst,host=server19978,region=tagval2_19978,core_tag=autumn core="field-*_values _1_19978",tx=19978i,yx=19978,rx=True 1648190516586400896',
    'mst,host=server19979,region=tagval2_19979,core_tag=winter core="field-*_values _1_19979",tx=19979i,yx=19979,rx=False 1648190516587400896',
    'mst,host=server19980,region=tagval2_19980 yx=19980,rx=True 1648190516588400896',
    'mst,host=server19981,region=tagval2_19981,core_tag=summer core="field-*_values _1_19981",tx=19981i,yx=19981,rx=False 1648190516589400896',
    'mst,host=server19982,region=tagval2_19982,core_tag=autumn core="field-*_values _1_19982",tx=19982i,yx=19982,rx=True 1648190516590400896',
    'mst,host=server19983,region=tagval2_19983 yx=19983,rx=False 1648190516591400896',
    'mst,host=server19984,region=tagval2_19984,core_tag=spring core="field-*_values _1_19984",tx=19984i,yx=19984,rx=True 1648190516592400896',
    'mst,host=server19985,region=tagval2_19985,core_tag=summer core="field-*_values _1_19985",tx=19985i,yx=19985,rx=False 1648190516593400896',
    'mst,host=server19986,region=tagval2_19986 yx=19986,rx=True 1648190516594400896',
    'mst,host=server19987,region=tagval2_19987,core_tag=winter core="field-*_values _1_19987",tx=19987i,yx=19987,rx=False 1648190516595400896',
    'mst,host=server19988,region=tagval2_19988,core_tag=spring core="field-*_values _1_19988",tx=19988i,yx=19988,rx=True 1648190516596400896',
    'mst,host=server19989,region=tagval2_19989 yx=19989,rx=False 1648190516597400896',
    'mst,host=server19990,region=tagval2_19990,core_tag=autumn core="field-*_values _1_19990",tx=19990i,yx=19990,rx=True 1648190516598400896',
    'mst,host=server19991,region=tagval2_19991,core_tag=winter core="field-*_values _1_19991",tx=19991i,yx=19991,rx=False 1648190516599400896',
    'mst,host=server19992,region=tagval2_19992 yx=19992,rx=True 1648190516600400896',
    'mst,host=server19993,region=tagval2_19993,core_tag=summer core="field-*_values _1_19993",tx=19993i,yx=19993,rx=False 1648190516601400896',
    'mst,host=server19994,region=tagval2_19994,core_tag=autumn core="field-*_values _1_19994",tx=19994i,yx=19994,rx=True 1648190516602400896',
    'mst,host=server19995,region=tagval2_19995 yx=19995,rx=False 1648190516603400896',
    'mst,host=server19996,region=tagval2_19996,core_tag=spring core="field-*_values _1_19996",tx=19996i,yx=19996,rx=True 1648190516604400896',
    'mst,host=server19997,region=tagval2_19997,core_tag=summer core="field-*_values _1_19997",tx=19997i,yx=19997,rx=False 1648190516605400896',
    'mst,host=server19998,region=tagval2_19998 yx=19998,rx=True 1648190516606400896',
    'mst,host=server19999,region=tagval2_19999,core_tag=winter core="field-*_values _1_19999",tx=19999i,yx=19999,rx=False 1648190516607400896',
]

Q_PA_SA_WNV_CASES = [
    (    # params: '"db": []string{"db0"'
        'select max(yx),core,tx,rx from mst',
        'select max(yx),core,tx,rx from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","max","core","tx","rx"],"values":[["2022-03-25T06:41:56.607400896Z",19999,"field-*_values _1_19999",19999,false]]}]}]}',
    ),
]
# --- TestServer_HintQuery_FilterNullColumn (server_test.go:11429) ---
HQ_FNC_WRITES = [
    'mst,tk1=tv1 f1=0i 1610380800000000000',
    'mst,tk1=tv2 f1=1i    1610467200000000000',
    'mst,tk2=tv3 f2=false 1610553600000000000',
    'mst,tk2=tv4 f2=true  1610640000000000000',
]

HQ_FNC_CASES = [
    (    # params: '"db": []string{"db0"'
        'show series',
        'show series',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["mst,tk1=tv1"],["mst,tk1=tv2"],["mst,tk2=tv3"],["mst,tk2=tv4"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'single field with tag',
        'select /*+ Filter_Null_Column */ f1,*::tag from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","f1","tk1"],"values":[["2021-01-11T16:00:00Z",0,"tv1"],["2021-01-12T16:00:00Z",1,"tv2"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'single field group by tag',
        'select /*+ Filter_Null_Column */ f1,*::tag from mst group by *::tag',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"tk1":"tv1","tk2":""},"columns":["time","f1"],"values":[["2021-01-11T16:00:00Z",0]]},{"name":"mst","tags":{"tk1":"tv2","tk2":""},"columns":["time","f1"],"values":[["2021-01-12T16:00:00Z",1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'single field with tag',
        'select /*+ Filter_Null_Column */ f2,*::tag from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","f2","tk2"],"values":[["2021-01-13T16:00:00Z",false,"tv3"],["2021-01-14T16:00:00Z",true,"tv4"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'single field group tag',
        'select /*+ Filter_Null_Column */ f2,*::tag from mst group by *::tag',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"tk1":"","tk2":"tv3"},"columns":["time","f2"],"values":[["2021-01-13T16:00:00Z",false]]},{"name":"mst","tags":{"tk1":"","tk2":"tv4"},"columns":["time","f2"],"values":[["2021-01-14T16:00:00Z",true]]}]}]}',
    ),
]
# --- TestServer_HintQuery_ManyNullColumns (server_test.go:11494) ---
HQ_MNC_WRITES = [
    'mst,tk1=tv1 f1=0i 1610380800000000000',
    'mst,tk1=tv2 f1=1i    1610467200000000000',
    'mst,tk2=tv3 f2=2i 1610553600000000000',
    'mst,tk3=tv4 f3=true  1610640000000000000',
]

HQ_MNC_CASES = [
    (    # params: '"db": []string{"db0"'
        'show series',
        'show series',
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["mst,tk1=tv1"],["mst,tk1=tv2"],["mst,tk2=tv3"],["mst,tk3=tv4"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'single field f1 with tag',
        'select /*+ Filter_Null_Column */ f1,*::tag from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","f1","tk1"],"values":[["2021-01-11T16:00:00Z",0,"tv1"],["2021-01-12T16:00:00Z",1,"tv2"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'single field f1 group by tag',
        'select /*+ Filter_Null_Column */ f1,*::tag from mst group by *::tag',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"tk1":"tv1","tk2":"","tk3":""},"columns":["time","f1"],"values":[["2021-01-11T16:00:00Z",0]]},{"name":"mst","tags":{"tk1":"tv2","tk2":"","tk3":""},"columns":["time","f1"],"values":[["2021-01-12T16:00:00Z",1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'single field f2 with tag',
        'select /*+ Filter_Null_Column */ f2,*::tag from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","f2","tk2"],"values":[["2021-01-13T16:00:00Z",2,"tv3"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'single field f2 group tag',
        'select /*+ Filter_Null_Column */ f2,*::tag from mst group by *::tag',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","tags":{"tk1":"","tk2":"tv3","tk3":""},"columns":["time","f2"],"values":[["2021-01-13T16:00:00Z",2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'exact count query',
        'select /*+ Exact_Statistic_Query */ count(*) from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","count_f1","count_f2","count_f3"],"values":[["1970-01-01T00:00:00Z",2,1,1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'exact first query',
        'select /*+ Exact_Statistic_Query */ first(*) from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","first_f1","first_f2","first_f3"],"values":[["1970-01-01T00:00:00Z",0,2,true]]}]}]}',
    ),
]
# --- TestServer_FieldIndex_Query (server_test.go:13106) ---
FI_Q_WRITES = [
    'cpu,host=server01,region=uswest value=100,field_index="127.0.0.1" 1257894000000000000',
    'cpu,host=server02,region=uswest value=100,field_index="127.0.0.2" 1257894000000000000',
    'cpu,host=server03,region=uswest value=100,field_index="127.0.0.3" 1257894000000000000',
    'cpu,host=server04,region=uswest value=100,field_index="127.0.0.4" 1257894000000000000',
    'cpu,host=server05,region=uswest value=100,field_index="127.0.0.5" 1257894000000000000',
    'cpu,host=server06,region=uswest value=100,field_index="127.0.0.6" 1257894000000000000',
]

FI_Q_CASES = [
    (    # params: '"db": []string{"db0"'
        'create measurement cpu',
        'CREATE MEASUREMENT cpu with indextype "field" indexlist field_index',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show series exact cardinality',
        'SHOW SERIES EXACT CARDINALITY',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[6]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show series cardinality',
        'SHOW SERIES CARDINALITY',
        '{"results":[{"statement_id":0,"series":[{"columns":["startTime","endTime","count"],"values":[["2009-11-09T00:00:00Z","2009-11-16T00:00:00Z",6]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'select * from cpu group by field_index',
        'SELECT * FROM cpu GROUP BY field_index',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","tags":{"field_index":"127.0.0.1"},"columns":["time","field_index","host","region","value"],"values":[["2009-11-10T23:00:00Z","127.0.0.1","server01","uswest",100]]},{"name":"cpu","tags":{"field_index":"127.0.0.2"},"columns":["time","field_index","host","region","value"],"values":[["2009-11-10T23:00:00Z","127.0.0.2","server02","uswest",100]]},{"name":"cpu","tags":{"field_index":"127.0.0.3"},"columns":["time","field_index","host","region","value"],"values":[["2009-11-10T23:00:00Z","127.0.0.3","server03","uswest",100]]},{"name":"cpu","tags":{"field_index":"127.0.0.4"},"columns":["time","field_index","host","region","value"],"values":[["2009-11-10T23:00:00Z","127.0.0.4","server04","uswest",100]]},{"name":"cpu","tags":{"field_index":"127.0.0.5"},"columns":["time","field_index","host","region","value"],"values":[["2009-11-10T23:00:00Z","127.0.0.5","server05","uswest",100]]},{"name":"cpu","tags":{"field_index":"127.0.0.6"},"columns":["time","field_index","host","region","value"],"values":[["2009-11-10T23:00:00Z","127.0.0.6","server06","uswest",100]]}]}]}',
    ),
]
# --- TestServer_Query_OutOfOrder_Overlap_Column (server_test.go:6891) ---
Q_OOO_O_C_WRITES = [
    'mst,country=china,name=azhu no=1i,age=12.3,height=70i,address="shenzhen",alive=TRUE 1629129600000000000',
    'mst,country=american,name=alan no=2i,age=20.5,height=80i,address="shanghai",alive=FALSE 1629129601000000000',
    'mst,country=germany,name=alang no=3i,age=3.4,height=90i,address="beijin",alive=TRUE 1629129602000000000',
    'mst,country=japan,name=ahui no=4i,age=30,height=121i,address="guangzhou",alive=FALSE 1629129603000000000',
    'mst,country=canada,name=aqiu no=5i,age=35,height=138i,address="chengdu",alive=TRUE 1629129604000000000',
    'mst,country=china,name=agang no=6i,age=48.8,height=149i,address="wuhan" 1629129605000000000',
    'mst,country=american,name=agan no=7i,age=52.7,height=153i,alive=TRUE 1629129606000000000',
    'mst,country=germany,name=alin no=8i,age=28.3,address="anhui",alive=FALSE 1629129607000000000',
    'mst,country=japan,name=ali no=9i,height=179i,address="xian",alive=TRUE 1629129608000000000',
    'mst,country=canada no=10i,age=60.8,height=180i,address="hangzhou",alive=FALSE 1629129609000000000',
    'mst,name=ahuang no=11i,age=102,height=191i,address="nanjin",alive=TRUE 1629129610000000000',
    'mst,country=china,name=ayin no=12i,height=203i,address="zhengzhou",alive=FALSE 1629129611000000000',
    'mst,country=china,name=ayin no=12i,age=1,height=20i,address="zhengzhou",alive=FALSE 1629129600000000000',
]

Q_OOO_O_C_CASES = [
    (    # params: '"db": []string{"db0"'
        'select last(height),age from mst',
        'select last(height),age from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","last","age"],"values":[["2021-08-16T16:00:11Z",203,null]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'select max(height),age from mst',
        'select max(height),age from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","max","age"],"values":[["2021-08-16T16:00:11Z",203,null]]}]}]}',
    ),
]
# --- TestServer_Query_MultiMeasurementsInDifferentRp (server_test.go:14269) ---
Q_MMIDR_WRITES = [
    'cpu0,host=server01 usage=10',
    'cpu0,host=server02 usage=20 1735660700000000000',
]

Q_MMIDR_CASES = [
    (    # params: '"db": []string{"db0"'
        'select * from rp0.cpu0,rp1.cpu0',
        "select * from rp0.cpu0,rp1.cpu0 where time < '2024-12-31T15:58:21Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu0","columns":["time","host","usage"],"values":[["2024-12-31T15:58:20Z","server02",20]]}]}]}',
    ),
]
# --- TestServer_Query_SelectRelativeTime1 (server_test.go:11092) ---
Q_SRT1_WRITES = [
    'cpu,region=region_0,az=az_0 v1=0i,v2=0.000000,v3=true 1610380800000000000',
    'cpu,region=region_0,az=az_0 v1=1i,v2=1.000000,v3=false 1610467200000000000',
    'cpu,region=region_0,az=az_0 v1=2i,v2=2.000000,v3=true 1610553600000000000',
    'cpu,region=region_0,az=az_0 v1=3i,v2=3.000000,v3=false 1610640000000000000',
]

Q_SRT1_CASES = [
    (  
        'single point with time pre-calculated for past time queries yesterday',
        "select v3 from db0.rp0.cpu where time>='2021-01-12T16:00:00Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","v3"],"values":[["2021-01-12T16:00:00Z",false],["2021-01-13T16:00:00Z",true],["2021-01-14T16:00:00Z",false]]}]}]}',
    ),
]
# --- TestServer_DropSeries (server_test.go:9340) ---
DS_WRITES = [
    'cpu,host=server03 field1=100 1257894000000000000',
    'cpu,host=server01,region=uswest field1=200,field2=300,field3=400 1257894000000000000',
    'cpu,host=server01,region=useast field1=200,field2=300,field3=400 1257894000000000000',
    'cpu,host=server02,region=useast field1=200,field2=300,field3=400 1257894000000000000',
    'cpu,host=server02,region=uswest value=100 1257894000000000000',
    'cpu,host=server02,region=useast value=100 1257894000000000000',
]

DS_CASES = [
    (    # params: '"db": []string{"db0"'
        'before drop execute select * from cpu',
        'select * from cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","field1","field2","field3","host","region","value"],"values":[["2009-11-10T23:00:00Z",null,null,null,"server02","uswest",100],["2009-11-10T23:00:00Z",100,null,null,"server03",null,null],["2009-11-10T23:00:00Z",200,300,400,"server01","useast",null],["2009-11-10T23:00:00Z",200,300,400,"server01","uswest",null],["2009-11-10T23:00:00Z",200,300,400,"server02","useast",100]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        "drop series from cpu where host='server02'",
        "drop series from cpu where host='server02'",
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'after drop execute select * from cpu',
        'select * from cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","field1","field2","field3","host","region","value"],"values":[["2009-11-10T23:00:00Z",100,null,null,"server03",null,null],["2009-11-10T23:00:00Z",200,300,400,"server01","useast",null],["2009-11-10T23:00:00Z",200,300,400,"server01","uswest",null]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        "after drop execute select * from cpu where host='server02'",
        "select * from cpu where host='server02'",
        '{"results":[{"statement_id":0}]}',
    ),
]
# --- TestServer_Write_OutOfOrder (server_test.go:11132) ---
W_OOO_WRITES = [
    'cpu,host=serverA,region=uswest val=23.1 1637931600000000000',
    'cpu,host=serverB,region=uswest val=23.2 1637935200000000000',
    'cpu,host=serverB,region=uswest val=23.3 1637845200000000000',
    'cpu,host=serverA,region=uswest val=23.4 1637848800000000000',
    'cpu,host=serverA,region=uswest val=105 1638003600000000000',
    'cpu,host=serverB,region=uswest val=106 1638007200000000000',
    'cpu,host=serverA,region=uswest val=100 1637917200000000000',
    'cpu,host=serverB,region=uswest val=200 1637920800000000000',
]

W_OOO_CASES = [
    (  
        'create database with shard group duration and index duration should succeed',
        'CREATE DATABASE db4 WITH SHARD DURATION 12h index duration 24h name rp3',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'select val from in date 2021-11-26 should success',
        'select val from db4.rp3.cpu where time>=\'2021-11-26T00:00:00Z\' and time<=\'2021-11-26T23:00:00Z\' and "host"=\'serverB\'',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","val"],"values":[["2021-11-26T10:00:00Z",200],["2021-11-26T14:00:00Z",23.2]]}]}]}',
    ),
    (  
        'select val from in date 2021-11-27 should success',
        'select val from db4.rp3.cpu where time>=\'2021-11-27T00:00:00Z\' and time<=\'2021-11-27T23:00:00Z\' and "host"=\'serverB\'',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","val"],"values":[["2021-11-27T10:00:00Z",106]]}]}]}',
    ),
    (  
        'select val from 25 to 26 should success',
        'select val from db4.rp3.cpu where time>=\'2021-11-25T00:00:00Z\' and time<=\'2021-11-26T23:00:00Z\' and "host"=\'serverB\'',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["time","val"],"values":[["2021-11-25T13:00:00Z",23.3],["2021-11-26T10:00:00Z",200],["2021-11-26T14:00:00Z",23.2]]}]}]}',
    ),
]
# --- TestServer_Write_Compatible (server_test.go:12605) ---
W_C_WRITES = [
    'mst,tk1=tv1 f1=0,f1=2 1654898400000000000',
    'mst,tk1=tv1 f1=3,time=1,f2=2,time=2 1654898460000000000',
    'mst,tk1=tv1 f1=4,f1="foo" 1654898520000000000',
    'mst,tk1=tv1 f1="bar",f1=5 1654898580000000000',
    'mst,tk1=tv1,tk1=tv2 f1=6 1654898700000000000',
    'mst,tk3=tv4 f3=99 1654902000000000000',
]

W_C_CASES = [
    (    # params: '"db": []string{"db0"'
        'select count(*) from mst',
        'select count(*) from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","count_f1","count_f2","count_f3"],"values":[["1970-01-01T00:00:00Z",2,1,1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'select * from mst',
        'select * from mst',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","f1","f2","f3","tk1","tk3"],"values":[["2022-06-10T22:00:00Z",2,null,null,"tv1",null],["2022-06-10T22:01:00Z",3,2,null,"tv1",null],["2022-06-10T23:00:00Z",null,null,99,null,"tv4"]]}]}]}',
    ),
]
# --- TestServer_ShowDatabases_NoAuth (server_test.go:389) ---
SD_NA_WRITES = [
]

SD_NA_CASES = [
    (  
        'create db1',
        'CREATE DATABASE db1',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'create db2',
        'CREATE DATABASE db2',
        '{"results":[{"statement_id":0}]}',
    ),
    (  
        'show dbs',
        'SHOW DATABASES',
        '{"results":[{"statement_id":0,"series":[{"name":"databases","columns":["name"],"values":[["db1"],["db2"]]}]}]}',
    ),
]

def _mkroot(spark, tmp_path_factory, name, writes):
    root = str(tmp_path_factory.mktemp(name))
    if writes:
        handle_write(spark, writes, root)
    return root


SUITES = [
    ("paf", "Q_PA_F_WRITES", "Q_PA_F_CASES"),
    ("pawed", "Q_PA_WED_WRITES", "Q_PA_WED_CASES"),
    ("paev", "Q_PA_M_M_EV_WRITES", "Q_PA_M_M_EV_CASES"),
    ("paooo", "Q_PA_OOOD_WRITES", "Q_PA_OOOD_CASES"),
    ("pasa", "Q_PA_SA_WNV_WRITES", "Q_PA_SA_WNV_CASES"),
    ("hqfnc", "HQ_FNC_WRITES", "HQ_FNC_CASES"),
    ("hqmnc", "HQ_MNC_WRITES", "HQ_MNC_CASES"),
    ("fiq", "FI_Q_WRITES", "FI_Q_CASES"),
    ("oooc", "Q_OOO_O_C_WRITES", "Q_OOO_O_C_CASES"),
    ("mmidr", "Q_MMIDR_WRITES", "Q_MMIDR_CASES"),
    ("srt1", "Q_SRT1_WRITES", "Q_SRT1_CASES"),
    ("ds", "DS_WRITES", "DS_CASES"),
    ("wooo", "W_OOO_WRITES", "W_OOO_CASES"),
    ("wc", "W_C_WRITES", "W_C_CASES"),
]

_g = globals()


def _suite_params():
    out = []
    for tag, _w, c in SUITES:
        for case in _g[c]:
            out.append(pytest.param(tag, *case, id=f"{tag}:{case[0]}"))
    return out


@pytest.fixture(scope="module")
def p8_roots(spark, tmp_path_factory):
    return {
        tag: _mkroot(spark, tmp_path_factory, f"p8_{tag}", _g[w])
        for tag, w, _c in SUITES
    }


@pytest.fixture(scope="module")
def p8_ddl(spark, tmp_path_factory):
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    ddl = DDLExecutor(
        spark, MetaStore(str(tmp_path_factory.mktemp("p8_meta")))
    )
    ddl.execute("CREATE DATABASE db0")
    ddl.execute(
        "CREATE RETENTION POLICY rp0 ON db0 DURATION 0s REPLICATION 1 DEFAULT"
    )
    return ddl


@pytest.mark.parametrize("tag,name,q,exp", _suite_params())
def test_parity8_case(spark, sf_dir, p8_roots, p8_ddl, tag, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None,
                       data_root=p8_roots[tag], ddl=p8_ddl,
                       now_ns=1893459723000000000)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# SHOW DATABASES runs against a FRESH metastore — the reference suite
# opens its own server with no pre-created db0 (ShowDatabases_NoAuth)
@pytest.mark.parametrize("name,q,exp", SD_NA_CASES,
                         ids=[c[0] for c in SD_NA_CASES])
def test_parity8_showdbs(spark, sf_dir, tmp_path_factory, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None,
                       data_root=None, ddl=_sdna_ddl(spark,
                                                     tmp_path_factory))
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


_SDNA = {}


def _sdna_ddl(spark, tmp_path_factory):
    if "ddl" not in _SDNA:
        from opengemini_spark.ddl import DDLExecutor, MetaStore

        _SDNA["ddl"] = DDLExecutor(
            spark, MetaStore(str(tmp_path_factory.mktemp("p8_sdna")))
        )
    return _SDNA["ddl"]


# --- TestServer_SubscriptionCommands (server_test.go) ---
# httptest server URLs pinned to fixed values
SUB_CASES = [
    ("CREATE SUBSCRIPTION",
     'create subscription subs0 on db0.rp0 destinations all '
     '"http://127.0.0.1:19001", "http://127.0.0.1:19002"',
     '{"results":[{"statement_id":0}]}'),
    ("SHOW SUBSCRIPTIONS",
     "SHOW SUBSCRIPTIONS",
     '{"results":[{"statement_id":0,"series":[{"name":"db0","columns":'
     '["retention_policy","name","mode","destinations"],"values":'
     '[["rp0","subs0","ALL",["http://127.0.0.1:19001",'
     '"http://127.0.0.1:19002"]]]}]}]}'),
    ("DROP SUBSCRIPTION subs0",
     "drop subscription subs0 on db0.rp0",
     '{"results":[{"statement_id":0}]}'),
    ("SHOW SUBSCRIPTIONS AFTER DROP",
     "SHOW SUBSCRIPTIONS",
     '{"results":[{"statement_id":0}]}'),
    ("RECREATE SUBSCRIPTION AFTER DROP",
     'create subscription subs0 on db0.rp0 destinations all '
     '"http://127.0.0.1:19001", "http://127.0.0.1:19002"',
     '{"results":[{"statement_id":0}]}'),
    ("SHOW SUBSCRIPTIONS 2",
     "SHOW SUBSCRIPTIONS",
     '{"results":[{"statement_id":0,"series":[{"name":"db0","columns":'
     '["retention_policy","name","mode","destinations"],"values":'
     '[["rp0","subs0","ALL",["http://127.0.0.1:19001",'
     '"http://127.0.0.1:19002"]]]}]}]}'),
    ("DROP ALL SUBSCRIPTIONS ON db0",
     "DROP ALL SUBSCRIPTIONS ON db0",
     '{"results":[{"statement_id":0}]}'),
    ("SHOW SUBSCRIPTIONS AFTER DROP ALL",
     "SHOW SUBSCRIPTIONS",
     '{"results":[{"statement_id":0}]}'),
    ("CREATE SUBSCRIPTION WITH INVALID URL",
     'create subscription subs0 on db0.rp0 destinations all '
     '"127.0.0.3:8086"',
     '{"results":[{"statement_id":0,"error":"invalid url 127.0.0.3:8086"}]}'),
]


@pytest.mark.parametrize("name,q,exp", SUB_CASES,
                         ids=[c[0] for c in SUB_CASES])
def test_parity8_subscriptions(spark, sf_dir, p8_roots, p8_ddl, name, q,
                               exp):
    got = handle_query(spark, sf_dir, q, epoch=None,
                       data_root=p8_roots["wc"], ddl=p8_ddl)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"


# --- TestServer_ShowDatabases_WithAuth (server_test.go:~410) ---
# auth-enabled server, NO password policy (c := NewConfig();
# AuthEnabled = true): SHOW DATABASES lists only the requesting user's
# readable/writable databases; the admin sees all.
def test_parity8_showdbs_with_auth(spark, sf_dir, tmp_path_factory):
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    ddl = DDLExecutor(
        spark, MetaStore(str(tmp_path_factory.mktemp("p8_auth"))),
        password_policy=False, auth_enabled=True,
    )

    def q(text, user=None):
        ddl.current_user = user
        try:
            return handle_query(spark, sf_dir, text, epoch=None,
                                data_root=None, ddl=ddl)
        finally:
            ddl.current_user = None

    assert q("CREATE USER admin WITH PASSWORD 'admin' WITH ALL PRIVILEGES"
             ) == {"results": [{"statement_id": 0}]}
    assert q("CREATE DATABASE dbR; CREATE DATABASE dbW") == {
        "results": [{"statement_id": 0}, {"statement_id": 1}]}
    assert q("SHOW DATABASES", user="admin") == json.loads(
        '{"results":[{"statement_id":0,"series":[{"name":"databases",'
        '"columns":["name"],"values":[["dbR"],["dbW"]]}]}]}')
    assert q('CREATE USER reader WITH PASSWORD \'r\'; '
             'GRANT READ ON "dbR" TO "reader"; '
             'CREATE USER writer WITH PASSWORD \'w\'; '
             'GRANT WRITE ON "dbW" TO "writer"; '
             "CREATE USER nobody WITH PASSWORD 'n'") == {
        "results": [{"statement_id": i} for i in range(5)]}
    assert q("SHOW DATABASES", user="reader") == json.loads(
        '{"results":[{"statement_id":0,"series":[{"name":"databases",'
        '"columns":["name"],"values":[["dbR"]]}]}]}')
    assert q("SHOW DATABASES", user="writer") == json.loads(
        '{"results":[{"statement_id":0,"series":[{"name":"databases",'
        '"columns":["name"],"values":[["dbW"]]}]}]}')
    assert q("SHOW DATABASES", user="nobody") == json.loads(
        '{"results":[{"statement_id":0,"series":[{"name":"databases",'
        '"columns":["name"]}]}]}')


# --- drop_and_recreate_series_retest (server_suite.go) ---
def test_parity8_recreate_series_retest(spark, sf_dir, tmp_path_factory,
                                        p8_ddl):
    root = str(tmp_path_factory.mktemp("p8_retest"))
    handle_write(spark,
                 ['cpu,host=serverA,region=uswest val=23.2 '
                  '946684800000000000'], root)
    got = handle_query(spark, sf_dir, "SHOW SERIES", epoch=None,
                       data_root=root, ddl=p8_ddl)
    assert got == json.loads(
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],'
        '"values":[["cpu,host=serverA,region=uswest"]]}]}]}')


# --- TestServer_DropMeasurementPerRP (server_test.go) ---
# two writes of the SAME measurement into different retention policies;
# DROP MEASUREMENT cpu0 removes only the default rp0's copy, the
# rp-qualified form removes rp1's.
def test_parity8_drop_measurement_per_rp(spark, sf_dir, tmp_path_factory):
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    ddl = DDLExecutor(
        spark, MetaStore(str(tmp_path_factory.mktemp("p8_perrp_meta"))))
    ddl.execute("CREATE DATABASE db0")
    ddl.execute(
        "CREATE RETENTION POLICY rp0 ON db0 DURATION 0s REPLICATION 1 "
        "DEFAULT")
    ddl.execute("CREATE RETENTION POLICY rp1 ON db0 DURATION 0s "
                "REPLICATION 1")
    root = str(tmp_path_factory.mktemp("p8_perrp"))
    handle_write(spark, ["cpu0,host=server01 usage=10"], root, rp="rp0")
    handle_write(spark, ["cpu0,host=server02 usage=20"], root, rp="rp1")

    def q(text):
        return handle_query(spark, sf_dir, text, epoch=None,
                            data_root=root, ddl=ddl)

    assert q("DROP MEASUREMENT cpu0") == {"results": [{"statement_id": 0}]}
    assert q("SELECT * FROM rp0.cpu0") == {"results": [
        {"statement_id": 0, "error": "measurement not found"}]}
    assert q("DROP MEASUREMENT rp1.cpu0") == {
        "results": [{"statement_id": 0}]}
    assert q("SELECT * FROM rp1.cpu0") == {"results": [
        {"statement_id": 0, "error": "measurement not found"}]}


# --- TestServer_Write_LineProtocol_{Float,Integer,Bool,Partial} ---
_LP_TS = 1257894000000000000  # 2009-11-10T23:00:00Z


@pytest.mark.parametrize("line,want_val", [
    ("cpu,host=server01 value=1.0", 1),
    ("cpu,host=server01 value=100i", 100),
    ("cpu,host=server01 value=true", True),
], ids=["float", "integer", "bool"])
def test_parity8_write_lp_typed(spark, sf_dir, tmp_path_factory, p8_ddl,
                                line, want_val):
    root = str(tmp_path_factory.mktemp("p8_lp"))
    handle_write(spark, [f"{line} {_LP_TS}"], root)
    got = handle_query(spark, sf_dir,
                       "SELECT * FROM db0.rp0.cpu GROUP BY *",
                       epoch=None, data_root=root, ddl=p8_ddl)
    assert got == {"results": [{"statement_id": 0, "series": [
        {"name": "cpu", "tags": {"host": "server01"},
         "columns": ["time", "value"],
         "values": [["2009-11-10T23:00:00Z", want_val]]}]}]}


def test_parity8_write_lp_partial_nan(spark, sf_dir, tmp_path_factory,
                                      p8_ddl):
    """A NaN field value rejects the ENTIRE write request — nothing from
    the batch lands (Write_LineProtocol_Partial)."""
    root = str(tmp_path_factory.mktemp("p8_lp_nan"))
    points = [
        f"cpu,host=server01 value=100 {_LP_TS}",
        f"cpu,host=server01 value=NaN {_LP_TS}",
        f"cpu,host=server01 value=NaN {_LP_TS}",
    ]
    with pytest.raises(ValueError, match="invalid field value"):
        handle_write(spark, points, root)
    got = handle_query(spark, sf_dir,
                       "SELECT * FROM db0.rp0.cpu GROUP BY *",
                       epoch=None, data_root=root, ddl=p8_ddl)
    assert got == {"results": [
        {"statement_id": 0, "error": "measurement not found"}]}


# --- TestServer_SubscriptionForward (server_test.go) ---
def test_parity8_subscription_forward(spark, sf_dir, tmp_path_factory):
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    ddl = DDLExecutor(
        spark, MetaStore(str(tmp_path_factory.mktemp("p8_fwd_meta"))))
    ddl.execute("CREATE DATABASE db0")
    ddl.execute("CREATE RETENTION POLICY rp0 ON db0 DURATION 0s "
                "REPLICATION 1 DEFAULT")
    requests: list[tuple[str, str, str, str]] = []
    ddl.subscription_post = (
        lambda url, db, rp, body: requests.append((url, db, rp, body)))
    root = str(tmp_path_factory.mktemp("p8_fwd"))
    writes = [
        "cpu,host=server1 value=1 946857601000000000",
        "cpu,host=server1 value=2 946857602000000000",
        "cpu,host=server1 value=3 946857603000000000",
    ]
    ddl.execute('create subscription subs0 on db0.rp0 destinations all '
                '"http://127.0.0.1:19001", "http://127.0.0.1:19002"')
    for _ in range(5):
        handle_write(spark, writes, root, ddl=ddl, db="db0", rp="rp0")
    # ALL mode: every write goes to BOTH destinations
    assert len(requests) == 10
    assert all(r[1] == "db0" and r[2] == "rp0"
               and r[3] == "\n".join(writes) for r in requests)
    assert {r[0] for r in requests} == {
        "http://127.0.0.1:19001", "http://127.0.0.1:19002"}

    ddl.execute("drop subscription subs0 on db0.rp0")
    ddl.execute('create subscription subs0 on db0.rp0 destinations any '
                '"http://127.0.0.1:19001", "http://127.0.0.1:19002"')
    requests.clear()
    for _ in range(5):
        handle_write(spark, writes, root, ddl=ddl, db="db0", rp="rp0")
    # ANY mode: exactly one destination per write, rotating
    assert len(requests) == 5


# --- TestServer_Query_With_All_ShardKey (server_test.go) ---
def test_parity8_all_shardkey(spark, sf_dir, tmp_path_factory):
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    ddl = DDLExecutor(
        spark, MetaStore(str(tmp_path_factory.mktemp("p8_sk_meta"))))
    ddl.execute("CREATE DATABASE db0 WITH SHARDKEY tag1,tag2")
    root = str(tmp_path_factory.mktemp("p8_sk"))
    handle_write(spark, [f"cpu,tag1=tv1,tag2=tv2 value=1.0 {_LP_TS}"],
                 root)
    got = handle_query(
        spark, sf_dir,
        "SELECT * FROM db0.autogen.cpu where tag1='tv1' AND tag2='tv2'",
        epoch=None, data_root=root, ddl=ddl)
    assert got == {"results": [{"statement_id": 0, "series": [
        {"name": "cpu", "columns": ["time", "tag1", "tag2", "value"],
         "values": [["2009-11-10T23:00:00Z", "tv1", "tv2", 1]]}]}]}
