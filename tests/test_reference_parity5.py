"""Reference-suite parity, batch 5: the SHOW metadata family.

Cases transcribed from /root/reference/tests/server_test.go
(TestServer_Query_ShowSeries:9177, _ShowTagKeys:9410,
_ShowTagKeysWithCondition:9262, _ShowTagValues:9532,
_ShowTagValues_Disorder:9771, _ShowTagKeyCardinality:10022,
_ShowMeasurementExactCardinality:8989, _ShowFieldKeys:10230,
_ShowFieldKeyCardinality:10298). Go-skipped cases are omitted.

The wire semantics under test: per-measurement (key,value) blocks,
WITH KEY = / =~ / IN forms, tag-filter WHERE (regex and equality),
time-bounded WHERE index-order slices (Disorder limit/offset quirk),
[EXACT] CARDINALITY rows, per-shard-group SHOW SERIES CARDINALITY,
and exact_statistic_query hints.
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

# --- TestServer_Query_ShowSeries (server_test.go:9177) ---
Q_SS_WRITES = [
    'cpu,host=server01 value=100 1257894000000000000',
    'cpu,host=server01,region=uswest value=100 1257894000000000000',
    'cpu,host=server01,region=useast value=100 1257894000000000000',
    'cpu,host=server02 value=100 1257894000000000000',
    'cpu,host=server02,region=uswest value=100 1257894000000000000',
    'cpu,host=server02,region=useast value=100 1257894000000000000',
]

Q_SS_CASES = [
    (    # params: '"db": []string{"db0"'
        'create measurement cpu',
        'CREATE MEASUREMENT cpu',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'drop measurement cpu',
        'DROP MEASUREMENT cpu',
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
        'show /hint/ series on db0 from cpu',
        "SHOW /*+ exact_statistic_query */ SERIES ON db0 FROM cpu where time = '2009-11-10T23:00:00Z'",
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["cpu,host=server01"],["cpu,host=server01,region=useast"],["cpu,host=server01,region=uswest"],["cpu,host=server02"],["cpu,host=server02,region=useast"],["cpu,host=server02,region=uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show /hint/ series from cpu',
        "SHOW /*+ exact_statistic_query */ SERIES FROM cpu where time = '2009-11-10T23:00:00Z'",
        '{"results":[{"statement_id":0,"series":[{"columns":["key"],"values":[["cpu,host=server01"],["cpu,host=server01,region=useast"],["cpu,host=server01,region=uswest"],["cpu,host=server02"],["cpu,host=server02,region=useast"],["cpu,host=server02,region=uswest"]]}]}]}',
    ),
]

# --- TestServer_Query_ShowTagKeys (server_test.go:9410) ---
Q_STK_WRITES = [
    'cpu,host=server01 value=100 1257894000000000000',
    'cpu,host=server01,region=uswest value=100 1257894000000000000',
    'cpu,host=server01,region=useast value=100 1257894000000000000',
    'cpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server03,region=caeast value=100 1257894000000000000',
    'disk,host=server03,region=caeast value=100 1257894000000000000',
]

Q_STK_CASES = [
    (    # params: '"db": []string{"db0"'
        'show tag keys',
        'SHOW TAG KEYS',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"disk","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"gpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (  
        'show tag keys on db0',
        'SHOW TAG KEYS ON db0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"disk","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"gpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag keys from',
        'SHOW TAG KEYS FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag keys from regex',
        'SHOW TAG KEYS FROM /[cg]pu/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"gpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag keys measurement not found',
        'SHOW TAG KEYS FROM doesntexist',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag keys with time',
        'SHOW TAG KEYS WHERE time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"disk","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"gpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (    # go-skip
        'show tag keys on db0 with time',
        'SHOW TAG KEYS ON db0 WHERE time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"disk","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"gpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag keys with time from',
        'SHOW TAG KEYS FROM cpu WHERE time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag keys with time from regex',
        'SHOW TAG KEYS FROM /[cg]pu/ WHERE time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"gpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag keys with time where',
        "SHOW TAG KEYS WHERE host = 'server03' AND time > 0",
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["tagKey"],"values":[["host"],["region"]]},{"name":"gpu","columns":["tagKey"],"values":[["host"],["region"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag keys with time measurement not found',
        'SHOW TAG KEYS FROM doesntexist WHERE time > 0',
        '{"results":[{"statement_id":0}]}',
    ),
]

# --- TestServer_Query_ShowTagKeysWithCondition (server_test.go:9262) ---
Q_STKWC_WRITES = [
    'mst,region=bj4,cluster=gemini,server=hostA cpu=10 1257894000000000000',
    'mst,region=bj4,label=test cpu=20 1257894000000000000',
    'mst,region=bj5,others=good cpu=30 1257894000000000000',
    'mst2,region=bj4,others=good cpu=30 1257894000000000000',
]

Q_STKWC_CASES = [
    (    # params: '"db": []string{"db0"'
        'show tag keys from mst and condition',
        'SHOW TAG KEYS FROM mst WHERE region=bj4',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["tagKey"],"values":[["cluster"],["label"],["region"],["server"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag keys with condition and special mst',
        'SHOW TAG KEYS FROM mst WHERE region=bj4 and time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["tagKey"],"values":[["cluster"],["label"],["region"],["server"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag keys with time condition',
        'SHOW TAG KEYS FROM mst WHERE time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["tagKey"],"values":[["cluster"],["label"],["others"],["region"],["server"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag keys with time condition and limit',
        'SHOW TAG KEYS FROM mst WHERE time > 0 limit 1',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["tagKey"],"values":[["cluster"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag keys with time condition and limit and offset',
        'SHOW TAG KEYS FROM mst WHERE time > 0 limit 1 offset 1',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["tagKey"],"values":[["label"]]}]}]}',
    ),
]

# --- TestServer_Query_ShowTagValues (server_test.go:9532) ---
Q_STV_WRITES = [
    'cpu,host=server01 value=100 1257894000000000000',
    'cpu,host=server01,region=uswest value=100 1257894000000000000',
    'cpu,host=server01,region=useast value=100 1257894000000000000',
    'cpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server03,region=caeast value=100 1257894000000000000',
    'disk,host=server03,region=caeast value=100 1257894000000000000',
]

Q_STV_CASES = [
    (    # params: '"db": []string{"db0"'
        'show tag values with key',
        'SHOW TAG VALUES WITH KEY = host order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key regex',
        'SHOW TAG VALUES WITH KEY =~ /ho/ order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key and where',
        "SHOW TAG VALUES FROM cpu WITH KEY = host WHERE region = 'uswest' order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key regex and where',
        "SHOW TAG VALUES FROM cpu WITH KEY =~ /ho/ WHERE region = 'uswest' order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key and where matches the regular expression',
        'SHOW TAG VALUES WITH KEY = host WHERE region =~ /ca.*/ order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key and where does not match the regular expression',
        'SHOW TAG VALUES WITH KEY = region WHERE host !~ /server0[12]/ order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["region","caeast"]]},{"name":"gpu","columns":["key","value"],"values":[["region","caeast"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where partially matches the regular expression',
        'SHOW TAG VALUES WITH KEY = host WHERE region =~ /us/ order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where partially does not match the regular expression',
        'SHOW TAG VALUES WITH KEY = host WHERE region !~ /us/ order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key in and where does not match the regular expression',
        "SHOW TAG VALUES FROM cpu WITH KEY IN (host, region) WHERE region = 'uswest' order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["region","uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key regex and where does not match the regular expression',
        "SHOW TAG VALUES FROM cpu WITH KEY =~ /(host|region)/ WHERE region = 'uswest' order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["region","uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key and measurement matches regular expression',
        'SHOW TAG VALUES FROM /[cg]pu/ WITH KEY = host order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key where time',
        'SHOW TAG VALUES WITH KEY = host WHERE time > 0 order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key regex where time',
        'SHOW TAG VALUES WITH KEY =~ /ho/ WHERE time > 0 order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where time',
        "SHOW TAG VALUES FROM cpu WITH KEY = host WHERE region = 'uswest' AND time > 0 order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key regex and where time',
        "SHOW TAG VALUES FROM cpu WITH KEY =~ /ho/ WHERE region = 'uswest' AND time > 0 order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where matches the regular expression where time',
        'SHOW TAG VALUES WITH KEY = host WHERE region =~ /ca.*/ AND time > 0 order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where does not match the regular expression where time',
        'SHOW TAG VALUES WITH KEY = region WHERE host !~ /server0[12]/ AND time > 0 order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["region","caeast"]]},{"name":"gpu","columns":["key","value"],"values":[["region","caeast"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where partially matches the regular expression where time',
        'SHOW TAG VALUES WITH KEY = host WHERE region =~ /us/ AND time > 0 order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where partially does not match the regular expression where time',
        'SHOW TAG VALUES WITH KEY = host WHERE region !~ /us/ AND time > 0 order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key in and where does not match the regular expression where time',
        "SHOW TAG VALUES FROM cpu WITH KEY IN (host, region) WHERE region = 'uswest' AND time > 0 order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["region","uswest"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key regex and where does not match the regular expression where time',
        "SHOW TAG VALUES FROM cpu WITH KEY =~ /(host|region)/ WHERE region = 'uswest' AND time > 0 order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["region","uswest"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and measurement matches regular expression where time',
        'SHOW TAG VALUES FROM /[cg]pu/ WITH KEY = host WHERE time > 0 order by value asc',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with value filter',
        "SHOW TAG VALUES WITH KEY = host WHERE value = 'server03' order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with no matching value filter',
        "SHOW TAG VALUES WITH KEY = host WHERE value = 'no_such_value' order by value asc",
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with non-string value filter',
        'SHOW TAG VALUES WITH KEY = host WHERE value = 5000 order by value asc',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with limit 1 offset 2',
        'SHOW TAG VALUES FROM cpu WITH KEY = host order by value asc limit 1 offset 2',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with limit 1 offset 0',
        'SHOW TAG VALUES WITH KEY = host order by value asc limit 1 offset 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show /hint/ tag values on db0 from gpu',
        "SHOW /*+ exact_statistic_query */ TAG VALUES ON db0 FROM gpu WITH KEY = host where time = '2009-11-10T23:00:00Z' order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show /hint/ tag values from gpu',
        "SHOW /*+ exact_statistic_query */ TAG VALUES FROM gpu WITH KEY = host where time = '2009-11-10T23:00:00Z' order by value asc",
        '{"results":[{"statement_id":0,"series":[{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
]

# --- TestServer_Query_ShowTagValues_Disorder (server_test.go:9771) ---
Q_STV_D_WRITES = [
    'cpu,host=server01 value=100 1257894000000000000',
    'cpu,host=server01,region=uswest value=100 1257894000000000000',
    'cpu,host=server01,region=useast value=100 1257894000000000000',
    'cpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server03,region=caeast value=100 1257894000000000000',
    'disk,host=server03,region=caeast value=100 1257894000000000000',
]

Q_STV_D_CASES = [
    (    # params: '"db": []string{"db0"'
        'show tag values with key',
        'SHOW TAG VALUES WITH KEY = host',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key regex',
        'SHOW TAG VALUES WITH KEY =~ /ho/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key and where',
        "SHOW TAG VALUES FROM cpu WITH KEY = host WHERE region = 'uswest'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key regex and where',
        "SHOW TAG VALUES FROM cpu WITH KEY =~ /ho/ WHERE region = 'uswest'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key and where matches the regular expression',
        'SHOW TAG VALUES WITH KEY = host WHERE region =~ /ca.*/',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key and where does not match the regular expression',
        'SHOW TAG VALUES WITH KEY = region WHERE host !~ /server0[12]/',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["region","caeast"]]},{"name":"gpu","columns":["key","value"],"values":[["region","caeast"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where partially matches the regular expression',
        'SHOW TAG VALUES WITH KEY = host WHERE region =~ /us/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where partially does not match the regular expression',
        'SHOW TAG VALUES WITH KEY = host WHERE region !~ /us/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key in and where does not match the regular expression',
        "SHOW TAG VALUES FROM cpu WITH KEY IN (host, region) WHERE region = 'uswest'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["region","uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key regex and where does not match the regular expression',
        "SHOW TAG VALUES FROM cpu WITH KEY =~ /(host|region)/ WHERE region = 'uswest'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["region","uswest"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with key and measurement matches regular expression',
        'SHOW TAG VALUES FROM /[cg]pu/ WITH KEY = host',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key where time',
        'SHOW TAG VALUES WITH KEY = host WHERE time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key regex where time',
        'SHOW TAG VALUES WITH KEY =~ /ho/ WHERE time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where time',
        "SHOW TAG VALUES FROM cpu WITH KEY = host WHERE region = 'uswest' AND time > 0",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key regex and where time',
        "SHOW TAG VALUES FROM cpu WITH KEY =~ /ho/ WHERE region = 'uswest' AND time > 0",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where matches the regular expression where time',
        'SHOW TAG VALUES WITH KEY = host WHERE region =~ /ca.*/ AND time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where does not match the regular expression where time',
        'SHOW TAG VALUES WITH KEY = region WHERE host !~ /server0[12]/ AND time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["region","caeast"]]},{"name":"gpu","columns":["key","value"],"values":[["region","caeast"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where partially matches the regular expression where time',
        'SHOW TAG VALUES WITH KEY = host WHERE region =~ /us/ AND time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and where partially does not match the regular expression where time',
        'SHOW TAG VALUES WITH KEY = host WHERE region !~ /us/ AND time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key in and where does not match the regular expression where time',
        "SHOW TAG VALUES FROM cpu WITH KEY IN (host, region) WHERE region = 'uswest' AND time > 0",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["region","uswest"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key regex and where does not match the regular expression where time',
        "SHOW TAG VALUES FROM cpu WITH KEY =~ /(host|region)/ WHERE region = 'uswest' AND time > 0",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["region","uswest"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with key and measurement matches regular expression where time',
        'SHOW TAG VALUES FROM /[cg]pu/ WITH KEY = host WHERE time > 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values with value filter',
        "SHOW TAG VALUES WITH KEY = host WHERE value = 'server03'",
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with no matching value filter',
        "SHOW TAG VALUES WITH KEY = host WHERE value = 'no_such_value'",
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with non-string value filter',
        'SHOW TAG VALUES WITH KEY = host WHERE value = 5000',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with limit 1 offset 2',
        'SHOW TAG VALUES FROM cpu WITH KEY = host limit 1 offset 2',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with limit 1 offset 0',
        'SHOW TAG VALUES WITH KEY = host limit 1 offset 0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with KEY = host where time',
        "show tag values with KEY = host where time > '2009-11-09T23:00:00Z' and time < '2009-11-11T23:00:00Z'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"],["host","server02"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"],["host","server03"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with KEY = host where time limit',
        "show tag values with KEY = host where time > '2009-11-09T23:00:00Z' and time < '2009-11-11T23:00:00Z' limit 1",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with KEY = host where time limit offset 0',
        "show tag values with KEY = host where time > '2009-11-09T23:00:00Z' and time < '2009-11-11T23:00:00Z' limit 1 offset 0",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"disk","columns":["key","value"],"values":[["host","server03"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values with KEY = host where time limit offset 1',
        "show tag values with KEY = host where time > '2009-11-09T23:00:00Z' and time < '2009-11-11T23:00:00Z' limit 1 offset 1",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["key","value"],"values":[["host","server01"]]},{"name":"gpu","columns":["key","value"],"values":[["host","server02"]]}]}]}',
    ),
]

# --- TestServer_Query_ShowTagKeyCardinality (server_test.go:10022) ---
Q_STKC_WRITES = [
    'cpu,host=server01 value=100 1257894000000000000',
    'cpu,host=server01,region=uswest value=100 1257894000000000000',
    'cpu,host=server01,region=useast value=100 1257894000000000000',
    'cpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server03,region=caeast value=100 1257894000000000000',
    'disk,host=server03,region=caeast value=100 1257894000000000000',
]

Q_STKC_CASES = [
    (    # params: '"db": []string{"db0"'
        'show tag key cardinality',
        'SHOW TAG KEY CARDINALITY',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"disk","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (  
        'show tag key cardinality on db0',
        'SHOW TAG KEY CARDINALITY ON db0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"disk","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key cardinality from',
        'SHOW TAG KEY CARDINALITY FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key cardinality from regex',
        'SHOW TAG KEY CARDINALITY FROM /[cg]pu/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key cardinality measurement not found',
        'SHOW TAG KEY CARDINALITY FROM doesntexist',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key cardinality with time in WHERE clause errors',
        'SHOW TAG KEY CARDINALITY FROM cpu WHERE time > now() - 1h',
        '{"results":[{"statement_id":0,"error":"SHOW TAG KEY EXACT CARDINALITY doesn\'t support time in WHERE clause"}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key exact cardinality',
        'SHOW TAG KEY EXACT CARDINALITY',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"disk","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (  
        'show tag key exact cardinality on db0',
        'SHOW TAG KEY EXACT CARDINALITY ON db0',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"disk","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key exact cardinality from',
        'SHOW TAG KEY EXACT CARDINALITY FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key exact cardinality from regex',
        'SHOW TAG KEY EXACT CARDINALITY FROM /[cg]pu/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key exact cardinality measurement not found',
        'SHOW TAG KEY EXACT CARDINALITY FROM doesntexist',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag key exact cardinality with time in WHERE clause errors',
        'SHOW TAG KEY EXACT CARDINALITY FROM cpu WHERE time > now() - 1h',
        '{"results":[{"statement_id":0,"error":"SHOW TAG KEY EXACT CARDINALITY doesn\'t support time in WHERE clause"}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values cardinality with key and where matches the regular expression',
        'SHOW TAG VALUES CARDINALITY WITH KEY = host WHERE region =~ /ca.*/',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["count"],"values":[[1]]},{"name":"gpu","columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values cardinality with key and where does not match the regular expression',
        'SHOW TAG VALUES CARDINALITY WITH KEY = region WHERE host !~ /server0[12]/',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["count"],"values":[[1]]},{"name":"gpu","columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values cardinality with key and where partially matches the regular expression',
        'SHOW TAG VALUES CARDINALITY WITH KEY = host WHERE region =~ /us/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values cardinality with key and where partially does not match the regular expression',
        'SHOW TAG VALUES CARDINALITY WITH KEY = host WHERE region !~ /us/',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["count"],"values":[[1]]},{"name":"gpu","columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values cardinality with key in and where does not match the regular expression',
        "SHOW TAG VALUES CARDINALITY FROM cpu WITH KEY IN (host, region) WHERE region = 'uswest'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values cardinality with key regex and where does not match the regular expression',
        "SHOW TAG VALUES CARDINALITY FROM cpu WITH KEY =~ /(host|region)/ WHERE region = 'uswest'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values cardinality with key and measurement matches regular expression',
        'SHOW TAG VALUES CARDINALITY FROM /[cg]pu/ WITH KEY = host',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values exact cardinality with key and where matches the regular expression',
        'SHOW TAG VALUES EXACT CARDINALITY WITH KEY = host WHERE region =~ /ca.*/',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["count"],"values":[[1]]},{"name":"gpu","columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values exact cardinality with key and where does not match the regular expression',
        'SHOW TAG VALUES EXACT CARDINALITY WITH KEY = region WHERE host !~ /server0[12]/',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["count"],"values":[[1]]},{"name":"gpu","columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values exact cardinality with key and where partially matches the regular expression',
        'SHOW TAG VALUES EXACT CARDINALITY WITH KEY = host WHERE region =~ /us/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show tag values exact cardinality with key and where partially does not match the regular expression',
        'SHOW TAG VALUES EXACT CARDINALITY WITH KEY = host WHERE region !~ /us/',
        '{"results":[{"statement_id":0,"series":[{"name":"disk","columns":["count"],"values":[[1]]},{"name":"gpu","columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values exact cardinality with key in and where does not match the regular expression',
        "SHOW TAG VALUES EXACT CARDINALITY FROM cpu WITH KEY IN (host, region) WHERE region = 'uswest'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values exact cardinality with key regex and where does not match the regular expression',
        "SHOW TAG VALUES EXACT CARDINALITY FROM cpu WITH KEY =~ /(host|region)/ WHERE region = 'uswest'",
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show tag values exact cardinality with key and measurement matches regular expression',
        'SHOW TAG VALUES EXACT CARDINALITY FROM /[cg]pu/ WITH KEY = host',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[2]]}]}]}',
    ),
]

# --- TestServer_Query_ShowMeasurementExactCardinality (server_test.go:8989) ---
Q_SMEC_WRITES = [
    'cpu,host=server01 value=100 1257894000000000000',
    'cpu,host=server01,region=uswest value=100 1257894000000000000',
    'cpu,host=server01,region=useast value=100 1257894000000000000',
    'cpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server02,region=useast value=100 1257894000000000000',
    'gpu,host=server02,region=caeast value=100 1257894000000000000',
    'other,host=server03,region=caeast value=100 1257894000000000000',
]

Q_SMEC_CASES = [
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement cardinality using FROM and regex',
        'SHOW MEASUREMENT CARDINALITY FROM /[cg]pu/',
        '{"results":[{"statement_id":0,"series":[{"columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement cardinality using FROM and regex - no matches',
        'SHOW MEASUREMENT CARDINALITY FROM /.*zzzzz.*/',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement cardinality where tag matches regular expression',
        'SHOW MEASUREMENT CARDINALITY WHERE region =~ /ca.*/',
        '{"results":[{"statement_id":0,"series":[{"columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement cardinality where tag does not match a regular expression',
        'SHOW MEASUREMENT CARDINALITY WHERE region !~ /ca.*/',
        '{"results":[{"statement_id":0,"series":[{"columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement cardinality with time in WHERE clauses errors',
        'SHOW MEASUREMENT CARDINALITY WHERE time > now() - 1h',
        '{"results":[{"statement_id":0,"error":"SHOW MEASUREMENT CARDINALITY doesn\'t support time in WHERE clause"}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement exact cardinality',
        'SHOW MEASUREMENT EXACT CARDINALITY',
        '{"results":[{"statement_id":0,"series":[{"columns":["count"],"values":[[3]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement exact cardinality using FROM',
        'SHOW MEASUREMENT EXACT CARDINALITY FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"columns":["count"],"values":[[1]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement exact cardinality using FROM and regex',
        'SHOW MEASUREMENT EXACT CARDINALITY FROM /[cg]pu/',
        '{"results":[{"statement_id":0,"series":[{"columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement exact cardinality using FROM and regex - no matches',
        'SHOW MEASUREMENT EXACT CARDINALITY FROM /.*zzzzz.*/',
        '{"results":[{"statement_id":0}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement exact cardinality where tag matches regular expression',
        'SHOW MEASUREMENT EXACT CARDINALITY WHERE region =~ /ca.*/',
        '{"results":[{"statement_id":0,"series":[{"columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement exact cardinality where tag does not match a regular expression',
        'SHOW MEASUREMENT EXACT CARDINALITY WHERE region !~ /ca.*/',
        '{"results":[{"statement_id":0,"series":[{"columns":["count"],"values":[[2]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"db0"'
        'show measurement exact cardinality with time in WHERE clauses errors',
        'SHOW MEASUREMENT EXACT CARDINALITY WHERE time > now() - 1h',
        '{"results":[{"statement_id":0,"error":"SHOW MEASUREMENT CARDINALITY doesn\'t support time in WHERE clause"}]}',
    ),
]

# --- TestServer_Query_ShowFieldKeys (server_test.go:10230) ---
Q_SFK_WRITES = [
    'cpu,host=server01 field1=100 1257894000000000000',
    'cpu,host=server01,region=uswest field1=200,field2=300,field3=400 1257894000000000000',
    'cpu,host=server01,region=useast field1=200,field2=300,field3=400 1257894000000000000',
    'cpu,host=server02,region=useast field1=200,field2=300,field3=400 1257894000000000000',
    'gpu,host=server01,region=useast field4=200,field5=300 1257894000000000000',
    'gpu,host=server03,region=caeast field6=200,field7=300 1257894000000000000',
    'disk,host=server03,region=caeast field8=200,field9=300 1257894000000000000',
]

Q_SFK_CASES = [
    (    # params: '"db": []string{"db0"'
        'show field keys',
        'SHOW FIELD KEYS',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["fieldKey","fieldType"],"values":[["field1","float"],["field2","float"],["field3","float"]]},{"name":"disk","columns":["fieldKey","fieldType"],"values":[["field8","float"],["field9","float"]]},{"name":"gpu","columns":["fieldKey","fieldType"],"values":[["field4","float"],["field5","float"],["field6","float"],["field7","float"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show field keys from measurement',
        'SHOW FIELD KEYS FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["fieldKey","fieldType"],"values":[["field1","float"],["field2","float"],["field3","float"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show field keys measurement with regex',
        'SHOW FIELD KEYS FROM /[cg]pu/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["fieldKey","fieldType"],"values":[["field1","float"],["field2","float"],["field3","float"]]},{"name":"gpu","columns":["fieldKey","fieldType"],"values":[["field4","float"],["field5","float"],["field6","float"],["field7","float"]]}]}]}',
    ),
]

# --- TestServer_Query_ShowFieldKeyCardinality (server_test.go:10298) ---
Q_SFKC_WRITES = [
    'cpu,host=server01 field1=100 1257894000000000000',
    'cpu,host=server01,region=uswest field1=200,field2=300,field3=400 1257894000000000000',
    'cpu,host=server01,region=useast field1=200,field2=300,field3=400 1257894000000000000',
    'cpu,host=server02,region=useast field1=200,field2=300,field3=400 1257894000000000000',
    'gpu,host=server01,region=useast field4=200,field5=300 1257894000000000000',
    'gpu,host=server03,region=caeast field6=200,field7=300 1257894000000000000',
    'disk,host=server03,region=caeast field8=200,field9=300 1257894000000000000',
]

Q_SFKC_CASES = [
    (    # params: '"db": []string{"db0"'
        'show field key cardinality',
        'SHOW FIELD KEY CARDINALITY',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[3]]},{"name":"disk","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[4]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show field key cardinality from measurement',
        'SHOW FIELD KEY CARDINALITY FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[3]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show field key cardinality measurement with regex',
        'SHOW FIELD KEY CARDINALITY FROM /[cg]pu/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[3]]},{"name":"gpu","columns":["count"],"values":[[4]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show field key exact cardinality',
        'SHOW FIELD KEY EXACT CARDINALITY',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[3]]},{"name":"disk","columns":["count"],"values":[[2]]},{"name":"gpu","columns":["count"],"values":[[4]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show field key exact cardinality from measurement',
        'SHOW FIELD KEY EXACT CARDINALITY FROM cpu',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[3]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'show field key exact cardinality measurement with regex',
        'SHOW FIELD KEY EXACT CARDINALITY FROM /[cg]pu/',
        '{"results":[{"statement_id":0,"series":[{"name":"cpu","columns":["count"],"values":[[3]]},{"name":"gpu","columns":["count"],"values":[[4]]}]}]}',
    ),
]


def _mkroot(spark, tmp_path_factory, name, writes):
    root = str(tmp_path_factory.mktemp(name))
    handle_write(spark, writes, root)
    return root


SUITES = [
    ("ss", "Q_SS_WRITES", "Q_SS_CASES"),
    ("stk", "Q_STK_WRITES", "Q_STK_CASES"),
    ("stkwc", "Q_STKWC_WRITES", "Q_STKWC_CASES"),
    ("stv", "Q_STV_WRITES", "Q_STV_CASES"),
    ("stvd", "Q_STV_D_WRITES", "Q_STV_D_CASES"),
    ("stkc", "Q_STKC_WRITES", "Q_STKC_CASES"),
    ("smec", "Q_SMEC_WRITES", "Q_SMEC_CASES"),
    ("sfk", "Q_SFK_WRITES", "Q_SFK_CASES"),
    ("sfkc", "Q_SFKC_WRITES", "Q_SFKC_CASES"),
]

_g = globals()


def _suite_params():
    out = []
    for tag, _w, c in SUITES:
        for case in _g[c]:
            out.append(pytest.param(tag, *case, id=f"{tag}:{case[0]}"))
    return out


@pytest.fixture(scope="module")
def p5_roots(spark, tmp_path_factory):
    return {
        tag: _mkroot(spark, tmp_path_factory, f"p5_{tag}", _g[w])
        for tag, w, _c in SUITES
    }


@pytest.fixture(scope="module")
def p5_ddl(spark, tmp_path_factory):
    from opengemini_spark.ddl import DDLExecutor, MetaStore

    ddl = DDLExecutor(
        spark, MetaStore(str(tmp_path_factory.mktemp("p5_meta")))
    )
    # reference suites run against a pre-created db0/rp0
    # (CreateDatabaseAndRetentionPolicy in the server setup)
    ddl.execute("CREATE DATABASE db0")
    return ddl


@pytest.mark.parametrize("tag,name,q,exp", _suite_params())
def test_parity5_case(spark, sf_dir, p5_roots, p5_ddl, tag, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None,
                       data_root=p5_roots[tag], ddl=p5_ddl)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"
