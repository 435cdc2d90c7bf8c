"""Reference server_colstore_test.go parity: the FunctionIf and
Select_PKkey suites (TestServer_Query_ColumnStore itself is
reference-skipped — "column store engine is being improved").

The Go harness compares these with CompareSortedResults (row order
within a series is not asserted), so the check sorts values on both
sides while keeping columns/tags exact.
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

Q_FI_WRITES = [
    'traffic,area=国内,country=中国,province=北京 region="华北",pop="五道口",level=1i,bps=111i,isisp=True,iseip=False,eqtype=1.1,percent=0.1 1629129600000000000',
    'traffic,area=国内,country=中国,province=上海 region="华东",pop="人民公园",level=2i,bps=222i,isisp=True,iseip=False,eqtype=2.2,percent=0.2 1629129601000000000',
    'traffic,area=国内,country=中国,province=广州 region="华南",pop="广州塔",level=3i,bps=333i,isisp=True,iseip=False,eqtype=3.3,percent=0.3 1629129602000000000',
    'traffic,area=海外,country=印度,province=孟买 region="海外",pop="恒河",level=4i,bps=444i,isisp=True,iseip=False,eqtype=4.4,percent=0.4 1629129603000000000',
    'traffic,area=海外,country=美国,province=好莱坞 region="海外",pop="A",level=5i,bps=555i,isisp=True,iseip=False,eqtype=5.5,percent=0.5 1629129604000000000',
    'traffic,area=海外,country=美国,province=拉斯维加斯 region="海外",pop="B",level=6i,bps=666i,isisp=True,iseip=False,eqtype=6.6,percent=0.6 1629129605000000000',
]

Q_FI_CASES = [
    (    # params: '"db": []string{"flowscope"'
        'THEN:Tag, ELSE:Tag',
        'SELECT if(\'"area"=\\\'国内\\\'\', province, country) From traffic',
        '{"results":[{"statement_id":0,"series":[{"name":"traffic","columns":["time","if"],"values":[["2021-08-16T16:00:00Z","北京"],["2021-08-16T16:00:01Z","上海"],["2021-08-16T16:00:02Z","广州"],["2021-08-16T16:00:03Z","印度"],["2021-08-16T16:00:04Z","美国"],["2021-08-16T16:00:05Z","美国"]]}]}]}',
    ),
    (    # params: '"db": []string{"flowscope"'
        'THEN:Integer, ELSE:Integer',
        'SELECT if(\'"area"=\\\'国内\\\'\', bps, level) From traffic',
        '{"results":[{"statement_id":0,"series":[{"name":"traffic","columns":["time","if"],"values":[["2021-08-16T16:00:00Z",111],["2021-08-16T16:00:01Z",222],["2021-08-16T16:00:02Z",333],["2021-08-16T16:00:03Z",4],["2021-08-16T16:00:04Z",5],["2021-08-16T16:00:05Z",6]]}]}]}',
    ),
    (    # params: '"db": []string{"flowscope"'
        'THEN:Boolean, ELSE:Boolean',
        'SELECT if(\'"area"=\\\'国内\\\'\', iseip, isisp) From traffic',
        '{"results":[{"statement_id":0,"series":[{"name":"traffic","columns":["time","if"],"values":[["2021-08-16T16:00:00Z",false],["2021-08-16T16:00:01Z",false],["2021-08-16T16:00:02Z",false],["2021-08-16T16:00:03Z",true],["2021-08-16T16:00:04Z",true],["2021-08-16T16:00:05Z",true]]}]}]}',
    ),
    (    # params: '"db": []string{"flowscope"'
        'THEN:Float, ELSE:Float',
        'SELECT if(\'"area"=\\\'国内\\\'\', percent, eqtype) From traffic',
        '{"results":[{"statement_id":0,"series":[{"name":"traffic","columns":["time","if"],"values":[["2021-08-16T16:00:00Z",0.1],["2021-08-16T16:00:01Z",0.2],["2021-08-16T16:00:02Z",0.3],["2021-08-16T16:00:03Z",4.4],["2021-08-16T16:00:04Z",5.5],["2021-08-16T16:00:05Z",6.6]]}]}]}',
    ),
    (    # go-skip; params: '"db": []string{"flowscope"'
        'CONDITION: KEY>x',
        'SELECT if(\'"level">3\', percent, eqtype) From traffic',
        '{"results":[{"statement_id":0,"series":[{"name":"traffic","columns":["time","if"],"values":[["2021-08-16T16:00:00Z",1.1],["2021-08-16T16:00:01Z",2.2],["2021-08-16T16:00:02Z",3.3],["2021-08-16T16:00:03Z",0.4],["2021-08-16T16:00:04Z",0.5],["2021-08-16T16:00:05Z",0.6]]}]}]}',
    ),
    (    # params: '"db": []string{"flowscope"'
        'Different type of THEN and Else',
        'SELECT if(\'\\"area\\"=\\\'国内\\\'\', province, level) From traffic',
        '{"results":[{"statement_id":0,"error":"the 2nd and 3rd argument must be of same type in if()"}]}',
    ),
    (    # params: '"db": []string{"flowscope"'
        'Invalid number of arguments',
        'SELECT if(\'"area"="国内"\', bps) From traffic',
        '{"results":[{"statement_id":0,"error":"invalid number of arguments for if, expected 3, got 2"}]}',
    ),
    (    # params: '"db": []string{"flowscope"'
        'Invalid operator',
        'SELECT if(\'"area"=="国内"\', bps, level) From traffic',
        '{"results":[{"statement_id":0,"error":"invalid condition, input like \'\\"key\\" [operator] \\\\\'string\\\\\'\' or \'\\"key\\" [operator] digit\'"}]}',
    ),
]
S_PK_WRITES = [
    'mst,country=china,name1=azhu age=12i,height=70,address="shenzhen",alive=TRUE 1629129600000000000',
    'mst,country=american,name1=alan age=20i,height=80,address="shanghai",alive=FALSE 1629129601000000000',
    'mst,country=germany,name1=alang age=3i,height=90,address="beijin",alive=TRUE 1629129602000000000',
    'mst,country=japan,name1=ahui age=30i,height=121,address="guangzhou",alive=FALSE 1629129603000000000',
    'mst,country=canada,name1=aqiu age=35i,height=138,address="chengdu",alive=TRUE 1629129604000000000',
    'mst,country=china,name1=agang age=48i,height=149,address="wuhan",alive=TRUE 1629129605000000000',
]

S_PK_CASES = [
    (    # params: '"db": []string{"db0"'
        'select * order by pkkey',
        'SELECT * from mst order by country',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","address","age","alive","country","height","name1"],"values":[["2021-08-16T16:00:01Z","shanghai",20,false,"american",80,"alan"],["2021-08-16T16:00:04Z","chengdu",35,true,"canada",138,"aqiu"],["2021-08-16T16:00:00Z","shenzhen",12,true,"china",70,"azhu"],["2021-08-16T16:00:05Z","wuhan",48,true,"china",149,"agang"],["2021-08-16T16:00:02Z","beijin",3,true,"germany",90,"alang"],["2021-08-16T16:00:03Z","guangzhou",30,false,"japan",121,"ahui"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'select pkkey',
        'SELECT country, name1 from mst order by name1',
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","country","name1"],"values":[["2021-08-16T16:00:05Z","china","agang"],["2021-08-16T16:00:03Z","japan","ahui"],["2021-08-16T16:00:01Z","american","alan"],["2021-08-16T16:00:02Z","germany","alang"],["2021-08-16T16:00:04Z","canada","aqiu"],["2021-08-16T16:00:00Z","china","azhu"]]}]}]}',
    ),
    (    # params: '"db": []string{"db0"'
        'select * with condition',
        "SELECT * from mst where country='canada'",
        '{"results":[{"statement_id":0,"series":[{"name":"mst","columns":["time","address","age","alive","country","height","name1"],"values":[["2021-08-16T16:00:04Z","chengdu",35,true,"canada",138,"aqiu"]]}]}]}',
    ),
]

_g = globals()
SUITES = [("fi", "Q_FI_WRITES", "Q_FI_CASES"),
          ("pk", "S_PK_WRITES", "S_PK_CASES")]


def _sorted(doc: dict) -> dict:
    out = json.loads(json.dumps(doc))
    for res in out.get("results", []):
        for s in res.get("series", []):
            s["values"] = sorted(
                s.get("values", []),
                key=lambda v: json.dumps(v, default=str),
            )
    return out


@pytest.fixture(scope="module")
def cs_roots(spark, tmp_path_factory):
    roots = {}
    for tag, w, _c in SUITES:
        root = str(tmp_path_factory.mktemp(f"cs_{tag}"))
        handle_write(spark, _g[w], root)
        roots[tag] = root
    return roots


def _suite_params():
    out = []
    for tag, _w, c in SUITES:
        for case in _g[c]:
            out.append(pytest.param(tag, *case, id=f"{tag}:{case[0]}"))
    return out


@pytest.mark.parametrize("tag,name,q,exp", _suite_params())
def test_colstore_case(spark, sf_dir, cs_roots, tag, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=cs_roots[tag])
    assert _sorted(got) == _sorted(json.loads(exp)), \
        f"case {name!r}: {json.dumps(got)[:600]}"
