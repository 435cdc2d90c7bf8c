"""Reference-suite parity: multi-metric anomaly detection over joined
aggregated subqueries (ad_rmse_ext + regr_slope, expressions over join
columns). TestServer_Multi_Metric_Detection:14203.
"""

from __future__ import annotations

import json

import pytest

from opengemini_spark.api import handle_query, handle_write

MMD_WRITES = [
    "CPU,ns=CPU,rgn=675,svc=CDN,pAgentSN=2dd,agentTP=1,agentSN=1dd cpu.total.usage=1,cpu.total.guest=1,cpu.total.user=1,cpu.total.iowait=1 1741243834649000000",
    "CPU,ns=CPU,rgn=675,svc=CDN,pAgentSN=2dd,agentTP=2,agentSN=2dd cpu.total.usage=2,cpu.total.guest=2,cpu.total.user=2,cpu.total.iowait=2 1741243834649000000",
    "CPU,ns=CPU,rgn=675,svc=CDN,pAgentSN=4dd,agentTP=1,agentSN=3dd cpu.total.usage=3,cpu.total.guest=3,cpu.total.user=3,cpu.total.iowait=3 1741243834649000000",
    "CPU,ns=CPU,rgn=675,svc=CDN,pAgentSN=4dd,agentTP=2,agentSN=4dd cpu.total.usage=4,cpu.total.guest=4,cpu.total.user=4,cpu.total.iowait=4 1741243834649000000",
    "SmartServer.serverkits_mem_monitor,ns=SmartServer.serverkits_mem_monitor,rgn=675,svc=CDN,pAgentSN=2dd,agentTP=1,agentSN=1dd serverkits_mem_monitor.cur_mem_ce_count=5,serverkits_mem_monitor.cur_mem_uce_count=5  1741243834649000000",
    "SmartServer.serverkits_mem_monitor,ns=SmartServer.serverkits_mem_monitor,rgn=675,svc=CDN,pAgentSN=2dd,agentTP=2,agentSN=2dd serverkits_mem_monitor.cur_mem_ce_count=6,serverkits_mem_monitor.cur_mem_uce_count=6  1741243834649000000",
    "SmartServer.serverkits_mem_monitor,ns=SmartServer.serverkits_mem_monitor,rgn=675,svc=CDN,pAgentSN=4dd,agentTP=1,agentSN=3dd serverkits_mem_monitor.cur_mem_ce_count=7,serverkits_mem_monitor.cur_mem_uce_count=7  1741243834649000000",
    "SmartServer.serverkits_mem_monitor,ns=SmartServer.serverkits_mem_monitor,rgn=675,svc=CDN,pAgentSN=4dd,agentTP=2,agentSN=4dd serverkits_mem_monitor.cur_mem_ce_count=8,serverkits_mem_monitor.cur_mem_uce_count=8  1741243834649000000",
]

MMD_CASES = [
    (
        "mem: anomaly detect: ad_rmse_ext, trend detect: regr_slope",
        "SELECT ad_rmse_ext(ce_sum) AS ce_as, regr_slope(ce_sum) AS ce_ts, ad_rmse_ext(uce_sum) AS uce_as, regr_slope(uce_sum) AS uce_ts FROM (SELECT sum(\"serverkits_mem_monitor.cur_mem_ce_count\") AS ce_sum, sum(\"serverkits_mem_monitor.cur_mem_uce_count\") AS uce_sum FROM db0.rp0.\"SmartServer.serverkits_mem_monitor\" WHERE rgn = '675' AND svc = 'CDN' AND agentTP = '2' GROUP BY time(1m), pAgentSN FILL(none)) GROUP BY pAgentSN",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"SmartServer.serverkits_mem_monitor\",\"tags\":{\"pAgentSN\":\"2dd\"},\"columns\":[\"time\",\"ce_as\",\"ce_ts\",\"uce_as\",\"uce_ts\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,0,0,0]]},{\"name\":\"SmartServer.serverkits_mem_monitor\",\"tags\":{\"pAgentSN\":\"4dd\"},\"columns\":[\"time\",\"ce_as\",\"ce_ts\",\"uce_as\",\"uce_ts\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,0,0,0]]}]}]}",
    ),
    (
        "cpu: anomaly detect: ad_rmse_ext, trend detect: regr_slope",
        "SELECT ad_rmse_ext(cpu.total.usage) AS cu_as, regr_slope(cpu.total.usage) AS cu_ts, ad_rmse_ext(cpu.total.guest) AS cg_as, regr_slope(cpu.total.guest) AS cg_ts, ad_rmse_ext(cpu.total.user) AS cr_as, regr_slope(cpu.total.user) AS cr_ts, ad_rmse_ext(cpu.total.iowait) AS ci_as, regr_slope(cpu.total.iowait) AS ci_ts FROM (SELECT sum(cpu.total.usage) AS cpu.total.usage, sum(cpu.total.guest) AS cpu.total.guest, sum(cpu.total.user) AS cpu.total.user, sum(cpu.total.iowait) AS cpu.total.iowait FROM db0.rp0.CPU WHERE rgn = '675' AND svc = 'CDN' AND agentTP = '1' GROUP BY time(1m), pAgentSN, agentSN, rgn, svc FILL(none)) GROUP BY pAgentSN, agentSN, rgn, svc",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"CPU\",\"tags\":{\"agentSN\":\"1dd\",\"pAgentSN\":\"2dd\",\"rgn\":\"675\",\"svc\":\"CDN\"},\"columns\":[\"time\",\"cu_as\",\"cu_ts\",\"cg_as\",\"cg_ts\",\"cr_as\",\"cr_ts\",\"ci_as\",\"ci_ts\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,0,0,0,0,0,0,0]]},{\"name\":\"CPU\",\"tags\":{\"agentSN\":\"3dd\",\"pAgentSN\":\"4dd\",\"rgn\":\"675\",\"svc\":\"CDN\"},\"columns\":[\"time\",\"cu_as\",\"cu_ts\",\"cg_as\",\"cg_ts\",\"cr_as\",\"cr_ts\",\"ci_as\",\"ci_ts\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,0,0,0,0,0,0,0]]}]}]}",
    ),
    (
        "join query",
        "SELECT t1.cu_as, t2.ce_as FROM (SELECT ad_rmse_ext(cpu.total.usage) AS cu_as, regr_slope(cpu.total.usage) AS cu_ts, ad_rmse_ext(cpu.total.guest) AS cg_as, regr_slope(cpu.total.guest) AS cg_ts, ad_rmse_ext(cpu.total.user) AS cr_as, regr_slope(cpu.total.user) AS cr_ts, ad_rmse_ext(cpu.total.iowait) AS ci_as, regr_slope(cpu.total.iowait) AS ci_ts FROM (SELECT sum(cpu.total.usage) AS cpu.total.usage, sum(cpu.total.guest) AS cpu.total.guest, sum(cpu.total.user) AS cpu.total.user, sum(cpu.total.iowait) AS cpu.total.iowait FROM db0.rp0.CPU WHERE rgn = '675' AND svc = 'CDN' AND agentTP = '1' GROUP BY time(1m), pAgentSN, agentSN, rgn, svc FILL(none)) GROUP BY pAgentSN, agentSN, rgn, svc) AS t1 INNER JOIN (SELECT ad_rmse_ext(ce_sum) AS ce_as, regr_slope(ce_sum) AS ce_ts, ad_rmse_ext(uce_sum) AS uce_as, regr_slope(uce_sum) AS uce_ts FROM (SELECT sum(\"serverkits_mem_monitor.cur_mem_ce_count\") AS ce_sum, sum(\"serverkits_mem_monitor.cur_mem_uce_count\") AS uce_sum FROM db0.rp0.\"SmartServer.serverkits_mem_monitor\" WHERE rgn = '675' AND svc = 'CDN' AND agentTP = '2' GROUP BY time(1m), pAgentSN FILL(none)) GROUP BY pAgentSN) AS t2 ON (t1.pAgentSN = t2.pAgentSN) GROUP BY pAgentSN, agentSN, rgn, svc",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"agentSN\":\"1dd\",\"pAgentSN\":\"2dd\",\"rgn\":\"675\",\"svc\":\"CDN\"},\"columns\":[\"time\",\"t1.cu_as\",\"t2.ce_as\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,0]]},{\"name\":\"t1,t2\",\"tags\":{\"agentSN\":\"3dd\",\"pAgentSN\":\"4dd\",\"rgn\":\"675\",\"svc\":\"CDN\"},\"columns\":[\"time\",\"t1.cu_as\",\"t2.ce_as\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,0]]}]}]}",
    ),
    (
        "multi metric detect",
        "SELECT group_anomaly_score, group_trend_score, cu_as_weight_anomaly_score, cg_as_weight_anomaly_score, cr_as_weight_anomaly_score, ci_as_weight_anomaly_score, ce_as_weight_anomaly_score, use_as_weight_anomaly_score, cu_ts_trend_score, cg_ts_trend_score, cr_ts_trend_score, ci_ts_trend_score, ce_ts_trend_score, uce_ts_trend_score FROM (SELECT (2 * t1.cu_as + t1.cg_as + t1.cr_as + t1.ci_as + t2.ce_as + t2.uce_as) AS group_anomaly_score, (t1.cu_ts + t1.cg_ts + t1.cr_ts + t1.ci_ts + t2.ce_ts + t2.uce_ts) AS group_trend_score, 2 * t1.cu_as AS cu_as_weight_anomaly_score, 1 * t1.cg_as AS cg_as_weight_anomaly_score, 1 * t1.cr_as AS cr_as_weight_anomaly_score, 1 * t1.ci_ts AS ci_as_weight_anomaly_score, 1 * t2.ce_as AS ce_as_weight_anomaly_score, 1 * t2.uce_as AS use_as_weight_anomaly_score, 1 * t1.cu_ts AS cu_ts_trend_score, 1 * t1.cg_ts AS cg_ts_trend_score, 1 * t1.cr_ts AS cr_ts_trend_score, 1 * t1.ci_ts AS ci_ts_trend_score, 1 * t2.ce_ts AS ce_ts_trend_score, 1 * t2.uce_ts AS uce_ts_trend_score FROM (SELECT ad_rmse_ext(cpu.total.usage) AS cu_as, regr_slope(cpu.total.usage) AS cu_ts, ad_rmse_ext(cpu.total.guest) AS cg_as, regr_slope(cpu.total.guest) AS cg_ts, ad_rmse_ext(cpu.total.user) AS cr_as, regr_slope(cpu.total.user) AS cr_ts, ad_rmse_ext(cpu.total.iowait) AS ci_as, regr_slope(cpu.total.iowait) AS ci_ts FROM (SELECT sum(cpu.total.usage) AS cpu.total.usage, sum(cpu.total.guest) AS cpu.total.guest, sum(cpu.total.user) AS cpu.total.user, sum(cpu.total.iowait) AS cpu.total.iowait FROM db0.rp0.CPU WHERE rgn = '675' AND svc = 'CDN' AND agentTP = '1' GROUP BY time(1m), pAgentSN, agentSN, rgn, svc FILL(none)) GROUP BY pAgentSN, agentSN, rgn, svc) AS t1 INNER JOIN (SELECT ad_rmse_ext(ce_sum) AS ce_as, regr_slope(ce_sum) AS ce_ts, ad_rmse_ext(uce_sum) AS uce_as, regr_slope(uce_sum) AS uce_ts FROM (SELECT sum(\"serverkits_mem_monitor.cur_mem_ce_count\") AS ce_sum, sum(\"serverkits_mem_monitor.cur_mem_uce_count\") AS uce_sum FROM db0.rp0.\"SmartServer.serverkits_mem_monitor\" WHERE rgn = '675' AND svc = 'CDN' AND agentTP = '2' GROUP BY time(1m), pAgentSN FILL(none)) GROUP BY pAgentSN) AS t2 ON (t1.pAgentSN = t2.pAgentSN) GROUP BY pAgentSN, agentSN, rgn, svc) WHERE group_anomaly_score >= 0 AND group_trend_score >= 0 GROUP BY pAgentSN, agentSN, rgn, svc",
        "{\"results\":[{\"statement_id\":0,\"series\":[{\"name\":\"t1,t2\",\"tags\":{\"agentSN\":\"1dd\",\"pAgentSN\":\"2dd\",\"rgn\":\"675\",\"svc\":\"CDN\"},\"columns\":[\"time\",\"group_anomaly_score\",\"group_trend_score\",\"cu_as_weight_anomaly_score\",\"cg_as_weight_anomaly_score\",\"cr_as_weight_anomaly_score\",\"ci_as_weight_anomaly_score\",\"ce_as_weight_anomaly_score\",\"use_as_weight_anomaly_score\",\"cu_ts_trend_score\",\"cg_ts_trend_score\",\"cr_ts_trend_score\",\"ci_ts_trend_score\",\"ce_ts_trend_score\",\"uce_ts_trend_score\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,0,0,0,0,0,0,0,0,0,0,0,0,0]]},{\"name\":\"t1,t2\",\"tags\":{\"agentSN\":\"3dd\",\"pAgentSN\":\"4dd\",\"rgn\":\"675\",\"svc\":\"CDN\"},\"columns\":[\"time\",\"group_anomaly_score\",\"group_trend_score\",\"cu_as_weight_anomaly_score\",\"cg_as_weight_anomaly_score\",\"cr_as_weight_anomaly_score\",\"ci_as_weight_anomaly_score\",\"ce_as_weight_anomaly_score\",\"use_as_weight_anomaly_score\",\"cu_ts_trend_score\",\"cg_ts_trend_score\",\"cr_ts_trend_score\",\"ci_ts_trend_score\",\"ce_ts_trend_score\",\"uce_ts_trend_score\"],\"values\":[[\"1970-01-01T00:00:00Z\",0,0,0,0,0,0,0,0,0,0,0,0,0,0]]}]}]}",
    ),
]

@pytest.fixture(scope="module")
def mmd_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("p3_mmd"))
    handle_write(spark, MMD_WRITES, root)
    return root


@pytest.mark.parametrize("name,q,exp", MMD_CASES, ids=[c[0] for c in MMD_CASES])
def test_mmd_case(spark, sf_dir, mmd_root, name, q, exp):
    got = handle_query(spark, sf_dir, q, epoch=None, data_root=mmd_root)
    assert got == json.loads(exp), f"case {name!r}: {json.dumps(got)}"
