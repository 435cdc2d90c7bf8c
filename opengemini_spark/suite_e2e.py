"""Full-lifecycle front-end registrations (VERDICT r5 next #7): the
operator bench covers engine plans; these entries run the complete HTTP
text paths — parse → plan → shape → JSON emission — and hash-check the
JSON CONTENT against DuckDB, so the 2× perf gate also guards front-end
overheads (statement splitting, series shaping, chunk slicing, the
PromQL results cache).

Each entry drives the same handler the server mode uses
(`api.handle_query` / `handle_query_chunked` /
`handle_prom_query_range_cached`), then lifts the emitted JSON back into
a DataFrame for the driver's comparison. The lift is driver-side by
construction (the JSON emitter already materialized the rows through
``toLocalIterator``); result sizes are the aggregate/series shapes the
reference serves, not raw scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengemini_spark.suite import register
from opengemini_spark.suite_prom import _STATS_CTE, RANGE_S
from opengemini_spark.suite_promql import _registry, START, STEP

HOUR_NS = 3_600_000_000_000


@register(
    "e2e_http_query_multi",
    # two statements in one /query: a raw filter (large series emission)
    # + a grouped count (per-series blocks). The oracle recomputes both
    # and unions them with NULL padding, exactly the normalized frame
    # the entry builds from the response JSON.
    """
    SELECT 0 AS stmt_id, epoch_us(ts) AS time_us, value,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS n
    FROM events WHERE value > 100 AND event_type != 'view'
    UNION ALL
    SELECT 1, NULL, NULL, NULL, event_type, count(value)
    FROM events GROUP BY event_type
    """,
)
def q_e2e_query_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.api import handle_query

    resp = handle_query(
        spark, sf_dir,
        "SELECT value, user_id FROM events "
        "WHERE value > 100 AND event_type != 'view';"
        "SELECT count(value) FROM events GROUP BY event_type",
    )
    rows: list[tuple] = []
    for res in resp["results"]:
        sid = res["statement_id"]
        for series in res.get("series", []):
            cols = series["columns"]
            tags = series.get("tags", {})
            for v in series["values"]:
                d = dict(zip(cols, v))
                if sid == 0:
                    rows.append((0, d["time"] // 1000, float(d["value"]),
                                 int(d["user_id"]), None, None))
                else:
                    rows.append((1, None, None, None,
                                 tags["event_type"], int(d["count"])))
    return spark.createDataFrame(
        rows,
        "stmt_id long, time_us long, value double, user_id long, "
        "event_type string, n long",
    )


@register(
    "e2e_http_query_chunked",
    # chunked=true emission: a windowed aggregate sliced into chunk_size
    # blocks with partial flags; reassembling every chunk must reproduce
    # the full aggregate exactly (nothing dropped or duplicated at chunk
    # boundaries)
    f"""
    SELECT epoch_ns(ts) - epoch_ns(ts) % {6 * HOUR_NS} AS time_ns,
           event_type,
           count(value) AS cnt, round(sum(value), 3) AS sum_v
    FROM events
    GROUP BY 1, 2
    """,
)
def q_e2e_query_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.api import handle_query_chunked

    docs = handle_query_chunked(
        spark, sf_dir,
        "SELECT count(value), sum(value) FROM events "
        "GROUP BY time(6h), event_type fill(none)",
        chunk_size=50,
    )
    rows: list[tuple] = []
    for doc in docs:
        for res in doc["results"]:
            for series in res.get("series", []):
                cols = series["columns"]
                et = series.get("tags", {}).get("event_type")
                for v in series["values"]:
                    d = dict(zip(cols, v))
                    rows.append(
                        (int(d["time"]), et, int(d["count"]),
                         round(float(d["sum"]), 3))
                    )
    return spark.createDataFrame(
        rows, "time_ns long, event_type string, cnt long, sum_v double"
    )


# rate(events_value[12h]) over the suite_promql grid, but through the
# /api/v1/query_range RESULTS-CACHE handler: a cold half-window request
# populates the cache, then the full-window request re-uses the cached
# extent and evaluates only the gap — the returned matrix must equal the
# single-shot evaluation (same oracle family as promql_rate_e2e).
_CACHED_END = START + 14 * 86400


@register(
    "e2e_promql_range_cached",
    _STATS_CTE
    + f"""
    SELECT event_type, t,
           round(delta / sampled * extrap / {RANGE_S}, 6) AS value
    FROM x WHERE t >= {START * 10**6} AND t <= {_CACHED_END * 10**6}
    """,
)
def q_e2e_prom_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.api import handle_prom_query_range_cached
    from opengemini_spark.promql.results_cache import ResultsCache

    reg = _registry()
    # µs clock far in the future so the freshness window never clips the
    # historical grid (engine time is µs; see api docstring)
    cache = ResultsCache(now_ms=lambda: (_CACHED_END + 10 * 86400) * 10**6)
    # cold: first half of the window
    handle_prom_query_range_cached(
        spark, sf_dir, reg, "rate(events_value[12h])",
        START, START + 7 * 86400, STEP, cache,
    )
    # warm: full window — left half served from cache, right half is the
    # gap evaluation; the merged grid is what gets shaped
    resp = handle_prom_query_range_cached(
        spark, sf_dir, reg, "rate(events_value[12h])",
        START, _CACHED_END, STEP, cache,
    )
    assert resp["status"] == "success", resp
    assert cache.stats.partial_hits + cache.stats.full_hits >= 1, \
        "warm request must hit the cached extent"
    rows = []
    for series in resp["data"]["result"]:
        et = series["metric"].get("event_type")
        for t_s, val in series["values"]:
            rows.append((et, int(t_s) * 10**6, round(float(val), 6)))
    return spark.createDataFrame(rows, "event_type string, t long, value double")


@register(
    "e2e_http_write_lp",
    # the ingest front-end e2e: 300 events rows rendered as line-protocol
    # text -> POST /write (parse -> pivot -> partitioned append) ->
    # __seq-dedup read-back -> per-tag aggregate; the oracle recomputes
    # the aggregate straight from the source rows, so a parse/pivot/
    # write/read defect anywhere in the path hash-mismatches
    """
    WITH src AS (
      SELECT event_id, event_type, user_id, value, epoch_ns(ts) AS t
      FROM events ORDER BY event_id LIMIT 300
    )
    SELECT event_type, count(*) AS n,
           CAST(sum(user_id) AS BIGINT) AS user_sum,
           round(sum(value), 4) AS val_sum,
           CAST(min(t) AS BIGINT) AS t_min
    FROM src GROUP BY event_type
    """,
)
def q_e2e_write_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from opengemini_spark import storage
    from opengemini_spark.api import handle_write
    from opengemini_spark.catalog import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id", "value", "time_ns")
        .orderBy("event_id")
        .limit(300)
        .collect()
    )
    lines = [
        f"lpbench,event_type={r['event_type']} "
        f"value={float(r['value'])!r},user={int(r['user_id'])}i "
        f"{int(r['time_ns'])}"
        for r in rows
    ]
    dst = os.path.join(
        tempfile.gettempdir(), f"og_spark_lp_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(dst, ignore_errors=True)   # write_measurement appends
    handle_write(spark, lines, dst)
    m = storage.read_measurement(spark, f"{dst}/lpbench")
    return m.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user").cast("long").alias("user_sum"),
        F.round(F.sum("value"), 4).alias("val_sum"),
        F.min("time_ns").cast("long").alias("t_min"),
    )


@register(
    "e2e_kafka_consume",
    # Kafka-protocol consume e2e: topic IS an InfluxQL query
    # (consume/fetch.go:68-71); rows stream out over the loopback wire
    # one record batch per fetch and are lifted back into a DataFrame.
    # The oracle recomputes the topic query directly.
    """
    SELECT epoch_ns(ts) AS time_ns, value,
           CAST(user_id AS BIGINT) AS user_id
    FROM events WHERE value > 180 AND event_type = 'click'
    """,
)
def q_e2e_kafka_consume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.sources.kafka_consume import (
        ConsumeClient,
        ConsumeServer,
    )

    srv = ConsumeServer(spark, sf_dir, batch_rows=64).open()
    try:
        client = ConsumeClient("127.0.0.1", srv.port)
        try:
            client.api_versions()
            client.metadata(["consume"])
            batches = client.consume_all(
                "SELECT value, user_id FROM events "
                "WHERE value > 180 AND event_type = 'click'"
            )
        finally:
            client.close()
    finally:
        srv.close()
    rows = [
        (int(d["time"]), float(d["value"]), int(d["user_id"]))
        for b in batches
        for d in (dict(zip(b["columns"], v)) for v in b["values"])
    ]
    return spark.createDataFrame(
        rows, "time_ns long, value double, user_id long"
    )
