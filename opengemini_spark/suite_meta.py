"""Sink, metadata, and remaining §2 registrations: SELECT INTO,
*CARDINALITY, regr_slope (deriv/predict_linear analog), compare()
time-shift.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from opengemini_spark.catalog import load_table
from opengemini_spark.suite import register

DAY_NS = 86_400_000_000_000


def _countmin_oracle_sql() -> str:
    from opengemini_spark.datapipe.dedup import MINHASH_AB, MINHASH_P
    from opengemini_spark.datapipe.hashing import h60_sql
    from opengemini_spark.operators.sketch import CM_DEPTH, CM_WIDTH

    def bucket(i: int) -> str:
        a, b = MINHASH_AB[i]
        return f"(({a} * base + {b}) % {MINHASH_P}) % {CM_WIDTH}"

    cell_rows = "\n      UNION ALL ".join(
        f"SELECT {i} AS row, {bucket(i)} AS bucket FROM hashed"
        for i in range(CM_DEPTH)
    )
    kcell_rows = "\n      UNION ALL ".join(
        f"SELECT k, {i} AS row, {bucket(i)} AS bucket FROM keys"
        for i in range(CM_DEPTH)
    )
    return f"""
    WITH hashed AS (
      SELECT user_id::VARCHAR AS k,
             ({h60_sql("user_id::VARCHAR")} % {MINHASH_P}) AS base
      FROM events
    ), cells AS (
      {cell_rows}
    ), sketch AS (
      SELECT row, bucket, count(*) AS c FROM cells GROUP BY row, bucket
    ), keys AS (
      SELECT DISTINCT k, base FROM hashed
    ), kcells AS (
      {kcell_rows}
    ), est AS (
      SELECT CAST(k AS BIGINT) AS key, min(c) AS est
      FROM kcells JOIN sketch USING (row, bucket) GROUP BY k
    )
    SELECT key, est, rank FROM (
      SELECT *, row_number() OVER (ORDER BY est DESC, key ASC) AS rank FROM est)
    WHERE rank <= 10
    """



@register(
    "otlp_logs_ingest_agg",
    # OTLP logs ingest e2e (handler_otlp.go:113 writeLogs + the
    # otel2influx log schema of otel_context.go:70-78): the Spark query
    # maps 400 deterministic events rows into ExportLogsServiceRequest
    # WIRE BYTES, pushes them through the protobuf decode → 'logs'
    # measurement write → __seq-dedup read-back, and aggregates per
    # service tag; the oracle computes the same aggregate straight from
    # the source rows, proving the whole encode/decode/map/write/read
    # pipeline is lossless
    """
    WITH src AS (
      SELECT event_id, event_type, user_id, value
      FROM events ORDER BY event_id LIMIT 400
    )
    SELECT event_type AS service, count(*) AS n,
           CAST(sum(event_id % 24 + 1) AS BIGINT) AS sev_sum,
           CAST(sum(user_id) AS BIGINT) AS user_sum,
           round(sum(value), 4) AS val_sum
    FROM src GROUP BY event_type
    """,
)
def q_otlp_logs_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from opengemini_spark import storage
    from opengemini_spark.api import handle_otlp_logs_wire
    from opengemini_spark.sources import otlp_pb

    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id", "value", "time_ns")
        .orderBy("event_id")
        .limit(400)
        .collect()
    )
    rls = [{
        "resource": {"host": "bench"},
        "logs": [
            {
                "time_ns": int(r["time_ns"]),
                "observed_time_ns": 0,
                "severity_number": int(r["event_id"]) % 24 + 1,
                "severity_text": "INFO",
                "body": f"evt {r['event_id']}",
                "attrs": {
                    "service.name": r["event_type"],
                    "user": int(r["user_id"]),
                    "value": float(r["value"]),
                },
                "dropped_attributes_count": 0,
                "trace_id": "",
                "span_id": "",
            }
            for r in rows
        ],
    }]
    body = otlp_pb.encode_export_logs_request(rls)
    dst = os.path.join(
        tempfile.gettempdir(), f"og_spark_otlp_{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(dst, ignore_errors=True)   # write_measurement appends
    handle_otlp_logs_wire(spark, body, dst)
    logs = storage.read_measurement(spark, f"{dst}/logs")
    return (
        logs.groupBy(F.col("`service.name`").alias("service"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("severity_number").cast("long").alias("sev_sum"),
            F.sum("user").cast("long").alias("user_sum"),
            F.round(F.sum("value"), 4).alias("val_sum"),
        )
    )


@register(
    "sink_select_into",
    # SELECT …INTO dst (target_transform.go:150 writeTarget): the Spark query
    # writes the result to a parquet target and returns the read-back — the
    # oracle recomputes the aggregate directly, proving write/read fidelity.
    """
    SELECT event_type, count(*) AS n, min(value) AS mn, max(value) AS mx
    FROM events GROUP BY event_type
    """,
)
def q_select_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    dst = os.path.join(
        tempfile.gettempdir(), f"og_spark_into_{os.path.basename(sf_dir)}"
    )
    agg = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
    )
    agg.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)


@register(
    "show_cardinality",
    # SHOW TAG VALUES CARDINALITY / SERIES CARDINALITY (statement_executor
    # dispatch): distinct tag-set counts from the catalog scan
    """
    SELECT 'event_type' AS tag_key,
           count(DISTINCT event_type) AS cardinality,
           (SELECT count(DISTINCT event_type) FROM events) AS series_cardinality
    FROM events
    """,
)
def q_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    series = ev.select("event_type").distinct().count()
    return ev.agg(
        F.lit("event_type").alias("tag_key"),
        F.countDistinct("event_type").alias("cardinality"),
        F.lit(series).alias("series_cardinality"),
    )


@register(
    "agg_regr_slope",
    # regr_slope (agg_functions.go:462) / predict_linear's regression core.
    # x = per-series row index (exact ints), y = value; float sums rounded
    # before the closed-form slope so both engines divide identical doubles.
    """
    WITH o AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ), s AS (
      SELECT user_id, count(*) AS n,
             sum(rn) AS sx, sum(rn * rn) AS sxx,
             round(sum(value), 2) AS sy,
             round(sum(rn * value), 2) AS sxy
      FROM o GROUP BY user_id
    )
    SELECT user_id,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
    FROM s WHERE n >= 2
    """,
)
def q_regr_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "time_us", F.expr("time_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("time_us", "event_id")
    o = ev.withColumn("rn", F.row_number().over(w))
    s = o.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rn").alias("sx"),
        F.sum(F.col("rn") * F.col("rn")).alias("sxx"),
        F.round(F.sum("value"), 2).alias("sy"),
        F.round(F.sum(F.col("rn") * F.col("value")), 2).alias("sxy"),
    )
    return s.filter(F.col("n") >= 2).select(
        "user_id",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("slope"),
    )


@register(
    "compare_timeshift",
    # compare(metric, 1d): today's window vs the same window shifted back one
    # day (query/compare_function.go family) — self-join on shifted bucket.
    f"""
    WITH d AS (
      SELECT epoch_ns(ts) - epoch_ns(ts) % {DAY_NS} AS day_ns, event_type,
             count(*) AS n, round(sum(value), 2) AS sum_v
      FROM events GROUP BY 1, 2
    )
    SELECT a.day_ns, a.event_type, a.sum_v,
           b.sum_v AS sum_v_prev,
           round(a.sum_v / b.sum_v, 6) AS ratio_1d
    FROM d a JOIN d b
      ON a.event_type = b.event_type AND b.day_ns = a.day_ns - {DAY_NS}
    """,
)
def q_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.operators.window_agg import window_agg

    ev = load_table(spark, sf_dir, "events")
    d = window_agg(
        ev, "time_ns", DAY_NS,
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_v")],
        dims=["event_type"], bucket_alias="day_ns",
    )
    a = d.select("day_ns", "event_type", "sum_v")
    b = d.select(
        (F.col("day_ns") + DAY_NS).alias("day_ns"),
        F.col("event_type"),
        F.col("sum_v").alias("sum_v_prev"),
    )
    return a.join(b, ["day_ns", "event_type"]).select(
        "day_ns", "event_type", "sum_v", "sum_v_prev",
        F.round(F.col("sum_v") / F.col("sum_v_prev"), 6).alias("ratio_1d"),
    )


@register(
    "sketch_countmin_topn",
    # topn_ddcm analog: count-min sketch (d=4 Carter-Wegman rows, w=256) —
    # deterministic, so the oracle rebuilds the same counter matrix.
    _countmin_oracle_sql(),
)
def q_countmin_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.operators.sketch import countmin_topn

    ev = load_table(spark, sf_dir, "events")
    return countmin_topn(ev, "user_id", 10)


@register(
    "table_function_rca",
    # UDTF registry example (table_function_factory.go): rca over the
    # mid-point split of the events range, per event_type
    """
    WITH sides AS (
      SELECT event_type,
             CASE WHEN epoch_ns(ts) < 1705363200000000000
                  THEN 'before' ELSE 'after' END AS side,
             value
      FROM events
    ), p AS (
      SELECT event_type,
             round(coalesce(sum(CASE WHEN side = 'before' THEN value END), 0), 2)
               AS before,
             round(coalesce(sum(CASE WHEN side = 'after' THEN value END), 0), 2)
               AS after
      FROM sides GROUP BY event_type
    ), c AS (
      SELECT *, round(after - before, 2) AS contribution FROM p
    )
    SELECT event_type, before, after, contribution, rank FROM (
      SELECT *, row_number() OVER (
        ORDER BY abs(contribution) DESC, event_type ASC) AS rank
      FROM c)
    WHERE rank <= 5
    """,
)
def q_rca(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.functions.table_functions import get_table_function

    ev = load_table(spark, sf_dir, "events")
    fn = get_table_function("rca")
    return fn(
        ev, time_col="time_ns", dim_col="event_type", value_col="value",
        split_ns=1705363200000000000, top=5,
    )


@register(
    "filter_fulltext_match",
    # MATCH / MATCHPHRASE full-text predicates (influxql token.go MATCH,
    # engine/index/textindex): MATCH = every query term present in the
    # tokenized text; MATCHPHRASE = exact substring
    """
    WITH d AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t != '') AS toks
      FROM documents
    )
    SELECT doc_id,
           list_contains(toks, 'window') AND list_contains(toks, 'join')
             AS match_terms,
           contains(text, 'join window') AS match_phrase
    FROM d
    WHERE (list_contains(toks, 'window') AND list_contains(toks, 'join'))
       OR contains(text, 'join window')
    """,
)
def q_fulltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.datapipe.hashing import tokens_expr

    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tokens_expr("text")
    )
    match_terms = F.array_contains("toks", "window") & F.array_contains(
        "toks", "join"
    )
    match_phrase = F.col("text").contains("join window")
    return (
        d.filter(match_terms | match_phrase)
        .select(
            "doc_id",
            match_terms.alias("match_terms"),
            match_phrase.alias("match_phrase"),
        )
    )


@register(
    "sort_multi_column",
    # columnstore multi-column sort (sort_transform.go) with deterministic
    # total order
    """
    SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_quantity > 49
    ORDER BY l_returnflag DESC, l_linestatus ASC, l_extendedprice DESC,
             l_orderkey ASC, l_linenumber ASC
    LIMIT 50
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 49)
        .orderBy(
            F.col("l_returnflag").desc(),
            F.col("l_linestatus").asc(),
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .select(
            "l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
        .limit(50)
    )
