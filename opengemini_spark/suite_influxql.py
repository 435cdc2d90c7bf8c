"""End-to-end InfluxQL path registrations: query string → lexer → parser →
planner → DataFrame, hash-checked against the DuckDB oracle.

Aggregates here are order-free (count/min/max/selector rows) so the
unrounded values are exact on both engines regardless of summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengemini_spark.influxql import query
from opengemini_spark.suite import register


@register(
    "influxql_window_agg_fill",
    # full path: GROUP BY time(6h), tag + FILL(null); count/min/max exact
    """
    WITH agg AS (
      SELECT epoch_ns(ts) - epoch_ns(ts) % 21600000000000 AS time,
             event_type,
             count(value) AS n, min(value) AS mn, max(value) AS mx
      FROM events WHERE event_type IN ('error', 'signup', 'click')
      GROUP BY 1, 2
    ), bounds AS (
      SELECT min(time) AS lo, max(time) AS hi FROM agg
    ), spine AS (
      SELECT unnest(generate_series((SELECT lo FROM bounds),
                                    (SELECT hi FROM bounds),
                                    21600000000000)) AS time
    ), series AS (SELECT DISTINCT event_type FROM agg)
    SELECT s.time, se.event_type, a.n, a.mn, a.mx
    FROM spine s CROSS JOIN series se
    LEFT JOIN agg a ON a.time = s.time AND a.event_type = se.event_type
    """,
)
def q_influxql_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return query(
        spark, sf_dir,
        "SELECT count(value) AS n, min(value) AS mn, max(value) AS mx "
        "FROM events WHERE event_type = 'error' OR event_type = 'signup' "
        "OR event_type = 'click' "
        "GROUP BY time(6h), event_type FILL(null)",
    )


@register(
    "influxql_selector_companion",
    # SELECT max(value), user_id: companion column from the argmax row
    # (validateSelector, compile.go:762-770)
    """
    SELECT event_type, epoch_us(ts) AS time_us, value AS max, user_id
    FROM events e
    WHERE value = (SELECT max(value) FROM events x
                   WHERE x.event_type = e.event_type)
    """,
)
def q_influxql_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = query(
        spark, sf_dir,
        "SELECT max(value), user_id FROM events GROUP BY event_type",
    )
    return out.select(
        "event_type", F.expr("time div 1000").alias("time_us"), "max", "user_id"
    )


@register(
    "influxql_raw_filter",
    """
    SELECT epoch_us(ts) AS time_us, value, user_id FROM events
    WHERE value > 248 AND event_type != 'view'
    """,
)
def q_influxql_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    return query(
        spark, sf_dir,
        "SELECT value, user_id FROM events WHERE value > 248 AND event_type != 'view'",
    ).withColumn("time_us", F.expr("time div 1000")).drop("time")


@register(
    "influxql_show_tag_values",
    "SELECT DISTINCT event_type AS value FROM events",
)
def q_influxql_show(spark: SparkSession, sf_dir: str) -> DataFrame:
    return query(
        spark, sf_dir, "SHOW TAG VALUES FROM events WITH KEY = event_type"
    )


@register(
    "influxql_regex_where",
    """
    SELECT epoch_us(ts) AS time_us, value FROM events
    WHERE regexp_matches(event_type, '^(err|sign)') AND value % 2 > 1.5
    """,
)
def q_influxql_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return query(
        spark, sf_dir,
        "SELECT value FROM events WHERE event_type =~ /^(err|sign)/ "
        "AND value % 2 > 1.5",
    ).withColumn("time_us", F.expr("time div 1000")).drop("time")


@register(
    "influxql_subquery_inherit",
    # subquery with outer time-range inheritance (SURVEY §7.4.7): inner
    # 6h-window counts, outer min/max/count over windows in the time range
    """
    WITH inner_q AS (
      SELECT epoch_ns(ts) - epoch_ns(ts) % 21600000000000 AS t,
             event_type, count(*) AS s
      FROM events
      WHERE epoch_ns(ts) >= 1704412800000000000
        AND epoch_ns(ts) < 1704844800000000000
      GROUP BY 1, 2
    )
    SELECT 1704412800000000000 AS time,
           count(*) AS n, min(s) AS mn, max(s) AS mx FROM inner_q
    WHERE t >= 1704412800000000000 AND t < 1704844800000000000
    """,
)
def q_influxql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return query(
        spark, sf_dir,
        "SELECT count(s) AS n, min(s) AS mn, max(s) AS mx FROM "
        "(SELECT count(value) AS s FROM events GROUP BY time(6h), event_type) "
        "WHERE time >= '2024-01-05T00:00:00Z' AND time < '2024-01-10T00:00:00Z'",
    )
