"""PromQL end-to-end registrations: promql text → parser → engine →
DataFrame, hash-checked against the same range-vector oracles as
suite_prom (restricted to the query_range window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengemini_spark.catalog import load_table
from opengemini_spark.promql import MetricRegistry, query_range
from opengemini_spark.promql.engine import Metric
from opengemini_spark.suite import register
from opengemini_spark.suite_prom import _EXPLODE_CTE, _STATS_CTE, RANGE_S

START = 1704067200          # 2024-01-01 00:00 UTC (6h-aligned)
END = START + 35 * 86400
STEP = 21600
_T_BOUND = f"t >= {START * 10**6} AND t <= {END * 10**6}"


def _registry() -> MetricRegistry:
    def loader(spark, sf_dir):
        return load_table(spark, sf_dir, "events").withColumn(
            "tu", F.expr("time_ns div 1000")
        )

    r = MetricRegistry()
    r.register("events_value", Metric(loader, labels=["event_type"]))
    return r


def _run(spark: SparkSession, sf_dir: str, q: str) -> DataFrame:
    return query_range(spark, sf_dir, _registry(), q, START, END, STEP)


@register(
    "promql_rate_e2e",
    _STATS_CTE
    + f"""
    SELECT event_type, t,
           round(delta / sampled * extrap / {RANGE_S}, 6) AS value
    FROM x WHERE {_T_BOUND}
    """,
)
def q_promql_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _run(spark, sf_dir, "rate(events_value[12h])")
    return out.select("event_type", "t", F.round("value", 6).alias("value"))


@register(
    "promql_count_over_time_matcher",
    _EXPLODE_CTE
    + f"""
    SELECT event_type, t, CAST(count(*) AS DOUBLE) AS value
    FROM e WHERE event_type IN ('error', 'click')
    GROUP BY event_type, t
    HAVING {_T_BOUND}
    """,
)
def q_promql_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark, sf_dir,
        'count_over_time(events_value{event_type=~"error|click"}[12h])',
    )


@register(
    "promql_binop_cmp_filter",
    # comparison filters the vector (Prometheus semantics): keep windows
    # whose max sample exceeds the threshold
    _EXPLODE_CTE
    + f"""
    SELECT event_type, t, max(value) AS value
    FROM e GROUP BY event_type, t
    HAVING max(value) > 249 AND {_T_BOUND}
    """,
)
def q_promql_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, "max_over_time(events_value[12h]) > 249")


# instant evaluation at a single timestamp (GET /api/v1/query, r3) — the
# engine's query_instant vector path; window is [AT-12h, AT] (closed —
# the reference lifts pre-3.0 Prometheus range-selector semantics)
INSTANT_AT = START + 10 * 86400


@register(
    "promql_instant_e2e",
    f"""
    SELECT event_type, CAST({INSTANT_AT} AS BIGINT) * 1000000 AS t,
           CAST(count(*) AS DOUBLE) AS value
    FROM events
    WHERE epoch_us(ts) >= CAST({INSTANT_AT - 43200} AS BIGINT) * 1000000
      AND epoch_us(ts) <= CAST({INSTANT_AT} AS BIGINT) * 1000000
    GROUP BY event_type
    """,
)
def q_promql_instant(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.promql.engine import query_instant

    kind, payload = query_instant(
        spark, sf_dir, _registry(),
        "count_over_time(events_value[12h])", INSTANT_AT,
    )
    assert kind == "vector"
    return payload.df


# --- PromQL subquery (r3): expr[range:step] ---------------------------------
# inner count_over_time on the absolutely-aligned 6h grid spanning
# [START-12h, END]; outer max_over_time over [t-12h, t] of those samples.
# The oracle replays both layers set-oriented in DuckDB.
SUB_STEP = 21600
SUB_RANGE = 43200


@register(
    "promql_subquery_e2e",
    f"""
    WITH tg AS (
      SELECT unnest(generate_series({START - SUB_RANGE}, {END}, {SUB_STEP})) AS tp
    ),
    inner_v AS (
      SELECT e.event_type, tg.tp, CAST(count(*) AS DOUBLE) AS v
      FROM tg JOIN events e
        ON epoch_us(e.ts) >= CAST(tg.tp - {SUB_STEP} AS BIGINT) * 1000000
       AND epoch_us(e.ts) <= CAST(tg.tp AS BIGINT) * 1000000
      GROUP BY e.event_type, tg.tp
    ),
    og AS (SELECT unnest(generate_series({START}, {END}, {STEP})) AS t)
    SELECT i.event_type, CAST(og.t AS BIGINT) * 1000000 AS t,
           max(i.v) AS value
    FROM og JOIN inner_v i
      ON i.tp >= og.t - {SUB_RANGE} AND i.tp <= og.t
    GROUP BY i.event_type, og.t
    """,
)
def q_promql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(
        spark, sf_dir,
        "max_over_time(count_over_time(events_value[6h])[12h:6h])",
    )


@register(
    "promql_changes_e2e",
    # changes(): value transitions in TIME order per closed window
    # (promql/functions.go funcChanges; engine ordered-window fold)
    _EXPLODE_CTE
    + f"""
    , lagged AS (
      SELECT event_type, t, value,
             lag(value) OVER (PARTITION BY event_type, t ORDER BY tu) AS pv
      FROM e
    )
    SELECT event_type, t,
           CAST(count(CASE WHEN value != pv THEN 1 END) AS DOUBLE) AS value
    FROM lagged GROUP BY event_type, t
    HAVING {_T_BOUND}
    """,
)
def q_promql_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run(spark, sf_dir, "changes(events_value[12h])")


@register(
    "promql_quantile_agg_e2e",
    # quantile(φ, v): Prometheus linear interpolation over the sorted
    # per-step vector (promql/quantile.go) — the engine's instant-vector
    # values are each step's latest sample within lookback; restricted to
    # steps ≤ 300s after a sample so DuckDB can replay the lookback
    f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) AS tu, max(value) AS value
      FROM events GROUP BY 1, 2
    ), e AS (
      SELECT event_type, tu, value,
             unnest(generate_series(
               ((tu + {21600 * 10**6 - 1}) // {21600 * 10**6})
                 * {21600 * 10**6},
               ((tu + {300 * 10**6}) // {21600 * 10**6}) * {21600 * 10**6},
               {21600 * 10**6})) AS t
      FROM s
    ), latest AS (
      SELECT event_type, t, arg_max(value, tu) AS value
      FROM e GROUP BY event_type, t
    ), ranked AS (
      SELECT t, value,
             row_number() OVER (PARTITION BY t ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY t) AS n
      FROM latest
    )
    SELECT t,
           round(max(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                     THEN value END)
           + (0.5 * (max(n) - 1) - floor(0.5 * (max(n) - 1)))
           * (max(CASE WHEN rn = least(
                    CAST(floor(0.5 * (n - 1)) AS BIGINT) + 2, n)
                  THEN value END)
              - max(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                    THEN value END)), 6) AS value
    FROM ranked GROUP BY t
    HAVING {_T_BOUND}
    """,
)
def q_promql_quantile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from opengemini_spark.promql.engine import Engine
    from opengemini_spark.promql import parser as P

    eng = Engine(spark, sf_dir, _registry(), START, END, STEP,
                 lookback_s=300)
    v = eng.eval(P.parse_promql("quantile(0.5, events_value)"))
    return v.df.select("t", F.round("value", 6).alias("value"))
