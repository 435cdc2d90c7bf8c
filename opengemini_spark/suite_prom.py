"""PromQL operator registrations (SURVEY.md §2.4 prom rows, §3.3).

Range = 12h, step = 6h on the µs time grid; label = event_type (plus a
derived shard label for vector matching). The DuckDB oracles replicate the
exact arithmetic (same expression shape → bit-identical doubles before
rounding), including Prometheus's extrapolation rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengemini_spark.catalog import load_table
from opengemini_spark.operators import prom
from opengemini_spark.suite import register

HOUR_US = 3_600_000_000
RANGE_US = 12 * HOUR_US
STEP_US = 6 * HOUR_US
RANGE_S = RANGE_US / 1_000_000  # 43200.0

HQ_LES = (50.0, 100.0, 150.0, 200.0)  # + Inf bucket
HQ_Q = 0.9


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").withColumn(
        "tu", F.expr("time_ns div 1000")
    )


# shared oracle CTE: normalized samples exploded onto the step grid
_EXPLODE_CTE = f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) AS tu, max(value) AS value
      FROM events GROUP BY 1, 2
    ), e AS (
      SELECT event_type, tu, value,
             unnest(generate_series(
               ((tu + {STEP_US - 1}) // {STEP_US}) * {STEP_US},
               ((tu + {RANGE_US}) // {STEP_US}) * {STEP_US},
               {STEP_US})) AS t
      FROM s
    )
"""


@register(
    "prom_over_time",
    _EXPLODE_CTE
    + """
    SELECT event_type, t,
           count(*) AS n,
           round(sum(value), 2) AS sum_v,
           round(round(sum(value), 2) / count(*), 6) AS avg_v,
           round(max(value), 4) AS max_v,
           round(min(value), 4) AS min_v,
           round(arg_max(value, tu), 4) AS last_v
    FROM e GROUP BY event_type, t
    """,
)
def q_prom_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    return prom.over_time(
        ev,
        ["event_type"],
        "tu",
        "value",
        RANGE_US,
        STEP_US,
        {
            "n": F.count(F.lit(1)),
            "sum_v": F.round(F.sum("value"), 2),
            "avg_v": F.round(F.round(F.sum("value"), 2) / F.count(F.lit(1)), 6),
            "max_v": F.round(F.max("value"), 4),
            "min_v": F.round(F.min("value"), 4),
            "last_v": F.round(F.max_by("value", "tu"), 4),
        },
    )


_STATS_CTE = (
    _EXPLODE_CTE
    + """
    , lagged AS (
      SELECT event_type, t, tu, value,
             lag(value) OVER (PARTITION BY event_type, t ORDER BY tu) AS pv
      FROM e
    ), stats AS (
      SELECT event_type, t, count(*) AS n,
             min(tu) AS first_t, max(tu) AS last_t,
             arg_min(value, tu) AS first_v, arg_max(value, tu) AS last_v,
             sum(CASE WHEN value < pv THEN pv ELSE 0.0 END) AS resets
      FROM lagged GROUP BY event_type, t
    ), d AS (
      -- durations form as integer-µs differences FIRST, seconds after —
      -- mirrors the engine's (and Prometheus's int64-ms) exactness
      SELECT *, last_v - first_v + resets AS delta,
             (last_t - first_t) / 1000000 AS sampled,
             (first_t - t + {rng_us}) / 1000000 AS to_start0,
             (t - last_t) / 1000000 AS to_end,
             ((last_t - first_t) / 1000000) / (n - 1) AS avg_ivl
      FROM stats WHERE n >= 2 AND last_t > first_t
    ), z AS (
      SELECT *, avg_ivl * 1.1 AS threshold,
             CASE WHEN delta > 0 AND first_v >= 0
                       AND sampled * (first_v / delta) < to_start0
                  THEN sampled * (first_v / delta) ELSE to_start0 END AS to_start
      FROM d
    ), x AS (
      SELECT *,
             sampled
             + (CASE WHEN to_start < threshold THEN to_start ELSE avg_ivl / 2 END)
             + (CASE WHEN to_end < threshold THEN to_end ELSE avg_ivl / 2 END)
               AS extrap
      FROM z
    )
""".format(rng_us=RANGE_S * 1000000)
)


@register(
    "prom_rate_extrapolated",
    _STATS_CTE
    + f"""
    SELECT event_type, t,
           round(delta * (extrap / sampled / {RANGE_S}), 6) AS rate
    FROM x
    """,
)
def q_prom_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    out = prom.rate_prom(ev, ["event_type"], "tu", "value", RANGE_US, STEP_US)
    return out.select("event_type", "t", F.round("result", 6).alias("rate"))


@register(
    "prom_increase_extrapolated",
    _STATS_CTE
    + """
    SELECT event_type, t,
           round(delta * (extrap / sampled), 6) AS increase
    FROM x
    """,
)
def q_prom_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    out = prom.increase_prom(ev, ["event_type"], "tu", "value", RANGE_US, STEP_US)
    return out.select("event_type", "t", F.round("result", 6).alias("increase"))


# delta(): same pipeline without reset correction or zero-limit
_DELTA_CTE = (
    _EXPLODE_CTE
    + """
    , stats AS (
      SELECT event_type, t, count(*) AS n,
             min(tu) AS first_t, max(tu) AS last_t,
             arg_min(value, tu) AS first_v, arg_max(value, tu) AS last_v
      FROM e GROUP BY event_type, t
    ), d AS (
      SELECT *, last_v - first_v + 0.0 AS delta,
             (last_t - first_t) / 1000000 AS sampled,
             (first_t - t + {rng_us}) / 1000000 AS to_start,
             (t - last_t) / 1000000 AS to_end,
             ((last_t - first_t) / 1000000) / (n - 1) AS avg_ivl
      FROM stats WHERE n >= 2 AND last_t > first_t
    ), x AS (
      SELECT *,
             sampled
             + (CASE WHEN to_start < avg_ivl * 1.1 THEN to_start ELSE avg_ivl / 2 END)
             + (CASE WHEN to_end < avg_ivl * 1.1 THEN to_end ELSE avg_ivl / 2 END)
               AS extrap
      FROM d
    )
""".format(rng_us=RANGE_S * 1000000)
)


@register(
    "prom_delta_gauge",
    _DELTA_CTE
    + """
    SELECT event_type, t, round(delta * (extrap / sampled), 6) AS delta_v FROM x
    """,
)
def q_prom_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    out = prom.delta_prom(ev, ["event_type"], "tu", "value", RANGE_US, STEP_US)
    return out.select("event_type", "t", F.round("result", 6).alias("delta_v"))


@register(
    "prom_irate_idelta",
    _EXPLODE_CTE
    + """
    , top2 AS (
      SELECT event_type, t, tu, value,
             row_number() OVER (PARTITION BY event_type, t ORDER BY tu DESC) AS rn
      FROM e
    ), g AS (
      SELECT event_type, t, count(*) AS n,
             arg_max(value, tu) AS last_v, arg_min(value, tu) AS prev_v,
             max(tu) AS last_t, min(tu) AS prev_t
      FROM top2 WHERE rn <= 2 GROUP BY event_type, t
    )
    SELECT event_type, t,
           round(last_v - prev_v, 6) AS idelta,
           round(CASE WHEN last_v >= prev_v
                      THEN (last_v - prev_v) / ((last_t - prev_t) / 1000000)
                      ELSE last_v / ((last_t - prev_t) / 1000000) END, 6) AS irate
    FROM g WHERE n = 2 AND last_t > prev_t
    """,
)
def q_prom_irate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    out = prom.irate_idelta_prom(ev, ["event_type"], "tu", "value", RANGE_US, STEP_US)
    return out.select(
        "event_type",
        "t",
        F.round("idelta", 6).alias("idelta"),
        F.round("irate", 6).alias("irate"),
    )


_LES_SQL = ", ".join(f"({le})" for le in HQ_LES) + ", ('infinity'::DOUBLE)"


@register(
    "prom_histogram_quantile",
    f"""
    WITH les(le) AS (VALUES {_LES_SQL}),
    b AS (
      SELECT event_type, le,
             CAST(count(CASE WHEN value <= le THEN 1 END) AS BIGINT) AS bucket_count
      FROM events CROSS JOIN les GROUP BY event_type, le
    ), w AS (
      SELECT event_type, le, bucket_count,
             lag(le) OVER (PARTITION BY event_type ORDER BY le) AS prev_le,
             lag(bucket_count) OVER (PARTITION BY event_type ORDER BY le) AS prev_cum,
             max(bucket_count) OVER (PARTITION BY event_type) AS max_cum
      FROM b
    ), r AS (
      SELECT *, {HQ_Q} * max_cum AS rank FROM w
    )
    SELECT event_type,
           round(CASE WHEN le = 'infinity'::DOUBLE THEN coalesce(prev_le, 0.0)
                 ELSE coalesce(prev_le, 0.0)
                      + (le - coalesce(prev_le, 0.0))
                        * (rank - coalesce(prev_cum, 0.0))
                        / (bucket_count - coalesce(prev_cum, 0.0)) END, 6)
             AS quantile
    FROM r
    WHERE bucket_count >= rank AND (prev_cum IS NULL OR prev_cum < rank)
    """,
)
def q_prom_hq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    les = [*HQ_LES, float("inf")]
    # literal array + explode on the fact side (no 1-row crossJoin node)
    buckets = (
        ev.withColumn("le", F.explode(F.array(*[F.lit(v) for v in les])))
        .groupBy("event_type", "le")
        .agg(
            F.count(F.when(F.col("value") <= F.col("le"), 1)).alias("bucket_count")
        )
    )
    out = prom.histogram_quantile(buckets, HQ_Q, ["event_type"])
    return out.select("event_type", F.round("quantile", 6).alias("quantile"))


@register(
    "prom_absent_over_time",
    _EXPLODE_CTE
    + """
    , spine AS (SELECT DISTINCT t FROM e),
    present AS (
      SELECT DISTINCT t FROM e WHERE event_type = 'error' AND value > 240
    )
    SELECT s.t, 1 AS absent FROM spine s
    WHERE s.t NOT IN (SELECT t FROM present)
    """,
)
def q_prom_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    s = prom.normalize_samples(ev, ["event_type"], "tu", "value")
    e = prom.explode_steps(s, ["event_type"], "tu", RANGE_US, STEP_US)
    spine = e.select("t").distinct()
    present = (
        e.filter((F.col("event_type") == "error") & (F.col("value") > 240))
        .select("t")
        .distinct()
    )
    return spine.join(present, "t", "left_anti").select(
        "t", F.lit(1).alias("absent")
    )


# --- PromQL binary ops: vector matching on labels --------------------------

@register(
    "prom_binop_ratio",
    # click_sum / view_sum matched on() the shard label (prom_binop_transform)
    """
    WITH a AS (
      SELECT user_id % 10 AS shard, round(sum(value), 2) AS v
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), b AS (
      SELECT user_id % 10 AS shard, round(sum(value), 2) AS v
      FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT a.shard, round(a.v / b.v, 6) AS ratio
    FROM a JOIN b ON a.shard = b.shard
    """,
)
def q_prom_binop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "shard", F.col("user_id") % 10
    )
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("shard")
        .agg(F.round(F.sum("value"), 2).alias("va"))
    )
    b = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("shard")
        .agg(F.round(F.sum("value"), 2).alias("vb"))
    )
    return a.join(b, "shard").select(
        "shard", F.round(F.col("va") / F.col("vb"), 6).alias("ratio")
    )


@register(
    "prom_binop_unless",
    # a UNLESS b: label-sets of a with no match in b → anti-join
    """
    WITH a AS (
      SELECT user_id % 10 AS shard, round(sum(value), 2) AS v
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), b AS (
      SELECT DISTINCT user_id % 10 AS shard
      FROM events WHERE event_type = 'signup' AND value > 230
    )
    SELECT a.shard, a.v FROM a
    WHERE a.shard NOT IN (SELECT shard FROM b)
    """,
)
def q_prom_unless(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "shard", F.col("user_id") % 10
    )
    a = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("shard")
        .agg(F.round(F.sum("value"), 2).alias("v"))
    )
    b = (
        ev.filter((F.col("event_type") == "signup") & (F.col("value") > 230))
        .select("shard")
        .distinct()
    )
    return a.join(b, "shard", "left_anti").select("shard", "v")


@register(
    "prom_label_replace_join",
    # label_replace / label_join (query/label_functions.go:26-31): regex
    # rewrite + concat of label columns
    """
    SELECT DISTINCT event_type,
           regexp_replace(event_type, '^(err).*', '\\1!') AS short_label,
           event_type || '-' || (user_id % 10) AS joined_label
    FROM events
    """,
)
def q_prom_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        F.regexp_replace("event_type", r"^(err).*", "$1!").alias("short_label"),
        F.concat_ws("-", F.col("event_type"), (F.col("user_id") % 10).cast("string"))
        .alias("joined_label"),
    ).distinct()


@register(
    "prom_quantile_over_time",
    # quantile_over_time(0.9, m[12h]): exact nearest-rank-style selection
    # within each range window (Prometheus linear interpolation differs; we
    # use the deterministic rank-selection variant, documented)
    _EXPLODE_CTE
    + """
    , ranked AS (
      SELECT event_type, t, value,
             row_number() OVER (PARTITION BY event_type, t
                                ORDER BY value, tu) AS vr,
             count(*) OVER (PARTITION BY event_type, t) AS n
      FROM e
    )
    SELECT event_type, t, value AS q90
    FROM ranked
    WHERE vr = greatest(CAST(ceil(0.9 * n) AS BIGINT), 1)
    """,
)
def q_prom_quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events_us(spark, sf_dir)
    s = prom.normalize_samples(ev, ["event_type"], "tu", "value")
    e = prom.explode_steps(s, ["event_type"], "tu", RANGE_US, STEP_US)
    w = Window.partitionBy("event_type", "t").orderBy("value", "tu")
    cw = Window.partitionBy("event_type", "t")
    return (
        e.withColumn("vr", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(cw))
        .filter(
            F.col("vr")
            == F.greatest(F.ceil(0.9 * F.col("n")).cast("long"), F.lit(1))
        )
        .select("event_type", "t", F.col("value").alias("q90"))
    )


# ---------------------------------------------------------------------------
# linear-regression-over-range family (agg_functions.go:233-455; reducers in
# engine/prom_function_reducers.go). Oracles replicate the sequential fold
# with a recursive CTE in the same accumulation order → bit-identical.
# ---------------------------------------------------------------------------

_LINREG_REC = _EXPLODE_CTE.replace("WITH s AS", "WITH RECURSIVE s AS") + """
    , o AS (
      SELECT event_type, t, tu, value,
             row_number() OVER w AS rn,
             count(*) OVER (PARTITION BY event_type, t) AS cnt,
             first_value(tu) OVER w AS t0
      FROM e WINDOW w AS (PARTITION BY event_type, t ORDER BY tu)
    ), rec AS (
      SELECT event_type, t, rn, cnt, t0,
             CAST(1 AS DOUBLE) AS n,
             (tu - __REF__) / 1e6 AS sx,
             value AS sy,
             (tu - __REF__) / 1e6 * value AS sxy,
             ((tu - __REF__) / 1e6) * ((tu - __REF__) / 1e6) AS sx2,
             value AS iy, true AS cst
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.event_type, o.t, o.rn, o.cnt, r.t0,
             r.n + 1,
             r.sx + (o.tu - __REF2__) / 1e6,
             r.sy + o.value,
             r.sxy + (o.tu - __REF2__) / 1e6 * o.value,
             r.sx2 + ((o.tu - __REF2__) / 1e6) * ((o.tu - __REF2__) / 1e6),
             r.iy, r.cst AND o.value = r.iy
      FROM o JOIN rec r ON o.event_type = r.event_type AND o.t = r.t
                       AND o.rn = r.rn + 1
    )
"""


@register(
    "prom_deriv",
    _LINREG_REC.replace("__REF__", "t0").replace("__REF2__", "r.t0")
    + """
    SELECT event_type, t,
           CASE WHEN cst THEN 0.0
                ELSE (sxy - sx * sy / n) / (sx2 - sx * sx / n) END AS value
    FROM rec WHERE rn = cnt AND cnt >= 2
    """,
)
def q_prom_deriv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    return prom.linreg_over_time(
        ev, ["event_type"], "tu", "value", RANGE_US, STEP_US, mode="deriv"
    )


@register(
    "prom_predict_linear",
    _LINREG_REC.replace("__REF__", "t").replace("__REF2__", "o.t")
    + """
    SELECT event_type, t,
           CASE WHEN cst THEN iy
                ELSE sy / n - ((sxy - sx * sy / n) / (sx2 - sx * sx / n))
                       * sx / n END
             + CASE WHEN cst THEN 0.0
                    ELSE (sxy - sx * sy / n) / (sx2 - sx * sx / n) END
               * CAST(3600 AS DOUBLE) AS value
    FROM rec WHERE rn = cnt AND cnt >= 2
    """,
)
def q_prom_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    return prom.linreg_over_time(
        ev, ["event_type"], "tu", "value", RANGE_US, STEP_US,
        mode="predict", predict_s=3600.0,
    )


@register(
    "prom_holt_winters",
    _EXPLODE_CTE.replace("WITH s AS", "WITH RECURSIVE s AS") + """
    , o AS (
      SELECT event_type, t, tu, value,
             row_number() OVER (PARTITION BY event_type, t ORDER BY tu) AS rn,
             count(*) OVER (PARTITION BY event_type, t) AS cnt
      FROM e
    ), seed AS (
      SELECT a.event_type, a.t, CAST(2 AS BIGINT) AS rn, a.cnt,
             a.value AS s0,
             CAST(0.5 AS DOUBLE) * b.value
               + CAST(0.5 AS DOUBLE) * (a.value + (b.value - a.value)) AS s1,
             b.value - a.value AS b
      FROM o a JOIN o b ON a.event_type = b.event_type AND a.t = b.t
                       AND a.rn = 1 AND b.rn = 2
    ), rec AS (
      SELECT * FROM seed
      UNION ALL
      SELECT o.event_type, o.t, o.rn, o.cnt,
             r.s1,
             CAST(0.5 AS DOUBLE) * o.value + CAST(0.5 AS DOUBLE)
               * (r.s1 + (CAST(0.5 AS DOUBLE) * (r.s1 - r.s0)
                          + CAST(0.5 AS DOUBLE) * r.b)),
             CAST(0.5 AS DOUBLE) * (r.s1 - r.s0)
               + CAST(0.5 AS DOUBLE) * r.b
      FROM o JOIN rec r ON o.event_type = r.event_type AND o.t = r.t
                       AND o.rn = r.rn + 1
    )
    SELECT event_type, t, s1 AS value FROM rec WHERE rn = cnt AND cnt >= 2
    """,
)
def q_prom_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_us(spark, sf_dir)
    return prom.holt_winters_prom(
        ev, ["event_type"], "tu", "value", RANGE_US, STEP_US, sf=0.5, tf=0.5
    )
