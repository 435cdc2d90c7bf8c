"""Scalar-function query registrations (SURVEY.md §2.8).

One query per function family — math, string, json, time, url, network —
each exercising several registry entries at once with a DuckDB oracle.
Float-valued functions round identically on both sides; everything else is
integer/string-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengemini_spark.catalog import load_table
from opengemini_spark.functions import network as net
from opengemini_spark.functions import scalar as sc
from opengemini_spark.suite import register


@register(
    "scalar_math",
    """
    WITH t AS (SELECT event_id, round(value, 2) AS x FROM events)
    SELECT event_id,
           round(abs(x - 100), 2) AS abs_v,
           round(sin(x / 100), 6) AS sin_v,
           round(sqrt(abs(x)), 6) AS sqrt_v,
           round(pow(x / 100, 2), 6) AS pow_v,
           CAST(floor(x) AS BIGINT) AS floor_v,
           CAST(ceil(x) AS BIGINT) AS ceil_v,
           round(x, 1) AS round_v,
           round(CASE WHEN x >= 0 THEN floor(x * 10) / 10
                      ELSE -(floor(-x * 10) / 10) END, 1) AS trunc_v,
           CAST(sign(x - 100) AS DOUBLE) AS sgn_v,
           round(least(greatest(x, 50.0), 150.0), 2) AS clamp_v,
           round(greatest(x, abs(x - 100)), 2) AS row_max_v,
           CASE WHEN x > 100 THEN 'high' ELSE 'low' END AS if_v
    FROM t
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.round("value", 2).alias("x")
    )
    x = F.col("x")
    return ev.select(
        "event_id",
        F.round(sc.MATH_FNS["abs"](x - 100), 2).alias("abs_v"),
        F.round(sc.MATH_FNS["sin"](x / 100), 6).alias("sin_v"),
        F.round(sc.MATH_FNS["sqrt"](F.abs(x)), 6).alias("sqrt_v"),
        F.round(sc.MATH_FNS["pow"](x / 100, F.lit(2)), 6).alias("pow_v"),
        sc.MATH_FNS["floor"](x).cast("long").alias("floor_v"),
        sc.MATH_FNS["ceil"](x).cast("long").alias("ceil_v"),
        F.round(x, 1).alias("round_v"),
        F.round(sc.truncate(x, 1), 1).alias("trunc_v"),
        sc.MATH_FNS["sgn"](x - 100).cast("double").alias("sgn_v"),
        F.round(sc.clamp(x, 50.0, 150.0), 2).alias("clamp_v"),
        F.round(sc.row_max(x, F.abs(x - 100)), 2).alias("row_max_v"),
        sc.if_fn(x > 100, F.lit("high"), F.lit("low")).alias("if_v"),
    )


@register(
    "scalar_string",
    """
    SELECT doc_id,
           length(text) AS strlen_v,
           upper(lang) AS upper_v,
           substr(text, 1, 12) AS substr_v,
           reverse(source) AS reverse_v,
           lpad(lang, 5, '_') AS lpad_v,
           rpad(lang, 5, '.') AS rpad_v,
           replace(source, 'src', 's') AS replace_v,
           split_part(text, ' ', 2) AS split_part_v,
           instr(text, 'spark') AS strpos_v,
           CAST(levenshtein(lang, 'en') AS INT) AS lev_v,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word
    FROM documents
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        sc.strlen("text").alias("strlen_v"),
        F.upper("lang").alias("upper_v"),
        sc.substr("text", 1, 12).alias("substr_v"),
        F.reverse("source").alias("reverse_v"),
        F.lpad("lang", 5, "_").alias("lpad_v"),
        F.rpad("lang", 5, ".").alias("rpad_v"),
        F.replace(F.col("source"), F.lit("src"), F.lit("s")).alias("replace_v"),
        sc.split_part("text", " ", 2).alias("split_part_v"),
        sc.strpos("text", "spark").alias("strpos_v"),
        sc.levenshtein_distance("lang", F.lit("en")).alias("lev_v"),
        sc.regexp_extract("text", "^([a-z]+)", 1).alias("first_word"),
    )


@register(
    "scalar_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.missing') AS missing_v,
           CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                THEN 'number' ELSE 'null' END AS typeof_v
    FROM events WHERE event_type = 'view'
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    k = sc.json_extract_scalar("props", "$.k")
    return ev.select(
        "event_id",
        k.cast("long").alias("k"),
        sc.json_extract_scalar("props", "$.missing").alias("missing_v"),
        F.when(k.isNotNull(), F.lit("number")).otherwise(F.lit("null")).alias(
            "typeof_v"
        ),
    )


@register(
    "scalar_time_prom",
    # prom time functions; day_of_week is Prometheus-style 0=Sunday, which
    # is DuckDB's dayofweek convention (Spark's is 1=Sunday, shifted in the
    # wrapper).
    """
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS year_v,
           CAST(month(ts) AS BIGINT) AS month_v,
           CAST(dayofmonth(ts) AS BIGINT) AS dom_v,
           CAST(dayofweek(ts) AS BIGINT) AS dow_v,
           CAST(dayofyear(ts) AS BIGINT) AS doy_v,
           CAST(hour(ts) AS BIGINT) AS hour_v,
           CAST(minute(ts) AS BIGINT) AS minute_v,
           CAST(extract(day FROM last_day(ts)) AS BIGINT) AS dim_v
    FROM events
    """,
)
def q_scalar_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        sc.year_prom("ts").alias("year_v"),
        sc.month_prom("ts").alias("month_v"),
        sc.day_of_month_prom("ts").alias("dom_v"),
        sc.day_of_week_prom("ts").alias("dow_v"),
        sc.day_of_year_prom("ts").alias("doy_v"),
        sc.hour_prom("ts").alias("hour_v"),
        sc.minute_prom("ts").alias("minute_v"),
        sc.days_in_month_prom("ts").alias("dim_v"),
    )


_URL_EXPR = (
    "'https://' || source || '.example.com:8080/docs/' || lang"
    " || '?q=' || doc_id || '#frag'"
)


@register(
    "scalar_url",
    f"""
    WITH u AS (SELECT doc_id, {_URL_EXPR} AS url FROM documents)
    SELECT doc_id,
           regexp_extract(url, '{sc.URL_PART_RE["protocol"]}', 1) AS protocol,
           regexp_extract(url, '{sc.URL_PART_RE["host"]}', 1) AS host,
           regexp_extract(url, '{sc.URL_PART_RE["port"]}', 1) AS port,
           regexp_extract(url, '{sc.URL_PART_RE["path"]}', 1) AS path,
           regexp_extract(url, '{sc.URL_PART_RE["query"]}', 1) AS query,
           regexp_extract(url, '{sc.URL_PART_RE["fragment"]}', 1) AS fragment
    FROM u
    """,
)
def q_scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com:8080/docs/"),
            F.col("lang"), F.lit("?q="), F.col("doc_id").cast("string"),
            F.lit("#frag"),
        ),
    )
    return d.select(
        "doc_id",
        *[sc.url_extract("url", p).alias(p) for p in
          ("protocol", "host", "port", "path", "query", "fragment")],
    )


@register(
    "scalar_network_ip",
    # synthesize a deterministic ipv4 per user, then exercise the ip_*
    # family: prefix/mask, subnet min/max, CIDR membership — all integer ops.
    """
    WITH u AS (
      SELECT DISTINCT user_id,
             '10.' || (user_id % 256) || '.' || (user_id * 7 % 256) || '.'
                   || (user_id * 13 % 256) AS ip
      FROM events
    ), p AS (
      SELECT user_id, ip,
             (10 * 16777216
              + (user_id % 256) * 65536
              + (user_id * 7 % 256) * 256
              + (user_id * 13 % 256)) AS ip_int
      FROM u
    )
    SELECT user_id, ip,
           ip_int,
           ((ip_int // 256) * 256) AS net24_int,
           (10 % 256) || '.' || ((ip_int // 65536) % 256) || '.'
             || ((ip_int // 256) % 256) || '.0' AS ip_prefix24,
           CASE WHEN (ip_int // 8388608) = ((10 * 16777216) // 8388608)
                THEN true ELSE false END AS in_10_0_0_0_9
    FROM p
    """,
)
def q_scalar_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().withColumn(
        "ip",
        F.concat_ws(
            ".",
            F.lit("10"),
            (F.col("user_id") % 256).cast("string"),
            (F.col("user_id") * 7 % 256).cast("string"),
            (F.col("user_id") * 13 % 256).cast("string"),
        ),
    )
    return u.select(
        "user_id",
        "ip",
        net.ip_to_int("ip").alias("ip_int"),
        F.shiftleft(F.shiftright(net.ip_to_int("ip"), 8), 8).alias("net24_int"),
        net.ip_prefix("ip", 24).alias("ip_prefix24"),
        net.ip_in_range("ip", "10.0.0.0/9").alias("in_10_0_0_0_9"),
    )
