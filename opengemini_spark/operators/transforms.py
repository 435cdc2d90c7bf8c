"""Transform functions — the derivative / difference / moving family.

openGemini registry ``lib/util/lifted/influx/query/agg_functions.go:137-226``:
derivative, non_negative_derivative, difference, non_negative_difference,
cumulative_sum, moving_average, elapsed, integral, rate, irate.

All are per-series ordered scans in the reference (sort-agg iterators,
``engine/executor/agg_iterator.gen.go``). In Spark each is a window function
over ``Window.partitionBy(series).orderBy(time)`` — a single shuffle on the
series key then a per-partition sort, identical cost shape to the
reference's per-series cursors and fully codegen'd (no Python).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from opengemini_spark.operators.window_agg import SECOND


def _series_window(dims: Sequence[str], time_col: str) -> WindowSpec:
    return Window.partitionBy(*[F.col(d) for d in dims]).orderBy(F.col(time_col))


def derivative(
    df: DataFrame,
    time_col: str,
    value_col: str,
    dims: Sequence[str],
    unit_ns: int = SECOND,
    non_negative: bool = False,
    out_col: str = "derivative",
) -> DataFrame:
    """(v - lag(v)) / (t - lag(t)) * unit; first row per series dropped.

    Ref: FloatDerivativeReduce (agg_functions.go:137); unit defaults 1s.
    """
    w = _series_window(dims, time_col)
    dv = F.col(value_col) - F.lag(value_col).over(w)
    dt = (F.col(time_col) - F.lag(time_col).over(w)).cast("double") / F.lit(float(unit_ns))
    d = dv / dt
    out = df.withColumn(out_col, d).filter(F.col(out_col).isNotNull())
    if non_negative:
        out = out.filter(F.col(out_col) >= 0)
    return out


def difference(
    df: DataFrame,
    time_col: str,
    value_col: str,
    dims: Sequence[str],
    non_negative: bool = False,
    out_col: str = "difference",
) -> DataFrame:
    """v - lag(v) per series (agg_functions.go:151-160)."""
    w = _series_window(dims, time_col)
    out = df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w)).filter(
        F.col(out_col).isNotNull()
    )
    if non_negative:
        out = out.filter(F.col(out_col) >= 0)
    return out


def cumulative_sum(
    df: DataFrame, time_col: str, value_col: str, dims: Sequence[str],
    out_col: str = "cumulative_sum",
) -> DataFrame:
    """Running sum per series (agg_functions.go:161)."""
    w = _series_window(dims, time_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def moving_average(
    df: DataFrame, time_col: str, value_col: str, dims: Sequence[str], n: int,
    out_col: str = "moving_average",
) -> DataFrame:
    """Trailing N-point mean per series; emitted only once N points seen
    (agg_functions.go:167 — openGemini starts output at the Nth point)."""
    w = _series_window(dims, time_col)
    frame = w.rowsBetween(-(n - 1), 0)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn(out_col, F.avg(value_col).over(frame))
        .filter(F.col("__rn") >= n)
        .drop("__rn")
    )


def elapsed(
    df: DataFrame, time_col: str, dims: Sequence[str], unit_ns: int = 1,
    out_col: str = "elapsed",
) -> DataFrame:
    """t - lag(t) in units (agg_functions.go:173); first row dropped."""
    w = _series_window(dims, time_col)
    out = df.withColumn(
        out_col,
        ((F.col(time_col) - F.lag(time_col).over(w)) / F.lit(unit_ns)).cast("long"),
    )
    return out.filter(F.col(out_col).isNotNull())


def integral(
    df: DataFrame, time_col: str, value_col: str, dims: Sequence[str],
    unit_ns: int = SECOND, out_col: str = "integral",
) -> DataFrame:
    """Trapezoidal area under the series (agg_functions.go:179): one row per
    series = Σ (v + lag(v))/2 * Δt/unit."""
    w = _series_window(dims, time_col)
    area = (
        (F.col(value_col) + F.lag(value_col).over(w))
        / 2.0
        * ((F.col(time_col) - F.lag(time_col).over(w)).cast("double") / F.lit(float(unit_ns)))
    )
    return (
        df.withColumn("__area", area)
        .groupBy(*dims)
        .agg(F.sum("__area").alias(out_col))
    )


def rate(
    df: DataFrame, time_col: str, value_col: str, dims: Sequence[str],
    unit_ns: int = SECOND, out_col: str = "rate",
) -> DataFrame:
    """(last - first) / (t_last - t_first) * unit per series
    (agg_functions.go:203 FloatRateReduce)."""
    span = (F.max(time_col) - F.min(time_col)).cast("double") / F.lit(float(unit_ns))
    return df.groupBy(*dims).agg(
        (
            (F.max_by(value_col, time_col) - F.min_by(value_col, time_col)) / span
        ).alias(out_col)
    )


def spread(
    df: DataFrame, value_col: str, dims: Sequence[str], out_col: str = "spread"
) -> DataFrame:
    """max - min per series (agg_functions.go:197)."""
    return df.groupBy(*dims).agg((F.max(value_col) - F.min(value_col)).alias(out_col))


def sessionize(
    df: DataFrame,
    gap_ns: int,
    dims: Sequence[str],
    time_col: str = "time_ns",
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: within each series (user), a new session
    starts at the first event and whenever the time since the previous
    event exceeds ``gap_ns``. Adds ``session_idx`` (1-based per series).

    The standard event-stream prep before per-session feature extraction;
    two window passes (lag + running sum), both over the same per-series
    partitioning — one shuffle total, session counts never leave the
    executor. Skew is bounded by the largest single series.
    """
    w = Window.partitionBy(*dims).orderBy(time_col, *order_cols)
    starts = F.when(
        F.lag(time_col).over(w).isNull()
        | ((F.col(time_col) - F.lag(time_col).over(w)) > gap_ns),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_idx", F.sum(starts).over(w).cast("long")
    )


def session_stats(
    df: DataFrame,
    gap_ns: int,
    dims: Sequence[str],
    time_col: str = "time_ns",
    order_cols: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output: event count,
    start/end time, duration — plus sum(value) when ``value_col`` is
    given. One additional hash aggregation on (dims, session_idx); the
    partial aggregation collapses map-side because sessionize's window
    already co-partitioned the data by the same keys.
    """
    s = sessionize(df, gap_ns, dims, time_col, order_cols)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min(time_col).alias("start_ns"),
        F.max(time_col).alias("end_ns"),
        (F.max(time_col) - F.min(time_col)).alias("duration_ns"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return s.groupBy(*dims, "session_idx").agg(*aggs)
