"""PromQL range-vector operators (SURVEY.md §2.4 prom variants, §3.3).

Reference semantics: ``engine/prom_function_reducers.go`` +
``lib/util/lifted/promql2influxql/transpiler.go`` — a range vector at step
``t`` holds the samples in ``(t - range, t]`` per label-set; functions
reduce each window.

Spark-first realization: a point at time ``p`` belongs to every grid step
``t`` with ``p ≤ t < p + range`` — so each row explodes into
``range/step`` step assignments (integer arithmetic on the µs time),
then a single groupBy((labels, t)) aggregates every window in one shuffle.
That replaces Prometheus's per-step window iteration with one set-oriented
pass — the explode factor is the small constant ``range/step``, and the
shuffle key (labels, t) is high-cardinality and skew-free at 100 TB.

Duplicate-timestamp resolution: max(value) per (labels, time) before
windowing (openGemini's last-write-wins needs arrival order, which a batch
scan doesn't have; max is the deterministic analog).

``rate``/``increase`` implement Prometheus's full ``extrapolatedRate``
(counter-reset correction + boundary extrapolation + counter zero-limit),
as deterministic column arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

US = 1_000_000  # microseconds per second


def normalize_samples(
    df: DataFrame, labels: list[str], time_col: str, value_col: str
) -> DataFrame:
    """One sample per (labels, timestamp): max-value dedup."""
    return df.groupBy(*labels, time_col).agg(F.max(value_col).alias("value"))


def explode_steps(
    df: DataFrame,
    labels: list[str],
    time_col: str,
    range_us: int,
    step_us: int,
    phase_us: int = 0,
) -> DataFrame:
    """Assign each sample to every grid step whose window contains it.

    Grid = ``phase_us + k·step_us`` (Prometheus imposes no alignment on a
    range query's start, so the grid carries the start's phase); window
    at t is the CLOSED interval [t - range, t] (the reference lifts the
    pre-3.0 Prometheus range-selector semantics — prom_test.go
    ``delta(up[3m])`` includes the sample exactly ``range`` old).
    """
    # smallest grid point ≥ p … largest grid point ≤ p + range
    t_min = F.expr(
        f"((({time_col} - {phase_us}) + {step_us - 1}) div {step_us})"
        f" * {step_us} + {phase_us}"
    )
    t_max = F.expr(
        f"((({time_col} - {phase_us}) + {range_us}) div {step_us})"
        f" * {step_us} + {phase_us}"
    )
    return (
        df.withColumn("__tmin", t_min.cast("long"))
        .withColumn("__tmax", t_max)
        .filter(F.col("__tmax") >= F.col("__tmin"))
        .withColumn(
            "t", F.explode(F.expr(f"sequence(__tmin, __tmax, {step_us})"))
        )
        .drop("__tmin", "__tmax")
    )


def over_time(
    df: DataFrame,
    labels: list[str],
    time_col: str,
    value_col: str,
    range_us: int,
    step_us: int,
    calls: dict[str, Column],
    phase_us: int = 0,
) -> DataFrame:
    """Generic *_over_time: normalize → explode → one grouped aggregate.

    ``calls`` maps output name → aggregate Column over (value, time).
    """
    s = normalize_samples(df, labels, time_col, value_col)
    e = explode_steps(s, labels, time_col, range_us, step_us, phase_us)
    return e.groupBy(*labels, "t").agg(
        *[c.alias(n) for n, c in calls.items()]
    )


def _extrapolated(
    g: DataFrame,
    labels: list[str],
    range_us: int,
    is_counter: bool,
    per_second: bool,
) -> DataFrame:
    """Prometheus extrapolatedRate over pre-grouped window stats.

    Expects columns: n, first_t, first_v, last_t, last_v, delta (already
    reset-corrected when is_counter). Emits ``result`` per (labels, t).

    All durations are formed as integer-µs DIFFERENCES first and divided
    to seconds after — subtracting two ~1.7e9 doubles loses the 1e-7
    tail, and Prometheus (int64-ms arithmetic) keeps it. The final value
    follows Prometheus's operation order exactly:
    ``delta * (extrapolateToInterval / sampledInterval [/ range])``
    (promql/functions.go extrapolatedRate) — same rounding, bit-equal.
    """
    rng = float(range_us) / US
    sampled = (F.col("last_t") - F.col("first_t")) / US
    to_start = (F.col("first_t") - F.col("t") + F.lit(range_us)) / US
    to_end = (F.col("t") - F.col("last_t")) / US
    avg_ivl = sampled / (F.col("n") - 1)
    threshold = avg_ivl * 1.1

    if is_counter:
        # limit extrapolation below zero for counters
        dur_zero = sampled * (F.col("first_v") / F.col("delta"))
        to_start = F.when(
            (F.col("delta") > 0) & (F.col("first_v") >= 0) & (dur_zero < to_start),
            dur_zero,
        ).otherwise(to_start)

    extrap = (
        sampled
        + F.when(to_start < threshold, to_start).otherwise(avg_ivl / 2)
        + F.when(to_end < threshold, to_end).otherwise(avg_ivl / 2)
    )
    factor = extrap / sampled
    if per_second:
        factor = factor / rng
    result = F.col("delta") * factor
    return (
        g.filter((F.col("n") >= 2) & (sampled > 0))
        .withColumn("result", result)
        .select(*labels, "t", "result")
    )


def _window_stats(
    df: DataFrame,
    labels: list[str],
    time_col: str,
    value_col: str,
    range_us: int,
    step_us: int,
    counter_correct: bool,
    phase_us: int = 0,
) -> DataFrame:
    """Per-(labels, t) stats: n, first/last sample, (reset-corrected) delta."""
    s = normalize_samples(df, labels, time_col, value_col)
    e = explode_steps(s, labels, time_col, range_us, step_us, phase_us)
    if counter_correct:
        w = Window.partitionBy(*labels, "t").orderBy(time_col)
        e = e.withColumn("__prev", F.lag("value").over(w)).withColumn(
            "__reset", F.when(F.col("value") < F.col("__prev"), F.col("__prev")).otherwise(0.0)
        )
        reset_sum = F.sum("__reset")
    else:
        reset_sum = F.lit(0.0)
    g = e.groupBy(*labels, "t").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(time_col).alias("first_t"),
        F.max(time_col).alias("last_t"),
        F.min_by("value", time_col).alias("first_v"),
        F.max_by("value", time_col).alias("last_v"),
        reset_sum.alias("__resets"),
    )
    return g.withColumn(
        "delta", F.col("last_v") - F.col("first_v") + F.col("__resets")
    ).drop("__resets")


def rate_prom(
    df: DataFrame, labels: list[str], time_col: str, value_col: str,
    range_us: int, step_us: int, phase_us: int = 0,
) -> DataFrame:
    """rate(): per-second extrapolated counter rate."""
    g = _window_stats(df, labels, time_col, value_col, range_us, step_us,
                      True, phase_us)
    return _extrapolated(g, labels, range_us, is_counter=True, per_second=True)


def increase_prom(
    df: DataFrame, labels: list[str], time_col: str, value_col: str,
    range_us: int, step_us: int, phase_us: int = 0,
) -> DataFrame:
    """increase(): extrapolated counter delta over the window."""
    g = _window_stats(df, labels, time_col, value_col, range_us, step_us,
                      True, phase_us)
    return _extrapolated(g, labels, range_us, is_counter=True, per_second=False)


def delta_prom(
    df: DataFrame, labels: list[str], time_col: str, value_col: str,
    range_us: int, step_us: int, phase_us: int = 0,
) -> DataFrame:
    """delta(): extrapolated gauge difference (no reset correction)."""
    g = _window_stats(df, labels, time_col, value_col, range_us, step_us,
                      False, phase_us)
    return _extrapolated(g, labels, range_us, is_counter=False, per_second=False)


def irate_idelta_prom(
    df: DataFrame, labels: list[str], time_col: str, value_col: str,
    range_us: int, step_us: int, phase_us: int = 0,
) -> DataFrame:
    """irate()/idelta(): from the last two samples of each window."""
    s = normalize_samples(df, labels, time_col, value_col)
    e = explode_steps(s, labels, time_col, range_us, step_us, phase_us)
    w = Window.partitionBy(*labels, "t").orderBy(F.col(time_col).desc())
    top2 = e.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= 2)
    g = top2.groupBy(*labels, "t").agg(
        F.count(F.lit(1)).alias("n"),
        F.max_by("value", time_col).alias("last_v"),
        F.min_by("value", time_col).alias("prev_v"),
        F.max(time_col).alias("last_t"),
        F.min(time_col).alias("prev_t"),
    )
    span = (F.col("last_t") - F.col("prev_t")) / US
    return (
        g.filter((F.col("n") == 2) & (span > 0))
        .withColumn("idelta", F.col("last_v") - F.col("prev_v"))
        .withColumn(
            "irate",
            F.when(
                F.col("last_v") >= F.col("prev_v"),
                (F.col("last_v") - F.col("prev_v")) / span,
            ).otherwise(F.col("last_v") / span),  # counter reset → from 0
        )
        .select(*labels, "t", "idelta", "irate")
    )


def histogram_quantile(
    buckets: DataFrame,
    q: float,
    labels: list[str],
    le_col: str = "le",
    count_col: str = "bucket_count",
) -> DataFrame:
    """histogram_quantile(q, buckets): linear interpolation within the
    bucket containing rank q·total (Prometheus semantics).

    ``buckets`` holds CUMULATIVE counts per (labels, le), le = double with
    +Inf as the last bucket. Returns one row per label-set.
    """
    w = Window.partitionBy(*labels).orderBy(le_col)
    total = Window.partitionBy(*labels)
    b = (
        buckets.withColumn("prev_le", F.lag(le_col).over(w))
        .withColumn("prev_cum", F.lag(count_col).over(w))
        .withColumn("max_cum", F.max(count_col).over(total))
        .withColumn("rank", F.lit(q) * F.col("max_cum"))
        # promql/quantile.go: a usable histogram needs ≥2 buckets and a
        # +Inf bucket — otherwise the quantile is NaN (prom_test.go
        # Histogram1/2: the stray le=8-only window)
        .withColumn("__nb", F.count(F.lit(1)).over(total))
        .withColumn("__has_inf", F.max(le_col).over(total)
                    == float("inf"))
    )
    hit = b.filter(
        (F.col(count_col) >= F.col("rank"))
        & ((F.col("prev_cum").isNull()) | (F.col("prev_cum") < F.col("rank")))
    )
    lo = F.coalesce(F.col("prev_le"), F.lit(0.0))
    lo_cum = F.coalesce(F.col("prev_cum"), F.lit(0.0))
    # Prometheus computes (rank/count) FIRST, then scales the bucket span
    # (promql/quantile.go bucketQuantile) — same float rounding; a zero
    # in-bucket count yields NaN (0/0), never an error
    cnt = F.col(count_col) - lo_cum
    ratio = F.when(
        cnt == 0, F.lit(float("nan"))
    ).otherwise((F.col("rank") - lo_cum) / cnt)
    interp = lo + (F.col(le_col) - lo) * ratio
    # +Inf bucket → return the upper bound of the last finite bucket
    result = F.when(F.col(le_col) == float("inf"), lo).otherwise(interp)
    result = F.when(
        (F.col("__nb") < 2) | (~F.col("__has_inf")),
        F.lit(float("nan")),
    ).otherwise(result)
    return hit.select(*labels, result.alias("quantile"))


def _sorted_window_arr(
    df: DataFrame, labels: list[str], time_col: str, value_col: str,
    range_us: int, step_us: int, phase_us: int = 0,
) -> DataFrame:
    """(labels, t, arr) — time-sorted window samples per grid step."""
    s = normalize_samples(df, labels, time_col, value_col)
    e = explode_steps(s, labels, time_col, range_us, step_us, phase_us)
    return e.groupBy(*labels, "t").agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(time_col).alias("st"),
                         F.col(value_col).cast("double").alias("v"))
            )
        ).alias("__arr")
    )


def linreg_over_time(
    df: DataFrame,
    labels: list[str],
    time_col: str,
    value_col: str,
    range_us: int,
    step_us: int,
    mode: str = "deriv",
    predict_s: float = 0.0,
    phase_us: int = 0,
) -> DataFrame:
    """deriv() / predict_linear(): simple least squares over the window.

    Mirrors Prometheus ``linearRegression`` (promql/functions.go:
    funcDeriv / funcPredictLinear, ref agg_functions.go:233-455): sums are
    accumulated SEQUENTIALLY in time order over x relative to the
    intercept time — deriv anchors at the first sample, predict_linear at
    the evaluation timestamp — and an all-constant window short-circuits
    to slope 0 / intercept y. The fold runs JVM-side over the sorted
    window array, so accumulation order (and therefore every last bit)
    matches the reference's loop.
    """
    g = _sorted_window_arr(df, labels, time_col, value_col, range_us, step_us, phase_us)
    return linreg_from_windows(g, labels, mode, predict_s)


def linreg_from_windows(
    g: DataFrame,
    labels: list[str],
    mode: str = "deriv",
    predict_s: float = 0.0,
) -> DataFrame:
    """The regression tail over pre-built (labels, t, __arr) windows —
    exposed so an @-pinned predict_linear can re-anchor the SAME window
    at every outer grid time (the anchor is the ``t`` column)."""
    ref = "element_at(__arr, 1).st" if mode == "deriv" else "t"
    fold = (
        "aggregate(__arr,"
        " named_struct('n', 0D, 'sx', 0D, 'sy', 0D, 'sxy', 0D, 'sx2', 0D,"
        "              'iy', cast(null as double), 'cst', true),"
        " (s, p) -> named_struct("
        f"   'n', s.n + 1D,"
        f"   'sx', s.sx + (p.st - {ref}) / 1e6,"
        "    'sy', s.sy + p.v,"
        f"   'sxy', s.sxy + (p.st - {ref}) / 1e6 * p.v,"
        f"   'sx2', s.sx2 + (p.st - {ref}) / 1e6 * ((p.st - {ref}) / 1e6),"
        "    'iy', coalesce(s.iy, p.v),"
        "    'cst', s.cst and p.v = coalesce(s.iy, p.v)),"
        " s -> s)"
    )
    g = g.withColumn("__s", F.expr(fold)).filter(F.size("__arr") >= 2)
    s = F.col("__s")
    cov = s["sxy"] - s["sx"] * s["sy"] / s["n"]
    var = s["sx2"] - s["sx"] * s["sx"] / s["n"]
    slope = F.when(s["cst"], F.lit(0.0)).otherwise(cov / var)
    if mode == "deriv":
        out_col = slope
    else:
        intercept = F.when(s["cst"], s["iy"]).otherwise(
            s["sy"] / s["n"] - slope * s["sx"] / s["n"]
        )
        out_col = intercept + slope * F.lit(float(predict_s))
    return g.select(*labels, "t", out_col.alias("value"))


def holt_winters_prom(
    df: DataFrame,
    labels: list[str],
    time_col: str,
    value_col: str,
    range_us: int,
    step_us: int,
    sf: float,
    tf: float,
    phase_us: int = 0,
) -> DataFrame:
    """holt_winters(v[d], sf, tf): Prometheus double exponential smoothing
    (promql/functions.go funcHoltWinters; reference reducer
    engine/prom_function_reducers.go): s1 seeds at the first sample, the
    trend seeds at the first difference, and the smoothed LAST value of
    the window is emitted. Same-order JVM fold — bit-compatible with the
    reference loop."""
    g = _sorted_window_arr(df, labels, time_col, value_col, range_us, step_us, phase_us)
    # bare decimal literals parse as DECIMAL in Spark SQL — cast to double
    SF = f"cast({sf!r} as double)"
    TF = f"cast({tf!r} as double)"
    fold = (
        "aggregate(slice(__arr, 3, greatest(size(__arr) - 2, 0)),"
        " named_struct("
        "   's0', element_at(__arr, 1).v,"
        f"  's1', {SF} * element_at(__arr, 2).v"
        f"        + (1D - {SF}) * (element_at(__arr, 1).v"
        "           + (element_at(__arr, 2).v - element_at(__arr, 1).v)),"
        "   'b', element_at(__arr, 2).v - element_at(__arr, 1).v),"
        " (s, p) -> named_struct("
        "   's0', s.s1,"
        f"  's1', {SF} * p.v + (1D - {SF})"
        f"        * (s.s1 + ({TF} * (s.s1 - s.s0) + (1D - {TF}) * s.b)),"
        f"  'b', {TF} * (s.s1 - s.s0) + (1D - {TF}) * s.b),"
        " s -> s.s1)"
    )
    return (
        g.filter(F.size("__arr") >= 2)
        .select(*labels, "t", F.expr(fold).alias("value"))
    )
