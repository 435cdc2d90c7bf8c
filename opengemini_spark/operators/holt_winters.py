"""InfluxQL ``holt_winters[_with_fit](agg(f), N, S)`` — damped-trend,
multiplicative-seasonal Holt-Winters FORECAST.

Semantics ported from the reference's HoltWintersTransform
(``engine/executor/holt_winters_transform.go``, itself lifted from the
public InfluxDB 1.x ``query/functions.go`` Holt-Winters reducer):

- input is the GROUP BY time(interval) aggregated series per tag set;
- times are rounded to the interval, duplicate buckets dropped, gaps
  NaN-filled (``initPoints``, holt_winters_transform.go:242);
- initial level/trend/seasonal state from the first m points
  (``initStartPara`` / ``initParameters``, :288-323);
- parameters (alpha, beta, gamma, phi) are fit by minimizing SSE with a
  Nelder-Mead simplex search seeded from a {0.3, 0.7}⁴ grid
  (hwGuessLower/Upper/Step = 0.3/1.0/0.4, epsilon 1e-4, :324-347);
- the damped-trend multiplicative recurrence is ``next()`` (:138-145);
- ``holt_winters`` emits the N forecast buckets AFTER the last input
  bucket (start = last_time + interval); ``_with_fit`` emits the fitted
  values over the input range followed by the N forecast buckets
  (``setForecated``, :146-164); NaN/Inf forecasts are zeroed.

The Nelder-Mead here is a standard reflection/expansion/contraction/
shrink simplex (coefficients 1, 2, 0.5, 0.5, max 1000 iterations) —
algorithm-level parity with the reference's optimizer, not bit-level:
simplex trajectories depend on implementation details, so this operator
is registered with a rows-only driver check (no SQL oracle can express
the optimizer anyway).

Scale: one ``applyInPandas`` over the (already aggregated, so small —
one row per time bucket) series, partitioned by tag set. The optimizer
runs per series on ≤ a few thousand buckets; work is proportional to
series count, embarrassingly parallel, no shuffle beyond the group-by.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference constants (holt_winters_transform.go:28-42)
_WEIGHT = 0.5
_EPSILON = 1.0e-4
_GUESS_LOWER = 0.3
_GUESS_UPPER = 1.0
_GUESS_STEP = 0.4


def _nelder_mead(
    objfunc, start: list[float], epsilon: float, scale: float = 1.0,
    max_iter: int = 1000, alpha: float = 1.0, beta: float = 0.5,
    gamma: float = 2.0,
):
    """Exact port of the reference's Hutt-style simplex
    (lib/util/lifted/influxdb/query/neldermead/neldermead.go): pn/qn
    initial simplex, largest/second-largest/smallest vertex bookkeeping,
    outside/inside contraction, halving toward the best vertex with only
    f[vg]/f[vh] re-evaluated, stddev-of-f convergence test, and a FINAL
    objfunc call on the winning vertex. The objective MUTATES its input
    vertex (constrain + seasonal-slot writes) exactly like the Go code —
    that feedback is part of the trajectory, so it is preserved."""
    n = len(start)
    v = [[0.0] * n for _ in range(n + 1)]
    f = [0.0] * (n + 1)
    pn = scale * (math.sqrt(n + 1.0) - 1 + n) / (n * math.sqrt(2.0))
    qn = scale * (math.sqrt(n + 1.0) - 1) / (n * math.sqrt(2.0))
    for i in range(n):
        v[0][i] = start[i]
    for i in range(1, n + 1):
        for j in range(n):
            v[i][j] = (pn if i - 1 == j else qn) + start[j]
    for j in range(n + 1):
        f[j] = objfunc(v[j])
    for _ in range(1, max_iter + 1):
        vg = 0
        vs = 0
        for i in range(n + 1):
            if f[i] > f[vg]:
                vg = i
            if f[i] < f[vs]:
                vs = i
        vh = vs
        for i in range(n + 1):
            if f[i] > f[vh] and f[i] < f[vg]:
                vh = i
        vm = [
            sum(v[m_][i] for m_ in range(n + 1) if m_ != vg) / n
            for i in range(n)
        ]
        vr = [vm[i] + alpha * (vm[i] - v[vg][i]) for i in range(n)]
        fr = objfunc(vr)
        if fr < f[vh] and fr >= f[vs]:
            for i in range(n):
                v[vg][i] = vr[i]
            f[vg] = fr
        if fr < f[vs]:
            ve = [vm[i] + gamma * (vr[i] - vm[i]) for i in range(n)]
            fe = objfunc(ve)
            if fe < fr:
                for i in range(n):
                    v[vg][i] = ve[i]
                f[vg] = fe
            else:
                for i in range(n):
                    v[vg][i] = vr[i]
                f[vg] = fr
        if fr >= f[vh]:
            if fr < f[vg] and fr >= f[vh]:
                vc = [vm[i] + beta * (vr[i] - vm[i]) for i in range(n)]
            else:
                vc = [vm[i] - beta * (vm[i] - v[vg][i]) for i in range(n)]
            fc = objfunc(vc)
            if fc < f[vg]:
                for i in range(n):
                    v[vg][i] = vc[i]
                f[vg] = fc
            else:
                for row in range(n + 1):
                    if row != vs:
                        for i in range(n):
                            v[row][i] = v[vs][i] + (v[row][i] - v[vs][i]) / 2.0
                f[vg] = objfunc(v[vg])
                f[vh] = objfunc(v[vh])
        favg = sum(f) / (n + 1)
        s = math.sqrt(sum((x - favg) ** 2.0 for x in f) / n)
        if s < epsilon:
            break
    vs = 0
    for i in range(n + 1):
        if f[i] < f[vs]:
            vs = i
    parameters = list(v[vs])
    fmin = objfunc(v[vs])
    return fmin, parameters


def _constrain(x: list[float]) -> None:
    for i in range(4):
        x[i] = min(1.0, max(0.0, x[i]))


def _div(n: float, d: float) -> float:
    """IEEE-754 division — Go float semantics: x/0 = ±Inf, 0/0 = NaN (Python
    raises instead; the reference relies on Inf/NaN propagating through the
    recurrence and being zeroed at emission)."""
    try:
        return n / d
    except ZeroDivisionError:
        if n == 0.0 or math.isnan(n):
            return math.nan
        neg = (math.copysign(1.0, n) < 0) != (math.copysign(1.0, d) < 0)
        return -math.inf if neg else math.inf


def _hw_series(
    times: list[int], vals: list[float], h: int, m: int, interval: int,
    include_fit: bool,
) -> tuple[int, list[float]]:
    """Returns (start_time, forecast values) for one series; empty when the
    reference would emit nothing (m > len or len < 2, Emit :268)."""
    if m > len(times) or len(times) < 2:
        return 0, []
    seasonal = m >= 2
    half = interval // 2

    def round_time(t: int) -> int:
        rem = t % interval
        return (t // interval + 1) * interval if rem > half else (t // interval) * interval

    # initPoints: NaN-fill interval gaps, drop duplicate buckets
    y: list[float] = [vals[0]]
    t = round_time(times[0])
    for i in range(1, len(vals)):
        rounded = round_time(times[i])
        if rounded <= t:
            continue
        t += interval
        while rounded != t:
            y.append(math.nan)
            t += interval
        y.append(vals[i])

    # initStartPara
    if seasonal:
        l0 = sum((1.0 / m) * y[i] for i in range(m) if not math.isnan(y[i]))
        b0 = sum(
            1.0 / (m * m) * (y[m + i] - y[i])
            for i in range(m)
            if m + i < len(y) and not math.isnan(y[i]) and not math.isnan(y[m + i])
        )
        s0 = [0.0 if math.isnan(y[i]) else _div(y[i], l0) for i in range(m)]
    else:
        l0 = _WEIGHT * y[0]
        b0 = _WEIGHT * (y[1] - y[0]) if not math.isnan(y[1]) else 0.0
        s0 = []

    def forecast(params: list[float], horizon: int) -> list[float]:
        # operates ON the passed vertex like the Go code: constrain and
        # the rolling seasonal-slot writes mutate `params` in place
        # (forecast() aliases r.parameters — that feedback into the
        # simplex is part of the reference trajectory)
        _constrain(params)
        y_t, phi = y[0], params[3]
        l_t, b_t = params[4], params[5]
        phi_h = phi
        mm = len(params) - 6
        if mm == 1:
            params[6] = 1.0
        so = mm - 1
        out = [0.0] * (len(y) + horizon)
        out[0] = y_t
        for step in range(1, len(out)):
            stm = stmh = 1.0
            if seasonal:
                hm = step % mm
                stm = params[6 + (step - mm + so) % mm]
                stmh = params[6 + (step - mm + hm + so) % mm]
            base = l_t + phi * b_t
            l_new = params[0] * _div(y_t, stm) + (1 - params[0]) * base
            b_new = params[1] * (l_new - l_t) + (1 - params[1]) * phi * b_t
            s_new = params[2] * _div(y_t, base) + (1 - params[2]) * stm
            y_t = (l_new + phi_h * b_new) * stmh
            l_t, b_t = l_new, b_new
            phi_h += math.pow(phi, float(step))
            if seasonal:
                params[6 + (step + so) % mm] = s_new
                so += 1
            out[step] = y_t
        return out

    def sse(params: list[float]) -> float:
        fc = forecast(params, 0)
        total = 0.0
        for i in range(len(y)):
            if not math.isnan(y[i]):
                if math.isnan(fc[i]):
                    return math.inf
                d = fc[i] - y[i]
                total += d * d
        return total

    base = [0.0, 0.0, 0.0, 0.0, l0, b0, *s0]
    best_sse, best = math.inf, None
    g = _GUESS_LOWER
    guesses = []
    while g < _GUESS_UPPER:
        guesses.append(g)
        g += _GUESS_STEP
    for a in guesses:
        for b in guesses:
            for c in guesses:
                for p4 in guesses:
                    x0 = list(base)
                    x0[0], x0[1], x0[2], x0[3] = a, b, c, p4
                    v, params = _nelder_mead(sse, x0, _EPSILON)
                    if v < best_sse or best is None:
                        best_sse, best = v, params
    fc = forecast(best, h)
    fc = [0.0 if (math.isnan(v) or math.isinf(v)) else v for v in fc]
    if include_fit:
        # setForecated: startTime is the RAW first point time (:156)
        return times[0], fc
    return times[-1] + interval, fc[len(fc) - h:]


def holt_winters_forecast(
    df: DataFrame,
    series_cols: list[str],
    time_col: str,
    value_col: str,
    h: int,
    m: int,
    interval_ns: int,
    include_fit: bool = False,
) -> DataFrame:
    """Forecast h future buckets per series; see module docstring."""
    out_fields = [T.StructField(c, df.schema[c].dataType) for c in series_cols]
    out_fields += [
        T.StructField(time_col, T.LongType()),
        T.StructField("hw", T.DoubleType()),
    ]
    schema = T.StructType(out_fields)
    base_cols = [f.name for f in schema.fields]

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        start, fc = _hw_series(
            pdf[time_col].to_list(),
            pdf[value_col].astype(float).to_list(),
            h, m, interval_ns, include_fit,
        )
        if not fc:
            return pd.DataFrame({c: pd.Series(dtype=object) for c in base_cols})
        out = pd.DataFrame(
            {
                time_col: [start + k * interval_ns for k in range(len(fc))],
                "hw": fc,
            }
        )
        for c in series_cols:
            out[c] = pdf[c].iloc[0]
        return out[base_cols]

    if series_cols:
        grouped = df.groupBy(*series_cols)
    else:
        grouped = df.groupBy(F.lit(1).alias("__g"))
        schema = T.StructType(
            [T.StructField("__g", T.IntegerType()), *schema.fields]
        )

        def apply_g(pdf: pd.DataFrame) -> pd.DataFrame:
            # grouping by a literal EXPRESSION: Spark does not add it to
            # the passed frame — drop defensively
            out = apply(pdf.drop(columns="__g", errors="ignore"))
            out["__g"] = 1
            return out

        return grouped.applyInPandas(apply_g, schema).drop("__g")
    return grouped.applyInPandas(apply, schema)
