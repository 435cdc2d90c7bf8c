"""Regenerate the pinned Holt-Winters parameters for the
``influxql_func_holt_winters_forecast`` oracle (suite_influxql.py).

The forecast's Nelder-Mead fit is deterministic (grid-seeded, fixed
float order — operators/holt_winters.py), so the fitted constrained
vector per series is a stable function of the sf0.01 data. The oracle
replays the damped-trend recurrence from these pins in DuckDB SQL; the
fit itself is not SQL-expressible. Run this after any change to the
fit trajectory or to the sf0.01 events fixture and paste the printed
VALUES rows into ``_HW_FORECAST_PINS``.

Usage: python tools/gen_hw_pins.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INTERVAL = 43_200_000_000_000   # 12h, matching the suite entry
H = 4


def main() -> None:
    import duckdb

    from opengemini_spark.operators import holt_winters as hw

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type,
               epoch_ns(ts) - epoch_ns(ts) % {INTERVAL} AS t,
               CAST(count(value) AS DOUBLE) AS v
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[tuple[int, float]]] = {}
    for et, t, v in rows:
        series.setdefault(et, []).append((t, v))

    for et, pts in sorted(series.items()):
        times = [p[0] for p in pts]
        vals = [p[1] for p in pts]
        best = _fit(hw, times, vals)
        a, b, _g, phi, l0, b0 = best[:6]
        print(
            f"        ('{et}', {a!r}, {b!r}, {phi!r}, {l0!r}, {b0!r}),"
        )


def _fit(hw, times: list[int], vals: list[float]) -> list[float]:
    """The non-seasonal fit exactly as _hw_series performs it, returning
    the winning constrained vertex."""
    half = INTERVAL // 2

    def round_time(t: int) -> int:
        rem = t % INTERVAL
        return (
            (t // INTERVAL + 1) * INTERVAL if rem > half
            else (t // INTERVAL) * INTERVAL
        )

    y: list[float] = [vals[0]]
    t = round_time(times[0])
    for i in range(1, len(vals)):
        rounded = round_time(times[i])
        if rounded <= t:
            continue
        t += INTERVAL
        while rounded != t:
            y.append(math.nan)
            t += INTERVAL
        y.append(vals[i])
    l0 = hw._WEIGHT * y[0]
    b0 = hw._WEIGHT * (y[1] - y[0]) if not math.isnan(y[1]) else 0.0

    def forecast(params: list[float], horizon: int) -> list[float]:
        hw._constrain(params)
        y_t, phi = y[0], params[3]
        l_t, b_t = params[4], params[5]
        phi_h = phi
        out = [0.0] * (len(y) + horizon)
        out[0] = y_t
        for step in range(1, len(out)):
            base = l_t + phi * b_t
            l_new = params[0] * hw._div(y_t, 1.0) + (1 - params[0]) * base
            b_new = params[1] * (l_new - l_t) + (1 - params[1]) * phi * b_t
            y_t = l_new + phi_h * b_new
            l_t, b_t = l_new, b_new
            phi_h += math.pow(phi, float(step))
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

    base = [0.0, 0.0, 0.0, 0.0, l0, b0]
    best_sse, best = math.inf, None
    g = hw._GUESS_LOWER
    guesses = []
    while g < hw._GUESS_UPPER:
        guesses.append(g)
        g += hw._GUESS_STEP
    for a in guesses:
        for b in guesses:
            for c in guesses:
                for p4 in guesses:
                    x0 = list(base)
                    x0[0], x0[1], x0[2], x0[3] = a, b, c, p4
                    v, params = hw._nelder_mead(sse, x0, hw._EPSILON)
                    if v < best_sse or best is None:
                        best_sse, best = v, params
    return best


if __name__ == "__main__":
    main()
