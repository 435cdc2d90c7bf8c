"""holt_winters[_with_fit] forecast — value-level pins for the Nelder-Mead
Holt-Winters port (operators/holt_winters.py; reference
engine/executor/holt_winters_transform.go).

The optimizer is not SQL-expressible, so these tests carry the value-level
burden the oracle gate can't: deterministic re-runs, trend continuation,
constant-series fixed point, seasonal pickup, and the reference's emission
rules (h future buckets at interval steps; with_fit prepends the fitted
range; short series emit nothing).
"""

from __future__ import annotations

import math

import pytest

from opengemini_spark.operators.holt_winters import (
    _hw_series,
    holt_winters_forecast,
)

HOUR = 3_600_000_000_000


def _times(n: int, start: int = 0) -> list[int]:
    return [start + i * HOUR for i in range(n)]


class TestHwSeries:
    def test_constant_series_forecasts_constant(self):
        vals = [42.0] * 12
        start, fc = _hw_series(_times(12), vals, h=4, m=0, interval=HOUR,
                               include_fit=False)
        assert start == 11 * HOUR + HOUR
        assert len(fc) == 4
        for v in fc:
            assert abs(v - 42.0) < 1e-6

    def test_linear_trend_continues(self):
        vals = [float(i) for i in range(20)]
        start, fc = _hw_series(_times(20), vals, h=5, m=0, interval=HOUR,
                               include_fit=False)
        assert len(fc) == 5
        # damped-trend model: forecasts keep rising beyond the last value
        assert all(fc[i] < fc[i + 1] for i in range(4))
        assert fc[0] > vals[-1] - 1.0

    def test_deterministic(self):
        vals = [math.sin(i / 3.0) * 10 + 50 for i in range(24)]
        a = _hw_series(_times(24), vals, 6, 4, HOUR, False)
        b = _hw_series(_times(24), vals, 6, 4, HOUR, False)
        assert a == b

    def test_with_fit_covers_input_range_plus_h(self):
        vals = [float(i % 5) for i in range(15)]
        start, fc = _hw_series(_times(15), vals, h=3, m=5, interval=HOUR,
                               include_fit=True)
        assert start == 0
        assert len(fc) == 15 + 3

    def test_short_series_emits_nothing(self):
        assert _hw_series(_times(1), [1.0], 2, 0, HOUR, False) == (0, [])
        # m greater than the point count
        assert _hw_series(_times(3), [1.0, 2.0, 3.0], 2, 5, HOUR, False) == (0, [])

    def test_seasonal_pattern_pickup(self):
        # strict period-4 pattern; seasonal model should track the cycle
        pattern = [10.0, 20.0, 30.0, 20.0]
        vals = pattern * 6
        _, fc = _hw_series(_times(24), vals, h=4, m=4, interval=HOUR,
                           include_fit=False)
        assert len(fc) == 4
        # the forecast's high aligns with the pattern's phase; the two
        # low-phase slots (0 and 3) sit below the mid/high phases
        assert fc[2] == max(fc)
        assert max(fc[0], fc[3]) < min(fc[1], fc[2])

    def test_gap_fill_and_duplicate_buckets(self):
        # missing bucket at i=2 and a duplicate timestamp at i=5 — initPoints
        # NaN-fills the gap and drops the dup; forecast still emitted
        times = [0, HOUR, 3 * HOUR, 4 * HOUR, 4 * HOUR, 5 * HOUR]
        vals = [1.0, 2.0, 4.0, 5.0, 99.0, 6.0]
        start, fc = _hw_series(times, vals, h=2, m=0, interval=HOUR,
                               include_fit=False)
        assert start == 6 * HOUR
        assert len(fc) == 2
        assert all(not math.isnan(v) for v in fc)

    def test_nan_inf_forecasts_zeroed(self):
        # all-zero series drives y/stm style divisions toward NaN; emission
        # contract says NaN/Inf become 0.0, never propagate
        vals = [0.0] * 8
        _, fc = _hw_series(_times(8), vals, h=3, m=0, interval=HOUR,
                           include_fit=False)
        assert all(math.isfinite(v) for v in fc)


@pytest.mark.usefixtures("spark")
class TestHwDataFrame:
    def test_forecast_per_series(self, spark):
        rows = []
        for s, base in (("a", 10.0), ("b", 100.0)):
            for i in range(12):
                rows.append((s, i * HOUR, base + i))
        df = spark.createDataFrame(rows, "series string, t long, v double")
        out = holt_winters_forecast(df, ["series"], "t", "v", h=3, m=0,
                                    interval_ns=HOUR).collect()
        by_series = {}
        for r in out:
            by_series.setdefault(r["series"], []).append((r["t"], r["hw"]))
        assert set(by_series) == {"a", "b"}
        for s, pts in by_series.items():
            pts.sort()
            assert len(pts) == 3
            assert pts[0][0] == 12 * HOUR  # first future bucket
            assert pts[1][0] - pts[0][0] == HOUR

    def test_influxql_text_path(self, spark, sf_dir):
        from opengemini_spark.influxql import query as iq

        df = iq(
            spark, sf_dir,
            "SELECT holt_winters(count(value), 2, 0) AS hw "
            "FROM events GROUP BY time(12h), event_type",
        )
        rows = df.collect()
        assert rows, "forecast emitted no rows"
        per_series: dict[str, int] = {}
        for r in rows:
            per_series[r["event_type"]] = per_series.get(r["event_type"], 0) + 1
        assert all(n == 2 for n in per_series.values())


def test_reference_exact_forecast():
    """Bit-exact parity with the reference's own TestServer_HoltWinters
    expectation (server_test.go: HOLT_WINTERS(FIRST(value),6,4) over 20m
    buckets) — same grid + Hutt Nelder-Mead trajectory, same floats."""
    times = [1597042800000000000 + i * 1200000000000 for i in range(6)]
    vals = [10.0, 37.0, 48.0, 80.0, 39.0, 25.0]
    start, fc = _hw_series(times, vals, h=6, m=4,
                           interval=1200000000000, include_fit=False)
    assert start == 1597050000000000000
    assert fc == [
        47.997143423738216, 80.01574957657594, 39.0206910442188,
        30.99629387435043, 47.99669178533439, 80.01631956468897,
    ]
