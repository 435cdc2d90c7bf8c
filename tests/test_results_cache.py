"""Results cache: extent partition/merge/freshness semantics
(results_cache.go parity) + the cached query_range handler end-to-end."""

from opengemini_spark.promql.results_cache import ResultsCache


def _mk(now=10_000_000):
    # freshness horizon = now - 1_000_000; tiny min extent for unit tests
    return ResultsCache(
        max_freshness_ms=1_000_000, min_extent_ms=10, now_ms=lambda: now
    )


def _eval_counter(log):
    def eval_fn(s, e):
        log.append((s, e))
        # one series, one point per 10-unit grid step
        return [
            {"host": "a", "t": t, "value": float(t)}
            for t in range(s, e + 1, 10)
        ]
    return eval_fn


def test_miss_then_full_hit():
    c = _mk()
    log = []
    out1 = c.do("k", 100, 200, 10, _eval_counter(log))
    assert log == [(100, 200)]
    assert len(out1) == 11
    out2 = c.do("k", 100, 200, 10, _eval_counter(log))
    assert log == [(100, 200)]  # nothing re-evaluated
    assert out2 == out1
    assert c.stats.full_hits == 1 and c.stats.misses == 1


def test_partial_hit_evaluates_only_gap():
    c = _mk()
    log = []
    c.do("k", 100, 200, 10, _eval_counter(log))
    out = c.do("k", 100, 400, 10, _eval_counter(log))
    # second call evaluates only the missing tail, on the grid
    assert log == [(100, 200), (210, 400)]
    assert len(out) == 31
    assert {r["t"] for r in out} == set(range(100, 401, 10))
    assert c.stats.partial_hits == 1


def test_no_store_bypasses():
    c = _mk()
    log = []
    c.do("k", 100, 200, 10, _eval_counter(log), cache_control="no-store")
    c.do("k", 100, 200, 10, _eval_counter(log), cache_control="no-store")
    assert log == [(100, 200), (100, 200)]  # evaluated twice, never cached
    assert c._store == {}


def test_freshness_window_not_cached():
    # horizon = 9_000_000: everything beyond it stays uncached
    c = _mk(now=10_000_000)
    log = []
    c.do("k", 8_999_000, 9_500_000, 100, _eval_counter(log))
    ext = c._store["k"]
    assert len(ext) == 1
    assert ext[0].end_ms == 9_000_000  # truncated at the horizon
    # re-request: the fresh tail re-evaluates, the old head is served
    c.do("k", 8_999_000, 9_500_000, 100, _eval_counter(log))
    assert log[1][0] > 9_000_000


def test_min_extent_dropped():
    c = ResultsCache(
        max_freshness_ms=0, min_extent_ms=1000, now_ms=lambda: 10**9
    )
    log = []
    c.do("k", 100, 200, 10, _eval_counter(log))  # 100-wide < 1000
    assert c._store.get("k", []) == []
    c.do("k", 100, 200, 10, _eval_counter(log))
    assert len(log) == 2  # nothing was kept, so it re-evaluates


def test_handler_second_call_skips_spark(spark):
    import time as _time
    from opengemini_spark.api import handle_prom_query_range_cached
    from tests.test_api import _events_registry

    cache = ResultsCache(
        max_freshness_ms=5 * 60 * 1_000_000,
        min_extent_ms=0,
        now_ms=lambda: int(_time.time() * 1_000_000),
    )
    reg = _events_registry()
    args = (
        spark, "/root/testdata/sf0.001", reg,
        'count_over_time(events_value{event_type="click"}[10m])',
        1704067200 + 10 * 86400, 1704067200 + 10 * 86400 + 600, 60,
    )
    r1 = handle_prom_query_range_cached(*args, cache)
    assert r1["status"] == "success", r1
    n_evals = len(cache.stats.evaluated_ranges)
    assert n_evals >= 1
    r2 = handle_prom_query_range_cached(*args, cache)
    assert len(cache.stats.evaluated_ranges) == n_evals  # no Spark work
    assert r2 == r1
