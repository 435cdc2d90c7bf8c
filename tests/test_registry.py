"""Registry invariants: the driver checks only the first 50 queries()
entries, so the ordering is part of the contract (VERDICT r1 item 2)."""

import sys

sys.path.insert(0, "/root/repo")

from opengemini_spark import suite


def test_priority_window_is_exactly_50_unique_registered_names():
    qs = list(suite.queries())
    assert len(suite.PRIORITY) == 50
    assert len(set(suite.PRIORITY)) == 50
    assert qs[:50] == list(suite.PRIORITY)
    assert len(qs) == len(set(qs))


def test_priority_window_samples_every_layer():
    window = set(suite.PRIORITY)
    for prefix in ("influxql_", "prom_", "promql_", "scalar_", "graph_"):
        assert any(n.startswith(prefix) for n in window), prefix
    for name in ("transform_ema", "transform_holt_winters", "sink_select_into"):
        assert name in window


def test_oracle_keys_subset_of_queries():
    qs, os_ = suite.queries(), suite.oracle_sql()
    assert set(os_) <= set(qs)
    # weak (no-oracle) entries are the deliberate, documented ones only:
    # the percentile sketch is engine-specific by nature; the holt_winters
    # forecast emits Nelder-Mead-optimized future points and the castor
    # sigma detector excludes prior anomalies from its rolling baseline —
    # both sequential-stateful shapes SQL cannot replay (rows-only gate).
    assert set(qs) - set(os_) == {
        "agg_percentile_approx",
        "influxql_func_holt_winters_forecast",
        "castor_sigma_anomaly",
    }
