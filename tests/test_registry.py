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


def test_priority_window_matches_round4_rotation():
    """The r4 window re-greens the OLDEST driver verdicts (all 38 r1-era
    entries), plus everything changed this round, plus r2-era entries on
    round-4-touched code paths (suite.PRIORITY docstring)."""
    window = set(suite.PRIORITY)
    # the r1-era family samples: fills, selectors, transforms, text/dedup
    for name in (
        "window_fill_linear", "selector_first_last", "transform_integral",
        "dedup_exact", "text_lang_id", "multimodal_frame_sample",
        "curate_keep_list", "union_all_by_name",
    ):
        assert name in window, name
    # entries changed/added in round 4 get driver verdicts this round
    for name in (
        "dedup_minhash_lsh", "influxql_func_holt_winters_forecast",
        "text_repetition_signals", "curate_quality_percentile_filter",
    ):
        assert name in window, name


def test_oracle_keys_subset_of_queries():
    qs, os_ = suite.queries(), suite.oracle_sql()
    assert set(os_) <= set(qs)
    # weak (no-oracle) entries are the deliberate, documented ones only:
    # the percentile sketch is engine-specific by nature and the castor
    # sigma/STL detectors exclude prior anomalies from their rolling
    # baselines — sequential-stateful shapes SQL cannot replay
    # (rows-only gate).
    # (The holt_winters forecast moved OFF this list in round 4: its
    # deterministic fit is pinned and the oracle replays the recurrence.)
    assert set(qs) - set(os_) == {
        "agg_percentile_approx",
        "castor_sigma_anomaly",
        "castor_stl_anomaly",
    }
