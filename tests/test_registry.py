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


def test_priority_window_matches_round5_rotation():
    """The r5 window: the never-driver-checked entries first (r4's two
    post-gate multimodal ops + this round's three new pipeline ops), then
    ALL 33 entries whose newest driver verdict is r2-era, then r3-era
    entries on round-5-touched code paths (suite.PRIORITY docstring)."""
    window = set(suite.PRIORITY)
    # never driver-checked → must be in the window
    for name in (
        "multimodal_audio_frame_features", "multimodal_image_tile_stats",
        "curate_cluster_representative", "curate_length_bucket_batches",
        "curate_holdout_exact_dedup",
    ):
        assert name in window, name
    # r2-era staleness tail samples (full list in PRIORITY)
    for name in (
        "agg_percentile_approx", "compare_timeshift", "dedup_embedding_lsh",
        "prom_histogram_quantile", "scalar_json", "sketch_countmin_topn",
        "transform_double_ema", "window_sliding_count", "table_function_rca",
    ):
        assert name in window, name
    # round-5-touched code paths
    for name in (
        "dedup_embedding_lsh_highthr", "multimodal_png_real_decode",
        "multimodal_wav_real_decode",
    ):
        assert name in window, name


def test_oracle_keys_subset_of_queries():
    qs, os_ = suite.queries(), suite.oracle_sql()
    assert set(os_) <= set(qs)
    # weak (no-oracle) entries are the deliberate, documented ones only:
    # the percentile sketch is engine-specific by nature and the castor
    # STL detector runs a loess decomposition no SQL can replay.
    # (holt_winters moved OFF this list in round 4 via pinned-fit replay;
    # castor_sigma moved off in round 5 — a recursive CTE carries the
    # flagged-index list and replays the baseline-exclusion recurrence.)
    assert set(qs) - set(os_) == {
        "agg_percentile_approx",
        "castor_stl_anomaly",
    }
