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


def test_priority_window_matches_round6_rotation():
    """The r6 window: ALL entries that have never had a driver verdict
    first (everything registered this round), then changed-semantics
    re-verdicts, then 14 of the 40 r3-era verdicts (suite.PRIORITY
    docstring)."""
    import json, pathlib

    window = set(suite.PRIORITY)
    assert len(suite.PRIORITY) == 50 == len(window)
    # every registered entry with NO driver verdict in any CORRECTNESS
    # file must be in the window — first verdicts outrank rotation
    seen = set()
    for f in pathlib.Path("/root/repo").glob("CORRECTNESS_r0*.json"):
        seen |= set(json.loads(f.read_text()))
    never = set(suite.queries()) - seen
    assert never <= window, sorted(never - window)
    # changed oracle/code this round → must be re-verdicted
    for name in (
        "agg_percentile_approx", "castor_stl_anomaly",
        "dedup_embedding_lsh", "dedup_embedding_lsh_highthr",
        "similarity_quantize_int8", "similarity_random_projection",
        "curate_cluster_representative",
    ):
        assert name in window, name
    # r3-era staleness tail samples (14-name list in PRIORITY part c)
    for name in (
        "agg_basic", "dedup_embedding_cosine", "influxql_join_stmt",
        "join_inner", "curate_pack_sequences",
    ):
        assert name in window, name


def test_oracle_keys_subset_of_queries():
    qs, os_ = suite.queries(), suite.oracle_sql()
    assert set(os_) <= set(qs)
    # since round 6 EVERY registered entry has a driver oracle: the
    # percentile sketch got a bounded-error interval oracle (the GK
    # rank-error contract checked against exact rank values), and the
    # castor STL detector got a pinned-component replay (tools/
    # gen_stl_pins.py) — the loess is pinned, everything downstream is
    # independently recomputed in SQL. (holt_winters moved off the weak
    # list in r4, castor_sigma in r5, these two in r6.)
    assert set(qs) - set(os_) == set()
