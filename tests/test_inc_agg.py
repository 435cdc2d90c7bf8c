"""Incremental query (inc agg): iteration merge correctness, missing-state
error (FailedGetIncAggItem parity), and multi-iteration accumulation."""

import pytest
from pyspark.sql import functions as F

from opengemini_spark.operators import inc_agg

SPEC = [("count", "v"), ("sum", "v"), ("mean", "v"), ("min", "v"), ("max", "v")]
HOUR_NS = 3_600_000_000_000


def _rows(spark, ids):
    return spark.createDataFrame(
        [(i, (i % 3) * HOUR_NS + i, float(i)) for i in ids],
        ["id", "time_ns", "v"],
    )


def test_three_iterations_equal_one_shot(spark, tmp_path):
    state = str(tmp_path / "state")
    batches = [range(0, 30), range(30, 70), range(70, 100)]
    for k, ids in enumerate(batches):
        final = inc_agg.inc_window_agg(
            spark, _rows(spark, ids), state, "q1", k, HOUR_NS, SPEC
        )
    oneshot = inc_agg.inc_window_agg(
        spark, _rows(spark, range(100)), str(tmp_path / "s2"), "q2", 0,
        HOUR_NS, SPEC,
    )
    a = {r["time"]: r.asDict() for r in final.collect()}
    b = {r["time"]: r.asDict() for r in oneshot.collect()}
    assert set(a) == set(b) and len(a) == 3
    for t in a:
        assert a[t]["count_v"] == b[t]["count_v"]
        assert a[t]["min_v"] == b[t]["min_v"]
        assert a[t]["max_v"] == b[t]["max_v"]
        assert a[t]["sum_v"] == pytest.approx(b[t]["sum_v"])
        assert a[t]["mean_v"] == pytest.approx(b[t]["mean_v"])


def test_missing_prev_state_errors(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="FailedGetIncAggItem"):
        inc_agg.inc_window_agg(
            spark, _rows(spark, range(5)), str(tmp_path / "s"), "q", 3,
            HOUR_NS, SPEC,
        )


def test_unsupported_function_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="inc query supports"):
        inc_agg.inc_window_agg(
            spark, _rows(spark, range(5)), str(tmp_path / "s"), "q", 0,
            HOUR_NS, [("median", "v")],
        )


def test_dims_partition_state(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, HOUR_NS, "a", 1.0), (2, HOUR_NS, "b", 10.0)],
        ["id", "time_ns", "tag", "v"],
    )
    state = str(tmp_path / "s")
    inc_agg.inc_window_agg(
        spark, df, state, "q", 0, HOUR_NS, [("sum", "v")], dims=["tag"]
    )
    more = spark.createDataFrame(
        [(3, HOUR_NS, "a", 5.0)], ["id", "time_ns", "tag", "v"]
    )
    final = inc_agg.inc_window_agg(
        spark, more, state, "q", 1, HOUR_NS, [("sum", "v")], dims=["tag"]
    )
    out = {r["tag"]: r["sum_v"] for r in final.collect()}
    assert out == {"a": 6.0, "b": 10.0}
