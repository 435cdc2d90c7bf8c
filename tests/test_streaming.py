"""Streaming tests: CREATE STREAM semantics end-to-end with file source +
availableNow trigger; result equivalence vs the batch window agg; late-row
watermark behavior; CQ idempotence."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from opengemini_spark.catalog import load_table
from opengemini_spark.streaming import (
    StreamDef,
    continuous_query_once,
    start_stream,
    stream_agg,
)


@pytest.fixture()
def sd():
    return StreamDef(
        name="ev_30m",
        interval="30 minutes",
        delay="5 minutes",
        dims=["event_type"],
        calls={"n": ("count", "value"), "sum_v": ("sum", "value"),
               "max_v": ("max", "value")},
    )


def test_invalid_call_rejected():
    bad = StreamDef(name="x", interval="1 minute", delay="0 seconds",
                    calls={"m": ("mean", "value")})
    with pytest.raises(ValueError, match="mean"):
        bad.validate()


def test_stream_matches_batch(spark, sf_dir, sd, tmp_path):
    """File-source stream with availableNow must equal the batch agg."""
    src_dir = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    ev.write.parquet(src_dir)

    stream = spark.readStream.schema(ev.schema).parquet(src_dir)
    q = start_stream(stream, sd, dest, ckpt, trigger_available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(dest)
    expect = stream_agg(ev, sd)
    # append mode only emits closed windows; with availableNow the final
    # watermark leaves the last window(s) open — compare on the emitted set
    keys = [r["window_start"] for r in got.select("window_start").distinct().collect()]
    exp_sub = expect.filter(F.col("window_start").isin(keys))
    assert got.count() > 0
    a = {tuple(r) for r in got.select("window_start", "event_type", "n", "sum_v").collect()}
    b = {tuple(r) for r in exp_sub.select("window_start", "event_type", "n", "sum_v").collect()}
    assert a == b
    shutil.rmtree(ckpt, ignore_errors=True)


def test_cq_idempotent(spark, sf_dir, sd, tmp_path):
    dest = str(tmp_path / "cq")
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    continuous_query_once(ev, sd, dest)
    n1 = spark.read.parquet(dest).count()
    continuous_query_once(ev, sd, dest)  # re-run must not duplicate
    n2 = spark.read.parquet(dest).count()
    assert n1 == n2 > 0
