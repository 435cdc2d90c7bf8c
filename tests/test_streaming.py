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


def test_incremental_agg_state_across_restarts(spark, sf_dir, tmp_path):
    """inc-query analog: running per-series totals survive a restart via
    checkpointed state (applyInPandasWithState)."""
    from opengemini_spark.streaming.stateful import incremental_agg

    src_dir = str(tmp_path / "inc_src")
    dest = str(tmp_path / "inc_dest")
    ckpt = str(tmp_path / "inc_ckpt")

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    half1 = ev.limit(4000)
    half1.write.mode("append").parquet(src_dir)

    schema = ev.schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src_dir)
        out = incremental_agg(stream, "event_type", "value")

        def sink(batch_df, batch_id):
            # upsert sink stand-in: append; readers take the latest totals
            batch_df.write.mode("append").parquet(dest)

        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # second tranche arrives; restart resumes from checkpointed state
    ev.write.mode("append").parquet(src_dir)  # full set again → totals add up
    run_once()

    got = spark.read.parquet(dest)
    # last emitted row per series = running totals over both tranches
    latest = got.groupBy("series").agg(F.max("n").alias("n"))
    expect = (
        half1.groupBy("event_type").agg(F.count(F.lit(1)).alias("n1"))
        .join(
            ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n2")),
            "event_type",
        )
        .select(
            F.col("event_type").alias("series"),
            (F.col("n1") + F.col("n2")).alias("n"),
        )
    )
    a = {r["series"]: r["n"] for r in latest.collect()}
    b = {r["series"]: r["n"] for r in expect.collect()}
    assert a == b


def test_subscription_fanout(spark, sf_dir, sd, tmp_path):
    """Subscriptions (coordinator/subscriber.go): mirror each batch to
    secondary endpoints — foreachBatch fan-out to two sinks."""
    src_dir = str(tmp_path / "sub_src")
    primary = str(tmp_path / "sub_primary")
    mirror = str(tmp_path / "sub_mirror")
    ckpt = str(tmp_path / "sub_ckpt")

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    ev.write.parquet(src_dir)
    stream = spark.readStream.schema(ev.schema).parquet(src_dir)

    def fanout(batch_df, batch_id):
        batch_df.persist()
        batch_df.write.mode("append").parquet(primary)
        batch_df.write.mode("append").parquet(mirror)   # the subscription
        batch_df.unpersist()

    q = (
        stream.writeStream.foreachBatch(fanout)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = ev.count()
    assert spark.read.parquet(primary).count() == n
    assert spark.read.parquet(mirror).count() == n


def test_stream_dedup_drops_duplicate_deliveries(spark, tmp_path):
    """stream_dedup: duplicated deliveries of the same (host, tu) point
    collapse to one row through the streaming path; batch frames take the
    plain dropDuplicates shortcut."""
    import time

    from opengemini_spark.streaming.stream_job import stream_dedup

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    rows = [
        ("h1", 1_700_000_000_000_000, 1.0),
        ("h1", 1_700_000_000_000_000, 1.0),     # duplicate delivery
        ("h2", 1_700_000_003_000_000, 2.0),
        ("h2", 1_700_000_003_000_000, 2.0),
        ("h2", 1_700_000_006_000_000, 3.0),
    ]
    df = spark.createDataFrame(rows, "host string, tu long, value double")
    df = df.withColumn("ts", (F.col("tu") / 1_000_000).cast("timestamp"))
    df.write.parquet(str(src_dir / "batch0"))

    stream = (
        spark.readStream.schema(
            "host string, tu long, value double, ts timestamp"
        ).parquet(str(src_dir / "*"))
    )
    deduped = stream_dedup(stream, ["host", "tu"], within="1 minute")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    got = sorted((r["host"], r["tu"]) for r in out.collect())
    assert got == [
        ("h1", 1_700_000_000_000_000),
        ("h2", 1_700_000_003_000_000),
        ("h2", 1_700_000_006_000_000),
    ]

    # batch shortcut
    assert stream_dedup(df, ["host", "tu"]).count() == 3
