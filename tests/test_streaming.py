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


def test_stream_sessionize_gap_sessions(spark, tmp_path):
    """stream_sessionize (VERDICT r5 next #8): F.session_window groupBy
    with watermark over a file stream — gap-separated bursts of one host
    land as separate sessions with correct per-session aggregates, and
    the batch path computes the identical result (unified model)."""
    from opengemini_spark.streaming.stream_job import stream_sessionize

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    base = 1_700_000_000
    rows = [
        # h1 burst 1: 3 events 5s apart
        ("h1", base + 0, 1.0),
        ("h1", base + 5, 2.0),
        ("h1", base + 10, 3.0),
        # h1 burst 2 after a 120s gap
        ("h1", base + 130, 4.0),
        # h2: one lone event
        ("h2", base + 7, 9.0),
    ]
    df = spark.createDataFrame(rows, "host string, tu long, value double")
    df = df.withColumn("ts", F.col("tu").cast("timestamp"))
    df.write.parquet(str(src_dir / "batch0"))

    stream = spark.readStream.schema(
        "host string, tu long, value double, ts timestamp"
    ).parquet(str(src_dir / "*"))
    sess = stream_sessionize(stream, "30 seconds", ["host"])
    q = (
        sess.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    got = {
        (r["host"], int(r["session_start"].timestamp())):
            (r["n_events"], r["sum_v"], r["min_v"], r["max_v"],
             int(r["session_end"].timestamp()))
        for r in out.collect()
    }
    # append mode only emits sessions the watermark has closed; the last
    # h1 burst stays open at end-of-stream (watermark = max ts - gap)
    assert got[("h1", base + 0)] == (3, 6.0, 1.0, 3.0, base + 40)
    assert got[("h2", base + 7)] == (1, 9.0, 9.0, 9.0, base + 37)

    # batch path: same operator, same sessions, open ones included
    batch = {
        (r["host"], int(r["session_start"].timestamp())):
            (r["n_events"], r["sum_v"])
        for r in stream_sessionize(df, "30 seconds", ["host"]).collect()
    }
    assert batch == {
        ("h1", base + 0): (3, 6.0),
        ("h1", base + 130): (1, 4.0),
        ("h2", base + 7): (1, 9.0),
    }


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


def test_stream_score_nb_classifier(spark, tmp_path):
    """nb_score_stateless: a frozen hashed-NB model rides the plan as a
    dense weight-array literal, so a docs readStream scores statelessly
    in append mode; the streamed scores equal the batch nb_score output
    row for row (training corpus — every bucket populated)."""
    from opengemini_spark.datapipe import models

    rows = [
        (0, "alpha beta gamma alpha beta", True),
        (1, "beta gamma alpha delta beta", True),
        (10, "omega psi chi phi omega psi", False),
        (11, "psi chi omega phi chi psi", False),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    weights, prior = models.nb_train(docs, "y")
    batch = {
        r["doc_id"]: (r["n_feats"], r["raw_milli"], r["score"], r["predicted"])
        for r in models.nb_score(docs, weights, prior, "y").collect()
    }

    dense, bias = models.nb_weights_array(weights, prior)
    assert len(dense) == models.QC_DIM

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    docs.drop("y").write.parquet(str(src_dir / "b0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src_dir / "*")
    )
    scored = models.nb_score_stateless(stream, dense, bias)
    assert scored.isStreaming
    q = (
        scored.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["n_feats"], r["raw_milli"], r["score"], r["predicted"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert streamed == batch


def test_stream_url_canonicalize_normalize(spark, tmp_path):
    """The r8 crawl-front operators are stream-safe: canonicalize_urls
    and normalize_text are pure projections (no state), so a documents
    readStream flows through both in append mode, and URL-level dedup
    composes with dropDuplicates on the canonical key. Streamed output
    equals the batch output row for row."""
    from opengemini_spark.datapipe import text as dtext
    from opengemini_spark.datapipe import web

    rows = [(i, "alpha  beta\x07 gamma") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    batch_urls = web.canonicalize_urls(web.synth_urls(docs))
    batch_norm = dtext.normalize_text(docs)

    src_dir = tmp_path / "in"
    src_dir.mkdir()
    docs.write.parquet(str(src_dir / "b0"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src_dir / "*")
    )

    canon = web.canonicalize_urls(web.synth_urls(stream))
    assert canon.isStreaming
    norm = dtext.normalize_text(stream)
    assert norm.isStreaming

    deduped = canon.dropDuplicates(["canonical_url"])
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
    # 8 docs = 2 canonical groups of 4 variants -> 2 survivors
    assert out.count() == 2
    assert set(r["canonical_url"] for r in out.collect()) == set(
        r["canonical_url"] for r in batch_urls.collect()
    )

    q2 = (
        norm.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out2"))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    streamed = {
        r["doc_id"]: r["norm_text"]
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert streamed == {
        r["doc_id"]: r["norm_text"] for r in batch_norm.collect()
    }
    assert streamed[0] == "alpha beta gamma"
