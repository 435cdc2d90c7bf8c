"""CREATE STREAM / CQ / downsample as Structured Streaming + batch jobs."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

# the reference restricts stream calls to these four (lib/stream/stream.go:71)
STREAM_CALLS = ("min", "max", "sum", "count")

#: continuous queries are ordinary SELECT INTO statements — they admit the
#: full basic-agg set, not the stream-pipeline restriction
#: (services/continuousquery runs the bound SELECT verbatim)
CQ_CALLS = STREAM_CALLS + ("mean",)


@dataclass
class StreamDef:
    """CREATE STREAM dst ON SELECT call(field) FROM src GROUP BY time(ivl), dims DELAY d."""

    name: str
    interval: str                 # e.g. "30 minutes"
    delay: str                    # allowed lateness, e.g. "5 minutes"
    dims: list[str] = field(default_factory=list)
    calls: dict[str, tuple[str, str]] = field(default_factory=dict)
    # calls: out_name -> (call, field); call ∈ STREAM_CALLS for streams,
    # CQ_CALLS for continuous queries (restrict=False)
    restrict: bool = True

    def validate(self) -> None:
        allowed = STREAM_CALLS if self.restrict else CQ_CALLS
        for out, (call, _) in self.calls.items():
            if call not in allowed:
                raise ValueError(
                    f"stream call {call!r} for {out!r} not in {allowed} "
                    "(reference restriction, lib/stream/stream.go:71-81)"
                )


def _agg_cols(sd: StreamDef) -> list[F.Column]:
    cols = []
    for out, (call, fld) in sd.calls.items():
        fn = {"min": F.min, "max": F.max, "sum": F.sum,
              "count": F.count, "mean": F.avg}[call]
        cols.append(fn(fld).alias(out))
    return cols


def stream_agg(src: DataFrame, sd: StreamDef, ts_col: str = "ts") -> DataFrame:
    """The windowed aggregation at the heart of a stream (works on both a
    batch and a streaming DataFrame — Spark's unified model).

    Watermark = DELAY: rows later than the window close are dropped, which
    is exactly the reference's rotation-based late-row drop
    (time_task.go:174-179).
    """
    sd.validate()
    d = src
    # Watermarks require TIMESTAMP; parquet written at µs precision loads as
    # TIMESTAMP_NTZ. Session tz is UTC so the cast is an identity on micros.
    if dict(d.dtypes).get(ts_col) == "timestamp_ntz":
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if d.isStreaming:
        d = d.withWatermark(ts_col, sd.delay)
    return (
        d.groupBy(F.window(ts_col, sd.interval).alias("w"), *sd.dims)
        .agg(*_agg_cols(sd))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *sd.dims,
            *[F.col(o) for o in sd.calls],
        )
    )


def start_stream(
    src_stream: DataFrame,
    sd: StreamDef,
    dest_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Wire a stream to its destination table (append mode — windows emit
    once their watermark passes, matching the reference's window-close
    flush at truncate(t)+interval+delay)."""
    out = stream_agg(src_stream, sd, ts_col)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", dest_path)
        .option("checkpointLocation", checkpoint)
        .queryName(sd.name)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_query_once(
    src: DataFrame,
    sd: StreamDef,
    dest_path: str,
    ts_col: str = "ts",
) -> None:
    """One tick of a continuous query: SELECT … INTO dest, idempotent via
    dynamic partition overwrite on the window-start day partition."""
    out = stream_agg(src, sd, ts_col).withColumn(
        "p_day", F.to_date("window_start")
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p_day")
        .parquet(dest_path)
    )


def downsample_once(
    src: DataFrame,
    interval: str,
    dims: list[str],
    aggs: list[F.Column],
    dest_path: str,
    ts_col: str = "ts",
) -> None:
    """Downsample job: rewrite a time range at lower resolution
    (engine_downsample.go analog). Partitioned by day for pruning +
    idempotent overwrite."""
    out = (
        src.groupBy(F.window(ts_col, interval).alias("w"), *dims)
        .agg(*aggs)
        .select(F.col("w.start").alias("window_start"), *dims, "*")
        .drop("w")
        .withColumn("p_day", F.to_date("window_start"))
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("p_day")
        .parquet(dest_path)
    )


def stream_dedup(
    src_stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    within: str = "10 minutes",
) -> DataFrame:
    """Streaming ingest dedup: drop repeated points (same key within the
    watermark horizon) before they land — the training-pipeline analog of
    exact dedup for continuous ingestion (duplicate deliveries from
    at-least-once collectors are the norm at scale).

    Spark-native: ``withWatermark`` + ``dropDuplicatesWithinWatermark``
    keys the state store on ``key_cols`` and expires entries once the
    event-time watermark passes ``within`` — state is bounded by the
    duplicate-arrival horizon, not the stream's lifetime (the unbounded
    alternative, ``dropDuplicates`` without a watermark, leaks state
    forever and is a scale killer). Works on batch frames too (plain
    dropDuplicates — Spark's unified model).
    """
    if not src_stream.isStreaming:
        return src_stream.dropDuplicates(key_cols)
    d = src_stream
    if dict(d.dtypes).get(ts_col) == "timestamp_ntz":
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return d.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_sessionize(
    src_stream: DataFrame,
    gap: str,
    dims: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    delay: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization: the continuous counterpart of the batch
    ``operators.transforms.sessionize`` — per-``dims`` gap-based sessions
    with per-session aggregates, emitted as sessions CLOSE (watermark
    passes the session end + gap).

    Spark-native: ``F.session_window(ts, gap)`` groupBy — the state store
    merges overlapping windows per key, so session state is bounded by
    the number of OPEN sessions, not stream history; ``delay`` is the
    allowed lateness (the reference's stream DELAY knob). Emits
    ``dims + (session_start, session_end, n_events, sum_v, min_v,
    max_v)``; session_end − session_start includes the trailing gap,
    exactly session_window's contract.

    Works on batch frames too (unified model: the same groupBy runs as a
    batch aggregation).
    """
    d = src_stream
    if dict(d.dtypes).get(ts_col) == "timestamp_ntz":
        d = d.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if d.isStreaming:
        d = d.withWatermark(ts_col, delay if delay != "0 seconds" else gap)
    return (
        d.groupBy(F.session_window(F.col(ts_col), gap), *dims)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
        .select(
            *dims,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events", "sum_v", "min_v", "max_v",
        )
    )
