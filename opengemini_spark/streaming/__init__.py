"""Streaming layer: CREATE STREAM / continuous query / downsample analogs.

Reference semantics (SURVEY.md §2.9):

- ``CREATE STREAM``: continuous tumbling-window aggregation from a source
  measurement into a destination, calls ∈ {min,max,sum,count}, group dims,
  ``DELAY d`` allowed lateness (``lib/stream/stream.go:71-81``,
  ``app/ts-store/stream/time_task.go:242`` — windows close at
  ``truncate(t)+interval+maxDelay``; rows older are dropped).
- Continuous queries: periodic re-execution of ``SELECT … INTO``
  (``services/continuousquery/service.go:178-267``).
- Downsample policies: rewrite aged high-res data at lower resolution
  (``engine/engine_downsample.go:94``).

Spark realization: Structured Streaming ``readStream → groupBy(window(ts,
interval), dims).agg(calls) → withWatermark(delay) → writeStream`` gives
the stream semantics natively (watermark drop == the reference's late-row
drop); CQ and downsample become idempotent batch jobs over time
partitions (partition-overwrite, so re-runs are safe).
"""

from opengemini_spark.streaming.stream_job import (  # noqa: F401
    STREAM_CALLS,
    StreamDef,
    continuous_query_once,
    downsample_once,
    start_stream,
    stream_agg,
)
