"""Time-window (GROUP BY time(interval)) aggregation.

openGemini semantics: ``GROUP BY time(1h[, offset]), tags`` buckets rows into
tumbling windows whose starts are aligned to the epoch (plus offset), then
applies the aggregate calls per (window, tag-set). Reference: interval
splitting ``engine/executor/interval_transform.go``, window boundaries kept
as chunk ``intervalIndex`` (``engine/executor/chunk.go:83-88``), compile-time
dimension handling ``lib/util/lifted/influx/query/compile.go:856-880``.

Spark-first design: the bucket is a pure integer expression on the int64-ns
time column (``time_ns - (time_ns - offset) % interval``), so it is computed
inside whole-stage codegen, partial aggregation happens map-side, and the
groupBy shuffles once on (bucket, tags). No Python in the hot path. At
100 TB the same expression works because bucketing is embarrassingly
parallel; skewed tag-sets are handled by AQE skew splitting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NS = 1  # base unit: nanoseconds
US = 1_000
MS = 1_000_000
SECOND = 1_000_000_000
MINUTE = 60 * SECOND
HOUR = 60 * MINUTE
DAY = 24 * HOUR
WEEK = 7 * DAY


def time_bucket(time_ns: Column | str, interval_ns: int, offset_ns: int = 0) -> Column:
    """Tumbling-window start (int64 ns), epoch-aligned like openGemini.

    Equivalent to the reference's interval start computation; stays in codegen
    (pure long arithmetic — no timestamp conversion, no UDF).
    """
    t = F.col(time_ns) if isinstance(time_ns, str) else time_ns
    shifted = t - F.lit(offset_ns)
    return (shifted - ((shifted % F.lit(interval_ns)) + F.lit(interval_ns)) % F.lit(interval_ns)
            + F.lit(offset_ns)).alias("bucket_ns")


def window_agg(
    df: DataFrame,
    time_col: str,
    interval_ns: int,
    aggs: Sequence[Column],
    dims: Sequence[str] = (),
    offset_ns: int = 0,
    bucket_alias: str = "bucket_ns",
) -> DataFrame:
    """GROUP BY time(interval[, offset]), *dims with the given agg columns.

    Returns one row per (window, dims) that has data; use
    :func:`opengemini_spark.operators.fill.fill_time_spine` afterwards to
    materialize empty windows (openGemini emits them per FILL clause).
    """
    bucket = time_bucket(df[time_col], interval_ns, offset_ns).alias(bucket_alias)
    return df.groupBy(bucket, *[F.col(d) for d in dims]).agg(*aggs)
