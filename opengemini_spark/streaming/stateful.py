"""Custom stateful streaming operator: incremental per-series aggregation.

Reference: incremental (``inc``) queries keep per-series aggregate state
between executions (``engine/executor/inc_agg_transform.go:585``,
``inc_hash_agg_transform.go``). Spark realization:
``applyInPandasWithState`` — per-group state (count, sum, min, max) updated
per micro-batch, checkpoint-durable across restarts (which is exactly the
inc-query iterator contract).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("series", StringType()),
        StructField("n", LongType()),
        StructField("sum_v", DoubleType()),
        StructField("min_v", DoubleType()),
        StructField("max_v", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("sum_v", DoubleType()),
        StructField("min_v", DoubleType()),
        StructField("max_v", DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = 0, 0.0
    mn = mx = None
    if state.exists:
        n, s, mn, mx = state.get
    for pdf in pdfs:
        v = pdf["value"]
        n += len(v)
        s += float(v.sum())
        bmn, bmx = float(v.min()), float(v.max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, s, mn, mx))
    yield pd.DataFrame(
        {"series": [key[0]], "n": [n], "sum_v": [s], "min_v": [mn], "max_v": [mx]}
    )


def incremental_agg(stream: DataFrame, series_col: str, value_col: str) -> DataFrame:
    """Running (count, sum, min, max) per series over a stream.

    Each micro-batch emits the UPDATED running totals for the series it
    touched — downstream sinks upsert on ``series``.
    """
    src = stream.selectExpr(f"{series_col} AS series", f"{value_col} AS value")
    return src.groupBy("series").applyInPandasWithState(
        _update,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
