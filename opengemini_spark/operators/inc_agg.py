"""Incremental windowed aggregation — the reference's "inc query".

Reference: engine/executor/inc_agg_transform.go — a repeated query
carries (queryID, iterID); iteration 0 aggregates and caches its
interval chunk (PutIncAggChunk), iteration k loads the (queryID, k-1)
chunk and merges the newly-scanned data into it, so each iteration pays
only for the NEW data, not the whole history.

Spark-first re-expression: the cached state is a parquet table of
MERGEABLE PARTIAL aggregates keyed (time bucket, dims) — not driver
memory (the reference's 100 MB in-heap chunk cache,
IncAggChunkCacheSize, would cap state size; a parquet state table
scales with the cluster and survives restarts). Each iteration:

    partial(new data)  ∪  state[iter-1]  →  groupBy(bucket, dims)
                                          →  merge  →  state[iter]

— one distributed shuffle proportional to |new data| + |state|, and the
finalized result (mean = sum/count, …) projects straight off the merged
state. Supported functions are the decomposable set count/sum/mean/
min/max (the same set the reference's fast path merges chunk-wise).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from opengemini_spark.operators.window_agg import time_bucket

#: (fn) -> partial columns needed; count/sum/mean share (cnt, sum)
MERGEABLE = ("count", "sum", "mean", "min", "max")


def _partial_cols(spec: list[tuple[str, str]]):
    """Partial aggregate expressions for a [(fn, field)] spec —
    deduplicated: mean+sum+count over one field share partials."""
    cols = {}
    for fn, field in spec:
        if fn not in MERGEABLE:
            raise ValueError(
                f"inc query supports {MERGEABLE}, got {fn!r}"
            )
        if fn in ("count", "sum", "mean"):
            cols[f"__cnt_{field}"] = F.count(field)
            cols[f"__sum_{field}"] = F.sum(F.col(field).cast("double"))
        if fn == "min":
            cols[f"__min_{field}"] = F.min(field)
        if fn == "max":
            cols[f"__max_{field}"] = F.max(field)
    return [e.alias(name) for name, e in cols.items()]


def _merge_cols(names: list[str]):
    out = []
    for c in names:
        if c.startswith("__cnt_") or c.startswith("__sum_"):
            out.append(F.sum(c).alias(c))
        elif c.startswith("__min_"):
            out.append(F.min(c).alias(c))
        elif c.startswith("__max_"):
            out.append(F.max(c).alias(c))
        else:
            raise AssertionError(f"unknown partial column {c}")
    return out


def _finalize(df: DataFrame, spec, dims):
    outs = []
    for fn, field in spec:
        name = f"{fn}_{field}"
        if fn == "count":
            outs.append(F.col(f"__cnt_{field}").cast("long").alias(name))
        elif fn == "sum":
            outs.append(F.col(f"__sum_{field}").alias(name))
        elif fn == "mean":
            outs.append(
                (F.col(f"__sum_{field}") / F.col(f"__cnt_{field}")).alias(name)
            )
        else:
            outs.append(F.col(f"__{fn}_{field}").alias(name))
    return df.select(F.col("__bucket").alias("time"), *dims, *outs)


def inc_window_agg(
    spark: SparkSession,
    new_df: DataFrame,
    state_root: str,
    query_id: str,
    iter_id: int,
    interval_ns: int,
    spec: list[tuple[str, str]],
    dims: list[str] | None = None,
    time_col: str = "time_ns",
) -> DataFrame:
    """One inc-query iteration: merge ``new_df``'s partials into the
    cached state and return the finalized windowed aggregate over ALL
    data seen so far. ``spec`` = [("mean", "value"), ("count", "value")].

    ``iter_id`` must be 0 (fresh state) or prev+1 — like the reference,
    a missing (query_id, iter_id-1) chunk is an error (errno
    FailedGetIncAggItem), not a silent recompute.
    """
    dims = dims or []
    part = (
        new_df.withColumn(
            "__bucket", time_bucket(F.col(time_col), interval_ns)
        )
        .groupBy("__bucket", *dims)
        .agg(*_partial_cols(spec))
    )
    state_cols = [c for c in part.columns if c.startswith("__") and c != "__bucket"]

    prev_dir = os.path.join(state_root, query_id, f"iter={iter_id - 1}")
    cur_dir = os.path.join(state_root, query_id, f"iter={iter_id}")
    if iter_id > 0:
        if not os.path.isdir(prev_dir):
            raise FileNotFoundError(
                f"inc query {query_id!r}: no cached state for iteration "
                f"{iter_id - 1} (FailedGetIncAggItem)"
            )
        prev = spark.read.parquet(prev_dir)
        merged = (
            prev.unionByName(part)
            .groupBy("__bucket", *dims)
            .agg(*_merge_cols(state_cols))
        )
    else:
        merged = part
    merged.write.mode("overwrite").parquet(cur_dir)
    return _finalize(spark.read.parquet(cur_dir), spec, dims)
