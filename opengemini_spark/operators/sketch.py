"""Approximate top-N via count-min sketch (reference ``topn_ddcm``:
``engine/executor/count_min_sketch.go:61``, ``ddcm.go``, ``topn_transform.go``).

Batch realization: the sketch IS a grouped aggregation —
``groupBy(row, bucket)`` over d hash rows gives the counter matrix in one
shuffle; estimates join each distinct key against its d buckets and take
the min. Deterministic (Carter-Wegman hashes, no sampling), so the DuckDB
oracle reproduces it exactly.

Scale: the sketch table is d·w rows regardless of input size (the whole
point of the sketch) and is broadcast to the estimate join; the estimate
side is distinct-keys × d. For true streaming top-N the same construction
runs under ``applyInPandasWithState``; batch covers the query surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from opengemini_spark.datapipe.dedup import MINHASH_AB, MINHASH_P
from opengemini_spark.datapipe.hashing import h60

CM_DEPTH = 4          # hash rows (reuses the first 4 Carter-Wegman pairs)
CM_WIDTH = 256        # buckets per row


def _bucket(col: Column, i: int) -> Column:
    a, b = MINHASH_AB[i]
    base = h60(col.cast("string")) % MINHASH_P
    return ((F.lit(a) * base + F.lit(b)) % MINHASH_P) % CM_WIDTH


def _stack_cells(df: DataFrame, prefix: str, keep: list[str]) -> DataFrame:
    """(…, __p0..__pd) → (…, row, bucket) long format."""
    pairs = ", ".join(f"{i}, {prefix}{i}" for i in range(CM_DEPTH))
    return df.select(
        *keep, F.expr(f"stack({CM_DEPTH}, {pairs}) as (row, bucket)")
    )


def countmin_sketch(df: DataFrame, key_col: str) -> DataFrame:
    """The d×w counter matrix: ``(row, bucket, c)``."""
    cells = _stack_cells(
        df.select(
            *[_bucket(F.col(key_col), i).alias(f"__b{i}") for i in range(CM_DEPTH)]
        ),
        "__b",
        [],
    )
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))


def countmin_topn(df: DataFrame, key_col: str, n: int) -> DataFrame:
    """Top-N keys by count-min estimated frequency.

    Returns ``(key, est, rank)`` — est ≥ true count (classic CM
    overestimate under collisions), deterministic tie-break on key.
    """
    sketch = countmin_sketch(df, key_col)
    keys = df.select(F.col(key_col).alias("key")).distinct()
    key_cells = _stack_cells(
        keys.select(
            "key",
            *[_bucket(F.col("key"), i).alias(f"__kb{i}") for i in range(CM_DEPTH)],
        ),
        "__kb",
        ["key"],
    )
    est = (
        key_cells.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("key")
        .agg(F.min("c").alias("est"))
    )
    # two-phase top-n: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heap + driver merge), so the est frame — one row per
    # DISTINCT key, unbounded at scale — never funnels through a single
    # unpartitioned WindowExec; only the n survivors get ranked.
    top = est.orderBy(F.col("est").desc(), F.col("key").asc()).limit(n)
    w = Window.orderBy(F.col("est").desc(), F.col("key").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "key", "est", "rank"
    )
