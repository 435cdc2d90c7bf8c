"""Selector aggregates — first/last/top/bottom/sample/percentile(exact).

openGemini selectors return the *row* at the selected point, not just the
value: ``SELECT max(value), other`` carries ``other`` from the max row
(``query/compile.go:762-770`` validateSelector); ``top(f, N, tags)`` /
``bottom`` return N ranked rows with their tags and times
(``lib/util/lifted/influx/query/agg_functions.go:123,130``).

Spark-first: ``min_by``/``max_by`` on a (time, value) struct for
deterministic first/last; ``row_number`` over a per-series window for
top/bottom (per-group top-k — shuffles once on the partition keys, the sort
is per-partition; at scale this is the standard Spark top-k pattern and AQE
handles skewed groups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_last_agg(
    df: DataFrame,
    time_col: str,
    value_col: str,
    dims: Sequence[str],
    which: str = "first",
    companion_cols: Sequence[str] = (),
) -> DataFrame:
    """value (and companions) at min/max time per group — deterministic.

    Ties on time break by value then companions, mirroring the reference's
    stable per-series scan order. Implemented with a single-pass window
    row_number rather than min_by so the tie-break is explicit and matches a
    SQL oracle exactly.
    """
    order = [F.col(time_col), F.col(value_col), *[F.col(c) for c in companion_cols]]
    if which == "last":
        order = [c.desc() for c in order]
    w = Window.partitionBy(*[F.col(d) for d in dims]).orderBy(*order)
    out_cols = [*dims, F.col(time_col), F.col(value_col), *[F.col(c) for c in companion_cols]]
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*out_cols)
    )


def top_bottom(
    df: DataFrame,
    value_col: str,
    n: int,
    dims: Sequence[str] = (),
    which: str = "top",
    tie_break: Sequence[str] = (),
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """top(f, N) / bottom(f, N) per dims group (agg_functions.go:123-130).

    Deterministic: ties on value break by ``tie_break`` columns ascending.
    """
    val = F.col(value_col).desc() if which == "top" else F.col(value_col).asc()
    w = Window.partitionBy(*[F.col(d) for d in dims]).orderBy(
        val, *[F.col(c) for c in tie_break]
    )
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
    if keep_cols is not None:
        out = out.select(*keep_cols)
    return out


def mode_agg(
    df: DataFrame,
    value_col: str,
    dims: Sequence[str],
    time_col: str | None = None,
) -> DataFrame:
    """mode() — most frequent value (NewModeReduce, agg_func.go:175-204).

    Reference tie-breaks: on equal frequency the value whose FIRST occurrence
    is earliest wins; on a full (freq, first-time) tie the later value in
    sort order wins. Pass ``time_col`` to reproduce that; without a time
    column (time-less relations) ties fall back to smallest value, which is
    the only deterministic order available. Built as count-groupBy + top-1 —
    two map-side-combinable aggregations, no full sort.
    """
    if time_col is not None:
        counted = df.groupBy(*dims, value_col).agg(
            F.count(F.lit(1)).alias("__freq"), F.min(time_col).alias("__ft")
        )
        order = [F.col("__freq").desc(), F.col("__ft").asc(), F.col(value_col).desc()]
    else:
        counted = df.groupBy(*dims, value_col).agg(F.count(F.lit(1)).alias("__freq"))
        order = [F.col("__freq").desc(), F.col(value_col).asc()]
    w = Window.partitionBy(*[F.col(d) for d in dims]).orderBy(*order)
    return (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*dims, F.col(value_col).alias("mode"))
    )


def percentile_exact(
    df: DataFrame, value_col: str, q: float, dims: Sequence[str]
) -> DataFrame:
    """percentile(f, q) — openGemini's exact nearest-rank percentile.

    Reference (FloatPercentileReduce): sorts values, picks element at
    ``floor(q/100 * n + 0.5) - 1`` (1-based rank round-half-up) — a *selector*
    (returns an actual sample), unlike SQL interpolated percentile.
    """
    w = Window.partitionBy(*[F.col(d) for d in dims]).orderBy(F.col(value_col))
    cnt = Window.partitionBy(*[F.col(d) for d in dims])
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__want",
            F.greatest(
                F.floor(F.lit(q / 100.0) * F.count(F.lit(1)).over(cnt) + F.lit(0.5)),
                F.lit(1),
            ),
        )
        .filter(F.col("__rn") == F.col("__want"))
        .select(*dims, F.col(value_col).alias("percentile"))
    )


def sample_n(
    df: DataFrame, n: int, dims: Sequence[str], seed_col: Column
) -> DataFrame:
    """sample(f, N) — N pseudo-random rows per group, deterministic via a
    caller-supplied hash ordering column (reference uses reservoir sampling;
    determinism here makes it oracle-checkable)."""
    w = Window.partitionBy(*[F.col(d) for d in dims]).orderBy(seed_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
