"""Table-function (UDTF) registry.

Reference: ``engine/executor/table_function_factory.go:26,46`` +
``table_function_transform.go`` — named table functions take a relation and
parameters and emit a new relation; ``rca`` (root-cause analysis) is the
registered example.

Spark realization: a registry of ``(DataFrame, params) -> DataFrame``
callables. Functions stay declarative where possible (rca is pure
DataFrame algebra); ``mapInPandas`` is available for imperative ones.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window, functions as F

TableFunction = Callable[..., DataFrame]

_REGISTRY: dict[str, TableFunction] = {}


def register_table_function(name: str):
    def deco(fn: TableFunction) -> TableFunction:
        _REGISTRY[name] = fn
        return fn

    return deco


def get_table_function(name: str) -> TableFunction:
    if name not in _REGISTRY:
        raise KeyError(
            f"table function {name!r} not registered; have {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


@register_table_function("rca")
def rca(
    df: DataFrame,
    time_col: str,
    dim_col: str,
    value_col: str,
    split_ns: int,
    top: int = 5,
) -> DataFrame:
    """Root-cause analysis: which dimension values drove the metric change
    across ``split_ns``?

    contribution(dim) = after_sum − before_sum; output the |contribution|
    top-N with both sides (the reference's rca surfaces the dimensions
    whose delta explains the aggregate movement).
    """
    sides = df.withColumn(
        "__side", F.when(F.col(time_col) < split_ns, "before").otherwise("after")
    )
    pivoted = (
        sides.groupBy(dim_col)
        .pivot("__side", ["before", "after"])
        .agg(F.round(F.sum(value_col), 2))
        .na.fill(0.0, ["before", "after"])
        .withColumn("contribution", F.round(F.col("after") - F.col("before"), 2))
    )
    w = Window.orderBy(F.abs(F.col("contribution")).desc(), F.col(dim_col).asc())
    return (
        pivoted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(dim_col, "before", "after", "contribution", "rank")
    )
