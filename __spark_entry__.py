"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — the operator suite; see
``opengemini_spark/suite.py`` for the registry (one entry per implemented
SURVEY.md §2 operator, each with a DuckDB oracle).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from opengemini_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: tumbling time-window aggregation with fill over events —
    the openGemini core query shape (GROUP BY time(30m), tag FILL(null))."""
    fn = suite.REGISTRY["window_fill_null"][0]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
