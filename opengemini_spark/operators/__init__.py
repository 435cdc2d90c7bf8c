"""Custom operator library — the pieces Spark lacks as built-ins.

Everything here is a DataFrame→DataFrame combinator (no Catalyst extension,
no RDDs): time-window aggregation + fill spine, selector aggregates,
transform functions (derivative family), per-series limits.
"""

from opengemini_spark.operators.window_agg import time_bucket, window_agg
from opengemini_spark.operators.fill import fill_time_spine

__all__ = ["time_bucket", "window_agg", "fill_time_spine"]
