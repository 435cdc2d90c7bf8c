"""PromQL front-end (SURVEY.md §3.3).

Reference path: ``/api/v1/query_range`` → Prometheus parser →
``promql2influxql.Transpiler`` (``lib/util/lifted/promql2influxql/
transpiler.go:45``) → the same select pipeline with prom-specific
transforms. Here the transpiler lowers PromQL onto the range-vector
operator library (``operators/prom.py``) — range selectors become the
step-grid explode, instant selectors become lookback last-sample,
aggregations become groupBy(t, labels), and binary ops become label joins.
"""

from opengemini_spark.promql.engine import MetricRegistry, query_range  # noqa: F401
from opengemini_spark.promql.parser import parse_promql  # noqa: F401
