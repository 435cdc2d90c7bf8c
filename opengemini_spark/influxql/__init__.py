"""InfluxQL front-end: lexer → recursive-descent parser → DataFrame planner
→ InfluxDB-shape results.

Mirrors the reference's front half of the query lifecycle (SURVEY.md §3.1):
``influxql.ParseQuery`` (grammar ``lib/util/lifted/influx/influxql/sql.y``,
AST ``ast.go``) followed by compile/plan — except IR #2 here is a PySpark
DataFrame expression tree, so Catalyst replaces the heuristic planner and
the executor DAG entirely.
"""

from opengemini_spark.influxql.parser import parse  # noqa: F401
from opengemini_spark.influxql.planner import plan  # noqa: F401
from opengemini_spark.influxql.shape import to_influx_json  # noqa: F401


def query(spark, sf_dir: str, q: str, loader=None):
    """Parse + plan an InfluxQL SELECT into a DataFrame."""
    df = plan(spark, sf_dir, parse(q), loader=loader)
    if "__skey" in df.columns:
        # presentation-only series-key order column (shape.py tie-break);
        # not part of the result schema
        df = df.drop("__skey")
    return df
