"""Query/write API layer: the ``/query`` + ``/write`` handler semantics
without the HTTP server (reference: ``httpd/handler.go:1160 serveQuery``,
``:1488 serveWrite``).

- multi-statement queries (``;``-separated), one result block each
- InfluxQL SELECT/SHOW via the front-end; EXPLAIN returns the Spark plan
  (the reference's EXPLAIN prints its logical/physical plan the same way)
- errors per statement in the InfluxDB shape ``{"error": "..."}``
- chunked emission: series blocks split every ``chunk_size`` rows
  (handler chunked=true behavior)
- writes: line protocol → parsed rows → time-partitioned parquet append
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from opengemini_spark import storage
from opengemini_spark.influxql import parse, to_influx_json
from opengemini_spark.influxql import ast as iast
from opengemini_spark.sources.line_protocol import (
    parse_line_protocol,
    to_measurement_table,
)


def _split_statements(q: str) -> list[str]:
    return [s.strip() for s in q.split(";") if s.strip()]


def handle_query(
    spark: SparkSession,
    sf_dir: str,
    q: str,
    epoch: str | None = "ns",
    chunk_size: int | None = None,
    max_row_limit: int | None = None,
    ddl=None,
    data_root: str | None = None,
) -> dict:
    """Execute one or more InfluxQL statements → InfluxDB response JSON.

    ``ddl``: optional :class:`opengemini_spark.ddl.DDLExecutor` — when
    given, DDL statements (CREATE DATABASE, …) are dispatched to it first,
    mirroring the statement_executor.go dispatch table.

    ``chunk_size`` / ``max_row_limit`` drive the streaming emit loop
    (statement_executor.go:1144-1193): results are pulled through
    ``toLocalIterator`` in per-series chunks, never fully collected, and
    truncated (with ``"partial": true``) at ``max_row_limit`` rows like
    the reference's MaxRowLimit.
    """
    results = []
    for i, stmt_text in enumerate(_split_statements(q)):
        try:
            if ddl is not None:
                first = stmt_text.split(None, 1)[0].lower()
                if first in ("create", "drop", "delete") or (
                    first == "show"
                    and stmt_text.lower().split()[1]
                    in ("databases", "retention")
                ):
                    out = ddl.execute(stmt_text)
                    out["statement_id"] = i
                    results.append(out)
                    continue
            explain = False
            if stmt_text.lower().startswith("explain "):
                explain = True
                stmt_text = stmt_text[len("explain "):]
            stmt = parse(stmt_text)
            loader = None
            if data_root is not None:
                import os as _os

                def loader(name, _root=data_root):  # noqa: E306
                    path = f"{_root}/{name}"
                    if _os.path.isdir(path):
                        return storage.read_measurement(spark, path).drop(
                            storage.PARTITION_COL
                        )
                    return None

            from opengemini_spark.influxql.planner import Planner

            df = Planner(spark, sf_dir, loader=loader).plan(stmt)
            if (
                isinstance(stmt, iast.SelectStatement)
                and stmt.into is not None
                and data_root is not None
            ):
                # SELECT … INTO dst (target_transform.go writeTarget):
                # append the result to the destination measurement and
                # report written-row counts like the reference does
                dst = f"{data_root}/{stmt.into}"
                w = df.withColumnRenamed("time", "time_ns") if "time" in df.columns else df
                if "time_ns" in w.columns:
                    storage.write_measurement(w, dst)
                else:
                    w.write.mode("append").parquet(dst)
                results.append(
                    {
                        "statement_id": i,
                        "series": [
                            {
                                "name": "result",
                                "columns": ["time", "written"],
                                "values": [[0, df.count()]],
                            }
                        ],
                    }
                )
                continue
            if explain:
                plan_str = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "simple"
                    )
                )
                results.append(
                    {
                        "statement_id": i,
                        "series": [
                            {
                                "name": "explain",
                                "columns": ["QUERY PLAN"],
                                "values": [[ln] for ln in plan_str.splitlines()],
                            }
                        ],
                    }
                )
                continue
            measurement = (
                stmt.source.rsplit(".", 1)[-1]
                if isinstance(stmt, iast.SelectStatement)
                and isinstance(stmt.source, str) else "results"
            )
            prefixed = [c for c in df.columns if c.startswith("__tag_")]
            tag_cols = prefixed or (
                [t for t in stmt.group_tags if t in df.columns]
                if isinstance(stmt, iast.SelectStatement) else []
            )
            body = to_influx_json(
                df,
                measurement,
                tag_cols=tag_cols,
                epoch=epoch,
                order_desc=bool(getattr(stmt, "order_desc", False)),
                chunk_size=chunk_size,
                max_rows=max_row_limit,
            )
            block = body["results"][0]
            block["statement_id"] = i
            results.append(block)
        except (SyntaxError, ValueError, KeyError, AssertionError) as e:
            results.append({"statement_id": i, "error": str(e)})
    return {"results": results}


def handle_write(
    spark: SparkSession,
    lines: list[str],
    data_root: str,
) -> dict:
    """Line-protocol write: parse → pivot per measurement → partitioned
    append under ``data_root/<measurement>/``."""
    parsed = parse_line_protocol(spark, lines)
    measurements = [
        r["measurement"] for r in parsed.select("measurement").distinct().collect()
    ]
    written = {}
    for m in measurements:
        wide = to_measurement_table(parsed, m)
        storage.write_measurement(wide, f"{data_root}/{m}")
        written[m] = wide.count()
    return {"written": written}


def handle_prom_query_range(
    spark: SparkSession,
    sf_dir: str,
    registry,
    promql: str,
    start_s: int,
    end_s: int,
    step_s: int,
) -> dict:
    """``GET /api/v1/query_range`` (handler_prom.go:539): PromQL text →
    engine → matrix JSON; errors in the Prometheus envelope."""
    from opengemini_spark.promql import query_range
    from opengemini_spark.promql.parser import parse_promql
    from opengemini_spark.promql.shape import to_prom_matrix, to_prom_vector

    try:
        node = parse_promql(promql)
        df = query_range(spark, sf_dir, registry, promql, start_s, end_s, step_s)
        labels = [c for c in df.columns if c not in ("t", "value")]
        metric = getattr(node, "metric", "")
        if start_s == end_s:
            return to_prom_vector(df, metric, labels)
        return to_prom_matrix(df, metric, labels)
    except (SyntaxError, ValueError, KeyError, AssertionError) as e:
        return {"status": "error", "errorType": "bad_data", "error": str(e)}
