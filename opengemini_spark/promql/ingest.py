"""Prometheus-over-line-protocol ingest adapter.

The reference stores Prometheus samples as measurements whose tags carry
the label set (``__name__`` included) and whose single field is
``value`` (lib/util/lifted/influx/httpd prom write path; the
prom_test.go suites write exactly this shape). This module builds a
:class:`~opengemini_spark.promql.engine.MetricRegistry` from such lines,
so PromQL queries evaluate over written data.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from opengemini_spark.promql.engine import Metric, MetricRegistry
from opengemini_spark.sources.line_protocol import parse_line


def registry_from_line_protocol(lines: list[str]) -> MetricRegistry:
    """Parse prom-shaped line protocol into an in-memory registry.

    Label keys are the union of tag keys seen for the metric, minus
    ``__name__`` (the metric name itself). Duplicate (labelset, time)
    samples resolve to the last write. Timestamps land as integer µs.
    """
    by_metric: dict[str, list[tuple[dict, int, float]]] = {}
    label_keys: dict[str, set[str]] = {}
    for ln in lines:
        for row in parse_line(ln):
            v = row["f_float"] if row["f_float"] is not None else row["f_int"]
            if row["field"] != "value" or v is None:
                continue
            # the MEASUREMENT is the metric's identity; the __name__ tag
            # merely mirrors it (prom_test.go Scalar writes `down` with
            # __name__=up and queries scalar(down))
            tags = dict(row["tags"])
            tags.pop("__name__", None)
            name = row["measurement"]
            by_metric.setdefault(name, []).append(
                (tags, row["time_ns"] // 1000, float(v))
            )
            label_keys.setdefault(name, set()).update(tags)

    reg = MetricRegistry()
    for name, samples in by_metric.items():
        keys = sorted(label_keys[name])
        by_key: dict[tuple, float] = {}
        for tags, tu, v in samples:
            by_key[tuple(tags.get(k) for k in keys) + (tu,)] = v
        rows = [k + (v,) for k, v in by_key.items()]
        schema = StructType(
            [StructField(k, StringType()) for k in keys]
            + [StructField("tu", LongType()),
               StructField("value", DoubleType())]
        )

        def loader(spark, sf_dir, _rows=rows, _schema=schema):
            return spark.createDataFrame(_rows, _schema)

        reg.register(name, Metric(loader, labels=keys))
    return reg
