"""Prometheus HTTP API response shaping (reference:
``lib/util/lifted/influx/httpd/handler_prom_util.go``).

``/api/v1/query_range`` returns a matrix: one entry per label-set with
``values: [[unix_seconds, "value-as-string"], …]``; instant queries return
a vector of single samples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _fmt_value(v: float) -> str:
    # Prometheus serializes samples as strings; Go's strconv drops the
    # trailing ".0" on integral floats
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def to_prom_matrix(
    df: DataFrame,
    metric_name: str,
    label_cols: list[str],
    time_col: str = "t",
    value_col: str = "value",
) -> dict:
    """Collect a (labels…, t µs, value) result into the range-query shape."""
    rows = df.collect()
    series: dict[tuple, dict] = {}
    for r in rows:
        key = tuple(r[c] for c in label_cols)
        blk = series.setdefault(
            key,
            {
                "metric": {
                    "__name__": metric_name,
                    **{c: str(r[c]) for c in label_cols},
                },
                "values": [],
            },
        )
        blk["values"].append([r[time_col] / 1_000_000, _fmt_value(r[value_col])])
    ordered = [series[k] for k in sorted(series, key=lambda k: tuple(map(str, k)))]
    for blk in ordered:
        blk["values"].sort(key=lambda v: v[0])
    return {
        "status": "success",
        "data": {"resultType": "matrix", "result": ordered},
    }


def to_prom_vector(
    df: DataFrame,
    metric_name: str,
    label_cols: list[str],
    time_col: str = "t",
    value_col: str = "value",
) -> dict:
    """Instant-query vector: one sample per label-set."""
    rows = df.collect()
    out = []
    for r in sorted(rows, key=lambda r: tuple(str(r[c]) for c in label_cols)):
        out.append(
            {
                "metric": {
                    "__name__": metric_name,
                    **{c: str(r[c]) for c in label_cols},
                },
                "value": [r[time_col] / 1_000_000, _fmt_value(r[value_col])],
            }
        )
    return {"status": "success", "data": {"resultType": "vector", "result": out}}
