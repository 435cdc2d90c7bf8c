"""InfluxDB-compatible result shaping.

Reference: ``engine/executor/httpsender_transform.go`` formats chunks into
``{"results":[{"statement_id":0,"series":[{"name","tags","columns",
"values"}]}]}`` — one series block per tag-set, ``time`` first in columns,
rows ordered by time within a block (emit loop
``statement_executor.go:1144-1193``).

This is driver-side presentation of an already-aggregated (small) result —
the one place a collect() is correct.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

RFC3339 = "%Y-%m-%dT%H:%M:%SZ"


def _fmt_time(ns: int, epoch: str | None) -> Any:
    if epoch is None or epoch == "rfc3339":
        # InfluxDB default: RFC3339, sub-second digits only when non-zero
        from datetime import datetime, timezone

        dt = datetime.fromtimestamp(ns // 1_000_000_000, timezone.utc)
        base = dt.strftime("%Y-%m-%dT%H:%M:%S")
        frac = ns % 1_000_000_000
        if frac:
            base += (".%09d" % frac).rstrip("0")
        return base + "Z"
    if epoch in ("ns", "n"):
        return ns
    div = {
        "u": 1_000, "µ": 1_000, "ms": 1_000_000, "s": 1_000_000_000,
        "m": 60 * 1_000_000_000, "h": 3_600 * 1_000_000_000,
    }[epoch]
    return ns // div


def to_influx_json(
    df: DataFrame,
    measurement: str,
    tag_cols: list[str] | None = None,
    time_col: str = "time",
    epoch: str | None = "ns",
    order_desc: bool = False,
) -> dict:
    """Collect a (small, final) result into the InfluxDB response shape."""
    tag_cols = tag_cols or []
    value_cols = [
        c for c in df.columns if c not in tag_cols and c != time_col
    ]
    columns = ([time_col] if time_col in df.columns else []) + value_cols

    def _tag_name(t: str) -> str:
        return t.removeprefix("__tag_")

    rows = df.collect()
    series: dict[tuple, dict] = {}
    for r in rows:
        key = tuple(r[t] for t in tag_cols)
        blk = series.setdefault(
            key,
            {
                "name": measurement,
                **(
                    {"tags": {_tag_name(t): r[t] for t in tag_cols}}
                    if tag_cols else {}
                ),
                "columns": columns,
                "values": [],
            },
        )
        vals = []
        if time_col in df.columns:
            vals.append(r[time_col])    # raw ns; formatted after sorting
        vals += [r[c] for c in value_cols]
        blk["values"].append(vals)

    def _row_key(v: list) -> tuple:
        return tuple((x is None, str(type(x)), x) for x in v)

    ordered = [series[k] for k in sorted(series, key=lambda k: tuple(map(str, k)))]
    for blk in ordered:
        if time_col in df.columns:
            # sort on the raw int time (RFC3339 strings with mixed
            # sub-second precision are not chronologically ordered), then
            # format; ORDER BY time DESC emits rows in the requested order
            blk["values"].sort(key=_row_key, reverse=order_desc)
            for v in blk["values"]:
                v[0] = _fmt_time(v[0], epoch)
    if not ordered:
        # InfluxDB omits "series" entirely for empty results
        return {"results": [{"statement_id": 0}]}
    return {"results": [{"statement_id": 0, "series": ordered}]}
