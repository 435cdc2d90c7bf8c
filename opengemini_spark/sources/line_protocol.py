"""InfluxDB line-protocol parser as a Spark source.

Format (reference parser ``lib/util/lifted/vm/protoparser/influx/parser.go``):

    measurement[,tag1=v1,tag2=v2] field1=fv1[,field2=fv2] [timestamp_ns]

Field values: float (``1.5``), integer (``5i``), unsigned (``5u``), string
(``"s"``), boolean (``t/T/true/f/F/false``).

Spark-first: the hot path is an Arrow-batched ``mapInPandas`` (the same
shape the reference's streamparser has — batch in, columnar out), emitting
a normalized long format ``(measurement, tags map, field name, field
value typed, time_ns)``. Batch ingestion then pivots fields per
measurement into the catalog's wide table; escape handling covers the
``\\,`` ``\\ `` ``\\=`` cases.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

LP_SCHEMA = StructType(
    [
        StructField("measurement", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("field", StringType()),
        StructField("f_float", DoubleType()),
        StructField("f_int", LongType()),
        StructField("f_str", StringType()),
        StructField("f_bool", BooleanType()),
        StructField("time_ns", LongType()),
    ]
)

_UNESCAPED_SPLIT = {
    ",": re.compile(r"(?<!\\),"),
    " ": re.compile(r"(?<!\\) "),
    "=": re.compile(r"(?<!\\)="),
}


def _unescape(s: str) -> str:
    return s.replace("\\,", ",").replace("\\ ", " ").replace("\\=", "=")


def _split_sections(line: str) -> list[str]:
    """Split into [key, fields, ts?] on unescaped spaces outside quotes."""
    parts: list[str] = []
    buf: list[str] = []
    in_q = esc = False
    for ch in line:
        if esc:
            buf.append(ch)
            esc = False
            continue
        if ch == "\\":
            buf.append(ch)
            esc = True
            continue
        if ch == '"':
            in_q = not in_q
            buf.append(ch)
            continue
        if ch == " " and not in_q:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf))
    return [p for p in parts if p]


def _split_fields(s: str) -> list[str]:
    """Split k=v pairs on unescaped commas outside quotes."""
    parts: list[str] = []
    buf: list[str] = []
    in_q = esc = False
    for ch in s:
        if esc:
            buf.append(ch)
            esc = False
            continue
        if ch == "\\":
            buf.append(ch)
            esc = True
            continue
        if ch == '"':
            in_q = not in_q
            buf.append(ch)
            continue
        if ch == "," and not in_q:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf))
    return parts


def parse_line(line: str, default_time_ns: int = 0) -> list[dict]:
    """Parse one line into normalized rows (one per field)."""
    line = line.strip()
    if not line or line.startswith("#"):
        return []
    parts = _split_sections(line)
    if len(parts) < 2:
        raise ValueError(f"line protocol: missing fields in {line!r}")
    key, fields_raw = parts[0], parts[1]
    time_ns = int(parts[2]) if len(parts) > 2 else default_time_ns

    key_parts = _UNESCAPED_SPLIT[","].split(key)
    measurement = _unescape(key_parts[0])
    tags = {}
    for t in key_parts[1:]:
        k, v = _UNESCAPED_SPLIT["="].split(t, 1)
        tags[_unescape(k)] = _unescape(v)

    rows = []
    for fv in _split_fields(fields_raw):
        k, v = _UNESCAPED_SPLIT["="].split(fv, 1)
        row = {
            "measurement": measurement, "tags": tags, "field": _unescape(k),
            "f_float": None, "f_int": None, "f_str": None, "f_bool": None,
            "time_ns": time_ns,
        }
        if v.startswith('"') and v.endswith('"'):
            row["f_str"] = v[1:-1].replace('\\"', '"')
        elif v in ("t", "T", "true", "True", "TRUE"):
            row["f_bool"] = True
        elif v in ("f", "F", "false", "False", "FALSE"):
            row["f_bool"] = False
        elif v.endswith(("i", "u")):
            row["f_int"] = int(v[:-1])
        else:
            row["f_float"] = float(v)
        rows.append(row)
    return rows


def parse_line_protocol_df(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Arrow-batched parse of a DataFrame of raw lines (batch or streaming).

    Works on ``spark.read.text`` / ``readStream`` sources — the streaming
    ingest path is this plus a ``writeStream`` sink.
    """
    src = lines.select(F.col(line_col).cast("string").alias("line"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for line in pdf["line"]:
                out.extend(parse_line(line))
            yield pd.DataFrame(
                out, columns=[f.name for f in LP_SCHEMA.fields]
            )

    return src.mapInPandas(run, LP_SCHEMA)


def parse_line_protocol(spark, lines: list[str]) -> DataFrame:
    """Convenience: parse an in-memory batch of lines."""
    df = spark.createDataFrame([(ln,) for ln in lines], ["value"])
    return parse_line_protocol_df(df)


def to_measurement_table(parsed: DataFrame, measurement: str) -> DataFrame:
    """Pivot normalized rows into the wide per-measurement table
    (schema-on-write: one column per field, tags as string columns)."""
    m = parsed.filter(F.col("measurement") == measurement)
    value = F.coalesce(
        F.col("f_float"),
        F.col("f_int").cast("double"),
    )
    wide = (
        m.groupBy("time_ns", "tags")
        .pivot("field")
        .agg(F.first(value))
    )
    return wide.select(
        "time_ns",
        *[
            F.col("tags").getItem(k).alias(k)
            for k in sorted(
                {
                    k
                    for row in m.select(F.map_keys("tags").alias("ks")).distinct().collect()
                    for k in row["ks"]
                }
            )
        ],
        *[c for c in wide.columns if c not in ("time_ns", "tags")],
    )
