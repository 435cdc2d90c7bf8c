"""Pure-Python OTLP metrics protobuf wire codec.

Message subset of the public opentelemetry-proto schema
(opentelemetry/proto/collector/metrics/v1/metrics_service.proto +
metrics/v1/metrics.proto + common/v1/common.proto) sufficient for the
``POST /api/v1/otlp/metrics`` write path the reference accepts
(handler_otlp.go) — gauge / sum / histogram data points with resource and
datapoint attributes. Built on the same varint/field-walk primitives as
the prompb codec (``sources/prompb.py``); no protobuf library needed.

Decode targets the decoded-form contract of
``api.handle_otlp_metrics_write``:
``[{"resource": {attrs}, "metrics": [{"name", "type", "points": [...]}]}]``.
The encode side exists so tests can exercise real wire bytes end-to-end.
"""

from __future__ import annotations

import struct

from opengemini_spark.sources.prompb import (
    _ld,
    _to_int64,
    encode_varint,
    iter_fields,
)

# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _decode_any_value(data: bytes):
    """common.v1.AnyValue — string/bool/int/double subset (tags become
    strings downstream either way)."""
    for f, wt, v in iter_fields(data):
        if f == 1:
            return v.decode("utf-8")
        if f == 2:
            return bool(v)
        if f == 3:
            return _to_int64(v)
        if f == 4 and wt == 1:
            return struct.unpack("<d", v.to_bytes(8, "little"))[0]
    return None


def _decode_keyvalue(data: bytes) -> tuple[str, object]:
    key, val = "", None
    for f, _wt, v in iter_fields(data):
        if f == 1:
            key = v.decode("utf-8")
        elif f == 2:
            val = _decode_any_value(v)
    return key, val


def _decode_attrs(chunks: list[bytes]) -> dict:
    out = {}
    for c in chunks:
        k, v = _decode_keyvalue(c)
        if k:
            out[k] = v
    return out


def _f64(v: int) -> float:
    return struct.unpack("<d", v.to_bytes(8, "little"))[0]


def _decode_number_point(data: bytes) -> dict:
    p = {"attrs": {}, "time_ns": 0, "value": 0.0}
    attrs = []
    for f, wt, v in iter_fields(data):
        if f == 7 and wt == 2:
            attrs.append(v)
        elif f == 3 and wt == 1:
            p["time_ns"] = v
        elif f == 4 and wt == 1:          # as_double
            p["value"] = _f64(v)
        elif f == 6 and wt == 1:          # as_int (sfixed64)
            p["value"] = float(_to_int64(v))
    p["attrs"] = _decode_attrs(attrs)
    return p


def _packed_fixed64(v: bytes) -> list[int]:
    return [
        int.from_bytes(v[i : i + 8], "little") for i in range(0, len(v), 8)
    ]


def _decode_histogram_point(data: bytes) -> dict:
    p = {
        "attrs": {},
        "time_ns": 0,
        "count": 0,
        "sum": 0.0,
        "bounds": [],
        "bucket_counts": [],
    }
    attrs = []
    for f, wt, v in iter_fields(data):
        if f == 9 and wt == 2:
            attrs.append(v)
        elif f == 3 and wt == 1:
            p["time_ns"] = v
        elif f == 4 and wt == 1:          # count (fixed64)
            p["count"] = v
        elif f == 5 and wt == 1:          # sum (double)
            p["sum"] = _f64(v)
        elif f == 6 and wt == 2:          # bucket_counts (packed fixed64)
            p["bucket_counts"] = _packed_fixed64(v)
        elif f == 7 and wt == 2:          # explicit_bounds (packed double)
            p["bounds"] = [_f64(x) for x in _packed_fixed64(v)]
    p["attrs"] = _decode_attrs(attrs)
    return p


def _decode_metric(data: bytes) -> dict | None:
    name, mtype, points = "", None, []
    for f, wt, v in iter_fields(data):
        if f == 1:
            name = v.decode("utf-8")
        elif f == 5 and wt == 2:          # Gauge
            mtype = "gauge"
            points += [
                _decode_number_point(p)
                for g, gwt, p in iter_fields(v)
                if g == 1 and gwt == 2
            ]
        elif f == 7 and wt == 2:          # Sum
            mtype = "sum"
            points += [
                _decode_number_point(p)
                for g, gwt, p in iter_fields(v)
                if g == 1 and gwt == 2
            ]
        elif f == 9 and wt == 2:          # Histogram
            mtype = "histogram"
            points += [
                _decode_histogram_point(p)
                for g, gwt, p in iter_fields(v)
                if g == 1 and gwt == 2
            ]
        # exponential_histogram(10)/summary(11): skipped — reference
        # otel2influx converts only the prom-compatible shapes
    if mtype is None:
        return None
    return {"name": name, "type": mtype, "points": points}


def decode_export_metrics_request(data: bytes) -> list[dict]:
    """ExportMetricsServiceRequest bytes → decoded resource_metrics list."""
    out = []
    for f, wt, v in iter_fields(data):
        if f != 1 or wt != 2:
            continue
        resource_attrs: dict = {}
        metrics: list[dict] = []
        for rf, rwt, rv in iter_fields(v):
            if rf == 1 and rwt == 2:      # Resource
                chunks = [
                    av for af, awt, av in iter_fields(rv)
                    if af == 1 and awt == 2
                ]
                resource_attrs = _decode_attrs(chunks)
            elif rf == 2 and rwt == 2:    # ScopeMetrics
                for sf, swt, sv in iter_fields(rv):
                    if sf == 2 and swt == 2:
                        m = _decode_metric(sv)
                        if m is not None:
                            metrics.append(m)
        out.append({"resource": resource_attrs, "metrics": metrics})
    return out


# ---------------------------------------------------------------------------
# encode (test fixture path)
# ---------------------------------------------------------------------------


def _enc_any_string(s: str) -> bytes:
    return _ld(1, s.encode("utf-8"))


def _enc_keyvalue(k: str, v: object) -> bytes:
    return _ld(1, k.encode("utf-8")) + _ld(2, _enc_any_string(str(v)))


def _enc_fixed64(field: int, v: int) -> bytes:
    return encode_varint(field << 3 | 1) + v.to_bytes(8, "little")


def _enc_double(field: int, v: float) -> bytes:
    return encode_varint(field << 3 | 1) + struct.pack("<d", v)


def _enc_number_point(p: dict) -> bytes:
    out = b"".join(_ld(7, _enc_keyvalue(k, v)) for k, v in p.get("attrs", {}).items())
    out += _enc_fixed64(3, int(p["time_ns"]))
    out += _enc_double(4, float(p["value"]))
    return out


def _enc_histogram_point(p: dict) -> bytes:
    out = b"".join(_ld(9, _enc_keyvalue(k, v)) for k, v in p.get("attrs", {}).items())
    out += _enc_fixed64(3, int(p["time_ns"]))
    out += _enc_fixed64(4, int(p["count"]))
    out += _enc_double(5, float(p["sum"]))
    out += _ld(6, b"".join(int(c).to_bytes(8, "little") for c in p["bucket_counts"]))
    out += _ld(7, b"".join(struct.pack("<d", b) for b in p["bounds"]))
    return out


def _enc_metric(m: dict) -> bytes:
    out = _ld(1, m["name"].encode("utf-8"))
    mtype = m.get("type", "gauge")
    if mtype in ("gauge", "sum"):
        field = 5 if mtype == "gauge" else 7
        body = b"".join(_ld(1, _enc_number_point(p)) for p in m["points"])
    else:
        field = 9
        body = b"".join(_ld(1, _enc_histogram_point(p)) for p in m["points"])
    return out + _ld(field, body)


def encode_export_metrics_request(resource_metrics: list[dict]) -> bytes:
    out = b""
    for rm in resource_metrics:
        res = b"".join(
            _ld(1, _enc_keyvalue(k, v)) for k, v in rm.get("resource", {}).items()
        )
        scope = b"".join(_ld(2, _enc_metric(m)) for m in rm["metrics"])
        out += _ld(1, _ld(1, res) + _ld(2, scope))
    return out
