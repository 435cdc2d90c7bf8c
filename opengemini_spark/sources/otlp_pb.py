"""Pure-Python OTLP metrics + logs protobuf wire codec.

Message subset of the public opentelemetry-proto schema
(opentelemetry/proto/collector/metrics/v1/metrics_service.proto +
metrics/v1/metrics.proto + collector/logs/v1/logs_service.proto +
logs/v1/logs.proto + common/v1/common.proto) sufficient for the
``POST /api/v1/otlp/metrics`` and ``POST /api/v1/otlp/logs`` write paths
the reference accepts (handler_otlp.go:107-115) — gauge / sum /
histogram data points and log records, with resource and per-point/record
attributes. Built on the same varint/field-walk primitives as the prompb
codec (``sources/prompb.py``); no protobuf library needed.

Decode targets the decoded-form contracts of
``api.handle_otlp_metrics_write`` / ``api.handle_otlp_logs_write``:
``[{"resource": {attrs}, "metrics": [{"name", "type", "points": [...]}]}]``
and ``[{"resource": {attrs}, "logs": [{...log record...}]}]``.
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
# logs (logs/v1/logs.proto LogRecord + collector ExportLogsServiceRequest)
# ---------------------------------------------------------------------------


def _decode_log_record(data: bytes) -> dict:
    """logs.proto LogRecord: 1 time_unix_nano fixed64, 2 severity_number
    varint, 3 severity_text, 5 body AnyValue, 6 attributes, 7
    dropped_attributes_count varint, 9 trace_id bytes, 10 span_id bytes,
    11 observed_time_unix_nano fixed64."""
    rec = {
        "time_ns": 0,
        "observed_time_ns": 0,
        "severity_number": 0,
        "severity_text": "",
        "body": None,
        "attrs": {},
        "dropped_attributes_count": 0,
        "trace_id": "",
        "span_id": "",
    }
    attrs = []
    for f, wt, v in iter_fields(data):
        if f == 1 and wt == 1:
            rec["time_ns"] = v
        elif f == 2 and wt == 0:
            rec["severity_number"] = int(v)
        elif f == 3 and wt == 2:
            rec["severity_text"] = v.decode("utf-8")
        elif f == 5 and wt == 2:
            rec["body"] = _decode_any_value(v)
        elif f == 6 and wt == 2:
            attrs.append(v)
        elif f == 7 and wt == 0:
            rec["dropped_attributes_count"] = int(v)
        elif f == 9 and wt == 2:
            rec["trace_id"] = v.hex()
        elif f == 10 and wt == 2:
            rec["span_id"] = v.hex()
        elif f == 11 and wt == 1:
            rec["observed_time_ns"] = v
    rec["attrs"] = _decode_attrs(attrs)
    return rec


def decode_export_logs_request(data: bytes) -> list[dict]:
    """ExportLogsServiceRequest bytes → decoded resource_logs list
    (ResourceLogs: 1 resource, 2 scope_logs; ScopeLogs: 2 log_records)."""
    out = []
    for f, wt, v in iter_fields(data):
        if f != 1 or wt != 2:
            continue
        resource_attrs: dict = {}
        logs: list[dict] = []
        for rf, rwt, rv in iter_fields(v):
            if rf == 1 and rwt == 2:      # Resource
                chunks = [
                    av for af, awt, av in iter_fields(rv)
                    if af == 1 and awt == 2
                ]
                resource_attrs = _decode_attrs(chunks)
            elif rf == 2 and rwt == 2:    # ScopeLogs
                logs += [
                    _decode_log_record(sv)
                    for sf, swt, sv in iter_fields(rv)
                    if sf == 2 and swt == 2
                ]
        out.append({"resource": resource_attrs, "logs": logs})
    return out


# ---------------------------------------------------------------------------
# traces (trace/v1/trace.proto Span + collector ExportTraceServiceRequest)
# ---------------------------------------------------------------------------


def _decode_span(data: bytes) -> dict:
    """trace.proto Span subset: 1 trace_id, 2 span_id, 4 parent_span_id,
    5 name, 6 kind varint, 7 start_time_unix_nano fixed64, 8
    end_time_unix_nano fixed64, 9 attributes, 10
    dropped_attributes_count varint, 15 status (1 message, 2 code)."""
    sp = {
        "trace_id": "",
        "span_id": "",
        "parent_span_id": "",
        "name": "",
        "kind": 0,
        "start_time_ns": 0,
        "end_time_ns": 0,
        "attrs": {},
        "dropped_attributes_count": 0,
        "status_code": 0,
        "status_message": "",
    }
    attrs = []
    for f, wt, v in iter_fields(data):
        if f == 1 and wt == 2:
            sp["trace_id"] = v.hex()
        elif f == 2 and wt == 2:
            sp["span_id"] = v.hex()
        elif f == 4 and wt == 2:
            sp["parent_span_id"] = v.hex()
        elif f == 5 and wt == 2:
            sp["name"] = v.decode("utf-8")
        elif f == 6 and wt == 0:
            sp["kind"] = int(v)
        elif f == 7 and wt == 1:
            sp["start_time_ns"] = v
        elif f == 8 and wt == 1:
            sp["end_time_ns"] = v
        elif f == 9 and wt == 2:
            attrs.append(v)
        elif f == 10 and wt == 0:
            sp["dropped_attributes_count"] = int(v)
        elif f == 15 and wt == 2:
            for g, gwt, gv in iter_fields(v):
                if g == 1 and gwt == 2:
                    sp["status_message"] = gv.decode("utf-8")
                elif g == 2 and gwt == 0:
                    sp["status_code"] = int(gv)
    sp["attrs"] = _decode_attrs(attrs)
    return sp


def decode_export_trace_request(data: bytes) -> list[dict]:
    """ExportTraceServiceRequest bytes → decoded resource_spans list
    (ResourceSpans: 1 resource, 2 scope_spans; ScopeSpans: 2 spans)."""
    out = []
    for f, wt, v in iter_fields(data):
        if f != 1 or wt != 2:
            continue
        resource_attrs: dict = {}
        spans: list[dict] = []
        for rf, rwt, rv in iter_fields(v):
            if rf == 1 and rwt == 2:      # Resource
                chunks = [
                    av for af, awt, av in iter_fields(rv)
                    if af == 1 and awt == 2
                ]
                resource_attrs = _decode_attrs(chunks)
            elif rf == 2 and rwt == 2:    # ScopeSpans
                spans += [
                    _decode_span(sv)
                    for sf, swt, sv in iter_fields(rv)
                    if sf == 2 and swt == 2
                ]
        out.append({"resource": resource_attrs, "spans": spans})
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


def _enc_any_typed(v: object) -> bytes:
    """AnyValue with its native wire type (logs carry typed bodies and
    attributes, unlike the stringly metric tag path above)."""
    if isinstance(v, bool):
        return encode_varint(2 << 3 | 0) + encode_varint(1 if v else 0)
    if isinstance(v, int):
        # int64 zigzag-free varint (negative ints use 10-byte two's
        # complement exactly as protobuf int64 does)
        return encode_varint(3 << 3 | 0) + encode_varint(v & 0xFFFFFFFFFFFFFFFF)
    if isinstance(v, float):
        return encode_varint(4 << 3 | 1) + struct.pack("<d", v)
    return _ld(1, str(v).encode("utf-8"))


def _enc_keyvalue_typed(k: str, v: object) -> bytes:
    return _ld(1, k.encode("utf-8")) + _ld(2, _enc_any_typed(v))


def _enc_log_record(rec: dict) -> bytes:
    out = b""
    if rec.get("time_ns"):
        out += _enc_fixed64(1, int(rec["time_ns"]))
    if rec.get("severity_number"):
        out += encode_varint(2 << 3 | 0) + encode_varint(int(rec["severity_number"]))
    if rec.get("severity_text"):
        out += _ld(3, rec["severity_text"].encode("utf-8"))
    if rec.get("body") is not None:
        out += _ld(5, _enc_any_typed(rec["body"]))
    for k, v in rec.get("attrs", {}).items():
        out += _ld(6, _enc_keyvalue_typed(k, v))
    if rec.get("dropped_attributes_count"):
        out += encode_varint(7 << 3 | 0) + encode_varint(
            int(rec["dropped_attributes_count"])
        )
    if rec.get("trace_id"):
        out += _ld(9, bytes.fromhex(rec["trace_id"]))
    if rec.get("span_id"):
        out += _ld(10, bytes.fromhex(rec["span_id"]))
    if rec.get("observed_time_ns"):
        out += _enc_fixed64(11, int(rec["observed_time_ns"]))
    return out


def encode_export_logs_request(resource_logs: list[dict]) -> bytes:
    out = b""
    for rl in resource_logs:
        res = b"".join(
            _ld(1, _enc_keyvalue_typed(k, v))
            for k, v in rl.get("resource", {}).items()
        )
        scope = b"".join(_ld(2, _enc_log_record(r)) for r in rl["logs"])
        out += _ld(1, _ld(1, res) + _ld(2, scope))
    return out


def _enc_span(sp: dict) -> bytes:
    out = b""
    if sp.get("trace_id"):
        out += _ld(1, bytes.fromhex(sp["trace_id"]))
    if sp.get("span_id"):
        out += _ld(2, bytes.fromhex(sp["span_id"]))
    if sp.get("parent_span_id"):
        out += _ld(4, bytes.fromhex(sp["parent_span_id"]))
    if sp.get("name"):
        out += _ld(5, sp["name"].encode("utf-8"))
    if sp.get("kind"):
        out += encode_varint(6 << 3 | 0) + encode_varint(int(sp["kind"]))
    if sp.get("start_time_ns"):
        out += _enc_fixed64(7, int(sp["start_time_ns"]))
    if sp.get("end_time_ns"):
        out += _enc_fixed64(8, int(sp["end_time_ns"]))
    for k, v in sp.get("attrs", {}).items():
        out += _ld(9, _enc_keyvalue_typed(k, v))
    if sp.get("dropped_attributes_count"):
        out += encode_varint(10 << 3 | 0) + encode_varint(
            int(sp["dropped_attributes_count"])
        )
    if sp.get("status_message") or sp.get("status_code"):
        st = b""
        if sp.get("status_message"):
            st += _ld(1, sp["status_message"].encode("utf-8"))
        if sp.get("status_code"):
            st += encode_varint(2 << 3 | 0) + encode_varint(int(sp["status_code"]))
        out += _ld(15, st)
    return out


def encode_export_trace_request(resource_spans: list[dict]) -> bytes:
    out = b""
    for rs in resource_spans:
        res = b"".join(
            _ld(1, _enc_keyvalue_typed(k, v))
            for k, v in rs.get("resource", {}).items()
        )
        scope = b"".join(_ld(2, _enc_span(s)) for s in rs["spans"])
        out += _ld(1, _ld(1, res) + _ld(2, scope))
    return out
