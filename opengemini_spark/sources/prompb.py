"""Pure-Python Prometheus remote-write/read wire format.

Implements exactly the subset the endpoints need, from the PUBLIC wire
specifications only — no generated stubs, no C extensions:

- protobuf base-128 varints and the length-delimited message framing
  (protobuf encoding spec);
- the ``prompb`` message shapes used by remote write/read
  (prometheus/prompb/remote.proto + types.proto):
    WriteRequest{ repeated TimeSeries timeseries = 1 }
    TimeSeries  { repeated Label labels = 1; repeated Sample samples = 2 }
    Label       { string name = 1; string value = 2 }
    Sample      { double value = 1; int64 timestamp = 2 }
    ReadRequest { repeated Query queries = 1 }
    Query       { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
                  repeated LabelMatcher matchers = 3 }
    LabelMatcher{ Type type = 1 (EQ/NEQ/RE/NRE); string name = 2;
                  string value = 3 }
    ReadResponse{ repeated QueryResult results = 1 }
    QueryResult { repeated TimeSeries timeseries = 1 }
- the snappy BLOCK format (google/snappy format_description.txt):
  uvarint uncompressed length, then literal / copy-1 / copy-2 / copy-4
  elements. Remote write bodies are snappy-block-compressed
  (reference handler_prom.go servePromWrite → snappy.Decode).

The compressor emits all-literal blocks — valid snappy any decoder
accepts (compression is an encoder freedom, correctness is not) — so the
round-trip is self-contained for tests and for the remote-read response
path.

Reference: ``lib/util/lifted/influx/httpd/handler_prom.go`` (write/read),
``open_src/github.com/golang/snappy`` usage therein.
"""

from __future__ import annotations

import struct

# --- varint ----------------------------------------------------------------


def encode_varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # protobuf int64: two's-complement as uint64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    """Returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _to_int64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


# --- generic protobuf field walk -------------------------------------------


def iter_fields(data: bytes):
    """Yield (field_number, wire_type, value) — value is an int for
    varint(0)/fixed(1,5), bytes for length-delimited(2)."""
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = decode_varint(data, pos)
        field, wt = key >> 3, key & 0x7
        if wt == 0:
            v, pos = decode_varint(data, pos)
            yield field, wt, v
        elif wt == 1:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            yield field, wt, int.from_bytes(data[pos:pos + 8], "little")
            pos += 8
        elif wt == 2:
            ln, pos = decode_varint(data, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            yield field, wt, data[pos:pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            yield field, wt, int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _ld(field: int, payload: bytes) -> bytes:
    return encode_varint(field << 3 | 2) + encode_varint(len(payload)) + payload


# --- prompb decode ----------------------------------------------------------


def _decode_label(data: bytes) -> tuple[str, str]:
    name = value = ""
    for f, _wt, v in iter_fields(data):
        if f == 1:
            name = v.decode("utf-8")
        elif f == 2:
            value = v.decode("utf-8")
    return name, value


def _decode_sample(data: bytes) -> tuple[int, float]:
    value = 0.0
    ts = 0
    for f, wt, v in iter_fields(data):
        if f == 1 and wt == 1:
            value = struct.unpack("<d", v.to_bytes(8, "little"))[0]
        elif f == 2:
            ts = _to_int64(v)
    return ts, value


def decode_write_request(data: bytes) -> list[dict]:
    """prompb.WriteRequest → ``[{"labels": {...}, "samples": [[ms, v]…]}]``
    — the decoded form ``handle_prom_write`` consumes."""
    out = []
    for f, _wt, ts_bytes in iter_fields(data):
        if f != 1:
            continue
        labels: dict[str, str] = {}
        samples: list[list] = []
        for ff, wt, v in iter_fields(ts_bytes):
            if ff == 1:
                k, val = _decode_label(v)
                labels[k] = val
            elif ff == 2:
                ms, fv = _decode_sample(v)
                samples.append([ms, fv])
        out.append({"labels": labels, "samples": samples})
    return out


_MATCHER_OPS = {0: "=", 1: "!=", 2: "=~", 3: "!~"}


def decode_read_request(data: bytes) -> list[dict]:
    """prompb.ReadRequest → ``[{"start_ms", "end_ms", "matchers":
    [{"name", "op", "value"}…]}]``."""
    queries = []
    for f, _wt, qb in iter_fields(data):
        if f != 1:
            continue
        q = {"start_ms": 0, "end_ms": 0, "matchers": []}
        for ff, wt, v in iter_fields(qb):
            if ff == 1:
                q["start_ms"] = _to_int64(v)
            elif ff == 2:
                q["end_ms"] = _to_int64(v)
            elif ff == 3:
                mtype, name, value = 0, "", ""
                for mf, _mwt, mv in iter_fields(v):
                    if mf == 1:
                        mtype = mv
                    elif mf == 2:
                        name = mv.decode("utf-8")
                    elif mf == 3:
                        value = mv.decode("utf-8")
                q["matchers"].append(
                    {"name": name, "op": _MATCHER_OPS[mtype], "value": value}
                )
        queries.append(q)
    return queries


# --- prompb encode (tests + read-response path) -----------------------------


def _encode_label(name: str, value: str) -> bytes:
    return _ld(1, name.encode()) + _ld(2, value.encode())


def _encode_sample(ms: int, value: float) -> bytes:
    return (
        encode_varint(1 << 3 | 1) + struct.pack("<d", value)
        + encode_varint(2 << 3) + encode_varint(ms)
    )


def _encode_timeseries(labels: dict[str, str] | list, samples: list) -> bytes:
    body = b""
    items = labels.items() if isinstance(labels, dict) else (
        (l["name"], l["value"]) for l in labels
    )
    for k, v in items:
        body += _ld(1, _encode_label(k, v))
    for s in samples:
        ms, v = (s["timestamp"], s["value"]) if isinstance(s, dict) else s
        body += _ld(2, _encode_sample(int(ms), float(v)))
    return body


def encode_write_request(timeseries: list[dict]) -> bytes:
    out = b""
    for ts in timeseries:
        out += _ld(1, _encode_timeseries(ts["labels"], ts["samples"]))
    return out


def encode_read_response(results: list[dict]) -> bytes:
    """``{"results": [{"timeseries": [...]}]}`` (handle_prom_read's decoded
    output) → prompb.ReadResponse bytes."""
    out = b""
    for res in results:
        qr = b""
        for ts in res["timeseries"]:
            qr += _ld(1, _encode_timeseries(ts["labels"], ts["samples"]))
        out += _ld(1, qr)
    return out


def encode_read_request(queries: list[dict]) -> bytes:
    _OPS = {v: k for k, v in _MATCHER_OPS.items()}
    out = b""
    for q in queries:
        body = (
            encode_varint(1 << 3) + encode_varint(int(q["start_ms"]))
            + encode_varint(2 << 3) + encode_varint(int(q["end_ms"]))
        )
        for m in q.get("matchers", []):
            mb = (
                encode_varint(1 << 3) + encode_varint(_OPS[m["op"]])
                + _ld(2, m["name"].encode()) + _ld(3, m["value"].encode())
            )
            body += _ld(3, mb)
        out += _ld(1, body)
    return out


# --- snappy block format ----------------------------------------------------


def snappy_decompress(data: bytes) -> bytes:
    """Decode the snappy BLOCK format (format_description.txt)."""
    expected, pos = decode_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        elem_type = tag & 0x3
        if elem_type == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nbytes = ln - 59
                if pos + nbytes > n:
                    raise ValueError("truncated literal length")
                ln = int.from_bytes(data[pos:pos + nbytes], "little")
                pos += nbytes
            ln += 1
            if pos + ln > n:
                raise ValueError("truncated literal")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if elem_type == 1:  # copy, 1-byte offset
            length = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise ValueError("truncated copy-1")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif elem_type == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("truncated copy-2")
            offset = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("truncated copy-4")
            offset = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("invalid copy offset")
        # copies may overlap the output tail (run-length encoding)
        for _ in range(length):
            out.append(out[-offset])
    if len(out) != expected:
        raise ValueError(
            f"snappy: declared {expected} bytes, produced {len(out)}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """All-literal snappy block — valid output of a compliant encoder
    (trades ratio for simplicity; every decoder must accept it)."""
    out = bytearray(encode_varint(len(data)))
    pos = 0
    n = len(data)
    while pos < n:
        chunk = data[pos:pos + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < (1 << 8):
            out.append(60 << 2)
            out += ln.to_bytes(1, "little")
        elif ln < (1 << 16):
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += ln.to_bytes(3, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)
