"""Kafka-compatible consume service: topic = InfluxQL query, fetch = rows.

Reference parity: openGemini's consume service speaks a small subset of
the Kafka wire protocol so stock Kafka consumers can stream query
results out of the store (services/consume/service.go:54-70 registers
exactly six handlers: Fetch v2, ListOffsets v1, Metadata v1,
ApiVersions v1, OffsetCommit v2, Heartbeat v0-registered-at-v1):

- framing — every request/response is a 4-byte big-endian size prefix +
  body (kafka/server.go:156-172 Reader / protocol/codec.go:41-51
  MarshalSize); an incoming frame larger than the configured max kills
  the connection with the same error text (server.go:162-164).
- request header — u16 api_key, u16 api_version, u32 correlation_id,
  u16-length client_id (protocol/request_v1.go:22-54).
- dispatch — per-connection handler table keyed by (api_key, version)
  with ``version = max(1, api_version)`` (kafka/handle/handler.go:106-117);
  an unregistered pair closes the connection.
- Fetch v2 — the topic STRING IS an InfluxQL query
  (consume/fetch.go:68-71: ``topic.Query = req.Topics[0]``). The first
  fetch on a connection compiles and runs it (processor.go:55-106); each
  subsequent fetch returns at most MessageCount(=1) record batch
  (fetch.go:30,91-100), the per-connection offset increments per
  message, and HighwaterMarkOffset = offset + 1 (fetch.go:102). When
  the iterator drains, the processor resets so the NEXT fetch re-runs
  the query from the start (processor.go:118-120) — the drained fetch
  itself returns zero messages.
- ListOffsets/OffsetCommit/Heartbeat — interaction-only, exactly like
  the reference (list_offset.go:24, offset_commit.go:22, heartbeat.go:22
  all say "only the interaction process is implemented"): fixed
  partition-0 rows, error code 0. OffsetCommit v2 and Heartbeat v0
  responses carry NO correlation id (protocol/response_v2.go:90-93,
  response_v1.go:169-171) — quirk preserved.

Spark-first substitution: the reference's fetch payload is its internal
``record.Record`` binary codec (column chunks straight off the TSSP
iterator). That codec is private to the Go engine; here a record batch
is a JSON object ``{"measurement", "tags", "columns", "values"}`` — one
per-series chunk of the query result, same information at the same
batch granularity (sid-per-record ≙ series-per-batch), produced by the
same planner/shape path the HTTP endpoint serves. The query executes in
Spark once per topic; the consume socket only pages out the (already
bounded) shaped result, so this edge service is never the data-plane
bottleneck at scale.
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time

DEFAULT_MAX_REQUEST_SIZE = 1 << 20

# kafka/handle/handler.go:26-36
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3
API_OFFSET_COMMIT = 8
API_HEARTBEAT = 12
API_VERSIONS = 18

# consume/fetch.go:25-31
DEFAULT_THROTTLE = 1
MESSAGE_COUNT = 1


class ProtocolError(Exception):
    """Malformed frame / unsupported API — closes the connection."""


# ---------------------------------------------------------------- codec

def _u16(v: int) -> bytes:
    return struct.pack(">H", v & 0xFFFF)


def _u32(v: int) -> bytes:
    return struct.pack(">I", v & 0xFFFFFFFF)


def _u64(v: int) -> bytes:
    return struct.pack(">Q", v & 0xFFFFFFFFFFFFFFFF)


def _i16(v: int) -> bytes:
    return struct.pack(">h", v)


def _i32(v: int) -> bytes:
    return struct.pack(">i", v)


def _i64(v: int) -> bytes:
    return struct.pack(">q", v)


def _string(s: str) -> bytes:
    b = s.encode("utf-8")
    return _u16(len(b)) + b


def _bytes(b: bytes) -> bytes:
    return _u32(len(b)) + b


def _string_slice(items: list[str]) -> bytes:
    out = _u32(len(items))
    for s in items:
        out += _string(s)
    return out


def _u32_slice(items: list[int]) -> bytes:
    out = _u32(len(items))
    for v in items:
        out += _u32(v)
    return out


class Decoder:
    """Big-endian cursor with CheckSize semantics (lib/codec decoder)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, n: int, what: str) -> bytes:
        if self.pos + n > len(self.buf):
            raise ProtocolError(f"{what}: not enough data")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def remain(self) -> int:
        return len(self.buf) - self.pos

    def u16(self, what: str = "u16") -> int:
        return struct.unpack(">H", self._take(2, what))[0]

    def u32(self, what: str = "u32") -> int:
        return struct.unpack(">I", self._take(4, what))[0]

    def u64(self, what: str = "u64") -> int:
        return struct.unpack(">Q", self._take(8, what))[0]

    def i16(self, what: str = "i16") -> int:
        return struct.unpack(">h", self._take(2, what))[0]

    def i32(self, what: str = "i32") -> int:
        return struct.unpack(">i", self._take(4, what))[0]

    def i64(self, what: str = "i64") -> int:
        return struct.unpack(">q", self._take(8, what))[0]

    def string(self, what: str = "string") -> str:
        n = self.u16(what)
        return self._take(n, what).decode("utf-8")

    def string_slice(self, what: str = "strings") -> list[str]:
        n = self.u32(what)
        return [self.string(what) for _ in range(n)]

    def u32_slice(self, what: str = "u32s") -> list[int]:
        n = self.u32(what)
        return [self.u32(what) for _ in range(n)]

    def nbytes(self, what: str = "bytes") -> bytes:
        n = self.u32(what)
        return self._take(n, what)


def _decode_header(dec: Decoder) -> dict:
    """protocol/request_v1.go:39-54."""
    return {
        "api_key": dec.u16("RequestHeader.ApiKey"),
        "api_version": dec.u16("RequestHeader.ApiVersion"),
        "correlation_id": dec.u32("RequestHeader.CorrelationID"),
        "client_id": dec.string("RequestHeader.ClientID"),
    }


# ------------------------------------------------------------ processor

class _Processor:
    """Runs the topic query once, pages out per-series JSON batches.

    Mirrors consume/processor.go: Init compiles + creates iterators;
    Process hands the next record to the fetch handler, or resets when
    every iterator is drained (processor.go:108-121) so a later fetch
    on the same connection starts over.
    """

    def __init__(self, server: "ConsumeServer"):
        self._server = server
        self._batches: list[bytes] | None = None
        self._idx = 0

    def size(self) -> int:
        return 0 if self._batches is None else len(self._batches)

    def reset(self) -> None:
        self._batches = None
        self._idx = 0

    def init(self, query: str) -> None:
        from opengemini_spark.api import handle_query

        srv = self._server
        resp = handle_query(
            srv.spark, srv.data_root, query, db=srv.db,
            data_root=srv._server_root,
        )
        batches: list[bytes] = []
        for res in resp.get("results", []):
            if "error" in res:
                # processor.Init error path: the fetch fails and the
                # connection is closed (kafka/server.go:118-120).
                raise ProtocolError(res["error"])
            for series in res.get("series", []):
                vals = series.get("values", [])
                for lo in range(0, len(vals), srv.batch_rows):
                    doc = {
                        "measurement": series.get("name"),
                        "tags": series.get("tags", {}),
                        "columns": series.get("columns", []),
                        "values": vals[lo:lo + srv.batch_rows],
                    }
                    batches.append(
                        json.dumps(doc, separators=(",", ":")).encode()
                    )
        self._batches = batches
        if not batches:
            # CreateConsumeIterator returning nothing is an Init error
            # (processor.go:102-104); an empty result set still yields
            # zero iterators here — treat like the reference and let
            # the drained-fetch path answer with no messages instead of
            # killing the connection on a legitimately empty query.
            self._batches = []

    def next_batch(self) -> bytes | None:
        if self._batches is None:
            return None
        if self._idx >= len(self._batches):
            self.reset()  # processor.go:118-120 IteratorReset
            return None
        b = self._batches[self._idx]
        self._idx += 1
        return b


# ------------------------------------------------------------- handlers

class _ConnState:
    """Per-connection handler state (NewHandlerManager per conn,
    kafka/server.go:93; fetch offset lives in the handler,
    fetch.go:33-45)."""

    def __init__(self, server: "ConsumeServer"):
        self.offset = 0
        self.processor = _Processor(server)


def _handle_api_versions(server, state, header, dec) -> bytes:
    """handle/api_version.go:28-47."""
    out = bytearray()
    out += _u32(header["correlation_id"])
    out += _u16(0)
    if header["api_version"] > 0:  # ThrottleTime -1 → omitted
        out += _u32(DEFAULT_THROTTLE)
    versions = [
        (API_VERSIONS, 1, 1),
        (API_LIST_OFFSETS, 1, 1),
        (API_METADATA, 1, 1),
        (API_FETCH, 2, 2),
        (API_OFFSET_COMMIT, 2, 2),
        (API_HEARTBEAT, 1, 1),
    ]
    out += _u32(len(versions))
    for key, lo, hi in versions:
        out += _u16(key) + _u16(lo) + _u16(hi)
    return bytes(out)


def _handle_metadata(server, state, header, dec) -> bytes:
    """consume/metadata.go:39-93 — single-broker layout (this process
    is the one data node; partition leader = broker 0)."""
    topics = dec.string_slice("RequestMetadataV1.Topics")
    out = bytearray()
    out += _u32(header["correlation_id"])
    out += _u32(1)  # brokers
    out += _u32(0)  # NodeID
    out += _string(server.host)
    out += _u32(server.port)
    out += _string("")  # rack
    out += _u32(0)  # ControllerID
    out += _u32(len(topics))
    for t in topics:
        out += _u16(0)          # TopicErrorCode
        out += _string(t)
        out += bytes([0])       # Internal = false
        out += _u32(1)          # one partition per node
        out += _u16(0)          # PartitionErrorCode
        out += _u32(0)          # PartitionID
        out += _u32(0)          # Leader
        out += _u32(0)          # Replicas (empty, metadata.go:87)
        out += _u32(0)          # Isr (empty, metadata.go:88)
    return bytes(out)


def _handle_list_offsets(server, state, header, dec) -> bytes:
    """consume/list_offset.go:32-58 — interaction only: partition 0,
    timestamp now_ns, offset 0 per requested topic."""
    dec.i32("RequestPartitionOffsetV1.ReplicaID")
    topics = dec.string_slice("RequestPartitionOffsetV1.topics")
    dec.u32_slice("RequestPartitionOffsetV1.Partition")
    dec.u64("RequestPartitionOffsetV1.Timestamp")
    out = bytearray()
    out += _u32(header["correlation_id"])
    out += _u32(len(topics))
    for t in topics:
        out += _string(t)
        out += _u32(1)
        out += _u32(0)                  # Partition
        out += _u16(0)                  # ErrorCode
        out += _u64(time.time_ns())     # Timestamp
        out += _u64(0)                  # Offset
    return bytes(out)


def _handle_heartbeat(server, state, header, dec) -> bytes:
    """consume/heartbeat.go:30-42 — decode, answer ErrorCode 0 only
    (no correlation id: protocol/response_v1.go:169-171)."""
    dec.string("RequestHeartbeatV0.GroupID")
    dec.i32("RequestHeartbeatV0.GenerationID")
    dec.string("RequestHeartbeatV0.MemberID")
    return _i16(0)


def _handle_offset_commit(server, state, header, dec) -> bytes:
    """consume/offset_commit.go:30-54 — echo topic list with a fixed
    partition-0/error-0 row each (no correlation id:
    protocol/response_v2.go:90-93)."""
    dec.string("RequestOffsetCommitV2.GroupID")
    dec.i32("RequestOffsetCommitV2.GenerationID")
    dec.string("RequestOffsetCommitV2.MemberID")
    dec.i64("RequestOffsetCommitV2.RetentionTime")
    ntopics = dec.u32("RequestOffsetCommitV2.Topics")
    names = []
    for _ in range(ntopics):
        name = dec.string("RequestOffsetCommitV2Topic.Topic")
        nparts = dec.u32("RequestOffsetCommitV2Topic.Partitions")
        for _ in range(nparts):
            dec.i32("RequestOffsetCommitV2Partition.Partition")
            dec.i64("RequestOffsetCommitV2Partition.Offset")
            dec.string("RequestOffsetCommitV2Partition.Metadata")
        names.append(name)
    out = bytearray()
    out += _u32(len(names))
    for name in names:
        out += _string(name)
        out += _u32(1)
        out += _i32(0)  # Partition
        out += _i16(0)  # ErrorCode
    return bytes(out)


def _handle_fetch(server, state, header, dec) -> bytes:
    """consume/fetch.go:51-104 + protocol/response_v2.go:56-84."""
    dec.i32("RequestFetchV2.ReplicaID")
    dec.u32("RequestFetchV2.MaxWaitTime")
    dec.u32("RequestFetchV2.MinBytes")
    topics = dec.string_slice("RequestFetchV2.Topics")
    partitions = dec.u32_slice("RequestFetchV2.Partition")
    dec.u64("RequestFetchV2.Offset")
    dec.u32("RequestFetchV2.MaxBytes")
    if not topics:
        raise ProtocolError("miss topic")        # errno.MissTopic
    if not partitions:
        raise ProtocolError("miss partitions")   # errno.MissPartitions

    if state.processor.size() == 0:
        state.processor.init(topics[0])  # topic.Query = req.Topics[0]

    messages = bytearray()
    for _ in range(MESSAGE_COUNT):
        payload = state.processor.next_batch()
        if payload is None:
            break
        # FetchMessage (response_v2.go:34-54): Length/Crc/Magic/Attrs
        # are left zero by the reference handler (fetch.go:92-95 sets
        # only FirstOffset and Message) — preserved.
        messages += _u64(state.offset)
        messages += _u32(0)   # Length
        messages += _u32(0)   # CrcOrLeaderEpoch
        messages += bytes([0, 0])  # Magic, Attributes
        messages += _u32(0)   # nil Key
        messages += _u32(len(payload)) + payload
        state.offset += 1

    out = bytearray()
    out += _u32(header["correlation_id"])
    out += _u32(DEFAULT_THROTTLE)
    out += _u32(1)  # only one topic (response_v2.go:77)
    out += _string(topics[0])
    out += _u32(1)  # only one header (response_v2.go:80)
    out += _u32(partitions[0])
    out += _u16(0)
    out += _u64(state.offset + 1)  # HighwaterMarkOffset (fetch.go:102)
    out += _u32(len(messages)) + messages  # MarshalSize(Messages)
    return bytes(out)


# handler.go:92-97 regDef pairs — note Heartbeat registers its v0
# handler AT version 1, and Call clamps ver = max(1, api_version).
_HANDLERS = {
    (API_FETCH, 2): _handle_fetch,
    (API_LIST_OFFSETS, 1): _handle_list_offsets,
    (API_METADATA, 1): _handle_metadata,
    (API_VERSIONS, 1): _handle_api_versions,
    (API_OFFSET_COMMIT, 2): _handle_offset_commit,
    (API_HEARTBEAT, 1): _handle_heartbeat,
}


# --------------------------------------------------------------- server

class ConsumeServer:
    """TCP server speaking the consume subset of the Kafka protocol.

    ``data_root``: directory of parquet measurement tables (the same
    root the HTTP handlers read); ``server_root`` may point at a
    writable server-mode root for measurements created at runtime.
    """

    def __init__(self, spark, data_root: str, host: str = "127.0.0.1",
                 port: int = 0,
                 max_request_size: int = DEFAULT_MAX_REQUEST_SIZE,
                 batch_rows: int = 256, db: str = "db0",
                 server_root: str | None = None):
        self.spark = spark
        self.data_root = data_root
        self.host = host
        self.port = port
        self.max_request_size = max_request_size
        self.batch_rows = batch_rows
        self.db = db
        self._server_root = server_root
        self._sock: socket.socket | None = None
        self._thread: threading.Thread | None = None
        self._closing = False

    def open(self) -> "ConsumeServer":
        sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        sock.bind((self.host, self.port))
        sock.listen()
        self.port = sock.getsockname()[1]
        self._sock = sock
        self._thread = threading.Thread(target=self._accept_loop,
                                        daemon=True)
        self._thread.start()
        return self

    def _accept_loop(self) -> None:
        while not self._closing:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._process, args=(conn,),
                             daemon=True).start()

    def _process(self, conn: socket.socket) -> None:
        # server.go:76-90: handle until error, then close the conn.
        state = _ConnState(self)
        try:
            with conn:
                while True:
                    body = self._read_frame(conn)
                    if body is None:
                        return
                    dec = Decoder(body)
                    header = _decode_header(dec)
                    ver = max(1, header["api_version"])  # handler.go:107
                    fn = _HANDLERS.get((header["api_key"], ver))
                    if fn is None:
                        raise ProtocolError(
                            f"unsupported API: {header['api_key']}, "
                            f"version: {ver}"
                        )
                    payload = fn(self, state, header, dec)
                    conn.sendall(_u32(len(payload)) + payload)
        except (ProtocolError, OSError):
            return

    def _read_frame(self, conn: socket.socket) -> bytes | None:
        size_buf = self._read_n(conn, 4)
        if size_buf is None:
            return None
        size = struct.unpack(">I", size_buf)[0]
        if size > self.max_request_size:
            # server.go:162-164, same message text
            raise ProtocolError(
                f"invalid request size. max: {self.max_request_size}; "
                f"current: {size}"
            )
        return self._read_n(conn, size)

    @staticmethod
    def _read_n(conn: socket.socket, n: int) -> bytes | None:
        buf = bytearray()
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                return None
            buf += chunk
        return bytes(buf)

    def close(self) -> None:
        self._closing = True
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass


# --------------------------------------------------------------- client

class ConsumeClient:
    """Minimal raw-socket client for the consume protocol (the role
    kafka-go plays in server_test.go's TestClient)."""

    def __init__(self, host: str, port: int, client_id: str = "og-py"):
        self.sock = socket.create_connection((host, port), timeout=120)
        self.client_id = client_id
        self._corr = 0

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def _send(self, api_key: int, api_version: int, body: bytes) -> int:
        self._corr += 1
        head = (_u16(api_key) + _u16(api_version) + _u32(self._corr)
                + _string(self.client_id))
        frame = head + body
        self.sock.sendall(_u32(len(frame)) + frame)
        return self._corr

    def _recv(self) -> Decoder:
        size = struct.unpack(">I", self._read_n(4))[0]
        return Decoder(self._read_n(size))

    def _read_n(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed connection")
            buf += chunk
        return bytes(buf)

    def api_versions(self, api_version: int = 1) -> dict:
        corr = self._send(API_VERSIONS, api_version, b"")
        dec = self._recv()
        out = {"correlation_id": dec.u32(), "error_code": dec.u16()}
        if api_version > 0:
            out["throttle"] = dec.u32()
        out["versions"] = [
            (dec.u16(), dec.u16(), dec.u16())
            for _ in range(dec.u32())
        ]
        assert out["correlation_id"] == corr
        return out

    def metadata(self, topics: list[str]) -> dict:
        corr = self._send(API_METADATA, 1, _string_slice(topics))
        dec = self._recv()
        out = {"correlation_id": dec.u32(), "brokers": [], "topics": []}
        for _ in range(dec.u32()):
            out["brokers"].append({
                "node_id": dec.u32(), "host": dec.string(),
                "port": dec.u32(), "rack": dec.string(),
            })
        out["controller_id"] = dec.u32()
        for _ in range(dec.u32()):
            t = {"error_code": dec.u16(), "name": dec.string(),
                 "internal": dec._take(1, "internal") != b"\x00",
                 "partitions": []}
            for _ in range(dec.u32()):
                t["partitions"].append({
                    "error_code": dec.u16(), "partition_id": dec.u32(),
                    "leader": dec.u32(),
                    "replicas": dec.u32_slice(),
                    "isr": dec.u32_slice(),
                })
            out["topics"].append(t)
        assert out["correlation_id"] == corr
        return out

    def list_offsets(self, topics: list[str],
                     partitions: list[int] | None = None,
                     timestamp: int = 0) -> dict:
        body = (_i32(-1) + _string_slice(topics)
                + _u32_slice(partitions or [0]) + _u64(timestamp))
        corr = self._send(API_LIST_OFFSETS, 1, body)
        dec = self._recv()
        out = {"correlation_id": dec.u32(), "topics": []}
        for _ in range(dec.u32()):
            t = {"name": dec.string(), "offsets": []}
            for _ in range(dec.u32()):
                t["offsets"].append({
                    "partition": dec.u32(), "error_code": dec.u16(),
                    "timestamp": dec.u64(), "offset": dec.u64(),
                })
            out["topics"].append(t)
        assert out["correlation_id"] == corr
        return out

    def heartbeat(self, group: str = "g", generation: int = 1,
                  member: str = "m") -> dict:
        self._send(API_HEARTBEAT, 1,
                   _string(group) + _i32(generation) + _string(member))
        dec = self._recv()
        return {"error_code": dec.i16()}

    def offset_commit(self, group: str, commits: dict[str, int]) -> dict:
        body = bytearray()
        body += _string(group) + _i32(1) + _string("m") + _i64(-1)
        body += _u32(len(commits))
        for topic, offset in commits.items():
            body += _string(topic) + _u32(1)
            body += _i32(0) + _i64(offset) + _string("")
        self._send(API_OFFSET_COMMIT, 2, bytes(body))
        dec = self._recv()
        out = {"topics": []}
        for _ in range(dec.u32()):
            t = {"name": dec.string(), "partitions": []}
            for _ in range(dec.u32()):
                t["partitions"].append({
                    "partition": dec.i32(), "error_code": dec.i16(),
                })
            out["topics"].append(t)
        return out

    def fetch(self, topic: str, partition: int = 0,
              offset: int = 0) -> dict:
        body = (_i32(-1) + _u32(500) + _u32(1)
                + _string_slice([topic]) + _u32_slice([partition])
                + _u64(offset) + _u32(1 << 20))
        corr = self._send(API_FETCH, 2, body)
        dec = self._recv()
        out = {"correlation_id": dec.u32(), "throttle": dec.u32()}
        ntopics = dec.u32()
        assert ntopics == 1
        out["topic"] = dec.string()
        nheaders = dec.u32()
        assert nheaders == 1
        out["partition"] = dec.u32()
        out["error_code"] = dec.u16()
        out["highwater"] = dec.u64()
        msg_size = dec.u32()
        end = dec.pos + msg_size
        out["messages"] = []
        while dec.pos < end:
            m = {"offset": dec.u64(), "length": dec.u32(),
                 "crc": dec.u32()}
            magic_attr = dec._take(2, "magic/attr")
            m["magic"], m["attributes"] = magic_attr[0], magic_attr[1]
            m["key"] = dec.nbytes("key")
            m["payload"] = json.loads(dec.nbytes("payload"))
            out["messages"].append(m)
        assert out["correlation_id"] == corr
        return out

    def consume_all(self, topic: str, max_fetches: int = 100000) -> list:
        """Fetch until the drained-reset empty response; returns the
        decoded batch payloads."""
        batches = []
        for _ in range(max_fetches):
            resp = self.fetch(topic)
            if not resp["messages"]:
                return batches
            batches.extend(m["payload"] for m in resp["messages"])
        raise RuntimeError("consume_all: fetch budget exhausted")
