"""Kafka-compatible consume service e2e over a real loopback socket.

Mirrors the reference's test strategy (services/consume/kafka/
server_test.go TestClient drives a live server through ApiVersions →
Metadata → ListOffsets → Fetch → OffsetCommit → Heartbeat;
processor_test.go checks Init/reset behavior) — here with the raw
byte-layout client from kafka_consume so every response is decoded
against the exact wire spec.
"""

from __future__ import annotations

import socket
import struct

import pytest

from opengemini_spark.sources.kafka_consume import (
    API_FETCH,
    API_HEARTBEAT,
    API_LIST_OFFSETS,
    API_METADATA,
    API_OFFSET_COMMIT,
    API_VERSIONS,
    ConsumeClient,
    ConsumeServer,
    _string,
    _string_slice,
    _u16,
    _u32,
    _u32_slice,
    _u64,
    _i32,
)

TOPIC = ("SELECT value, user_id FROM events "
         "WHERE value > 180 AND event_type = 'click'")


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    srv = ConsumeServer(spark, sf_dir, batch_rows=4).open()
    yield srv
    srv.close()


@pytest.fixture()
def client(server):
    c = ConsumeClient("127.0.0.1", server.port)
    yield c
    c.close()


def test_api_versions_v1_and_v0_throttle_quirk(server):
    # v1: throttle present; v0 request is clamped to the v1 handler but
    # header.ApiVersion==0 → ThrottleTime -1 → field omitted
    # (api_version.go:42-44, response_v1.go:45-47).
    c = ConsumeClient("127.0.0.1", server.port)
    try:
        v1 = c.api_versions(api_version=1)
        assert v1["error_code"] == 0
        assert v1["throttle"] == 1
        got = {k: (lo, hi) for k, lo, hi in v1["versions"]}
        assert got == {
            API_VERSIONS: (1, 1), API_LIST_OFFSETS: (1, 1),
            API_METADATA: (1, 1), API_FETCH: (2, 2),
            API_OFFSET_COMMIT: (2, 2), API_HEARTBEAT: (1, 1),
        }
        v0 = c.api_versions(api_version=0)
        assert "throttle" not in v0
        assert len(v0["versions"]) == 6
    finally:
        c.close()


def test_metadata_single_broker(client, server):
    md = client.metadata(["t1", "t2"])
    assert [b["port"] for b in md["brokers"]] == [server.port]
    assert md["brokers"][0]["host"] == "127.0.0.1"
    assert md["controller_id"] == 0
    assert [t["name"] for t in md["topics"]] == ["t1", "t2"]
    for t in md["topics"]:
        assert t["error_code"] == 0 and not t["internal"]
        assert len(t["partitions"]) == 1
        p = t["partitions"][0]
        # replicas/isr empty (metadata.go:87-88)
        assert p["replicas"] == [] and p["isr"] == []
        assert p["partition_id"] == 0 and p["leader"] == 0


def test_list_offsets_interaction(client):
    resp = client.list_offsets(["a", "b", "c"])
    assert [t["name"] for t in resp["topics"]] == ["a", "b", "c"]
    for t in resp["topics"]:
        (row,) = t["offsets"]
        assert row["partition"] == 0 and row["error_code"] == 0
        assert row["offset"] == 0 and row["timestamp"] > 0


def test_heartbeat_and_offset_commit_no_correlation_id(client):
    # Both responses are payload-only (response_v1.go:169-171,
    # response_v2.go:90-93): heartbeat is exactly 2 bytes.
    hb = client.heartbeat("grp", 3, "member-1")
    assert hb["error_code"] == 0
    oc = client.offset_commit("grp", {"topicA": 42, "topicB": 7})
    assert [t["name"] for t in oc["topics"]] == ["topicA", "topicB"]
    for t in oc["topics"]:
        (p,) = t["partitions"]
        assert p["partition"] == 0 and p["error_code"] == 0


def test_fetch_streams_query_rows(client, spark, sf_dir):
    batches = client.consume_all(TOPIC)
    rows = [tuple(v) for b in batches for v in b["values"]]
    # every batch carries the shaped series frame
    assert all(b["measurement"] == "events" for b in batches)
    assert all(b["columns"] == ["time", "value", "user_id"]
               for b in batches)
    assert all(len(b["values"]) <= 4 for b in batches)
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    expected = (df.filter("value > 180 AND event_type = 'click'")
                .count())
    assert len(rows) == expected > 0
    assert all(v > 180 for _, v, _ in rows)


def test_fetch_offsets_and_reset_cycle(server):
    """One message per fetch (fetch.go:30), offset increments, the
    drained fetch returns zero messages + resets, and the NEXT fetch
    re-runs the query from the start (processor.go:118-120)."""
    c = ConsumeClient("127.0.0.1", server.port)
    try:
        topic = ("SELECT value FROM events "
                 "WHERE value > 195 AND event_type = 'click'")
        firsts, offsets = [], []
        for i in range(50):
            resp = c.fetch(topic)
            if not resp["messages"]:
                break
            (m,) = resp["messages"]
            offsets.append(m["offset"])
            firsts.append(m["payload"]["values"][0])
            # zero-value FetchMessage framing quirks (fetch.go:92-95)
            assert m["length"] == 0 and m["crc"] == 0
            assert m["magic"] == 0 and m["attributes"] == 0
            assert m["key"] == b""
            assert resp["highwater"] == m["offset"] + 2
        assert offsets == list(range(len(offsets)))
        assert 0 < len(offsets) < 50
        # second consume cycle: same data, continuing offsets
        resp = c.fetch(topic)
        (m,) = resp["messages"]
        assert m["offset"] == len(offsets)
        assert m["payload"]["values"][0] == firsts[0]
    finally:
        c.close()


def test_fetch_missing_topic_closes_connection(server):
    c = ConsumeClient("127.0.0.1", server.port)
    try:
        body = (_i32(-1) + _u32(500) + _u32(1)
                + _string_slice([]) + _u32_slice([0])
                + _u64(0) + _u32(1 << 20))
        c._send(API_FETCH, 2, body)
        with pytest.raises(ConnectionError):
            c._recv()
    finally:
        c.close()


def test_bad_query_topic_closes_connection(server):
    c = ConsumeClient("127.0.0.1", server.port)
    try:
        c.fetch("SELECT value FROM no_such_measurement")
        raise AssertionError("expected connection close")
    except (ConnectionError, struct.error, OSError):
        pass
    finally:
        c.close()


def test_unsupported_api_closes_connection(server):
    c = ConsumeClient("127.0.0.1", server.port)
    try:
        c._send(99, 1, b"")
        with pytest.raises(ConnectionError):
            c._recv()
    finally:
        c.close()


def test_oversized_frame_closes_connection(spark, sf_dir):
    srv = ConsumeServer(spark, sf_dir, max_request_size=64).open()
    try:
        sock = socket.create_connection(("127.0.0.1", srv.port),
                                        timeout=30)
        sock.sendall(_u32(65))
        sock.sendall(b"x" * 65)
        try:
            assert sock.recv(1) == b""  # orderly close
        except ConnectionResetError:
            pass  # or RST — unread bytes were pending at close
        sock.close()
    finally:
        srv.close()


def test_request_header_roundtrip_layout():
    # byte-exact header framing: u16 key, u16 ver, u32 corr, u16-len id
    head = _u16(1) + _u16(2) + _u32(7) + _string("cid")
    assert head == bytes([0, 1, 0, 2, 0, 0, 0, 7, 0, 3]) + b"cid"
