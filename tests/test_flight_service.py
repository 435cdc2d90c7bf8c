"""Arrow Flight service end-to-end: do_put ingest → parquet measurement →
do_get / InfluxQL egress, discovery, and token auth rejection.

Mirrors services/arrowflight/service.go behavior (write path + auth) over
a real gRPC loopback server.
"""

import json

import pyarrow as pa
import pyarrow.flight as fl
import pytest

from opengemini_spark.sources.flight_service import GeminiFlightServer


def _batch(n=10, t0=1_700_000_000_000_000_000):
    return pa.table(
        {
            "time_ns": pa.array(
                [t0 + i * 1_000_000_000 for i in range(n)], pa.int64()
            ),
            "host": pa.array([f"h{i % 2}" for i in range(n)]),
            "usage": pa.array([float(i) for i in range(n)]),
        }
    )


@pytest.fixture()
def server(spark, tmp_path):
    srv = GeminiFlightServer(spark, str(tmp_path / "data"))
    yield srv
    srv.shutdown()


def test_put_get_roundtrip_and_discovery(server):
    client = fl.connect(f"grpc://127.0.0.1:{server.port}")
    desc = fl.FlightDescriptor.for_path(b"db0", b"autogen", b"cpu")
    table = _batch()
    writer, _ = client.do_put(desc, table.schema)
    writer.write_table(table)
    writer.close()

    # discovery sees the measurement with the ingested row count
    infos = list(client.list_flights())
    assert [i.descriptor.path[0].decode() for i in infos] == ["cpu"]
    assert infos[0].total_records == 10

    # raw egress round-trips every row
    got = client.do_get(
        fl.Ticket(json.dumps({"measurement": "cpu"}).encode())
    ).read_all()
    assert got.num_rows == 10
    assert {"time_ns", "host", "usage"} <= set(got.schema.names)

    # InfluxQL egress: aggregate over the flight-ingested data
    got = client.do_get(
        fl.Ticket(
            json.dumps(
                {"influxql": "SELECT mean(usage) FROM cpu GROUP BY host"}
            ).encode()
        )
    ).read_all()
    by_host = dict(
        zip(
            (str(h) for h in got.column("host").to_pylist()),
            got.column("mean").to_pylist(),
        )
    )
    assert by_host["h0"] == pytest.approx(4.0)  # mean(0,2,4,6,8)
    assert by_host["h1"] == pytest.approx(5.0)


def test_put_with_timestamp_column(server, spark):
    client = fl.connect(f"grpc://127.0.0.1:{server.port}")
    table = pa.table(
        {
            "time": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
            "v": pa.array([1.5]),
        }
    )
    writer, _ = client.do_put(
        fl.FlightDescriptor.for_command(
            json.dumps({"measurement": "mem"}).encode()
        ),
        table.schema,
    )
    writer.write_table(table)
    writer.close()
    got = client.do_get(
        fl.Ticket(json.dumps({"measurement": "mem"}).encode())
    ).read_all()
    assert got.column("time_ns").to_pylist() == [1_700_000_000_000_000_000]


def test_token_auth_rejects_and_accepts(spark, tmp_path):
    srv = GeminiFlightServer(spark, str(tmp_path / "d"), token="s3cret")
    try:
        client = fl.connect(f"grpc://127.0.0.1:{srv.port}")
        with pytest.raises(fl.FlightUnauthenticatedError):
            list(client.list_flights())
        opts = fl.FlightCallOptions(headers=[(b"authorization", b"Bearer s3cret")])
        assert list(client.list_flights(options=opts)) == []
    finally:
        srv.shutdown()
