"""Arrow Flight service: record-batch ingest + query results over gRPC.

Reference parity: openGemini's arrowflight service
(services/arrowflight/service.go) accepts DoPut streams whose flight
descriptor names {db, rp, measurement} and appends the decoded record
batches into the store; clients authenticate with a token. This is the
Spark-first re-expression:

- ``do_put``   — descriptor path ``db/rp/measurement`` (or a JSON command
  ``{"measurement": ...}``); the batch stream is read as one Arrow table,
  converted via ``spark.createDataFrame`` (Arrow fast path), and appended
  to the time-partitioned parquet measurement table
  (``storage.write_measurement`` — same sink as line-protocol writes).
- ``do_get``   — ticket ``{"measurement": m}`` streams the table back;
  ticket ``{"influxql": "SELECT ..."}`` plans the statement through the
  InfluxQL planner and streams the result — Arrow end-to-end
  (``DataFrame.toArrow``), no JSON re-encoding.
- ``list_flights`` / ``get_flight_info`` — measurement discovery with
  schema + row counts, mirroring the catalog listing.
- token auth — a server middleware requiring
  ``authorization: Bearer <token>`` on every call (service.go's
  handshake/token check, expressed as gRPC header middleware).

Scale note: this service is an ingest/egress edge, not a data-plane
bottleneck — batches land as parquet appends and queries execute in
Spark; the Flight stream only carries the (already bounded) result.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.flight as fl
from pyspark.sql import SparkSession, functions as F

from opengemini_spark import storage
from opengemini_spark.influxql import ast  # noqa: F401  (parser dep)
from opengemini_spark.influxql.parser import parse
from opengemini_spark.influxql.planner import plan


class _BearerTokenMiddleware(fl.ServerMiddleware):
    def __init__(self):
        pass


class _BearerTokenFactory(fl.ServerMiddlewareFactory):
    """Rejects any call without ``authorization: Bearer <token>``."""

    def __init__(self, token: str):
        self._token = token

    def start_call(self, info, headers):
        auth = headers.get("authorization") or headers.get("Authorization")
        want = f"Bearer {self._token}"
        if not auth or auth[0] != want:
            raise fl.FlightUnauthenticatedError("invalid or missing token")
        return _BearerTokenMiddleware()


def _measurement_from_descriptor(descriptor: fl.FlightDescriptor) -> str:
    if descriptor.path:
        # db/rp/measurement — the measurement is the last path segment
        return descriptor.path[-1].decode()
    cmd = json.loads(descriptor.command.decode())
    return cmd["measurement"]


class GeminiFlightServer(fl.FlightServerBase):
    def __init__(
        self,
        spark: SparkSession,
        data_root: str,
        location: str = "grpc://127.0.0.1:0",
        token: str | None = None,
    ):
        middleware = (
            {"auth": _BearerTokenFactory(token)} if token is not None else None
        )
        super().__init__(location, middleware=middleware)
        self.spark = spark
        self.data_root = data_root

    # -- ingest ------------------------------------------------------------

    def do_put(self, context, descriptor, reader, writer):
        measurement = _measurement_from_descriptor(descriptor)
        table = reader.read_all()
        df = self.spark.createDataFrame(table.to_pandas())
        if "time_ns" not in df.columns:
            if "time" in df.columns:
                # timestamp column → ns epoch (µs precision ×1000)
                df = df.withColumn(
                    "time_ns",
                    (F.unix_micros(F.col("time")) * F.lit(1000)).cast("long"),
                ).drop("time")
            else:
                raise fl.FlightServerError(
                    "batch needs a time_ns (int64) or time (timestamp) column"
                )
        storage.write_measurement(df, os.path.join(self.data_root, measurement))

    # -- egress ------------------------------------------------------------

    def do_get(self, context, ticket):
        req = json.loads(ticket.ticket.decode())
        if "influxql" in req:
            stmt = parse(req["influxql"])
            df = plan(
                self.spark,
                req.get("sf_dir", self.data_root),
                stmt,
                loader=self._loader,
            )
        else:
            df = storage.read_measurement(
                self.spark,
                os.path.join(self.data_root, req["measurement"]),
            )
        limit = int(req.get("limit", 1_000_000))
        return fl.RecordBatchStream(df.limit(limit).toArrow())

    def _loader(self, name: str):
        return storage.read_measurement(
            self.spark, os.path.join(self.data_root, name)
        )

    # -- discovery ---------------------------------------------------------

    def _measurements(self) -> list[str]:
        if not os.path.isdir(self.data_root):
            return []
        return sorted(
            d for d in os.listdir(self.data_root)
            if os.path.isdir(os.path.join(self.data_root, d))
        )

    def _info(self, name: str) -> fl.FlightInfo:
        df = storage.read_measurement(
            self.spark, os.path.join(self.data_root, name)
        )
        schema = pa.schema(
            [pa.field(f.name, pa.string() if f.dataType.simpleString() ==
                      "string" else pa.from_numpy_dtype("int64")
                      if f.dataType.simpleString() in ("bigint", "long")
                      else pa.float64())
             for f in df.schema.fields
             if f.dataType.simpleString() in
             ("string", "bigint", "long", "double")]
        )
        ticket = fl.Ticket(json.dumps({"measurement": name}).encode())
        endpoint = fl.FlightEndpoint(ticket, [])
        return fl.FlightInfo(
            schema,
            fl.FlightDescriptor.for_path(name.encode()),
            [endpoint],
            df.count(),
            -1,
        )

    def list_flights(self, context, criteria):
        for name in self._measurements():
            yield self._info(name)

    def get_flight_info(self, context, descriptor):
        return self._info(_measurement_from_descriptor(descriptor))
