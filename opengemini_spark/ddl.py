"""DDL statements + metadata store (SURVEY.md §2.11).

Reference dispatch: ``statement_executor.go:241-450`` — CREATE/DROP
DATABASE, RETENTION POLICY, MEASUREMENT; SHOW DATABASES / RETENTION
POLICIES; DELETE/DROP SERIES. The raft-replicated ts-meta store becomes a
JSON metadata file next to the data (on a cluster: the lakehouse catalog);
row deletion becomes a partition-wise rewrite (no tombstones needed —
partitions are immutable day buckets).
"""

from __future__ import annotations

import json
import re
import shutil
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession, functions as F

from opengemini_spark import storage
from opengemini_spark.influxql.lexer import DUR_NS


@dataclass
class RetentionPolicy:
    name: str
    duration_ns: int
    shard_group_duration_ns: int = 86_400_000_000_000  # 1d partitions
    default: bool = False
    hot_duration_ns: int = 0
    warm_duration_ns: int = 0
    index_duration_ns: int = 0    # 0 → tracks shard group duration
    replica_n: int = 1


def _go_dur(ns: int) -> str:
    """Go ``time.Duration.String()`` for whole-second durations:
    ``0s``, ``1h0m0s``, ``168h0m0s`` (meta/data.go ShowRetentionPolicies
    marshals durations with Duration.String())."""
    if ns == 0:
        return "0s"
    s, rem_ns = divmod(ns, 10**9)
    frac = ""
    if rem_ns:
        frac = f"{rem_ns / 1e9:.9f}".rstrip("0")[1:]  # ".5" style
    h, s = divmod(s, 3600)
    m, s = divmod(s, 60)
    if h:
        return f"{h}h{m}m{s}{frac}s"
    if m:
        return f"{m}m{s}{frac}s"
    return f"{s}{frac}s"


def _norm_shard_group_ns(duration_ns: int) -> int:
    """Default shard-group duration by retention duration
    (lifted influxdb meta: 0→168h, <2d→1h, <6mo→1d, else 7d)."""
    if duration_ns == 0:
        return 7 * 24 * 3_600_000_000_000
    if duration_ns < 2 * 24 * 3_600_000_000_000:
        return 3_600_000_000_000
    if duration_ns < 180 * 24 * 3_600_000_000_000:
        return 24 * 3_600_000_000_000
    return 7 * 24 * 3_600_000_000_000


@dataclass
class Database:
    name: str
    retention_policies: dict[str, RetentionPolicy] = field(default_factory=dict)
    measurements: list[str] = field(default_factory=list)
    tag_array: bool = False       # EnableTagArray (detail: "array")
    replica_n: int = 1


class MetaStore:
    """JSON-file metadata catalog (ts-meta analog, single-writer)."""

    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.path = self.root / "_meta.json"
        self.databases: dict[str, Database] = {}
        self.users: dict[str, dict] = {}
        self.streams: dict[str, dict] = {}
        self.cqs: dict[str, dict] = {}
        self.subscriptions: dict[str, dict] = {}
        if self.path.exists():
            raw = json.loads(self.path.read_text())
            self.users = raw.pop("__users__", {})
            self.streams = raw.pop("__streams__", {})
            self.cqs = raw.pop("__cqs__", {})
            self.subscriptions = raw.pop("__subscriptions__", {})
            for name, d in raw.items():
                db = Database(
                    name,
                    {
                        r["name"]: RetentionPolicy(**r)
                        for r in d["retention_policies"].values()
                    },
                    d["measurements"],
                )
                self.databases[name] = db

    def save(self) -> None:
        self.path.write_text(
            json.dumps(
                {
                    **{
                        n: {
                            "name": d.name,
                            "retention_policies": {
                                rn: asdict(rp)
                                for rn, rp in d.retention_policies.items()
                            },
                            "measurements": d.measurements,
                        }
                        for n, d in self.databases.items()
                    },
                    "__users__": self.users,
                    "__streams__": self.streams,
                    "__subscriptions__": self.subscriptions,
                    "__cqs__": self.cqs,
                },
                indent=1,
            )
        )

    def db_dir(self, db: str) -> Path:
        return self.root / db


_DUR_RE = re.compile(r"(\d+)(ns|u|ms|s|m|h|d|w)")


def _dur_ns(s: str) -> int:
    if s.lower() == "inf":
        return 0
    return sum(int(v) * DUR_NS[u] for v, u in _DUR_RE.findall(s))


class DDLExecutor:
    """Regex-dispatch executor for the DDL surface (the reference's own DDL
    grammar is flat keyword sequences — sql.y DDL productions)."""

    def __init__(self, spark: SparkSession, meta: MetaStore):
        self.spark = spark
        self.meta = meta

    def execute(self, q: str) -> dict:
        s = q.strip().rstrip(";")
        low = s.lower()
        for pattern, fn in self._DISPATCH:
            m = re.match(pattern, low)
            if m:
                return fn(self, s, m)
        raise ValueError(f"DDL: unsupported statement {q!r}")

    # --- databases ---
    def _create_db(self, s, m):
        """CREATE DATABASE [WITH DURATION d [REPLICATION n]
        [SHARD DURATION d] [NAME rp]] — the WITH clause configures the
        initial retention policy instead of the autogen default
        (statement_executor.go executeCreateDatabaseStatement)."""
        name = m.group(1)
        dur, shard_dur, rp_name = m.group(2), m.group(3), m.group(4)
        if name not in self.meta.databases:
            self.meta.databases[name] = Database(name)
            rp = RetentionPolicy(
                rp_name or "autogen",
                _dur_ns(dur) if dur else 0,
                default=True,
            )
            rp.shard_group_duration_ns = (
                _dur_ns(shard_dur) if shard_dur
                else _norm_shard_group_ns(rp.duration_ns)
            )
            self.meta.databases[name].retention_policies[rp.name] = rp
            self.meta.db_dir(name).mkdir(parents=True, exist_ok=True)
            self.meta.save()
        return {"ok": True}

    def _drop_db(self, s, m):
        name = m.group(1)
        self.meta.databases.pop(name, None)
        shutil.rmtree(self.meta.db_dir(name), ignore_errors=True)
        self.meta.save()
        return {"ok": True}

    def _show_dbs(self, s, m):
        return {
            "series": [
                {
                    "name": "databases",
                    "columns": ["name"],
                    "values": [[n] for n in sorted(self.meta.databases)],
                }
            ]
        }

    def _show_dbs_detail(self, s, m):
        """SHOW DATABASES DETAIL: name, ReplicaN, Tag Attribute
        (statement_executor.go executeShowDatabasesStatement ShowDetail)."""
        return {
            "series": [
                {
                    "name": "databases",
                    "columns": ["name", "ReplicaN", "Tag Attribute"],
                    "values": [
                        [
                            n,
                            d.replica_n,
                            "array" if d.tag_array else "default",
                        ]
                        for n, d in sorted(self.meta.databases.items())
                    ],
                }
            ]
        }

    # --- retention policies ---
    def _create_rp(self, s, m):
        rp_name, db, dur = m.group(1), m.group(2), m.group(3)
        d = self.meta.databases[db]
        rp = RetentionPolicy(rp_name, _dur_ns(dur), default="default" in m.group(0))
        rp.shard_group_duration_ns = _norm_shard_group_ns(rp.duration_ns)
        d.retention_policies[rp_name] = rp
        if rp.default:
            for other in d.retention_policies.values():
                other.default = other.name == rp_name
        self.meta.save()
        return {"ok": True}

    def _show_rps(self, s, m):
        """Nameless row, Go duration strings, name-sorted
        (meta/data.go ShowRetentionPolicies)."""
        db = m.group(1)
        if db not in self.meta.databases:
            raise ValueError(f"database not found: {db}")
        rps = self.meta.databases[db].retention_policies
        return {
            "series": [
                {
                    "columns": [
                        "name", "duration", "shardGroupDuration",
                        "hot duration", "warm duration", "index duration",
                        "replicaN", "default",
                    ],
                    "values": sorted(
                        [
                            r.name,
                            _go_dur(r.duration_ns),
                            _go_dur(r.shard_group_duration_ns),
                            _go_dur(r.hot_duration_ns),
                            _go_dur(r.warm_duration_ns),
                            _go_dur(
                                r.index_duration_ns
                                or r.shard_group_duration_ns
                            ),
                            r.replica_n,
                            r.default,
                        ]
                        for r in rps.values()
                    ),
                }
            ]
        }

    # --- measurements / series ---
    def _drop_measurement(self, s, m):
        name = m.group(1)
        for d in self.meta.databases.values():
            if name in d.measurements:
                d.measurements.remove(name)
                shutil.rmtree(self.meta.db_dir(d.name) / name, ignore_errors=True)
        self.meta.save()
        return {"ok": True}

    def _delete_where_time(self, s, m):
        """DELETE FROM <m> WHERE time < '…' — partition-wise rewrite: whole
        partitions before the cutoff are dropped; the boundary partition is
        rewritten with the residual filter."""
        name, op, cutoff_ns = m.group(1), m.group(2), int(m.group(3))
        assert op in ("<", "<="), "DELETE supports time < / <= cutoffs"
        found = None
        for d in self.meta.databases.values():
            if name in d.measurements:
                found = self.meta.db_dir(d.name) / name
        if found is None:
            raise ValueError(f"DELETE: unknown measurement {name!r}")
        root = str(found)
        cutoff_day = str(
            __import__("datetime").datetime.fromtimestamp(
                cutoff_ns / 1e9, __import__("datetime").timezone.utc
            ).date()
        )
        storage.retention_drop(root, cutoff_day)
        # rewrite the boundary partition with the residual predicate
        part = Path(root) / f"{storage.PARTITION_COL}={cutoff_day}"
        if part.exists():
            df = self.spark.read.parquet(str(part))
            kept = df.filter(~(
                F.col("time_ns") < cutoff_ns if op == "<"
                else F.col("time_ns") <= cutoff_ns
            ))
            tmp = str(part) + ".rewrite"
            kept.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(part)
            Path(tmp).rename(part)
        return {"ok": True}

    def _show_shards(self, s, m):
        """SHOW SHARDS: one row per (db, measurement, time partition) —
        shard groups are the parquet day-partition directories."""
        rows = []
        for db in sorted(self.meta.databases):
            for mst in sorted(self.meta.databases[db].measurements):
                root = self.meta.db_dir(db) / mst
                for p in sorted(root.glob(f"{storage.PARTITION_COL}=*")):
                    rows.append([db, mst, p.name.split("=", 1)[1]])
        return {
            "series": [
                {
                    "name": "shards",
                    "columns": ["database", "measurement", "shard_group"],
                    "values": rows,
                }
            ]
        }

    # --- admin surface (statement_executor.go:241-450 dispatch rows) ---
    def _alter_rp(self, s, m):
        """ALTER RETENTION POLICY … DURATION … [DEFAULT]."""
        rp_name, db, dur = m.group(1), m.group(2), m.group(3)
        d = self.meta.databases[db]
        if rp_name not in d.retention_policies:
            raise ValueError(f"retention policy not found: {rp_name}")
        rp = d.retention_policies[rp_name]
        rp.duration_ns = _dur_ns(dur)
        if m.group(4):
            for other in d.retention_policies.values():
                other.default = other.name == rp_name
        self.meta.save()
        return {"ok": True}

    def _create_measurement(self, s, m):
        """CREATE MEASUREMENT <name> (columnstore DDL,
        statement_executor.go CreateMeasurement): pre-registers the
        measurement in meta so SHOW MEASUREMENTS lists it before first
        write."""
        db = next(iter(sorted(self.meta.databases)), None)
        if db is None:
            raise ValueError("CREATE MEASUREMENT requires a database")
        self.register_measurement(db, m.group(1))
        return {"ok": True}

    def _create_user(self, s, m):
        name = m.group(1)
        self.meta.users[name] = {"admin": bool(m.group(2)), "grants": {}}
        self.meta.save()
        return {"ok": True}

    def _drop_user(self, s, m):
        if m.group(1) not in self.meta.users:
            raise ValueError(f"user not found: {m.group(1)}")
        del self.meta.users[m.group(1)]
        self.meta.save()
        return {"ok": True}

    def _show_grants(self, s, m):
        user = m.group(1)
        if user not in self.meta.users:
            raise ValueError(f"user not found: {user}")
        grants = self.meta.users[user]["grants"]
        return {
            "series": [
                {
                    "name": "grants",
                    "columns": ["database", "privilege"],
                    "values": [[db, p] for db, p in sorted(grants.items())],
                }
            ]
        }

    def _show_users(self, s, m):
        return {
            "series": [
                {
                    "name": "users",
                    "columns": ["user", "admin"],
                    "values": [
                        [n, u["admin"]] for n, u in sorted(self.meta.users.items())
                    ],
                }
            ]
        }

    def _grant(self, s, m):
        priv, db, user = m.group(1), m.group(2), m.group(3)
        if user not in self.meta.users:
            raise ValueError(f"user not found: {user}")
        self.meta.users[user]["grants"][db] = priv
        self.meta.save()
        return {"ok": True}

    def _revoke(self, s, m):
        db, user = m.group(2), m.group(3)
        if user not in self.meta.users:
            raise ValueError(f"user not found: {user}")
        self.meta.users[user]["grants"].pop(db, None)
        self.meta.save()
        return {"ok": True}

    def _kill_query(self, s, m):
        """KILL QUERY <id>: cancel the Spark job group the query runs
        under — the reference aborts the query's executor DAG the same way
        (statement_executor.go executeKillQuery)."""
        qid = int(m.group(1))
        from opengemini_spark import querytrack

        if not querytrack.kill(self.spark, qid):
            raise ValueError(f"no such query id: {qid}")
        return {"ok": True}

    def _show_queries(self, s, m):
        from opengemini_spark import querytrack

        return {
            "series": [
                {
                    "name": "queries",
                    "columns": ["qid", "query", "duration_s"],
                    "values": querytrack.listing(),
                }
            ]
        }

    # --- streams / continuous queries (statement surface, r3) ---
    # CREATE STREAM name INTO dst ON SELECT … [DELAY d]
    # (grammar sql.y:3896 CREATE_STREAM_STATEMENT; dispatch
    # statement_executor.go:433). The SELECT goes through the real InfluxQL
    # parser; semantics bind to streaming/stream_job.py.

    def _parse_stream_select(self, select_text: str, require_into: bool):
        from opengemini_spark.influxql import ast as iast
        from opengemini_spark.influxql.parser import parse
        from opengemini_spark.streaming.stream_job import STREAM_CALLS

        stmt = parse(select_text)
        if not isinstance(stmt, iast.SelectStatement):
            raise ValueError("stream/CQ body must be a SELECT statement")
        if require_into and not stmt.into:
            raise ValueError("continuous query SELECT needs an INTO target")
        if stmt.group_time is None:
            # the reference also supports filter-only streams (ast.go:11535
            # Check); this engine scope is windowed-agg streams only
            raise ValueError("stream/CQ SELECT needs GROUP BY time(...)")
        calls: dict[str, tuple[str, str]] = {}
        for f in stmt.fields:
            e = f.expr
            if not (isinstance(e, iast.Call) and e.args
                    and isinstance(e.args[0], iast.VarRef)):
                raise ValueError("stream fields must be call(field)")
            if e.name not in STREAM_CALLS:
                raise ValueError(
                    f"stream call {e.name!r} not supported "
                    f"(reference restriction lib/stream/stream.go:71: "
                    f"{STREAM_CALLS})"
                )
            out = f.alias or f"{e.name}_{e.args[0].name}"
            calls[out] = (e.name, e.args[0].name)
        if not isinstance(stmt.source, str):
            raise ValueError("stream source must be a single measurement")
        return stmt, calls

    def _stream_def(self, entry: dict):
        from opengemini_spark.streaming.stream_job import StreamDef

        def dur(ns: int) -> str:
            return f"{ns // 1_000_000_000} seconds"

        return StreamDef(
            name=entry["name"],
            interval=dur(entry["interval_ns"]),
            delay=dur(entry["delay_ns"]) if entry["delay_ns"] else "0 seconds",
            dims=list(entry["dims"]),
            calls={k: tuple(v) for k, v in entry["calls"].items()},
        )

    def _create_stream(self, s, m):
        name, dest, select_text, delay = m.group(1), m.group(2), m.group(3), m.group(4)
        stmt, calls = self._parse_stream_select(select_text, require_into=False)
        self.meta.streams[name] = {
            "name": name,
            "dest": dest,
            "source": stmt.source,
            "interval_ns": stmt.group_time.interval_ns,
            "delay_ns": _dur_ns(delay) if delay else 0,
            "dims": list(stmt.group_tags),
            "calls": calls,
            "query": s,
        }
        self.meta.save()
        return {"ok": True}

    # --- subscriptions (executeCreateSubscriptionStatement,
    # statement_executor.go:862 → MetaClient.CreateSubscription) ---
    def _create_subscription(self, s, m):
        name, db, rp, mode = m.group(1), m.group(2), m.group(3), m.group(4)
        dests = re.findall(r"'([^']*)'", s[m.end(4):])
        self.meta.subscriptions[name] = {
            "name": name, "db": db, "rp": rp,
            "mode": mode.upper(), "destinations": dests,
        }
        self.meta.save()
        return {"ok": True}

    def _show_subscriptions(self, s, m):
        by_db: dict[str, list] = {}
        for e in self.meta.subscriptions.values():
            by_db.setdefault(e["db"], []).append(e)
        return {
            "series": [
                {
                    "name": db,
                    "columns": ["retention_policy", "name", "mode",
                                "destinations"],
                    "values": [
                        [e["rp"], e["name"], e["mode"], e["destinations"]]
                        for e in sorted(entries, key=lambda x: x["name"])
                    ],
                }
                for db, entries in sorted(by_db.items())
            ]
        }

    def _drop_subscription(self, s, m):
        name = m.group(1)
        if name not in self.meta.subscriptions:
            raise ValueError(f"subscription not found: {name}")
        del self.meta.subscriptions[name]
        self.meta.save()
        return {"ok": True}

    def _show_streams(self, s, m):
        return {
            "series": [
                {
                    "name": "streams",
                    "columns": ["name", "dest", "source", "interval_ns",
                                "delay_ns", "query"],
                    "values": [
                        [e["name"], e["dest"], e["source"], e["interval_ns"],
                         e["delay_ns"], e["query"]]
                        for e in self.meta.streams.values()
                    ],
                }
            ]
        }

    def _drop_stream(self, s, m):
        if m.group(1) not in self.meta.streams:
            raise ValueError(f"no such stream: {m.group(1)}")
        del self.meta.streams[m.group(1)]
        self.meta.save()
        return {"ok": True}

    def _create_cq(self, s, m):
        name, db, every, for_, select_text = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5)
        )
        stmt, calls = self._parse_stream_select(select_text, require_into=True)
        self.meta.cqs[name] = {
            "name": name,
            "db": db,
            "dest": stmt.into,
            "source": stmt.source,
            "interval_ns": stmt.group_time.interval_ns,
            "delay_ns": 0,
            "resample_every_ns": _dur_ns(every) if every else None,
            "resample_for_ns": _dur_ns(for_) if for_ else None,
            "dims": list(stmt.group_tags),
            "calls": calls,
            "query": s,
        }
        self.meta.save()
        return {"ok": True}

    def _show_cqs(self, s, m):
        # grouped per database like the reference's SHOW CONTINUOUS QUERIES
        by_db: dict[str, list] = {}
        for e in self.meta.cqs.values():
            by_db.setdefault(e["db"], []).append([e["name"], e["query"]])
        return {
            "series": [
                {"name": db, "columns": ["name", "query"], "values": vals}
                for db, vals in sorted(by_db.items())
            ]
        }

    def _drop_cq(self, s, m):
        name, db = m.group(1), m.group(2)
        e = self.meta.cqs.get(name)
        if e is None or e["db"] != db:
            raise ValueError(f"no such continuous query: {name} on {db}")
        del self.meta.cqs[name]
        self.meta.save()
        return {"ok": True}

    # statement → execution binding
    def run_stream_once(self, name: str, src, dest_path: str,
                        ts_col: str = "ts") -> None:
        """One batch cycle of a registered stream (the unified batch/stream
        aggregation; for a live run use ``start_registered_stream``)."""
        from opengemini_spark.streaming.stream_job import continuous_query_once

        entry = self.meta.streams.get(name)
        if entry is None:
            raise ValueError(f"no such stream: {name}")
        continuous_query_once(src, self._stream_def(entry), dest_path, ts_col)

    def start_registered_stream(self, name: str, src_stream, dest_path: str,
                                checkpoint: str, ts_col: str = "ts",
                                available_now: bool = True):
        from opengemini_spark.streaming.stream_job import start_stream

        entry = self.meta.streams.get(name)
        if entry is None:
            raise ValueError(f"no such stream: {name}")
        return start_stream(
            src_stream, self._stream_def(entry), dest_path, checkpoint,
            ts_col, trigger_available_now=available_now,
        )

    def run_cq_once(self, name: str, src, dest_path: str | None = None,
                    ts_col: str = "ts") -> str:
        """One resample tick of a registered continuous query; returns the
        destination path written (services/continuousquery/service.go:178
        runs the bound SELECT … INTO per tick)."""
        from opengemini_spark.streaming.stream_job import continuous_query_once

        entry = self.meta.cqs.get(name)
        if entry is None:
            raise ValueError(f"no such continuous query: {name}")
        dest = dest_path or str(self.meta.db_dir(entry["db"]) / entry["dest"])
        continuous_query_once(src, self._stream_def(entry), dest, ts_col)
        return dest

    _DISPATCH = [
        (
            r"create database ([a-z_][a-z0-9_]*)"
            r"(?: with(?: duration ([a-z0-9]+))?(?: replication \d+)?"
            r"(?: shard duration ([a-z0-9]+))?"
            r"(?: index duration [a-z0-9]+)?"
            r"(?: name ([a-z_][a-z0-9_]*))?)?$",
            _create_db,
        ),
        (r"drop database ([a-z_][a-z0-9_]*)$", _drop_db),
        (r"show databases$", _show_dbs),
        (r"show databases detail$", _show_dbs_detail),
        (
            r"create retention policy ([a-z_][a-z0-9_]*) on ([a-z_][a-z0-9_]*) "
            r"duration ([a-z0-9]+)(?: replication \d+)?( default)?$",
            _create_rp,
        ),
        (
            r"alter retention policy ([a-z_][a-z0-9_]*) on ([a-z_][a-z0-9_]*) "
            r"duration ([a-z0-9]+)(?: replication \d+)?( default)?$",
            _alter_rp,
        ),
        (r"show retention policies on ([a-z_][a-z0-9_]*)$", _show_rps),
        (r"show shards$", _show_shards),
        (r"drop measurement ([a-z_][a-z0-9_]*)$", _drop_measurement),
        (
            r"delete from ([a-z_][a-z0-9_]*) where time (<|<=) (\d+)$",
            _delete_where_time,
        ),
        (
            r"create measurement ([a-z_][a-z0-9_]*)(?: with .*)?$",
            _create_measurement,
        ),
        (
            r"create user ([a-z_][a-z0-9_]*) with password '[^']*'"
            r"( with all privileges)?$",
            _create_user,
        ),
        (r"drop user ([a-z_][a-z0-9_]*)$", _drop_user),
        (r"show users$", _show_users),
        (r"show grants for ([a-z_][a-z0-9_]*)$", _show_grants),
        (
            r"grant (read|write|all)(?: privileges)? on ([a-z_][a-z0-9_]*) "
            r"to ([a-z_][a-z0-9_]*)$",
            _grant,
        ),
        (
            r"revoke (read|write|all)(?: privileges)? on ([a-z_][a-z0-9_]*) "
            r"from ([a-z_][a-z0-9_]*)$",
            _revoke,
        ),
        (r"kill query (\d+)$", _kill_query),
        (r"show queries$", _show_queries),
        (
            r"create stream ([a-z_][a-z0-9_]*) into ([a-z_][a-z0-9_.]*) "
            r"on (select .+?)(?: delay ([0-9]+(?:ns|u|ms|s|m|h|d|w)))?$",
            _create_stream,
        ),
        (
            r'create subscription "?([a-z_][a-z0-9_]*)"? on '
            r'"?([a-z_][a-z0-9_]*)"?\."?([a-z_][a-z0-9_]*)"? '
            r"destinations (all|any) ",
            _create_subscription,
        ),
        (r"show subscriptions$", _show_subscriptions),
        (
            r'drop subscription "?([a-z_][a-z0-9_]*)"? on '
            r'"?([a-z_][a-z0-9_]*)"?\."?([a-z_][a-z0-9_]*)"?$',
            _drop_subscription,
        ),
        (r"show streams(?: on [a-z_][a-z0-9_]*)?$", _show_streams),
        (r"drop stream ([a-z_][a-z0-9_]*)$", _drop_stream),
        (
            r"create continuous query ([a-z_][a-z0-9_]*) on ([a-z_][a-z0-9_]*)"
            r"(?: resample(?: every ([0-9]+[a-z]+))?(?: for ([0-9]+[a-z]+))?)?"
            r" begin (select .+) end$",
            _create_cq,
        ),
        (r"show continuous queries$", _show_cqs),
        (
            r"drop continuous query ([a-z_][a-z0-9_]*) on ([a-z_][a-z0-9_]*)$",
            _drop_cq,
        ),
    ]

    def register_measurement(self, db: str, name: str) -> None:
        d = self.meta.databases[db]
        if name not in d.measurements:
            d.measurements.append(name)
            self.meta.save()
