"""DDL + metastore tests: database/RP lifecycle, persistence, DELETE
partition rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opengemini_spark import storage
from opengemini_spark.catalog import load_table
from opengemini_spark.ddl import DDLExecutor, MetaStore


@pytest.fixture()
def ddl(spark, tmp_path):
    return DDLExecutor(spark, MetaStore(str(tmp_path / "meta")))


def test_database_lifecycle(ddl, spark, tmp_path):
    ddl.execute("CREATE DATABASE mydb")
    out = ddl.execute("SHOW DATABASES")
    assert [["mydb"]] == out["series"][0]["values"]
    # autogen RP exists and is default
    rps = ddl.execute("SHOW RETENTION POLICIES ON mydb")["series"][0]["values"]
    assert rps[0][0] == "autogen" and rps[0][3] is True

    ddl.execute("CREATE RETENTION POLICY hot ON mydb DURATION 30d DEFAULT")
    rps = {r[0]: r for r in
           ddl.execute("SHOW RETENTION POLICIES ON mydb")["series"][0]["values"]}
    assert rps["hot"][1] == 30 * 86400 * 10**9
    assert rps["hot"][3] is True and rps["autogen"][3] is False

    # metastore persists across re-open
    reopened = DDLExecutor(ddl.spark, MetaStore(str(ddl.meta.root)))
    assert "mydb" in reopened.meta.databases
    assert reopened.meta.databases["mydb"].retention_policies["hot"].default

    ddl.execute("DROP DATABASE mydb")
    assert ddl.execute("SHOW DATABASES")["series"][0]["values"] == []


def test_unsupported_raises(ddl):
    with pytest.raises(ValueError):
        ddl.execute("GRANT ALL TO bob")


def test_delete_from_partition_rewrite(ddl, spark, sf_dir):
    ddl.execute("CREATE DATABASE db1")
    ev = load_table(spark, sf_dir, "events").select("time_ns", "event_type", "value")
    root = str(ddl.meta.db_dir("db1") / "events")
    storage.write_measurement(ev, root)
    ddl.register_measurement("db1", "events")

    total = ev.count()
    # cutoff mid-day on day 3 of the data
    lo = ev.agg(F.min("time_ns")).first()[0]
    cutoff = (lo // storage.DAY_NS + 3) * storage.DAY_NS + storage.DAY_NS // 2
    expect = ev.filter(~(F.col("time_ns") < cutoff)).count()
    assert expect < total

    ddl.execute(f"DELETE FROM events WHERE time < {cutoff}")
    back = storage.read_measurement(spark, root)
    assert back.count() == expect
    assert back.agg(F.min("time_ns")).first()[0] >= cutoff


def test_show_shards(ddl, spark, sf_dir):
    ddl.execute("CREATE DATABASE shdb")
    ev = load_table(spark, sf_dir, "events").select("time_ns", "value").limit(2000)
    storage.write_measurement(ev, str(ddl.meta.db_dir("shdb") / "events"))
    ddl.register_measurement("shdb", "events")
    out = ddl.execute("SHOW SHARDS")
    rows = out["series"][0]["values"]
    assert rows and all(r[0] == "shdb" and r[1] == "events" for r in rows)
    days = [r[2] for r in rows]
    assert days == sorted(days) and len(days) > 1


def test_admin_surface(ddl, spark):
    """CREATE/ALTER RP, CREATE MEASUREMENT, users/GRANT/REVOKE, KILL QUERY
    (statement_executor.go:241-450 dispatch rows)."""
    ddl.execute("CREATE DATABASE adm")
    ddl.execute("CREATE RETENTION POLICY rp1 ON adm DURATION 1d")
    ddl.execute("ALTER RETENTION POLICY rp1 ON adm DURATION 12h DEFAULT")
    rps = ddl.execute("SHOW RETENTION POLICIES ON adm")["series"][0]["values"]
    row = next(r for r in rps if r[0] == "rp1")
    assert row[1] == 12 * 3600 * 10**9 and row[3] is True

    ddl.execute("CREATE MEASUREMENT cpu_pre")
    assert "cpu_pre" in ddl.meta.databases["adm"].measurements

    ddl.execute("CREATE USER alice WITH PASSWORD 'pw' WITH ALL PRIVILEGES")
    ddl.execute("CREATE USER bob WITH PASSWORD 'pw'")
    ddl.execute("GRANT READ ON adm TO bob")
    users = ddl.execute("SHOW USERS")["series"][0]["values"]
    assert ["alice", True] in users and ["bob", False] in users
    assert ddl.meta.users["bob"]["grants"] == {"adm": "read"}
    ddl.execute("REVOKE READ ON adm FROM bob")
    assert ddl.meta.users["bob"]["grants"] == {}
    ddl.execute("DROP USER bob")
    assert "bob" not in ddl.meta.users

    # users survive a MetaStore reload
    from opengemini_spark.ddl import DDLExecutor, MetaStore
    re2 = DDLExecutor(ddl.spark, MetaStore(str(ddl.meta.root)))
    assert "alice" in re2.meta.users

    import pytest as _pt
    with _pt.raises(ValueError, match="no such query id"):
        ddl.execute("KILL QUERY 99999")


def test_show_and_kill_query_registry(ddl, spark):
    from opengemini_spark import querytrack
    qid = querytrack.attach(spark, "SELECT fake")
    rows = ddl.execute("SHOW QUERIES")["series"][0]["values"]
    assert any(r[0] == qid and r[1] == "SELECT fake" for r in rows)
    assert ddl.execute(f"KILL QUERY {qid}") == {"ok": True}
    rows2 = ddl.execute("SHOW QUERIES")["series"][0]["values"]
    assert not any(r[0] == qid for r in rows2)


def test_show_grants(ddl, spark):
    ddl.execute("CREATE DATABASE gdb")
    ddl.execute("CREATE USER carol WITH PASSWORD 'pw'")
    ddl.execute("GRANT WRITE ON gdb TO carol")
    out = ddl.execute("SHOW GRANTS FOR carol")["series"][0]
    assert out["values"] == [["gdb", "write"]]
