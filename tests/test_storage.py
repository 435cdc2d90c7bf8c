"""Storage lifecycle tests: partitioned write, partition pruning, retention,
compaction."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from opengemini_spark import storage
from opengemini_spark.catalog import load_table


def test_partitioned_write_and_prune(spark, sf_dir, tmp_path):
    root = str(tmp_path / "events_tbl")
    ev = load_table(spark, sf_dir, "events").select("time_ns", "event_type", "value")
    storage.write_measurement(ev, root)

    parts = sorted(Path(root).glob("p_day=*"))
    assert len(parts) > 1  # multi-day data → multiple shard groups

    back = storage.read_measurement(spark, root)
    assert back.count() == ev.count()

    # time predicate must prune partitions (shard-group pruning analog)
    day = parts[3].name.split("=")[1]
    pruned = back.filter(F.col("p_day") == day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or pruned.count() > 0


def test_write_salts_large_batches_within_day(spark, tmp_path, monkeypatch):
    """Small batches keep 1 file per day bucket; a batch over the salt
    threshold spreads each day across several write tasks (the salted
    repartition key), so one giant day never serializes through one
    task. Rows identical either way."""
    df = spark.range(600).select(
        (
            F.lit(1_700_000_000_000_000_000)
            + (F.col("id") % 2) * storage.DAY_NS
            + F.col("id")
        ).alias("time_ns"),
        F.col("id").alias("v"),
    )
    small_root = str(tmp_path / "small_tbl")
    storage.write_measurement(df, small_root)
    for day in sorted(Path(small_root).glob("p_day=*")):
        assert len(list(day.glob("*.parquet"))) == 1

    # force the salted path (tiny threshold/target) and disable AQE's
    # small-partition coalescing so the spread is visible at test size
    monkeypatch.setenv("OG_WRITE_SALT_OVER_BYTES", "1024")
    monkeypatch.setenv("OG_WRITE_TARGET_FILE_BYTES", "1024")
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        salted_root = str(tmp_path / "salted_tbl")
        storage.write_measurement(df, salted_root)
    finally:
        spark.conf.set(coalesce_key, prev)
    days = sorted(Path(salted_root).glob("p_day=*"))
    assert len(days) == 2
    assert all(len(list(d.glob("*.parquet"))) > 1 for d in days)
    a = sorted(
        storage.read_measurement(spark, small_root)
        .select("time_ns", "v").collect()
    )
    b = sorted(
        storage.read_measurement(spark, salted_root)
        .select("time_ns", "v").collect()
    )
    assert a == b


def test_retention_drop(spark, sf_dir, tmp_path):
    root = str(tmp_path / "ret_tbl")
    ev = load_table(spark, sf_dir, "events").select("time_ns", "value")
    storage.write_measurement(ev, root)
    parts = sorted(p.name for p in Path(root).glob("p_day=*"))
    cutoff = parts[2].split("=")[1]
    dropped = storage.retention_drop(root, cutoff)
    assert dropped == parts[:2]
    remaining = sorted(p.name for p in Path(root).glob("p_day=*"))
    assert remaining == parts[2:]
    # table still reads cleanly after the drop
    assert storage.read_measurement(spark, root).count() > 0


def test_compaction(spark, sf_dir, tmp_path):
    root = str(tmp_path / "cmp_tbl")
    ev = load_table(spark, sf_dir, "events").select("time_ns", "value").repartition(8)
    storage.write_measurement(ev, root)
    parts = sorted(Path(root).glob("p_day=*"))
    day = parts[0].name.split("=")[1]
    before_rows = spark.read.parquet(str(parts[0])).count()
    n_files = storage.compact_partition(spark, root, day)
    assert n_files >= 1
    after = list(parts[0].glob("*.parquet"))
    assert len(after) == 1
    assert spark.read.parquet(str(parts[0])).count() == before_rows
