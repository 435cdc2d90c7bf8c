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
