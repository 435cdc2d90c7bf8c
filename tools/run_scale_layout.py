"""10000×-shape dry run of the layout tail (r8 verdict item 8 / r9 item 7):
global_shuffle, pack_shuffled, hash_split, shard_manifest over a ~50M-row
documents replication, with n_shards from the global_shuffle docstring
sizing rule (one shard ≈ one ~256 MB output file).

Records per op: wall (noop sink), shuffle-write MB (REST stage delta),
per-shard shuffle MB, and the max per-stage peakExecutionMemory the REST
API reports — the "flat per-shard cost" evidence the verdict asks for.

Usage: python tools/run_scale_layout.py [synth_dir] [n_shards]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI = "http://localhost:4049"


def stages() -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{UI}/api/v1/applications"))
    return json.load(urllib.request.urlopen(
        f"{UI}/api/v1/applications/{apps[0]['id']}/stages"))


def shuffle_mb() -> float:
    return sum(s.get("shuffleWriteBytes", 0) for s in stages()) / 1e6


def peak_exec_mb() -> float:
    return max(
        (s.get("peakExecutionMemory", 0) for s in stages()), default=0
    ) / 1e6


def main() -> None:
    synth = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf50m"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from pyspark.sql import functions as F

    from opengemini_spark.session import get_spark
    from opengemini_spark.datapipe import corpus

    spark = get_spark(
        "scale_layout",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4049",
            "spark.driver.memory": "96g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{synth}/documents.parquet")
    n = docs.count()
    size_b = os.path.getsize(f"{synth}/documents.parquet")
    if not n_shards:
        # docstring rule: one shard ~ one ~256 MB output file
        n_shards = max(8, round(size_b / (256 * 1024 * 1024)))
    print(f"rows={n} input={size_b/1e6:.0f}MB n_shards={n_shards}")

    results = {"rows": n, "input_mb": round(size_b / 1e6, 1),
               "n_shards": n_shards}

    def timed(label, df):
        s0, t0 = shuffle_mb(), time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        smb = shuffle_mb() - s0
        results[label] = {
            "wall_sec": round(wall, 1),
            "shuffle_write_mb": round(smb, 1),
            "shuffle_mb_per_shard": round(smb / n_shards, 2),
            "max_stage_peak_exec_mb": round(peak_exec_mb(), 1),
        }
        print(label, json.dumps(results[label]))

    timed("global_shuffle",
          corpus.global_shuffle(docs, n_shards=n_shards))
    from opengemini_spark.suite_datapipe import PACK_BUDGET
    timed("pack_shuffled",
          corpus.pack_shuffled(docs, PACK_BUDGET, n_shards=n_shards))
    timed("hash_split", corpus.hash_split(docs))
    timed("shard_manifest",
          corpus.shard_manifest(docs, n_shards=n_shards))
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
