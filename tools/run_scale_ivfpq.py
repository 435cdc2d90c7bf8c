"""IVF-PQ build/serve split priced at 100× (r6 verdict next #7).

``ivfpq_build`` exists to amortize the one corpus-shuffling join of the
query path; SCALE100_r06 priced only the combined build+serve entry.
This records, at sf0.1 and at the factor-100 replication
(/tmp/sf10synth via tools/make_scale.py):

- build-once wall + shuffle (kmeans cells + PQ codebooks + the vid-keyed
  index join, forced via persist+count);
- serve-only wall + shuffle over the prebuilt index (broadcast joins +
  candidate-proportional aggregate — the number a 100 TB deployment
  repeats per query batch).

Usage: python tools/run_scale_ivfpq.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

UI = "http://localhost:4049"


def shuffle_bytes() -> float:
    apps = json.load(urllib.request.urlopen(f"{UI}/api/v1/applications"))
    stages = json.load(urllib.request.urlopen(
        f"{UI}/api/v1/applications/{apps[0]['id']}/stages"))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from opengemini_spark.catalog import load_table
    from opengemini_spark.datapipe import similarity as sim
    from opengemini_spark.suite_datapipe import (
        IVF_NPROBE, KM_ITERS, KM_K, TOPK_K, TOPK_QUERIES,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "96g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"),
                          ("x100", "/tmp/sf10synth")):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < TOPK_QUERIES)

        s0 = shuffle_bytes()
        t0 = time.time()
        index, books, cents = sim.ivfpq_build(
            emb, nlist=KM_K, coarse_iter=KM_ITERS
        )
        index = index.persist()
        books = books.persist()
        cents = cents.persist()
        n_index = index.count()
        books.count()
        cents.count()
        build_wall = time.time() - t0
        build_sh = (shuffle_bytes() - s0) / 1e6

        s0 = shuffle_bytes()
        t0 = time.time()
        # persist BEFORE the timed write so the row-count probe below
        # reads the cache instead of recomputing the whole serve plan a
        # second time (whose recompute shuffle would land in the NEXT
        # label's snapshot only by luck of ordering — r7 advice)
        served = sim.ivfpq_topk(
            emb, queries, TOPK_K, nprobe=IVF_NPROBE,
            index=index, books=books, cents=cents,
        ).persist()
        served.write.format("noop").mode("overwrite").save()
        serve_wall = time.time() - t0
        serve_sh = (shuffle_bytes() - s0) / 1e6
        n_served = served.count()
        served.unpersist()

        out[label] = {
            "index_rows": n_index,
            "build_wall_sec": round(build_wall, 2),
            "build_shuffle_mb": round(build_sh, 1),
            "serve_wall_sec": round(serve_wall, 2),
            "serve_shuffle_mb": round(serve_sh, 1),
            "served_rows": n_served,
        }
        print(json.dumps({label: out[label]}), flush=True)
        for f in (index, books, cents):
            f.unpersist()
        spark.catalog.clearCache()

    out["ratios"] = {
        "build_wall": round(
            out["x100"]["build_wall_sec"] / out["sf0.1"]["build_wall_sec"], 1
        ),
        "serve_wall": round(
            out["x100"]["serve_wall_sec"] / out["sf0.1"]["serve_wall_sec"], 1
        ),
    }
    print("FINAL " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
