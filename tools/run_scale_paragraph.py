"""1000x skew point for paragraph-level boilerplate dedup.

The adversarial shape for dedup_paragraph at scale is the HOT census key:
the fixture's three boilerplate paragraphs each appear in ~1/3 of ALL
docs, so at factor-1000 of sf0.1 (5M docs) a single paragraph hash has
~1.67M occurrences. The docstring claims Catalyst's countDistinct
expansion keeps that key balanced (first exchange partitions on
(ph, doc_id)); this harness measures it instead of trusting it.

Replication is in-Spark with tools/make_scale.py semantics — replica r
offsets doc_id by r*KEY_OFF and appends a one-token ' w<r>' suffix to
text (content paragraphs stay unique per replica; the boilerplate
paragraphs are IDENTICAL across all replicas — that is the point).
Generation is a pure projection (explode of a replica array), so the
measured walls are the operator's census + rebuild shuffles, not I/O.

Usage: python tools/run_scale_paragraph.py [factor]   (default 1000)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFF = 100_000_000


def stage_mb(ui_base: str) -> tuple[float, float]:
    """(shuffle-write MB, disk-spill MB) summed over all stages —
    spill separates genuine plan cost from memory-pressure wall noise."""
    apps = json.load(urllib.request.urlopen(f"{ui_base}/api/v1/applications"))
    stages = json.load(urllib.request.urlopen(
        f"{ui_base}/api/v1/applications/{apps[0]['id']}/stages"))
    sh = sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6
    sp = sum(s.get("diskBytesSpilled", 0) for s in stages) / 1e6
    return sh, sp


def replicate(docs, factor: int):
    from pyspark.sql import functions as F

    if factor == 1:
        return docs
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__r")
    return docs.select("doc_id", "text", reps).select(
        (F.col("doc_id") + F.col("__r").cast("long") * KEY_OFF).alias("doc_id"),
        F.when(F.col("__r") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" w"), F.col("__r"))
        ).alias("text"),
    )


def main() -> None:
    from pyspark.sql import SparkSession

    from opengemini_spark.datapipe import dedup, text

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
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
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    # warm the session (JVM/codegen startup) so the x1 anchor is clean —
    # a fat anchor would understate the scale ratio
    dedup.paragraph_dedup(
        text.synth_paragraph_docs(base.limit(200)), max_docs=2
    ).count()
    out = {}
    for label, f in (("x1", 1), (f"x{factor}", factor)):
        src = replicate(base, f)
        # spread the generated rows so the explode's 1-file parent doesn't
        # serialize the pipeline (same reason catalog.parallelize_scan exists)
        if f > 1:
            src = src.repartition(int(cpus) * 4)
        fixture = text.synth_paragraph_docs(src)
        s0, p0 = stage_mb("http://localhost:4049")
        t0 = time.time()
        res = dedup.paragraph_dedup(fixture, max_docs=2)
        # row/removed counts ride the noop write as observed metrics —
        # a count()/agg() after the write would re-execute the whole
        # unpersisted plan (the recompute waste the r7 advice flagged
        # in run_scale_ivfpq)
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        obs = Observation(f"para_{label}")
        res.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_removed").alias("removed"),
        ).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        s1, p1 = stage_mb("http://localhost:4049")
        out[label] = {
            "wall_sec": round(wall, 2),
            "rows": obs.get["rows"],
            "sum_removed": int(obs.get["removed"]),
            "shuffle_mb": round(s1 - s0, 1),
            "spill_mb": round(p1 - p0, 1),
        }
        print(json.dumps({label: out[label]}), flush=True)
    r = out[f"x{factor}"]["wall_sec"] / max(out["x1"]["wall_sec"], 1e-9)
    out["wall_ratio"] = round(r, 1)
    print("FINAL " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
