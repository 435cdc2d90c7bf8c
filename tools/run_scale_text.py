"""100× scale points for the round-6 text/retrieval operators.

Runs the named suite entries against the factor-100 replication of sf0.1
(/tmp/sf10synth via tools/make_scale.py), one fresh session, sf0.1 as the
1× anchor, shuffle bytes from the Spark REST API per query (delta of the
stage totals around each run).

Usage: python tools/run_scale_text.py [queries...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "retrieval_bm25_topk",
    "retrieval_lm_perplexity",
    "curate_holdout_fuzzy_dedup",
    "curate_domain_cap",
    "curate_weighted_sample",
    "multimodal_image_resize",
]


def shuffle_bytes(ui: str) -> float:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{apps[0]['id']}/stages"))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    from pyspark.sql import SparkSession

    from opengemini_spark import suite

    names = sys.argv[1:] or DEFAULT
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "96g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4048")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    def timed_noop(df, tag: str) -> tuple[float, int]:
        """noop-sink timing (count() alone lets Catalyst prune expensive
        derived output columns — span-rebuild entries measured 10-40x too
        fast). The row count rides the write as an Observation: a count()
        AFTER the write would re-execute the whole unpersisted plan inside
        the shuffle snapshot window and ~2x-inflate the recorded shuffle
        (the r8 paragraph-harness finding)."""
        obs = Observation(tag)
        t0 = time.time()
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.time() - t0, int(obs.get["rows"])

    qs = suite.queries()
    out: dict[str, dict] = {}
    for i, name in enumerate(names):
        fn = qs[name]
        fn(spark, "/root/testdata/sf0.001").count()      # warm
        w1, n1 = timed_noop(fn(spark, "/root/testdata/sf0.1"), f"a{i}")
        s0 = shuffle_bytes("http://localhost:4048")
        w100, n100 = timed_noop(fn(spark, "/tmp/sf10synth"), f"b{i}")
        sh = (shuffle_bytes("http://localhost:4048") - s0) / 1e6
        out[name] = {
            "sf0.1_wall_sec": round(w1, 2), "sf0.1_rows": n1,
            "x100_wall_sec": round(w100, 2), "x100_rows": n100,
            "x100_shuffle_mb": round(sh, 1),
            "wall_ratio": round(w100 / w1, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("FINAL " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
