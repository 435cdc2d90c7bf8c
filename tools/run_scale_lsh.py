"""Scale point for the adaptive-banding LSH lever (SCALE100_r05's named
1000× lever; VERDICT r5 next #5).

Runs dedup_embedding_lsh_highthr's shape (planted cosine-1.0 copy of the
corpus, threshold 0.99) against a factor-R replication of the sf0.1
embeddings table (tools/make_scale.py semantics: per-replica seeded QR
rotation, disjoint key spaces), with

- ADAPTIVE banding (bands/rows-per-band from adaptive_lsh_params —
  r grows with log n), and optionally
- the old FIXED banding (8 bands × 16 bits) for comparison,

and reports wall, result rows, candidate-pair count (post-prefilter,
pre-rerank) and shuffle bytes from the Spark REST API.

Usage: python tools/run_scale_lsh.py <emb_dir> [--fixed] [--prefix[=G]]
  <emb_dir> must contain embeddings.parquet.
  --prefix[=G]: adaptive banding PLUS prefix-shared band groups of size
  G (default 6) with 12 additional shared prefix bits — the 10000×
  explode-shuffle lever (one bucket row per vector per group). Exact on
  the planted cosine-1.0 dups at any grouping.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shuffle_mb(ui_base: str) -> tuple[float, float]:
    apps = json.load(urllib.request.urlopen(f"{ui_base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui_base}/api/v1/applications/{app_id}/stages")
    )
    r = sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6
    return round(r, 1), round(w, 1)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from opengemini_spark.datapipe import similarity

    emb_dir = sys.argv[1]
    fixed = "--fixed" in sys.argv
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
    emb = spark.read.parquet(f"{emb_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_base = emb.count()
    copy = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(copy)
    n = 2 * n_base

    prefix_g = 0
    threshold = 0.99
    for a in sys.argv[2:]:
        if a.startswith("--prefix"):
            prefix_g = int(a.split("=")[1]) if "=" in a else 6
        elif a.startswith("--threshold="):
            # r9: the SCALE1000_r08 next_lever (a) regime — mid thresholds
            # (0.8-0.9) where the CS prefix bound's junk-pass rate is the
            # differentiator between the two rerank prefilters
            threshold = float(a.split("=")[1])

    kwargs: dict = {"threshold": threshold, "dim": 64}
    if fixed:
        kwargs |= {"bands": 8, "rows_per_band": 16}
    else:
        kwargs |= {"adaptive_n": n}
    if prefix_g:
        kwargs |= {"prefix_group_size": prefix_g, "prefix_bits": 12}
    # int8 lever A/B: default (no flag) = the shipped default (r9:
    # threshold-dependent — int8 below 0.95, CS prefix at >=0.95), so
    # A/B arms must ALWAYS pass an explicit flag to be comparable
    if "--int8" in sys.argv:
        kwargs |= {"int8_rerank": True}
    elif "--noint8" in sys.argv:
        kwargs |= {"int8_rerank": False}
    stats: dict = {}
    t0 = time.time()
    out = similarity.lsh_near_dups(corpus, stats_out=stats, **kwargs)
    rows = out.count()
    wall = time.time() - t0
    t1 = time.time()
    cand = stats["candidates"].count()
    cand_wall = time.time() - t1
    sr, sw = shuffle_mb("http://localhost:4049")
    print(json.dumps({
        "mode": ("fixed(8x16)" if fixed else
                 f"adaptive({stats['bands']}x{stats['rows_per_band']})")
                + (f"+prefix(g={prefix_g},s=12)" if prefix_g else "")
                + ("+int8" if "--int8" in sys.argv else "+cs_prefix")
                + (f"@t={threshold}" if threshold != 0.99 else ""),
        "threshold": threshold,
        "corpus": n,
        "result_rows": rows,
        "candidate_pairs": cand,
        "cand_per_true_dup": round(cand / max(rows, 1), 3),
        "wall_sec": round(wall, 1),
        "cand_recount_sec": round(cand_wall, 1),
        "shuffle_read_mb": sr,
        "shuffle_write_mb": sw,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
