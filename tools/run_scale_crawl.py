"""100× price of the composed crawl→clean→dedup→quality→pack pipeline
(r8 verdict item 7 / r9 verdict item 6 — SCALE100 record for the e2e).

Runs e2e_crawl_corpus_pack's exact composition against the factor-R
replication of sf0.1 documents (tools/make_scale.py), one fresh session,
with a per-stage wall split (each stage boundary is one of the entry's
own localCheckpoint / eager barriers, so stage walls are real job walls,
not lazy-plan noise) plus total shuffle-write bytes from the Spark REST
API. sf0.1 runs first as the 1× anchor.

Usage: python tools/run_scale_crawl.py [synth_dir] [factor]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shuffle_mb(ui: str) -> float:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{apps[0]['id']}/stages"))
    return sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6


def run(spark, sf_dir: str, ui: str) -> dict:
    from pyspark.sql import functions as F

    from opengemini_spark.catalog import load_table
    from opengemini_spark.datapipe import bpe as bpe_mod
    from opengemini_spark.datapipe import corpus, dedup, text
    from opengemini_spark.suite_datapipe import (
        CRAWL_QGATE, PACK_BUDGET, PACK_BUCKETS,
    )

    s0 = shuffle_mb(ui)
    t0 = time.time()
    docs = load_table(spark, sf_dir, "documents")
    clean = (
        text.extract_text(text.synth_html(docs))
        .filter(F.col("clean_text") != "")
        .localCheckpoint()
    )
    t1 = time.time()
    keep = dedup.exact_dedup(clean, text_col="clean_text").select("doc_id")
    c1 = clean.select("doc_id", F.col("clean_text").alias("text")).join(
        keep, "doc_id"
    )
    pairs = dedup.minhash_lsh_dedup(c1, threshold=0.8)
    drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    c2 = c1.join(drops, "doc_id", "left_anti")
    kept = (
        text.quality_score(c2)
        .filter(F.col("quality_bp") >= CRAWL_QGATE)
        .select("doc_id")
    )
    c3 = c2.join(kept, "doc_id").localCheckpoint()
    t2 = time.time()
    _, vocab = bpe_mod.bpe_train_local_full(c3)
    t3 = time.time()
    counts = bpe_mod.bpe_encode_vocab(c3, vocab).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_subwords")
    )
    out = corpus.pack_sequences(
        c3, budget=PACK_BUDGET, n_buckets=PACK_BUCKETS, counts=counts
    )
    out.write.format("noop").mode("overwrite").save()
    t4 = time.time()
    n = out.count()
    return {
        "rows_out": n,
        "extract_ckpt_sec": round(t1 - t0, 1),
        "dedup_quality_ckpt_sec": round(t2 - t1, 1),
        "bpe_train_sec": round(t3 - t2, 1),
        "encode_pack_noop_sec": round(t4 - t3, 1),
        "total_sec": round(t4 - t0, 1),
        "shuffle_write_mb": round(shuffle_mb(ui) - s0, 1),
    }


def main() -> None:
    synth = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10synth"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    from opengemini_spark.session import get_spark

    results = {}
    for label, sf_dir in (("x1", "/root/testdata/sf0.1"), (f"x{factor}", synth)):
        spark = get_spark(
            f"scale_crawl_{label}",
            extra_conf={
                "spark.ui.enabled": "true",
                "spark.ui.port": "4049",
                "spark.driver.memory": "96g",
            },
        )
        spark.sparkContext.setLogLevel("ERROR")
        ui = "http://localhost:4049"
        results[label] = run(spark, sf_dir, ui)
        print(label, json.dumps(results[label]))
        spark.stop()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
