"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "suite_wall_sec", "value": N, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan build + execution to a driver-side
count/collect). A tiny warmup query runs first so JVM/codegen startup isn't
attributed to the first headline query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opengemini_spark.session import get_spark  # noqa: E402
from opengemini_spark import suite  # noqa: E402

# headline shapes: scan+filter, hash agg, window agg, fill spine, join,
# top-k, lag-window transform, per-series limit, dedup/similarity (datapipe)
HEADLINE = [
    "scan_filter_project",
    "agg_basic",
    "window_tumbling_agg",
    "window_fill_null",
    "join_inner",
    "selector_top_per_group",
    "transform_derivative",
    "limit_per_series",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_score",
    "similarity_cosine_topk",
    "prom_rate_extrapolated",
    "transform_ema",
    "influxql_window_agg_fill",
    # r2 additions: blocked exact all-pairs (replaces the r1 crossJoin),
    # hyperplane-LSH near-dup in its design regime (high threshold, planted
    # exact dups — the t=0.45 variant degenerates to ~all-pairs candidates
    # by design and is gated at sf0.01 instead), least-squares range
    # function, text-path EMA
    "dedup_embedding_cosine",
    "dedup_embedding_lsh_highthr",
    "prom_deriv",
    "influxql_func_ema",
    # r3 additions: k-gram decontamination (shingle-hash join), bucketed
    # sequence packing (windowed running sum), real PNG decode through the
    # Arrow mapInPandas stage
    "curate_contamination",
    "curate_pack_sequences",
    "multimodal_png_real_decode",
    # r3 late additions: incremental-query state merge, PromQL subquery
    # (aligned-grid inner eval), sliding token-window chunking
    "inc_window_agg",
    "promql_subquery_e2e",
    "curate_chunk_documents",
    # r4 additions: Gopher repetition quality signals (two explode->count
    # aggregates + tiny join), per-language quality-percentile filter
    # (rank window over pre-aggregated scores), STL anomaly detection
    # (per-series Cleveland-1990 decomposition through the castor bridge)
    "text_repetition_signals",
    "curate_quality_percentile_filter",
    "castor_stl_anomaly",
    # r5 additions: dup-cluster representative selection (minhash CC +
    # quality compose), length-bucketed batch dealing (per-bucket windows,
    # no global sort), doc-level train/holdout anti-join, and the two
    # vectorized multimodal frame/tile extractors over the real codecs
    "curate_cluster_representative",
    "curate_length_bucket_batches",
    "curate_holdout_exact_dedup",
    "multimodal_audio_frame_features",
    "multimodal_image_tile_stats",
    "similarity_quantize_int8",
    "similarity_random_projection",
    "session_assign",
    "session_stats",
    # r6 additions: the full-lifecycle front-end shapes (multi-statement
    # /query JSON emission, chunked emission, query_range through the
    # results cache cold+warm — VERDICT r5 next #7), the composed
    # LSH->CC->representatives drop-list (pairs/components computed once),
    # and the OTLP logs ingest e2e (wire encode/decode + write + read-back)
    "e2e_http_query_multi",
    "e2e_http_query_chunked",
    "e2e_promql_range_cached",
    "curate_dedup_drop_best",
    "otlp_logs_ingest_agg",
    # r6 late additions: ingest front-end e2e (line-protocol text ->
    # /write -> read-back), BM25 retrieval, bigram-LM perplexity scoring,
    # weighted sampling, per-domain caps
    "e2e_http_write_lp",
    "retrieval_bm25_topk",
    "retrieval_lm_perplexity",
    "curate_weighted_sample",
    "curate_domain_cap",
    "multimodal_image_resize",
    "curate_holdout_fuzzy_dedup",
    "retrieval_tfidf_keywords",
    # r6 final additions: span-level exact dedup (shingle census +
    # position rebuild), SemDeDup cluster-scoped semantic dedup,
    # perceptual-hash image/audio near-dup joins over the real codecs,
    # and the Kafka-protocol consume e2e (query -> wire -> DataFrame)
    "dedup_span_exact",
    "dedup_semantic_semdedup",
    "dedup_image_dhash",
    "dedup_audio_fingerprint",
    "e2e_kafka_consume",
    "multimodal_video_keyframes",
    "agg_distinct_sketch_hll",
    # r6 late additions: model-based quality filtering, hybrid retrieval
    # fusion, and the product-quantized ANN regime
    "curate_quality_classifier",
    "retrieval_rrf_fusion",
    "similarity_ivfpq_topk",
    "text_hash_embedding",
    "similarity_ivfpq_rerank",
    "text_novelty_signals",
    "curate_span_decontaminate",
    # r7 additions: the crawl-extraction front stage, the deterministic
    # BPE tokenizer (train+encode over the distinct-word frame), and
    # packing budgeted in real BPE tokens
    "text_extract_html_blocks",
    "text_extract_quality_e2e",
    "text_bpe_encode",
    "curate_pack_sequences_bpe",
    # r8 additions: BPE-exact chunking/length-bucket budgets, the
    # serve-only IVF-PQ path over a prebuilt index (SETUP hook builds it
    # before the timer — the per-query-batch number a deployment
    # repeats), and the composed crawl->clean->dedup->quality->pack e2e
    "curate_chunk_documents_bpe",
    "curate_length_bucket_bpe",
    "similarity_ivfpq_serve",
    "e2e_crawl_corpus_pack",
    # r8 late additions: crawl-front URL canonicalization+dedup (the
    # cheapest dedup in the pipeline — pure projection + one hash agg),
    # RefinedWeb-style paragraph boilerplate removal, deterministic
    # text normalization (pure projection), and the deterministic
    # global training shuffle (one hash-partition + per-shard sort)
    "dedup_url_canonical",
    "dedup_paragraph",
    "text_normalize",
    "curate_global_shuffle",
    "curate_shard_manifest",
    "curate_hash_split",
    "curate_pack_shuffled",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    qs = suite.queries()

    # Warmup: run every headline query once at sf0.001 so JVM startup,
    # whole-stage-codegen compilation, and Python-worker spin-up are not
    # attributed to the measured run (the measured SF data is NOT touched
    # during warmup; steady-state is what a resident cluster sees).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is not None:
                try:
                    fn(spark, warm_dir).count()
                except Exception as e:  # warmup must never fail the bench
                    print(f"# warmup {name}: {e}", file=sys.stderr)
    else:
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # Per-query cache hygiene: operators may persist frames for their own
    # plan reuse (e.g. the LSH signature cache) and those cached blocks
    # accumulate executor memory pressure across a 60+-query batch session,
    # inflating LATER queries' walls by 30-100% (the fresh-session re-measure
    # effect recorded in SCALE100_r06). Each query is measured from a
    # clean cache so its wall reflects the operator, not its predecessors.
    from opengemini_spark.datapipe.similarity import unpersist_lsh_caches

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        # build-once/serve-many entries: run the registered setup (index
        # construction) OUTSIDE the timer — the headline number is the
        # serve path; suite.SETUP documents the contract
        setup = suite.SETUP.get(name)
        if setup is not None:
            setup(spark, sf_dir)
        t0 = time.time()
        df = fn(spark, sf_dir)
        # time a noop-sink write, not count(): count() lets Catalyst
        # prune expensive derived output columns (the span-rebuild
        # entries measured 10-40x too fast that way), while the noop
        # sink materializes every column the operator actually produces
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = df.count()
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
        unpersist_lsh_caches()
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
