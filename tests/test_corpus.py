"""Corpus-curation operator semantics on hand-built inputs (the driver
gate checks the oracle parity; these pin the intended behavior)."""

import pytest
from pyspark.sql import functions as F

from opengemini_spark.datapipe import corpus


def test_contamination_detects_verbatim_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "totally different words here entirely now"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "beta gamma delta epsilon zeta eta")], ["doc_id", "text"]
    )
    out = corpus.benchmark_contamination(docs, bench, k=3, min_overlap=1)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    # doc1 shares 3-grams "beta gamma delta", "gamma delta epsilon",
    # "delta epsilon zeta" with the 4-shingle benchmark doc
    assert r["doc_id"] == 1 and r["bench_id"] == 100
    assert r["n_common"] == 3
    assert r["bench_frac_bp"] == 3 * 10000 // 4


def test_pack_sequences_budget_boundaries(spark):
    # one bucket so the packing order is the full id order
    docs = spark.createDataFrame(
        [(i, "word " * 40) for i in range(1, 6)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in corpus.pack_sequences(
            docs, budget=100, n_buckets=1
        ).collect()
    }
    # each doc is 40 tokens × ceil(4/4)=1 subword → 40; budget 100 →
    # offsets 0,40,80,120,160 → seqs 0,0,0,1,1
    assert [out[i]["seq_offset"] for i in range(1, 6)] == [0, 40, 80, 20, 60]
    assert [out[i]["seq_id"] for i in range(1, 6)] == [0, 0, 0, 1, 1]


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(1000)],
        ["doc_id", "lang"],
    )
    kept1 = sorted(
        r["doc_id"]
        for r in corpus.stratified_sample(
            docs, {"en": 10000, "de": 0}, seed=3
        ).collect()
    )
    kept2 = sorted(
        r["doc_id"]
        for r in corpus.stratified_sample(
            docs, {"en": 10000, "de": 0}, seed=3
        ).collect()
    )
    assert kept1 == kept2  # hash-deterministic
    assert kept1 == [i for i in range(1000) if i % 2]  # en kept, de dropped
    half = corpus.stratified_sample(docs, {"en": 5000, "de": 5000}, seed=3).count()
    assert 400 < half < 600  # ~50% keep


def test_redact_pii_counts_and_placeholders(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b-c@test.org and x@y.io from 192.168.0.1 call 555-1234"),
            (2, "clean text with no identifiers at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in corpus.redact_pii(docs).collect()}
    r1 = out[1]
    assert r1["n_email"] == 2 and r1["n_ipv4"] == 1 and r1["n_phone"] == 1
    assert (
        r1["redacted_text"]
        == "mail <EMAIL> and <EMAIL> from <IPV4> call <PHONE>"
    )
    r2 = out[2]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0)
    assert r2["redacted_text"] == "clean text with no identifiers at all"


def test_chunk_documents_windows_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "solo"), (3, "")],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in corpus.chunk_documents(
            docs, chunk_tokens=4, overlap_tokens=1
        ).collect()
    }
    # doc1: 10 tokens, stride 3 → chunks at offsets 0,3,6 ... ceil((10-4)/3)=2
    # → chunk_ids 0,1,2 with the last chunk length 4 (offsets 6..9)
    assert {k for k in out if k[0] == 1} == {(1, 0), (1, 1), (1, 2)}
    assert out[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert out[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"
    assert out[(1, 2)]["chunk_text"] == "w6 w7 w8 w9"
    assert out[(1, 2)]["n_tokens"] == 4
    # short doc: one (short) chunk; empty doc: no chunks
    assert out[(2, 0)]["chunk_text"] == "solo" and out[(2, 0)]["n_tokens"] == 1
    assert not any(k[0] == 3 for k in out)


def test_length_bucket_batches_deterministic_dealing(spark):
    # texts of 1..40 words -> buckets 0 (n<32) and 1 (32<=n<64);
    # batches of 16 dealt in (n_tokens, doc_id) order
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (i + 1))) for i in range(40)],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in corpus.length_bucket_batches(
            docs, bucket_tokens=32, batch_size=16
        ).collect()
    }
    assert len(rows) == 40
    assert rows[0]["bucket"] == 0 and rows[0]["n_tokens"] == 1
    assert rows[31]["bucket"] == 1 and rows[30]["bucket"] == 0
    # bucket 0 holds docs 0..30 (31 docs): first 16 -> batch 0, rest -> 1
    assert rows[0]["batch_idx"] == 0 and rows[15]["batch_idx"] == 0
    assert rows[16]["batch_idx"] == 1 and rows[30]["batch_idx"] == 1
    # bucket 1 holds docs 31..39 (9 docs): all batch 0
    assert all(rows[i]["batch_idx"] == 0 for i in range(31, 40))


def test_holdout_exact_dedup_drops_leaked_docs(spark):
    docs = spark.createDataFrame(
        [
            (0, "held out text", "src0"),
            (1, "unique train text", "src1"),
            (2, "held out text", "src1"),      # exact leak -> dropped
            (3, "held out text", "src2"),      # leak from another source
            (4, "another train text", "src2"),
        ],
        ["doc_id", "text", "source"],
    )
    kept = sorted(
        r["doc_id"]
        for r in corpus.holdout_exact_dedup(docs, "src0").collect()
    )
    assert kept == [1, 4]


def test_cluster_representatives_picks_best_quality(spark):
    from opengemini_spark.datapipe.curate import cluster_representatives
    from opengemini_spark.datapipe.dedup import minhash_lsh_dedup
    from opengemini_spark.datapipe.text import quality_score

    # two identical docs (near-dup pair) with different lengths would not
    # be identical; instead use verbatim copies so jaccard = 1.0, and give
    # one copy extra stopword-rich content? verbatim copies tie on quality
    # -> rep = min doc_id; a third unrelated doc forms no cluster.
    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [(10, base), (3, base), (99, "totally different content here")],
        ["doc_id", "text"],
    )
    reps = cluster_representatives(docs).collect()
    assert len(reps) == 1
    r = reps[0]
    assert r["component"] == 3           # min-id canonical component
    assert r["n_members"] == 2
    assert r["rep_doc_id"] == 3          # quality tie -> min doc_id
    # and the reported quality matches quality_score for that doc
    q = {x["doc_id"]: x["quality_bp"] for x in quality_score(docs).collect()}
    assert r["rep_quality_bp"] == q[3]
    # sanity: the pair really was a near-dup pair
    assert minhash_lsh_dedup(docs, threshold=0.8).count() == 1


def test_weighted_sample_proportional_and_deterministic(spark):
    """A-ES weighted sampling: reproducible across runs, exactly k per
    group, and heavily-weighted docs are selected far more often."""
    from opengemini_spark.datapipe.corpus import weighted_sample

    rows = [(i, "g", 1000 if i < 20 else 1) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, quality_bp long")
    a = weighted_sample(docs, 10)
    got = sorted((r["doc_id"], r["rank"]) for r in a.collect())
    again = sorted((r["doc_id"], r["rank"]) for r in weighted_sample(docs, 10).collect())
    assert got == again and len(got) == 10
    # weight 1000 vs 1: essentially all picks land in the heavy 10%
    heavy = sum(1 for d, _ in got if d < 20)
    assert heavy >= 8
    # zero/negative weights are excluded
    z = spark.createDataFrame([(1, "g", 0)], "doc_id long, lang string, quality_bp long")
    assert weighted_sample(z, 5).count() == 0


def test_mixing_weights_plan(spark):
    """Mixing plan: the binding source keeps ~100%, keep_prob respects
    the target mix, no source is upsampled."""
    from opengemini_spark.datapipe.corpus import mixing_weights

    rows = (
        [(i, "a") for i in range(100)]
        + [(i + 1000, "b") for i in range(300)]
        + [(i + 2000, "c") for i in range(600)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in
           mixing_weights(docs, {"a": 0.25, "b": 0.25, "c": 0.5}).collect()}
    # N_out = min(100/.25, 300/.25, 600/.5) = 400 -> a keeps 100%
    assert out["a"]["keep_prob"] == 1.0 and out["a"]["expected_docs"] == 100
    assert abs(out["b"]["keep_prob"] - 100 / 300) < 1e-9
    assert out["c"]["expected_docs"] == 200
    assert all(r["keep_prob"] <= 1.0 for r in out.values())


def test_mixing_weights_token_budgeted(spark):
    """counts= switches the mixing plan to TOKEN budgets: n_s = sum of
    subword counts per source (the fraction that matters for training
    mixtures when doc lengths differ), with 0 for docs missing from the
    counts frame (coverage left-join)."""
    from opengemini_spark.datapipe.corpus import mixing_weights

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b")],
        "doc_id long, source string",
    )
    # token counts: a = 100+300 = 400; b = 800+400 (+0 for doc 5) = 1200
    counts = spark.createDataFrame(
        [(1, 100), (2, 300), (3, 800), (4, 400)],
        "doc_id long, n_subwords long",
    )
    out = {r["source"]: r for r in
           mixing_weights(docs, {"a": 0.5, "b": 0.5}, counts=counts).collect()}
    # N_out = min(400/.5, 1200/.5) = 800 tokens -> a binds at 100%
    assert out["a"]["n_docs"] == 400 and out["b"]["n_docs"] == 1200
    assert out["a"]["keep_prob"] == 1.0 and out["a"]["expected_docs"] == 400
    assert abs(out["b"]["keep_prob"] - 400 / 1200) < 1e-9
    assert out["b"]["expected_docs"] == 400
    # doc-count plan unchanged by the new parameter's default
    by_docs = {r["source"]: r for r in
               mixing_weights(docs, {"a": 0.5, "b": 0.5}).collect()}
    assert by_docs["a"]["n_docs"] == 2 and by_docs["b"]["n_docs"] == 3


def test_holdout_fuzzy_dedup_drops_near_copies(spark):
    """Fuzzy decontamination: a lightly-edited copy of a held-out doc is
    dropped from training; unrelated docs survive; exact-dup also caught."""
    from opengemini_spark.datapipe.corpus import holdout_fuzzy_dedup

    held = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, held, "eval"),
        (2, held, "train"),                                # exact copy
        (3, held.replace("dog", "cat"), "train"),          # near copy
        (4, "completely different text with other words entirely here now",
         "train"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = {r["doc_id"] for r in
            holdout_fuzzy_dedup(docs, "eval", threshold=0.5).collect()}
    assert kept == {4}
    # held-out docs never appear in the training keep-list
    assert 1 not in kept
