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
