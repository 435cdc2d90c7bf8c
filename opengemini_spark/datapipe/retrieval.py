"""Corpus retrieval & language-model scoring for training-data pipelines.

Two operators a curation pipeline runs constantly at 100 TB:

- :func:`bm25_search` — sparse keyword retrieval over the corpus (the
  standard first-stage retriever for decontamination lookups, eval-set
  mining and targeted corpus audits);
- :func:`lm_perplexity` — self-trained bigram-LM negative log-likelihood
  per document (the KenLM-style quality signal: gibberish and boilerplate
  score far from the corpus distribution).

Both are pure DataFrame plans (explode → hash aggregate → join), no UDFs;
determinism notes inline — every floating sum is either a fixed-order
literal chain or a position-ordered fold so the DuckDB oracles reproduce
the doubles, with a final 6 dp rounding absorbing libm ulp differences
(ln differs by ≤1 ulp between JVM and DuckDB).

Scale shape: token/bigram explodes are map-side; the count aggregations
shuffle on term keys (high cardinality, skew bounded by the hottest
token); the per-doc re-aggregation shuffles on doc_id. The query side of
BM25 (a handful of literal terms) folds into the scan filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from opengemini_spark.datapipe.hashing import tokens_expr

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-``k``: score = Σ_q idf(q) · tf·(k1+1) /
    (tf + k1·(1 − b + b·dl/avgdl)), idf = ln(1 + (N − df + ½)/(df + ½))
    (the Lucene non-negative variant).

    → ``(doc_id, score, rank)``, rank over (rounded score desc, doc_id).
    The per-document sum runs in the literal order of ``query_terms``
    (a fixed (…(0 + s₁) + s₂)… chain), so the oracle reproduces it
    exactly; the 6 dp rounding happens BEFORE ranking so both engines
    rank identical keys.

    Scale: corpus stats (N, Σdl) collapse map-side to one row; df is one
    term-keyed aggregate over the (term ∈ query) explode — the filter on
    a literal array prunes everything else scan-side; the final top-k is
    a tiny sorted window.
    """
    # (r9 note: a keyed parallelize_scan here was A/B'd and REVERTED —
    # bm25's tokenize is light and the tf aggregate runs on the tiny
    # post-filter hit set, so the spread bought nothing and its exchange
    # cost ~+0.4 s per call at sf0.1, visible as rrf_fusion's 4 legs
    # going 1.67 -> 3.2 s)
    toks = docs.select(
        F.col(id_col), tokens_expr(text_col).alias("__toks")
    ).withColumn("dl", F.size("__toks").cast("long"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    terms_arr = "array(" + ", ".join(f"'{t}'" for t in query_terms) + ")"
    hits = toks.select(
        F.col(id_col), "dl", F.explode("__toks").alias("term")
    ).filter(F.expr(f"array_contains({terms_arr}, term)"))
    tf = hits.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "sub",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    # fixed-order literal sum: one conditional-agg column per query term,
    # chained left-to-right — no engine-ordered SUM() in the hash
    per_term = [
        F.max(F.when(F.col("term") == t, F.col("sub"))).alias(f"__s{i}")
        for i, t in enumerate(query_terms)
    ]
    agg = scored.groupBy(id_col).agg(*per_term)
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        score = score + F.coalesce(F.col(f"__s{i}"), F.lit(0.0))
    # two-phase top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition heap + driver merge of k rows each), so the scored
    # frame — one row per MATCHING doc, unbounded for common terms at
    # scale — never funnels through a single unpartitioned WindowExec;
    # only the k survivors get ranked. Total order (score, id) keeps the
    # limit deterministic.
    top = (
        agg.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        ),
    )


def lm_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-trained bigram-LM scoring: add-one-smoothed p(w₂|w₁) =
    (C(w₁,w₂) + 1)/(C(w₁) + V) with counts from the corpus itself,
    per-document mean negative log-likelihood over its bigrams.

    → ``(doc_id, n_bigrams, nll)`` with nll = round(−Σ ln p / n, 6);
    single-token documents are dropped (no bigrams — KenLM's behavior
    for empty input). The Σ runs as a position-ordered left fold so both
    engines add the same doubles in the same order.

    Scale: two count aggregates (bigram- and head-keyed) + one distinct
    for V; the per-doc fold re-shuffles on doc_id. All whole-stage
    codegen — the classic "score 100 TB against its own LM" pass is
    three hash aggregates, no UDF.
    """
    from opengemini_spark.catalog import parallelize_scan

    # keyed scan spread (r9): the bigram posexplode is the map cost and
    # the final per-doc fold groups on id
    toks = parallelize_scan(
        docs.select(F.col(id_col), F.col(text_col)), by=id_col
    ).select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    big = toks.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                "transform(slice(__toks, 1, size(__toks) - 1),"
                " (t, i) -> struct(t AS w1, element_at(__toks, i + 2) AS w2))"
            )
        ).alias("pos", "bg"),
    ).select(id_col, "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # (r9 note: deriving C(w1) = Σ_w2 C(w1,w2) from c2 was A/B'd and
    # REVERTED — without materializing c2 it re-runs the bigram explode
    # AND adds a second aggregate, measured 2.34 -> 3.81 s at sf0.1;
    # the direct head-keyed count below shares the scan via exchange
    # reuse instead)
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.select(F.explode("__toks").alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    lnp = (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lnp",
            F.log(
                (F.col("c2") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
            ),
        )
    )
    return (
        lnp.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(pos, lnp))),"
                " s -> s.lnp), 0D, (acc, x) -> acc + x)"
            ).alias("__sum"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(-F.col("__sum") / F.col("n_bigrams"), 6).alias("nll"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the cheap corpus-audit /
    topic-tagging pass (what is each document about, corpus-relatively).

    score(t, d) = tf(t, d) · ln(N / df(t)); → ``(doc_id, term, score,
    rank)`` with score rounded to 6 dp BEFORE ranking and (score desc,
    term asc) ties, so both engines rank identical keys. Corpus-wide
    terms (df = N, idf = 0) can still surface when a doc has nothing
    rarer — rank order stays total.

    Scale: one explode → (doc, term) count → term-keyed df aggregate →
    per-doc top-k window. All codegen'd; the window input is one row per
    distinct (doc, term).
    """
    from opengemini_spark.catalog import parallelize_scan

    # keyed scan spread (r9): the tf aggregate clusters on (id, term)
    toks = parallelize_scan(
        docs.select(F.col(id_col), F.col(text_col)), by=id_col
    ).select(F.col(id_col), tokens_expr(text_col).alias("__toks"))
    tf = (
        toks.select(F.col(id_col), F.explode("__toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = toks.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    k0: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists (the standard hybrid-
    retrieval combiner for sparse+dense candidates): score(d) =
    Σ_lists 1/(k0 + rank_i(d)) over the lists that retrieved ``d``.

    Each input needs ``(id_col, rank)``. → ``(id_col, score, rank)``,
    score rounded to 6 dp BEFORE ranking, (score desc, id asc) ties.
    The per-document sum is a fixed-order coalesce chain (list order),
    so an oracle reproduces the doubles exactly.

    Scale: the inputs are already top-N candidate lists (bounded by
    N·lists rows total), so the outer-join cascade and the final top-k
    never touch corpus-sized data — fusion cost is independent of the
    collection size behind the retrievers.
    """
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    merged = None
    for i, df in enumerate(ranked):
        part = df.select(F.col(id_col), F.col("rank").alias(f"__r{i}"))
        merged = part if merged is None else merged.join(
            part, id_col, "full_outer"
        )
    score = F.lit(0.0)
    for i in range(len(ranked)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(k0)) + F.col(f"__r{i}")), F.lit(0.0)
        )
    top = (
        merged.select(F.col(id_col), F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return top.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        ),
    )
