"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exactness baseline; the IVF variant is the
scale path: a coarse quantizer (per-label centroids here; k-means centroids
in production) prunes the candidate set to ``nprobe`` partitions before the
exact rerank, so the pair space is ``queries × (nprobe/nlist) × corpus``
instead of ``queries × corpus``.

All arithmetic is JVM-side (``zip_with`` + higher-order ``aggregate`` —
whole-stage-codegen'd), element-wise in index order with double casts so
the DuckDB oracle reproduces the floats bit-for-bit before rounding.

At cluster scale: the query side is broadcast (queries ≪ corpus), the
corpus scan is embarrassingly parallel, and the per-partition top-k is
map-side (AQE keeps the final global top-k shuffle tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a: str, b: str) -> F.Column:
    """Index-ordered double-precision dot product of two array columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " 0D, (acc, v) -> acc + v)"
    )


def with_norm(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm (double) of the embedding column as ``norm``."""
    return df.withColumn("norm", F.sqrt(_dot(emb_col, emb_col)))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k per query.

    Returns ``(query_id, vec_id, cosine, rank)``; ties broken by vec_id so
    the result is a deterministic total order. The query side is broadcast
    — at 100 TB the corpus never shuffles.
    """
    q = with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
        ),
        "q_emb",
    ).withColumnRenamed("norm", "q_norm")
    c = with_norm(
        corpus.select(F.col(id_col), F.col(emb_col).alias("c_emb")), "c_emb"
    ).withColumnRenamed("norm", "c_norm")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn(
            "cosine",
            F.round(_dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, symmetric, id_a < id_b).

    Brute force — correct at any scale but O(n²); the IVF/LSH variants are
    the scale path when n² is prohibitive.
    """
    a = with_norm(
        df.select(F.col(id_col).alias("id_a"), F.col(emb_col).alias("ea")), "ea"
    ).withColumnRenamed("norm", "na")
    b = with_norm(
        df.select(F.col(id_col).alias("id_b"), F.col(emb_col).alias("eb")), "eb"
    ).withColumnRenamed("norm", "nb")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(_dot("ea", "eb") / (F.col("na") * F.col("nb")), 4)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    emb_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean embedding per label: ``(label, centroid)``.

    posexplode → per-(label, pos) avg → re-assemble in position order.
    One shuffle keyed by (label, pos) — high cardinality, skew-free.
    """
    exploded = df.select(
        F.col(label_col), F.posexplode(F.col(emb_col)).alias("pos", "v")
    )
    per_pos = exploded.groupBy(label_col, "pos").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    return (
        per_pos.groupBy(label_col)
        .agg(F.sort_array(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            F.col(label_col),
            F.expr("transform(pm, s -> s.m)").alias("centroid"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: probe the ``nprobe`` nearest coarse cells, rerank
    exactly within them.

    Coarse cells here are the corpus's ``label`` partitions (stand-in for
    k-means cells); centroids are broadcast, so routing each query costs
    nlist dot products and the fine search only scans nprobe cells.
    Returns ``(query_id, vec_id, cosine, rank)`` — approximate: misses
    neighbors outside the probed cells, which is the accuracy/cost knob.
    """
    cents = with_norm(label_centroids(corpus, label_col, emb_col), "centroid")
    cents = cents.withColumnRenamed("norm", "cent_norm")
    q = with_norm(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb")
        ),
        "q_emb",
    ).withColumnRenamed("norm", "q_norm")
    routed = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "cent_cos",
            F.round(
                _dot("q_emb", "centroid") / (F.col("q_norm") * F.col("cent_norm")), 6
            ),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cent_cos").desc(), F.col(label_col).asc()
    )
    probes = (
        routed.withColumn("__r", F.row_number().over(wr))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "q_emb", "q_norm", label_col)
    )
    c = with_norm(
        corpus.select(F.col(id_col), F.col(label_col), F.col(emb_col).alias("c_emb")),
        "c_emb",
    ).withColumnRenamed("norm", "c_norm")
    scored = (
        c.join(F.broadcast(probes), label_col)
        .filter(F.col("query_id") != F.col(id_col))
        .withColumn(
            "cosine",
            F.round(_dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_norm")), 4),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )
