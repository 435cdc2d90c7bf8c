"""End-to-end corpus curation: the composition a real training-data
pipeline runs — near-dup clustering + quality gate + language filter into
one keep-list with per-document reject reasons.

Reject precedence (first match wins): duplicate → low_quality → lang.
Everything is the already-oracle-checked operators composed declaratively,
so the whole pipeline stays one Catalyst plan per stage and the keep-list
join keys are doc ids (high-cardinality, skew-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from opengemini_spark.datapipe.cluster import connected_components
from opengemini_spark.datapipe.dedup import minhash_lsh_dedup
from opengemini_spark.datapipe.text import quality_score


def curate(
    docs: DataFrame,
    min_quality_bp: int = 5000,
    langs_keep: tuple[str, ...] = ("en", "de"),
    jaccard_threshold: float = 0.8,
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """→ ``(doc_id, keep, reason)``; reason ∈ duplicate|low_quality|lang|kept."""
    pairs = minhash_lsh_dedup(docs, threshold=jaccard_threshold, id_col=id_col)
    comps = connected_components(pairs)
    dup = comps.filter(F.col("component") != F.col(id_col)).select(
        F.col(id_col), F.lit(True).alias("__dup")
    )
    q = quality_score(docs, id_col=id_col)
    out = (
        docs.select(id_col, lang_col)
        .join(dup, id_col, "left")
        .join(q, id_col)
        .withColumn(
            "reason",
            F.when(F.col("__dup"), "duplicate")
            .when(F.col("quality_bp") < min_quality_bp, "low_quality")
            .when(~F.col(lang_col).isin(*langs_keep), "lang")
            .otherwise("kept"),
        )
    )
    return out.select(
        id_col, (F.col("reason") == "kept").alias("keep"), "reason"
    )


def quality_percentile_filter(
    df: "DataFrame",
    frac: float = 0.1,
    group_col: str = "lang",
    id_col: str = "doc_id",
) -> "DataFrame":
    """Drop the bottom ``frac`` of documents by quality WITHIN each group
    (language): corpus-wide thresholds over-prune low-resource languages,
    per-group ranks don't. Deterministic: ties break by (quality, doc_id).

    Scale: 1 row/doc enters the window (scores pre-aggregated); the
    per-group sort is bounded by the largest language. At extreme scale
    swap the exact rank for an approx-quantile threshold per group
    (approxQuantile / percentile_approx) — this exact form is the
    correctness-gated variant.
    """
    from pyspark.sql import Window

    from opengemini_spark.datapipe import text

    q = text.quality_score(df, id_col=id_col)
    d = df.select(id_col, group_col).join(q, id_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("quality_bp").asc(), F.col(id_col).asc()
    )
    n = Window.partitionBy(group_col)
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter(
            F.col("__rn")
            > F.ceil(F.col("__n") * F.lit(frac)).cast("long")
        )
        .select(id_col, group_col, "quality_bp")
    )
