"""Duplicate-cluster resolution: connected components over near-dup pairs.

After MinHash/SimHash emit pairwise matches, corpus dedup needs the
transitive closure — "keep one representative per duplicate *group*", not
per pair. Components are computed by iterative min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each round is two hash joins + one aggregate; the
number of rounds is the graph diameter (near-dup clusters are tiny chains,
so 2–4 rounds in practice; doubling tricks exist for pathological chains).
The driver-side loop iterates ROUNDS, not rows — per-round work is fully
distributed, which is what makes this viable on a billion-edge dup graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve ``(id_a, id_b)`` edges into ``(doc_id, component)`` where
    component = min doc id reachable (the canonical representative)."""
    # Materialize the edge set once and truncate lineage per round —
    # without this every iteration would re-execute the upstream pair
    # pipeline (e.g. the whole MinHash) and the plan would grow per round.
    # localCheckpoint in local mode; a reliable checkpoint dir on a cluster.
    # Both orientations come out of ONE explode over one scan of `pairs`:
    # a self-union would carry two copies of the (expensive) pair-pipeline
    # subtree and execute it twice inside this eager checkpoint.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        # Labels only ever decrease, so the change flag is computable in
        # the update projection itself — the convergence probe then scans
        # the checkpointed blocks instead of re-joining old vs new labels
        # (one fewer shuffle join per round).
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nbr_label"), F.col("label"))
                    < F.col("label")
                ).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("__chg")).limit(1).count()
        labels = updated.drop("__chg")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def dedup_keep_list(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The final corpus keep-list: all docs, duplicates collapsed to their
    component representative. Returns ``(doc_id, keep)``."""
    joined = df.select(id_col).join(components, id_col, "left")
    return joined.select(
        id_col,
        (F.col("component").isNull() | (F.col("component") == F.col(id_col))).alias(
            "keep"
        ),
    )
