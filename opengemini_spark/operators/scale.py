"""Scale techniques as reusable operators: salted aggregation for skewed
keys, bucketed tables for shuffle-free joins.

These are the knobs SURVEY §4.2 promises for the 100 TB deployment:

- **Salting**: a hot series (one tag-set holding a large fraction of rows)
  makes one reducer the straggler. Two-phase aggregation over
  ``(key, salt)`` then ``key`` bounds any reducer's input to ``1/salt`` of
  the hot key. AQE's skew-join splitting handles joins; this handles
  aggregations, which AQE does not split.
- **Bucketing**: repeated equi-joins on the same key (orders ⋈ lineitem)
  pay a shuffle each time; bucketed tables co-locate matching keys at
  write time so Catalyst plans the join with zero Exchange.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partials`` maps output name → (phase1 aggregate over raw rows,
    phase2 aggregate over phase-1 partials); e.g. count → (count(1),
    sum), sum → (sum(x), sum), max → (max(x), max). The salt is derived
    from a hash of the full row id via ``monotonically_increasing_id`` —
    uniform, no data dependence.
    """
    salted = df.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c1.alias(f"__p_{name}") for name, (c1, _) in partials.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[
            c2(F.col(f"__p_{name}")).alias(name)
            if callable(c2)
            else c2.alias(name)
            for name, (_, c2) in partials.items()
        ]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist a bucketed (and optionally sorted) table — co-locates join
    keys so later equi-joins on ``bucket_col`` plan without an Exchange."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join_plan_has_no_shuffle(
    spark: SparkSession, left: str, right: str, key_l: str, key_r: str
) -> tuple[DataFrame, bool]:
    """Sort-merge-join two bucketed tables; report whether the plan needs a
    shuffle. (The merge hint rules out broadcast — for a small side the
    planner would broadcast and bypass bucketing entirely; bucketing's
    payoff is the big-big join, where it removes the hash repartition.)"""
    a = spark.table(left).hint("merge")
    b = spark.table(right)
    joined = a.join(b, a[key_l] == b[key_r])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    shuffle_free = "Exchange hashpartitioning" not in plan
    return joined, shuffle_free
