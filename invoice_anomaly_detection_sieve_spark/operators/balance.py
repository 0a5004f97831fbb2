"""Input-parallelism guard for compute-amplifying corpus operators.

A small parquet input is one row group ⇒ one scan task, and Spark cannot
split a single row group across tasks. Any operator whose first stage
amplifies work 100-1000× per input row (shingling explodes a document
into hundreds of shingles × K hash projections) then runs single-threaded
up to its first exchange, no matter how many cores the cluster has — AQE
only rebalances *after* a shuffle, never the leaf scan.

The guard below is a no-op at corpus scale: a 100 TB table scans as
~10⁵-10⁶ splits, far above any cluster's core count. It only fires when
the plan's leaf partitioning is below the session's default parallelism —
which bounds the rebalanced data to (cores × maxPartitionBytes), a few
GB shuffled once to unlock full-width execution of a stage that does
orders of magnitude more work than the shuffle moves.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


# logical-plan nodes that imply an exchange somewhere in the plan: the
# under-partitioned-LEAF-SCAN problem this guard exists for cannot occur
# past a shuffle (AQE rebalances post-shuffle stages), and probing
# df.rdd there would EXECUTE the upstream stages under AQE just to count
# partitions — which the real action then recomputes. A NARROW
# Repartition (coalesce: "Repartition N, false") is exempt — it is free
# to probe and is itself an under-parallelism the guard should fix.
_EXCHANGE_NODES = (
    "Aggregate", "Join", "Window", "RepartitionByExpression",
    "Sort", "Deduplicate", "GlobalLimit",
)
# node names are matched ANCHORED at the start of a plan line (after the
# tree-drawing prefix), not by raw substring: a user column named e.g.
# "SortKey" appearing inside a Project's expression list must not read as
# an exchange and silently disable the rebalance
_EXCHANGE_LINE = re.compile(
    r"^[+:\-\s'*]*(?:" + "|".join(_EXCHANGE_NODES) + r")\b", re.MULTILINE
)
_SHUFFLE_REPARTITION = re.compile(r"^[+:\-\s'*]*Repartition \d+, true", re.MULTILINE)


def guard_hot_keys(df: DataFrame, keys: list[str], max_count: int | None) -> DataFrame:
    """Drop rows whose key group exceeds ``max_count`` — the shared
    hot-key guard for pair-generating operators (a key shared by K rows
    yields K² pairs; a degenerate key is useless evidence anyway).

    One window count riding the SAME (keys) shuffle the caller's next
    groupBy uses — WindowExec sorts + spills, so a degenerate key never
    materializes in memory. ``max_count=None`` is a no-op (exact-recall
    oracle paths)."""
    if max_count is None:
        return df
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    return (
        df.withColumn("_kc", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
        .where(F.col("_kc") <= max_count)
        .drop("_kc")
    )


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin rebalance ``df`` iff it is a shuffle-free (scan-shaped)
    plan with fewer partitions than the session's default parallelism (or
    ``min_partitions`` if given). Plans that already contain an exchange
    are returned unchanged — see _EXCHANGE_NODES."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        # fail CLOSED: without the plan text we cannot prove the plan is
        # scan-shaped, and probing df.rdd below a shuffle EXECUTES the
        # upstream stages under AQE — the exact hazard this check avoids.
        # Skipping the rebalance is only ever a perf miss, never wrong.
        return df
    if _EXCHANGE_LINE.search(plan) or _SHUFFLE_REPARTITION.search(plan):
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
