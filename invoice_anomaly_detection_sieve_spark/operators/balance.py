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

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin rebalance ``df`` iff it has fewer partitions than the
    session's default parallelism (or ``min_partitions`` if given)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
