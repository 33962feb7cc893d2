"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_rows_per_partition: int = 1) -> DataFrame:
    """Spread a narrow input over the cluster before a compute-heavy stage.

    Small dimension-sized inputs (a single parquet file under
    ``maxPartitionBytes``) arrive as ONE partition, which serializes any
    expensive projection downstream — interpreted higher-order array
    functions (MinHash, hyperplane sketches) and pandas UDFs never get past
    one core. When the scan yields fewer partitions than the session's
    default parallelism, repartition round-robin; the shuffle moves only the
    narrow input rows and buys a cluster-wide stage. Inputs that already
    arrive well-partitioned (any real corpus) pass through untouched.
    """
    if df.isStreaming:
        # .rdd is illegal on a streaming plan; micro-batch sizing is the
        # trigger's job (maxFilesPerTrigger), not a static repartition
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
