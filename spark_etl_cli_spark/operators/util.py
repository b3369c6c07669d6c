"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Ensure compute-dense inputs are spread across the cluster.

    File sources split by *bytes* (``spark.sql.files.maxPartitionBytes``),
    so a small-but-compute-heavy table (documents to shingle, embeddings
    to score) can arrive in a single partition and serialize an entire
    operator onto one core. A round-robin repartition to the session's
    parallelism costs one tiny shuffle and unlocks full-width execution.

    No-op when the input already has >= target partitions — a 100 TB
    scan that is already wide must NOT be coalesced down.
    """
    sc = df.sparkSession.sparkContext
    target = partitions or sc.defaultParallelism
    try:
        # JVM-side physical-plan partition count. df.rdd would work but
        # additionally builds the InternalRow→Python conversion RDD —
        # measured ~100 ms per probe vs ~0.6 ms for toRdd, and fan_out
        # runs at build time for every compute-dense query.
        current = df._jdf.queryExecution().toRdd().getNumPartitions()  # noqa: SLF001
    except Exception:  # Spark Connect: no _jdf — fall back to the API
        current = df.rdd.getNumPartitions()
    if current >= target:
        return df
    return df.repartition(target)
