"""Distributed dense sequential-id assignment.

The naive form — ``row_number()`` over a global ``ORDER BY`` window —
collapses the whole dataset into ONE partition (Spark warns: "No
Partition Defined for Window operation"); at 100 TB that is not a plan,
it's an outage. The scalable classic is two-pass:

1. range-partition by the order columns and sort within partitions —
   the same machinery a global ``ORDER BY`` uses, minus the collapse;
2. count rows per partition (a ~num_partitions-row aggregate), prefix-
   sum the counts into per-partition start offsets on the driver;
3. per partition, id = partition offset + local ordinal, assigned
   streaming over Arrow batches (``mapInPandas`` keeps a counter across
   the partition's batches — no shuffle, no window).

The input is ``localCheckpoint``-materialized between the two passes:
range-partitioning samples its bounds, so re-executing the plan could
route boundary rows differently between the count job and the assign
job. Materializing pins one layout (and pays one extra write of the
data to executor storage — the unavoidable cost of any exact two-pass
scheme; at extreme scale, persist to DISK_ONLY instead).

``order_cols`` must be a total order (include a unique tiebreaker) for
the ids to be deterministic — the oracle-facing guarantee. For ids that
only need uniqueness, not density/order, use
``F.monotonically_increasing_id()`` (pure expression, zero passes).

No counterpart in the reference (its surface is connectors + SQL
pass-through); north-star extension for training-data indexing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_sequential_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "seq_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col``: dense 0-based ids in ``order_cols`` order."""
    if not order_cols:
        raise ValueError("order_cols must be non-empty (need a total order)")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    ranged = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["n"]
        for r in ranged.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    total = 0
    for pid in sorted(counts):
        offsets[pid] = total
        total += counts[pid]

    out_schema = df.schema.add(id_col, "long", False)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        start = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if start is None:
                start = offsets[int(pdf["__pid"].iloc[0])]
            out = pdf.drop(columns=["__pid"])
            out[id_col] = range(start + seen, start + seen + len(pdf))
            seen += len(pdf)
            yield out

    return ranged.mapInPandas(assign, out_schema)
