"""Z-order (Morton) clustering for multi-dimensional data skipping.

A table sorted on one column skips row groups only for filters on that
column. Interleaving the bits of several columns into one z-value and
sorting by it clusters the data in ALL of those dimensions at once —
parquet min/max row-group statistics then prune scans for filters on
any interleaved column (the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY``). Spark has no built-in; this is a north-star
extension (the reference has no layout operators at all — its sinks
write whatever partitioning arrives,
``core/src/main/scala/dev/mauch/spark/dfio/ParquetDataFrameIO.scala:7-26``).

``z_value`` is a flat shift/mask expression — codegen'd JVM-side and
bit-for-bit replicable in ANSI SQL (the q106 oracle recomputes it in
DuckDB integer arithmetic). ``zorder_sort`` adds min-max scaling (one
tiny stats pass, broadcast back) and the actual range-partition + sort,
i.e. a total order by z-value without ever collapsing to one partition.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cols: list[Column], bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of each column into one BIGINT.

    ``cols[j]`` must already be non-negative integers < 2**bits (scale
    first — see :func:`zorder_sort`). Bit i of column j lands at output
    position ``i*d + j``: column 0 occupies the least-significant
    position of each group, so earlier columns get slightly finer
    granularity. ``d*bits`` must stay <= 63 (BIGINT, sign bit unused).
    """
    d = len(cols)
    if d == 0:
        raise ValueError("z_value needs at least one column")
    if d * bits > 63:
        raise ValueError(f"{d} cols x {bits} bits > 63-bit capacity")
    terms = []
    for j, c in enumerate(cols):
        x = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(x, i).bitwiseAND(F.lit(1)) if i else x.bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, i * d + j) if (i * d + j) else bit)
    return reduce(lambda a, b: a + b, terms)


def zorder_sort(
    df: DataFrame,
    cols: list[str],
    bits: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df`` totally ordered by the z-value of ``cols``.

    Each column is min-max scaled onto [0, 2**bits) using one
    ``min/max`` stats pass (a scalar aggregate, broadcast back as a
    one-row cross join — no driver round trip in the data path), then
    range-partitioned and sorted by the interleaved value. Write the
    result with any file sink to get multi-dimensional row-group
    clustering. Constant columns scale to 0 and simply drop out of the
    interleave.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    scale = F.lit((1 << bits) - 1)
    scaled = []
    for c in cols:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        frac = F.when(hi > lo, (F.col(c).cast("double") - lo) / (hi - lo)).otherwise(
            F.lit(0.0)
        )
        scaled.append(F.floor(frac * scale).cast("long"))
    with_z = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__zv", z_value(scaled, bits))
        .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
    )
    return (
        with_z.repartitionByRange(n, "__zv")
        .sortWithinPartitions("__zv")
        .drop("__zv")
    )
