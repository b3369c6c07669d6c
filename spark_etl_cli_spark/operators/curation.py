"""Corpus-curation operators a 100 TB training-data pipeline needs:
per-domain caps, deterministic dataset splits, file-compaction
planning, and join-key skew profiling.

These extend the reference's transform surface (it delegates all
relational work to SQL — README.md "transformation" section) with the
curation primitives used by large-scale LLM corpus builds; each is a
plain ``DataFrame -> DataFrame`` so it composes with the pipeline
runner exactly like ``sql://`` (operators/transforms.py).

Scale notes (100 TB):

- ``cap_per_group`` is ONE shuffle on the group key. The window is a
  per-key sort, so a pathological heavy-hitter domain serializes one
  partition; the documented mitigation is the two-phase variant (cap
  within salted sub-groups first, then exact-cap the survivors), which
  composes from this same function.
- ``dataset_split`` is a pure narrow projection (hash -> bucket ->
  label): zero shuffles, zero RNG state — reproducible on any cluster
  layout, which is the property that matters for train/test hygiene.
- ``compaction_plan`` mirrors Delta/Iceberg OPTIMIZE bin-packing:
  cumulative byte sums per partition-dir, files binned at target size.
  One shuffle on the partition key; output is a driver-consumable plan
  (bins), not moved data.
- ``key_skew_profile`` is the pre-flight check before a big join: one
  aggregation pass emitting per-key share + the skew ratio that decides
  broadcast / salt / AQE-skew-join (operators/skew.py) treatment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cap_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, by a deterministic priority.

    The canonical "at most N documents per domain" curation gate.
    ``order_by`` defaults to the group's natural column order — pass an
    explicit priority (e.g. quality desc, id asc) and ALWAYS include a
    unique tiebreaker so survivorship is reproducible.
    """
    order = order_by or [F.col(c) for c in df.columns]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def dataset_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int],
    salt: str = "",
) -> DataFrame:
    """Append a deterministic ``split`` label (train/val/test shape).

    Buckets ``md5(id [+ salt])`` into ``sum(weights)`` cells and assigns
    labels by cumulative weight, so splits are stable across runs,
    cluster layouts, and engines (no ``rand()``: a re-run after adding
    rows never reshuffles existing assignments). ``weights`` preserves
    insertion order, e.g. ``{"train": 80, "val": 10, "test": 10}``.
    """
    total = sum(weights.values())
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError(
            "weights must be non-negative and sum to a positive integer"
        )
    from spark_etl_cli_spark.functions.text import md5_long

    # md5_long's '#'-separated salt gives domain separation: id='1',
    # salt='2' never collides with id='12', salt='' (and differently
    # salted split families are independent)
    bucket = md5_long(
        F.col(id_col).cast("string"),
        salt=F.lit(salt) if salt else None,
    ) % total
    expr = None
    acc = 0
    for label, wgt in weights.items():
        acc += wgt
        cond = bucket < acc
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn("split", expr)


def compaction_plan(
    df: DataFrame,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_size: int,
) -> DataFrame:
    """Bin-pack files into ~``target_size`` groups per partition.

    The planning half of OPTIMIZE/compaction: files are walked in
    ``file_col`` order within each partition directory and assigned the
    bin their *preceding* cumulative size falls in — so bins fill to at
    least the target before a new one opens (a single over-size file
    still gets its own bin). Emits one row per (partition, bin) with
    file count and total bytes; executing the plan is a separate
    ``coalesce``-style rewrite.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("bigint"))
    return (
        df.withColumn("__bin", F.floor(before / F.lit(target_size)))
        .groupBy(partition_col, F.col("__bin").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(size_col).cast("bigint").alias("bytes"),
        )
    )


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Top-``top_k`` heaviest keys with share-of-table and skew ratio.

    ``skew_ratio`` is key_count / mean_count — the number AQE's skew
    join and operators/skew.py salting key off. One aggregation pass +
    a broadcast-size global stats join (2 scalar values). The top-k cut
    is ``orderBy().limit()`` (TakeOrdered: per-partition heaps + a
    k-row driver merge) BEFORE the ranking window, so the global sort
    the window implies only ever sees ``top_k`` rows — a billion-key
    profile never single-partitions the key list.
    """
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("key_count")
    )
    stats = counts.agg(
        F.sum("key_count").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__nkeys"),
    )
    top = counts.orderBy(
        F.col("key_count").desc(), F.col(key_col).asc()
    ).limit(top_k)
    w = Window.orderBy(F.col("key_count").desc(), F.col(key_col).asc())
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .select(
            "rank",
            key_col,
            "key_count",
            (F.col("key_count") / F.col("__total")).alias("share"),
            (F.col("key_count") * F.col("__nkeys") / F.col("__total")).alias(
                "skew_ratio"
            ),
        )
    )
