"""CDC apply-changes as a relational operator: materialize the CURRENT
snapshot implied by a change log (insert / update / delete records per
key, ordered by a sequence).

This is the DataFrame-level core of the ``?mode=cdc`` delta sink
(sources/delta_lite.py apply_changes_delta_lite) exposed for ANY frame
— a Kafka CDC topic, a Debezium export, an events table. Reference
surface: the reference pipes everything through ``sql://``
(core/TransformerParser.scala:22-31); this operator is the named,
oracle-paired form of the latest-change-per-key idiom.

Scale: one shuffle on the key columns + a row_number window — the
minimal plan for the semantics. Per-key state is bounded by changes
per entity (the same per-entity bound sessionization and the fold
operators rely on); no driver-side key lists, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes_snapshot(
    df: DataFrame,
    keys: list[str],
    sequence_cols: list[str],
    change_type_col: str | None = None,
    delete_values: tuple[str, ...] = ("delete",),
    ignore_values: tuple[str, ...] = ("update_preimage",),
) -> DataFrame:
    """The latest change per key, with keys whose latest change is a
    delete REMOVED — i.e. the table the change log describes.

    ``sequence_cols`` order changes within a key (descending wins);
    ``change_type_col`` names the operation column; rows whose type is
    in ``ignore_values`` are descriptive only (CDF pre-images) and are
    dropped before ranking, rows whose type is in ``delete_values``
    tombstone their key.
    """
    work = df
    if change_type_col is not None and ignore_values:
        work = work.filter(
            ~F.col(change_type_col).isin(*ignore_values)
        )
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in sequence_cols]
    )
    latest = (
        work.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if change_type_col is not None and delete_values:
        latest = latest.filter(
            ~F.col(change_type_col).isin(*delete_values)
        )
    return latest
