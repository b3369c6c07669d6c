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


def resolve_cdc_sequence(
    changes: DataFrame,
    keys: list[str],
    sequence_col: str | None = None,
    change_type_col: str = "_change_type",
    ignore_values: tuple[str, ...] = ("update_preimage",),
) -> list[str]:
    """Pick the sequence columns that order a CDC batch within a key —
    and REFUSE to guess when none exist.

    Resolution: an explicit ``sequence_col`` (comma-separable) wins;
    else ``_commit_version`` when the frame carries it (CDF output);
    else the batch must hold at most ONE applicable change per key —
    verified with one distributed groupBy — because any tie-break
    invented here (change-type order, the key itself) silently picks
    wrong winners on real CDC exports (insert→delete in one batch
    would resurrect the row). Returns the ordering columns, possibly
    empty (single-change-per-key proven, no ordering needed).
    """
    if sequence_col:
        cols = [c.strip() for c in sequence_col.split(",") if c.strip()]
        missing = [c for c in cols if c not in changes.columns]
        if missing:
            raise ValueError(
                f"cdc apply: sequence column(s) {missing} not in the "
                f"change frame (columns: {changes.columns})"
            )
        return cols
    if "_commit_version" in changes.columns:
        return ["_commit_version"]
    work = changes
    if change_type_col in changes.columns and ignore_values:
        work = work.filter(~F.col(change_type_col).isin(*ignore_values))
    ambiguous = (
        work.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if ambiguous:
        raise ValueError(
            "cdc apply: the change batch has keys with multiple "
            "applicable changes but no sequence to order them (no "
            "_commit_version column and no explicit sequence given). "
            "Pass ?sequence=<col> (sequence_col=) so 'latest per key' "
            "is well-defined — guessing by change type or key order "
            "silently produces wrong tables."
        )
    return []


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
    # an empty sequence means "no ordering needed" (caller proved each
    # key carries at most one applicable change); a constant keeps the
    # window legal without inventing an order
    order = (
        [F.col(c).desc() for c in sequence_cols]
        if sequence_cols
        else [F.lit(1)]
    )
    w = Window.partitionBy(*keys).orderBy(*order)
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
