"""Table-maintenance operators: changelog merge (upsert/delete), date-spine
gap filling with forward fill, and declarative data-quality expectations.

These are the incremental-maintenance primitives an ETL engine needs once
tables live long enough to be *updated* rather than rebuilt — the reference
has no native merge (its Hive sink is append-only,
``hive/src/main/scala/dev/mauch/spark/dfio/HiveDataFrameSource.scala:28-32``),
so these extend the surface the same way the dedup/similarity operators do.

Scale notes (100 TB):

- ``merge_changelog`` is the union+window plan (same shape as
  operators/asof.py): ONE hash shuffle on the merge keys, no join of base
  against changes, no row explosion. At cluster scale this is the pattern
  behind Delta/Iceberg MERGE compaction: the snapshot streams through the
  same exchange as the (much smaller) changelog.
- ``gap_fill`` generates the per-key date spine with ``sequence``+``explode``
  on the *aggregated* (one row per key/day) relation, never on raw facts, so
  spine width is bounded by key-count x day-range, independent of fact rows.
- ``expectations`` folds all row-local checks into ONE aggregate pass over
  the table (conditional sums), one groupBy per uniqueness check, and one
  broadcast-able anti join per foreign-key check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def merge_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_cols: str | list[str],
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Apply an upsert/delete changelog onto a snapshot (SCD1 MERGE).

    ``base`` is the current snapshot (no seq/op needed — every change
    outranks it); ``changes`` carries ``seq_cols`` (a version ordering per
    key; pass several columns when the first can tie, e.g. ``[ts,
    event_id]``) and optionally ``op_col`` where ``delete_op`` marks
    tombstones. Output = new snapshot: per key the highest-seq change wins;
    keys whose winning change is a tombstone disappear; untouched base rows
    pass through.

    Single shuffle: union(base tagged seq=null, changes) -> row_number over
    (keys, seq desc nulls last) -> keep rank 1, drop tombstones.
    """
    seq_list = [seq_cols] if isinstance(seq_cols, str) else list(seq_cols)
    drop = {*keys, *seq_list, op_col}
    value_cols = [c for c in changes.columns if c not in drop]
    missing = [c for c in value_cols if c not in base.columns]
    if missing:
        raise ValueError(f"base is missing changelog value columns: {missing}")

    seq_aliases = [f"__seq{i}" for i in range(len(seq_list))]
    tagged_base = base.select(
        *keys,
        *[F.col(c) for c in value_cols],
        *[
            F.lit(None).cast(changes.schema[c].dataType).alias(a)
            for c, a in zip(seq_list, seq_aliases)
        ],
        F.lit(None).cast("string").alias("__op"),
        F.lit("base").alias("src"),
    )
    tagged_changes = changes.select(
        *keys,
        *[F.col(c) for c in value_cols],
        *[F.col(c).alias(a) for c, a in zip(seq_list, seq_aliases)],
        (F.col(op_col) if op_col else F.lit("U")).cast("string").alias("__op"),
        F.lit("change").alias("src"),
    )
    # NULL seq (base) sorts last under desc_nulls_last => any change wins.
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(a).desc_nulls_last() for a in seq_aliases]
    )
    merged = (
        tagged_base.unionByName(tagged_changes)
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            # base rows carry NULL __op: never tombstones
            & (F.coalesce(F.col("__op"), F.lit("")) != F.lit(delete_op))
        )
        .drop("__rn", *seq_aliases, "__op")
    )
    return merged


def gap_fill(
    df: DataFrame,
    keys: list[str],
    date_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Densify a per-key daily series and forward-fill values.

    Input: at most one row per (keys, date). Output: one row per (keys,
    every day between that key's min and max date); original values where
    present (null on gap days) plus ``<col>_filled`` = last non-null value
    at-or-before the day.

    Plan: groupBy(keys) builds [min,max] (map-side combinable), the spine is
    ``explode(sequence(min,max))`` — distributed, one array per key — then a
    key+day left join back and one window per key for the fills. All
    shuffles hash on the key columns.
    """
    span = df.groupBy(*keys).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    spine = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__d0"), F.col("__d1"), F.expr("interval 1 day"))
        ).alias(date_col),
    )
    joined = spine.join(df, on=[*keys, date_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        joined = joined.withColumn(
            f"{c}_filled", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return joined


def expectations(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[list[str]] | None = None,
    accepted: dict[str, list[str]] | None = None,
    positive: list[str] | None = None,
    foreign_keys: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Declarative data-quality audit -> (check string, violations bigint).

    Row-local checks (not_null / accepted / positive) compute in one
    aggregate scan; each ``unique`` key set is one groupBy counting
    duplicated groups; each foreign key is a left-anti join (broadcast when
    the parent side is small enough for AQE to decide) counting orphans.
    """
    spark = df.sparkSession
    results: list[DataFrame] = []

    def vio(name: str, cond: Column) -> Column:
        return F.struct(
            F.lit(name).alias("check"),
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias("violations"),
        )

    row_checks: list[Column] = []
    for c in not_null or []:
        row_checks.append(vio(f"not_null:{c}", F.col(c).isNull()))
    for c, values in (accepted or {}).items():
        row_checks.append(
            vio(f"accepted:{c}", ~F.col(c).isin(values) | F.col(c).isNull())
        )
    for c in positive or []:
        row_checks.append(vio(f"positive:{c}", ~(F.col(c) > 0) | F.col(c).isNull()))
    if row_checks:
        packed = df.agg(F.array(*row_checks).alias("checks"))
        results.append(
            packed.select(F.explode("checks").alias("c")).select("c.check", "c.violations")
        )

    for key_set in unique or []:
        dup_groups = (
            df.groupBy(*key_set)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(
                F.lit("unique:" + ",".join(key_set)).alias("check"),
                F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("bigint").alias(
                    "violations"
                ),
            )
        )
        results.append(dup_groups)

    for child_col, parent_df, parent_col in foreign_keys or []:
        orphans = (
            df.filter(F.col(child_col).isNotNull())
            .join(
                parent_df.select(F.col(parent_col).alias(child_col)).distinct(),
                on=child_col,
                how="left_anti",
            )
            .agg(
                F.lit(f"fk:{child_col}->{parent_col}").alias("check"),
                F.count(F.lit(1)).cast("bigint").alias("violations"),
            )
        )
        results.append(orphans)

    if not results:
        return spark.createDataFrame([], "check string, violations bigint")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def apply_agg_deltas(
    mv: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    count_col: str,
    sum_cols: list[str],
    *,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Incremental (delta) maintenance of a COUNT/SUM aggregate view.

    ``mv`` holds the current materialized state (one row per key group:
    ``count_col`` + exact-integer ``sum_cols``); ``deltas`` holds the
    same columns as SIGNED contributions already reduced per key
    (insert → (+1, +value), update → (0, new−old), delete →
    (−1, −old)). The merged view is a full-outer coalesce-add; groups
    whose count reaches zero drop out, exactly like a re-aggregation
    over the changed base would.

    Scale shape: the MV is never re-derived from the fact table — the
    work is |MV| ⊕ |affected keys| and the MV side NEVER shuffles. A
    single full-outer coalesce-add would be the obvious spelling, but
    Spark cannot broadcast either side of a FULL OUTER join: the hint
    is silently dropped and the whole view sort-merge-shuffles every
    batch. So the merge is split into three joins that each broadcast
    only the delta-sized side:

    1. **updates** — ``mv ⟕ broadcast(deltas)`` (broadcast-right IS
       honored for LEFT OUTER): every MV row streams once, matched
       keys get the signed contribution coalesce-added.
    2. **touched-key probe** — ``mv_keys ⋉ broadcast(delta_keys)``
       (broadcast LEFT SEMI): at most |deltas| rows survive, so the
       result itself is broadcastable regardless of |MV|.
    3. **inserts** — ``deltas ▷ broadcast(touched)`` (broadcast LEFT
       ANTI): delta keys absent from the view enter as fresh groups.

    Maintaining a 10⁹-group view against a 10⁴-row batch therefore
    moves 10⁴ rows — two exchange-free MV scans (the probe scan is
    key-column-pruned), zero MV shuffles. Sums must be exact
    (integer/decimal) — float sums are not associative enough to
    guarantee maintained == recomputed.
    """
    zero = F.lit(0).cast("long")
    vals = [count_col, *sum_cols]
    mvr = mv.select(
        *keys,
        *[F.col(c).alias(c + "__mv") for c in vals],
    )
    dr = deltas.select(
        *keys,
        *[F.col(c).alias(c + "__d") for c in vals],
    )
    hint = F.broadcast if broadcast_deltas else (lambda df: df)
    updated = mvr.join(hint(dr), keys, "left_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(c + "__mv"), zero)
                + F.coalesce(F.col(c + "__d"), zero)
            )
            .cast("long")
            .alias(c)
            for c in vals
        ],
    )
    touched = mv.select(*keys).join(
        hint(deltas.select(*keys)), keys, "left_semi"
    )
    inserted = dr.join(hint(touched), keys, "left_anti").select(
        *keys,
        *[
            F.coalesce(F.col(c + "__d"), zero).cast("long").alias(c)
            for c in vals
        ],
    )
    return updated.unionByName(inserted).filter(F.col(count_col) > 0)
