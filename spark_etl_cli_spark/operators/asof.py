"""As-of (nearest-prior) join, expressed as one shuffle + one window pass.

Spark has no native ASOF JOIN (DuckDB does; the reference reaches range
joins through plain SQL ``BETWEEN`` predicates — reference
``etl/src/test/scala/dev/mauch/spark/dfio/ETLTest.scala:143-157``). The
naive formulations are quadratic (theta join) or driver-bound
(``pd.merge_asof`` after collect). This implementation is the scalable
union-and-window pattern:

1. union left and right rows with a side tag, aligning on (key, ts)
2. sort within each key partition by (ts, side) — right rows sort
   before left rows at equal timestamps, making the match inclusive
3. ``last(<right payload>, ignoreNulls=True)`` over rows UNBOUNDED
   PRECEDING..CURRENT ROW propagates the most recent right row forward
4. keep only left rows

Cost: a single hash-partition shuffle on the key + an in-partition sort
— the same cost profile as a regular sort-merge join, no row explosion,
no skew beyond what the key distribution already has. At 100 TB this
beats a range-join by orders of magnitude because each left row never
meets more than one right row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: str | float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row with equal keys:
    ``right.ts <= left.ts`` for ``direction='backward'`` (default) or
    ``right.ts >= left.ts`` for ``'forward'`` — inclusive either way.

    ``right_payload`` — right columns to carry (default: all non-key,
    non-ts). Carried columns are renamed with ``suffix`` when they clash
    with left column names. ``tolerance`` nulls out matches farther than
    the given distance — an interval string ("10 minutes") for timestamp
    keys, or a number for numeric time columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = right_payload or [
        c for c in right.columns if c not in key_cols and c != right_ts
    ]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    # carry the matched right timestamp for tolerance checks
    payload_struct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in payload]
    )
    payload_type = right.select(payload_struct.alias("s")).schema["s"].dataType

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema.fields
          if f.name not in key_cols],
        *[F.col(c) for c in key_cols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__payload"),
    ).select(*[c for c in left.columns], "__ts", "__side", "__payload")

    unioned = l_tagged.unionByName(r_tagged)
    # backward: scan time ascending, latest right at or before wins.
    # forward: scan time descending, earliest right at or after wins.
    # Right rows sort before left rows at equal ts either way, which is
    # what makes the match inclusive.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    if tolerance is not None:
        if isinstance(tolerance, str):
            tol = F.expr(f"INTERVAL {tolerance}")
        else:
            tol = F.lit(tolerance)
        dist = (
            F.col("__ts") - F.col("__match.__rts")
            if direction == "backward"
            else F.col("__match.__rts") - F.col("__ts")
        )
        matched = matched.withColumn(
            "__match", F.when(dist <= tol, F.col("__match"))
        )
    out = matched.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in payload],
    )
    return out
