"""Native DataFrame diff operator (N/I/D/C row-level comparison).

The reference delegates to the G-Research ``spark-extension`` library
(``diff/.../DiffTransformerParser.scala:9-62``, dep ``build.mill:138``).
This is a from-scratch PySpark implementation of the same observable
semantics:

- full-outer join of left/right on the id columns
- null-safe comparison of every non-id, non-ignored value column
- a leading ``diff`` column:
    ``N`` — row in both, all compared values equal
    ``C`` — row in both, some compared value differs
    ``I`` — row only in right (insert to get from left to right)
    ``D`` — row only in left (delete to get from left to right)
- output layout: ``diff``, id cols, then ``left_<c>``/``right_<c>``
  per value column.

Scale notes: this is a single shuffle (the full-outer join) on the id
columns; Catalyst will broadcast the smaller side when it fits, and the
null-safe comparisons are codegen'd expressions. ``handle='fail'`` uses
``isEmpty``-style short-circuit (LIMIT 1 under the hood) instead of
collecting all diffs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIFF_COL = "diff"


def diff(
    left: DataFrame,
    right: DataFrame,
    id_cols: list[str],
    ignore_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two DataFrames keyed by ``id_cols``."""
    ignore = set(ignore_cols or [])
    if not id_cols:
        raise ValueError("diff requires at least one id column")
    left_cols = set(left.columns)
    right_cols = set(right.columns)
    if not set(id_cols) <= left_cols & right_cols:
        raise ValueError(
            f"id columns {id_cols} must exist on both sides "
            f"(left={sorted(left_cols)}, right={sorted(right_cols)})"
        )
    value_cols = [c for c in left.columns if c not in id_cols and c in right_cols]
    compare_cols = [c for c in value_cols if c not in ignore]

    l = left.alias("l")
    r = right.alias("r")
    cond: Column | None = None
    for c in id_cols:
        eq = F.col(f"l.`{c}`").eqNullSafe(F.col(f"r.`{c}`"))
        cond = eq if cond is None else cond & eq
    joined = l.join(r, cond, "full_outer")

    # existence markers: any id col non-null on that side (ids are join keys)
    l_exists = F.lit(None)
    r_exists = F.lit(None)
    l_exists = F.col(f"l.`{id_cols[0]}`").isNotNull()
    r_exists = F.col(f"r.`{id_cols[0]}`").isNotNull()
    # Guard against genuinely-null id values: fall back to a struct check.
    l_any = None
    r_any = None
    for c in id_cols:
        la = F.col(f"l.`{c}`").isNotNull()
        ra = F.col(f"r.`{c}`").isNotNull()
        l_any = la if l_any is None else l_any | la
        r_any = ra if r_any is None else r_any | ra
    l_exists, r_exists = l_any, r_any

    changed: Column = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"l.`{c}`").eqNullSafe(F.col(f"r.`{c}`"))

    diff_col = (
        F.when(l_exists & ~r_exists, F.lit("D"))
        .when(r_exists & ~l_exists, F.lit("I"))
        .when(changed, F.lit("C"))
        .otherwise(F.lit("N"))
        .alias(DIFF_COL)
    )

    out_cols: list[Column] = [diff_col]
    for c in id_cols:
        out_cols.append(F.coalesce(F.col(f"l.`{c}`"), F.col(f"r.`{c}`")).alias(c))
    for c in value_cols:
        out_cols.append(F.col(f"l.`{c}`").alias(f"left_{c}"))
        out_cols.append(F.col(f"r.`{c}`").alias(f"right_{c}"))
    return joined.select(*out_cols)


class DiffFailedError(AssertionError):
    """Raised by handle='fail' when any non-'N' diff rows exist."""


def apply_diff_handling(diffed: DataFrame, handle: str | None) -> DataFrame:
    """``filter`` keeps only rows with differences; ``fail`` raises if any."""
    if handle in (None, "", "keep"):
        return diffed
    if handle == "filter":
        return diffed.filter(F.col(DIFF_COL) != "N")
    if handle == "fail":
        bad = diffed.filter(F.col(DIFF_COL) != "N")
        sample = bad.limit(20).collect()
        if sample:
            raise DiffFailedError(
                f"diff found {len(sample)}+ differing rows; first rows: {sample[:5]}"
            )
        return diffed
    raise ValueError(f"unknown handleDifferences mode: {handle!r}")
