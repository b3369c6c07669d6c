"""Column profiling: the discovery side of data quality.

``expect://`` (operators/maintenance.py) *checks* declared
expectations; profiling *discovers* what to declare — null rates and
cardinalities per column in ONE aggregation pass over the table
(every per-column aggregate rides the same scan; Spark plans the
multi-distinct via a single Expand + two-stage aggregate, so the cost
is one shuffle of (column-tagged) keys, not one job per column).

Output is long-form ``(column, n_rows, n_nonnull, n_distinct)`` —
schema-stable regardless of the profiled table's column types, which
is what lets one oracle/diff/checksum pipeline consume profiles of any
table. Exact counts (no approx_count_distinct) so the DuckDB oracle
matches bit-for-bit; swap in ``approx_count_distinct`` at extreme
cardinalities where a 2% error is worth avoiding the distinct Expand.

No counterpart in the reference (connectors + SQL pass-through only);
north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nonnull, n_distinct) per column, one pass."""
    cols = cols or df.columns
    if not cols:
        raise ValueError("nothing to profile: no columns")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"__nn_{c}"))
        aggs.append(
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}")
        )
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nonnull"),
                F.col(f"__nd_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def profile_sql(cols: list[str], table: str) -> str:
    """DuckDB twin of :func:`profile_columns` (oracle helper)."""
    selects = [
        f"""
        SELECT '{c}' AS column,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(selects)
