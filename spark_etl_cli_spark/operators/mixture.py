"""Deterministic epoch-weighted corpus mixing (training-data upsampling).

A training mix assigns each corpus source a repeat weight ("3.5 epochs
of wikipedia, 0.3 epochs of crawl"). This operator materializes that
mix: every row is emitted ``floor(w)`` times, plus one extra copy for
the deterministic ``frac(w)`` fraction of rows chosen by an md5 bucket
of the id — the same hash-gated idiom as the stratified sampler
(plans/corpusops.py q48): no RNG state, identical selection on re-runs,
under repartitioning, and across engines.

Scale shape: one narrow projection + ``explode(sequence(...))`` — no
shuffle at all; output partitioning inherits the input. Fractional
weights are resolved to integer percents on the driver so both engines
compare integers (never floats) in the copy-count CASE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _split_weight(w: float) -> tuple[int, int]:
    """weight -> (whole copies, extra-copy percent 0..99), exactly."""
    pct = int(round(w * 100))
    return pct // 100, pct % 100


def id_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5 of the id."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def epoch_upsample(
    df: DataFrame,
    weights: dict[str, float],
    *,
    default: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Repeat each row per its source's epoch weight; adds ``epoch_col``
    (1-based copy index). Weight 0 drops the source entirely."""
    bucket = id_bucket(F.col(id_col))
    base_d, pct_d = _split_weight(default)
    copies = F.lit(base_d) + (bucket < F.lit(pct_d)).cast("int")
    for src, w in sorted(weights.items()):
        b, p = _split_weight(w)
        copies = F.when(
            F.col(source_col) == src, F.lit(b) + (bucket < F.lit(p)).cast("int")
        ).otherwise(copies)
    return (
        df.withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)
        .withColumn(
            epoch_col, F.explode(F.sequence(F.lit(1), F.col("__copies")))
        )
        .drop("__copies")
    )


def epoch_upsample_sql(
    table_expr: str,
    weights: dict[str, float],
    *,
    default: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
    epoch_col: str = "epoch",
    columns: str = "*",
) -> str:
    """DuckDB twin of :func:`epoch_upsample` (same integer bucket math)."""
    bucket = (
        f"CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) AS BIGINT)"
        " % 100"
    )
    base_d, pct_d = _split_weight(default)
    cases = " ".join(
        f"WHEN {source_col} = '{src}' THEN "
        f"{_split_weight(w)[0]} + CASE WHEN ({bucket}) < {_split_weight(w)[1]}"
        " THEN 1 ELSE 0 END"
        for src, w in sorted(weights.items())
    )
    default_expr = (
        f"{base_d} + CASE WHEN ({bucket}) < {pct_d} THEN 1 ELSE 0 END"
    )
    # no WHEN branches (weights={}) would make "CASE ELSE ... END"
    # invalid SQL, while the Spark path happily applies the default to
    # every row — emit just the default expression in that case
    copies = f"CASE {cases} ELSE {default_expr} END" if cases else default_expr
    return f"""
    SELECT {columns}, CAST(UNNEST(generate_series(1, n_copies)) AS INT)
             AS {epoch_col}
    FROM (SELECT *, {copies} AS n_copies FROM {table_expr})
    WHERE n_copies >= 1
    """
