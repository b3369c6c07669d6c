"""Order-insensitive table checksums for cross-system reconciliation.

``diff://`` (operators/diff.py) answers *which rows differ* but needs
both tables in one session. A checksum answers *whether* they differ
while moving only one row per group between systems — the cheap
first-line reconciliation at 100 TB (run on both sides, compare
results; drill into mismatched groups with ``diff://`` afterwards).

Design for cross-engine exactness (the q107 oracle recomputes the sum
in DuckDB):

- row canonical form = ``concat_ws(0x1f, cast(col as string)...)`` —
  the caller picks columns whose string form is engine-stable
  (integers, strings, dates; cast floats/timestamps explicitly first);
- row hash = first 15 hex chars of md5 (60 bits — portable integer
  range, same trick as winnowing fingerprints in functions/text.py);
- group checksum = exact DECIMAL(38,0) sum of row hashes, folded to
  BIGINT by a Mersenne-prime modulus (2^61-1) — associative,
  commutative, overflow-free on both engines, so partition order and
  partial aggregation cannot change the result.

NULL columns canonicalize to the empty string (concat_ws skips nulls),
which also makes ``NULL`` and ``''`` collide — include a not-null
indicator column upstream if that distinction matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERSENNE_61 = (1 << 61) - 1
_SEP = "\x1f"


def row_hash(cols: list[str]):
    """60-bit portable row hash of the given columns' canonical form."""
    canon = F.concat_ws(_SEP, *[F.col(c).cast("string") for c in cols])
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")


def table_checksum(
    df: DataFrame, cols: list[str], group_by: list[str] | None = None
) -> DataFrame:
    """(group cols..., n_rows, checksum) — one hash-agg shuffle.

    Equal multisets of rows produce equal checksums regardless of
    order, partitioning, or engine; a mismatch pinpoints the group to
    drill into.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    h = row_hash(cols)
    grouped = df.groupBy(*(group_by or []))
    return grouped.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.pmod(F.sum(h.cast("decimal(38,0)")), F.lit(_MERSENNE_61))
        .cast("bigint")
        .alias("checksum"),
    )


def checksum_sql(cols: list[str], table: str, group_by: list[str] | None = None) -> str:
    """The DuckDB twin of :func:`table_checksum` (oracle helper)."""
    canon = ", ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    h = (
        f"CAST(('0x' || substr(md5(concat_ws(chr(31), {canon})), 1, 15)) "
        "AS BIGINT)"
    )
    keys = ", ".join(group_by or [])
    sel_keys = f"{keys}, " if keys else ""
    group = f"GROUP BY {keys}" if keys else ""
    return f"""
    SELECT {sel_keys}CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST({h} AS HUGEINT)) % {_MERSENNE_61} AS BIGINT)
             AS checksum
    FROM {table} {group}
    """
