"""Query/oracle registry backing the driver contract (__spark_entry__).

Each named query is a ``(spark, sf_dir) -> DataFrame`` callable; most
carry a DuckDB-executable ANSI-SQL oracle string. Cross-engine
determinism rules used throughout (so order-insensitive value hashes
match exactly):

- money/quantity sums go through DECIMAL(18,4) (exact, associative)
  and are cast back to DOUBLE for a stable output schema;
- averages are computed as exact-decimal-sum / count in DOUBLE;
- counts are cast to BIGINT on both sides (DuckDB count → HUGEINT);
- timestamps never appear raw in outputs — cast to DATE or epoch
  BIGINT (Spark session TZ is UTC; DuckDB timestamps are UTC-naive);
- top-k orderings always include a unique key as the final tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a named query (and its DuckDB oracle, if expressible)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def pin_session(spark: SparkSession) -> None:
    """Runtime confs every query depends on, set defensively.

    The driver's correctness gate builds its OWN SparkSession; if that
    session's timezone isn't UTC, every epoch/date cast would shift
    against the (UTC-naive) DuckDB oracle. Both confs are
    runtime-settable, so pinning here makes the query library correct
    under any host session, not just ours (session.py).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the synthetic tables from a scale-factor dir.

    The legacy nanosAsLong conf keeps TIMESTAMP(NANOS) fixture
    generations readable (as LONG nanoseconds); it is a no-op for
    µs-precision data. Event-time queries should load events via
    :func:`events`, which normalizes ``ts`` across generations.
    """
    pin_session(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with ``ts`` normalized to TimestampType (UTC).

    Fixture generations differ in the physical type of ``ts``:
    TIMESTAMP(NANOS) arrives as LONG nanoseconds (legacy conf in
    :func:`t`), TIMESTAMP(MICROS) as TIMESTAMP_NTZ. Both become the
    session-tz TimestampType (session TZ is pinned UTC, so the NTZ cast
    is wall-clock identity and epochs match the DuckDB oracle).
    """
    df = t(spark, sf_dir, "events")
    dt = dict(df.dtypes)["ts"]
    if dt in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt != "timestamp":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def dsum(col, alias: str, scale: int = 4):
    """Exact decimal sum → double (deterministic across engines)."""
    return F.sum(col.cast(T.DecimalType(18, scale))).cast("double").alias(alias)


def davg(col, alias: str, scale: int = 6):
    """Exact decimal mean → double."""
    return (
        F.sum(col.cast(T.DecimalType(18, scale))).cast("double") / F.count(F.lit(1))
    ).alias(alias)


def bcount(alias: str):
    return F.count(F.lit(1)).cast("bigint").alias(alias)


def dec(col, p: int = 10, s: int = 2):
    """Cast a known-2-decimal money/rate double to an exact decimal.

    All money columns in the synthetic data are round(x, 2) doubles, so
    this recovers the exact decimal value in both engines; subsequent
    decimal arithmetic is then exact and engine-independent (no
    HALF_UP-vs-HALF_EVEN divergence on product rounding).
    """
    return col.cast(T.DecimalType(p, s))


def rev_col():
    """Exact-decimal ``l_extendedprice * (1 - l_discount)``."""
    return dec(F.col("l_extendedprice")) * (F.lit(1) - dec(F.col("l_discount"), 4))


def charge_col():
    """Exact-decimal ``rev * (1 + l_tax)``."""
    return rev_col() * (F.lit(1) + dec(F.col("l_tax"), 4))


def xsum(col, alias: str):
    """Sum an already-exact decimal column → double."""
    return F.sum(col).cast("double").alias(alias)


# DuckDB-side helpers (kept as f-string fragments for the oracles)
SQL_REV = "(CAST(l_extendedprice AS DECIMAL(10,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))))"
SQL_CHARGE = f"({SQL_REV} * (1 + CAST(l_tax AS DECIMAL(4,2))))"


def SQL_XSUM(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def SQL_DSUM(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def SQL_DAVG(expr: str, alias: str, scale: int = 6) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / COUNT(*) AS {alias}"
    )
