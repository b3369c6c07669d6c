"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full named-query library (see
``spark_etl_cli_spark/plans/``) for the DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _registry():
    # import registers all named queries
    from spark_etl_cli_spark.plans import all_queries  # noqa: F401
    from spark_etl_cli_spark.plans.registry import ORACLES, QUERIES

    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    queries, _ = _registry()
    return queries["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _registry()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    _, o = _registry()
    return dict(o)
