"""Shared Spark fixtures: one local session for the whole test run."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    import shutil

    from spark_etl_cli_spark.session import get_spark

    # orphaned managed-table locations from aborted runs break saveAsTable
    shutil.rmtree("/tmp/pytest-spark-warehouse", ignore_errors=True)

    spark = get_spark(
        app_name="pytest",
        master="local[4]",
        extra_confs={
            "spark.sql.shuffle.partitions": "4",
            "spark.default.parallelism": "4",
            "spark.sql.warehouse.dir": "/tmp/pytest-spark-warehouse",
        },
    )
    yield spark
