"""Import every query module so the registry is fully populated."""

from spark_etl_cli_spark.plans import relational  # noqa: F401

# populated in later milestones:
for _mod in ("textops", "vectorops", "streamops"):
    try:
        __import__(f"spark_etl_cli_spark.plans.{_mod}")
    except ImportError:
        pass
