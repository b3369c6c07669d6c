"""spark_etl_cli_spark — a PySpark-native ETL/analytics engine.

A from-scratch re-expression of the capability surface of
nightscape/spark-etl-cli (reference: a URI-driven ETL orchestrator on
Spark; see ``etl/src/main/scala/dev/mauch/spark/dfio/ETL.scala`` in the
reference repo): URI-addressed sources/transforms/sinks over Spark temp
views, the full Spark SQL relational surface, plus first-class
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Design principles (Spark-first, scale-first):

- DataFrame/SQL everywhere; Catalyst owns optimization (pushdown,
  pruning, join selection, AQE). No driver-side row loops.
- Built-in ``pyspark.sql.functions`` in every hot path; Arrow-batched
  Pandas UDFs only where built-ins cannot express the semantics.
- Partitioning-aware: broadcast small dimensions, map-side partial
  aggregation, no ``repartition(1)`` in any measured path.
"""

from spark_etl_cli_spark.session import get_spark
from spark_etl_cli_spark.pipeline import Pipeline, run_pipeline

__version__ = "0.1.0"

__all__ = ["get_spark", "Pipeline", "run_pipeline", "__version__"]
