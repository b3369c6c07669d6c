"""Built-in connectors. Importing this package registers all schemes."""

from spark_etl_cli_spark.sources import files as _files  # noqa: F401
from spark_etl_cli_spark.sources import inline as _inline  # noqa: F401
from spark_etl_cli_spark.sources import catalog as _catalog  # noqa: F401
from spark_etl_cli_spark.sources import memory as _memory  # noqa: F401
from spark_etl_cli_spark.sources import arrowipc as _arrowipc  # noqa: F401
from spark_etl_cli_spark.sources import jdbc as _jdbc  # noqa: F401
from spark_etl_cli_spark.sources import http as _http  # noqa: F401

# Optional connectors whose dependencies may be absent (delta jars,
# kafka connector jar, excel reader). They register themselves and fail
# lazily with a clear message when actually used without the dependency.
from spark_etl_cli_spark.sources import optional as _optional  # noqa: F401
from spark_etl_cli_spark.sources import lakehouse_maint as _lm  # noqa: F401
