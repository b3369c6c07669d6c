"""Import every query module so the registry is fully populated."""

from spark_etl_cli_spark.plans import (  # noqa: F401
    corpusops,
    curationops,
    eventops,
    funcops,
    joinops,
    maintenance,
    mmops,
    pipelineops,
    relational,
    retrieval,
    statsops,
    streamops,
    subqueries,
    textops,
    tpch_extra,
    vectorops,
)
