"""Queries that run THROUGH the URI pipeline engine itself.

These exercise the actual product surface — URI parsing, the temp-view
IR, source connectors, and the sql/flatten-explode/diff transforms
(reference ``ETL.scala:11-33``, ``TransformerParser.scala:17-144``,
``DiffTransformerParser.scala:9-62``) — inside the driver's oracle
gate, so the engine plumbing is correctness-checked, not just the
queries it hosts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_cli_spark.pipeline import run_pipeline
from spark_etl_cli_spark.plans.registry import query


# --- q60: parquet source → sql:// transform ------------------------------
@query(
    "q60_pipeline_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def q60_pipeline_sql(spark, sf_dir):
    run_pipeline(
        spark,
        sources=[f"p60_orders+parquet://{sf_dir}/orders.parquet"],
        transforms=[
            "p60_orders+p60_out+sql://"
            "SELECT o_orderstatus, o_orderpriority, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM p60_orders GROUP BY 1, 2"
        ],
    )
    return spark.table("p60_out")


# --- q61: sql:// building nested structs+arrays → flatten-explode:// -----
@query(
    "q61_pipeline_flatten_explode",
    oracle="""
    SELECT event_id,
           event_type AS info_et,
           user_id AS info_ids_uid,
           unnest([CAST(user_id AS BIGINT), CAST(event_id AS BIGINT)])
             AS related
    FROM events WHERE event_id < 1000
    """,
)
def q61_pipeline_flatten_explode(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    run_pipeline(
        spark,
        sources=[f"p61_events+parquet://{sf_dir}/events.parquet"],
        transforms=[
            "p61_events+p61_nested+sql://"
            "SELECT event_id, "
            "named_struct('et', event_type, "
            "             'ids', named_struct('uid', user_id)) AS info, "
            "array(CAST(user_id AS BIGINT), CAST(event_id AS BIGINT)) AS related "
            "FROM p61_events WHERE event_id < 1000",
            "p61_nested+p61_flat+flatten-explode://",
        ],
    )
    return spark.table("p61_flat").select(
        "event_id", "info_et", "info_ids_uid", "related"
    )


# --- q62: self-checking diff:// pipeline (reference test-1 shape) ---------
# left = orders; right = orders with every 97th row dropped and every
# 100th price bumped; diff+filter leaves exactly the D and C rows.
@query(
    "q62_pipeline_diff",
    oracle="""
    SELECT 'D' AS diff, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 97 = 0
    UNION ALL
    SELECT 'C' AS diff, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 100 = 0 AND o_orderkey % 97 <> 0
    """,
)
def q62_pipeline_diff(spark, sf_dir):
    run_pipeline(
        spark,
        sources=[f"p62_orders+parquet://{sf_dir}/orders.parquet"],
        transforms=[
            # perturbed right side
            "p62_orders+p62_right+sql://"
            "SELECT o_orderkey, o_custkey, "
            "CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1 "
            "ELSE o_totalprice END AS o_totalprice "
            "FROM p62_orders WHERE o_orderkey % 97 <> 0",
            # narrow the left to the same columns
            "p62_orders+p62_left+sql://"
            "SELECT o_orderkey, o_custkey, o_totalprice FROM p62_orders",
            "p62_left+p62_diff+diff://p62_right"
            "?id=o_orderkey&handleDifferences=filter",
        ],
    )
    return (
        spark.table("p62_diff")
        .groupBy("diff")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# --- q108: end-to-end corpus pipeline through the URI engine --------------
# The full training-data preparation chain as ONE pipeline — noisy-dup
# injection (sql://) → Gopher-style quality gates (quality-filter://) →
# exact dedup, min-id survivor (dedup://?mode=exact) → greedy sequence
# packing (sql:// cumsum) — with a single DuckDB oracle verifying the
# composition end to end. Every stage is deterministic, so the whole
# chain is ANSI-expressible even though it runs through four transform
# URIs and three operators.
_Q108_SEQ = 2048


def _q108_oracle() -> str:
    from spark_etl_cli_spark.plans.textops import (
        SQL_DOCS_WITH_DUPS,
        SQL_FP,
        SQL_NTOK,
        SQL_PUNCT,
        SQL_SW,
    )

    return f"""
    WITH docs AS ({SQL_DOCS_WITH_DUPS}),
    q AS (
      SELECT doc_id, text, source FROM docs
      WHERE {SQL_NTOK} BETWEEN 5 AND 1000
        AND {SQL_PUNCT} <= 0.3 AND {SQL_SW} >= 0.01
    ),
    d AS (
      SELECT doc_id, text, source FROM q
      QUALIFY ROW_NUMBER() OVER (PARTITION BY {SQL_FP}
                                 ORDER BY doc_id) = 1
    ),
    c AS (
      SELECT source, doc_id, {SQL_NTOK} AS ntok,
             SUM({SQL_NTOK}) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT source, CAST((cum - ntok) // {_Q108_SEQ} AS BIGINT) AS seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS seq_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM c GROUP BY 1, 2
    """


@query("q108_corpus_pipeline", oracle=_q108_oracle())
def q108_corpus_pipeline(spark, sf_dir):
    ntok_sql = (
        "CASE WHEN length(trim(regexp_replace(text, '\\\\s+', ' '))) = 0 "
        "THEN 0 ELSE size(split(trim(regexp_replace(text, '\\\\s+', ' ')), "
        "' ')) END"
    )
    run_pipeline(
        spark,
        sources=[f"p108_docs+parquet://{sf_dir}/documents.parquet"],
        transforms=[
            # noisy-dup injection (the Spark twin of SQL_DOCS_WITH_DUPS)
            "p108_docs+p108_dups+sql://"
            "SELECT doc_id, text, source FROM p108_docs "
            "UNION ALL "
            "SELECT doc_id + 100000 AS doc_id, "
            "regexp_replace(text, ' ', concat(char(9), ' ')) AS text, "
            "'dupsrc' AS source FROM p108_docs WHERE doc_id < 100",
            "p108_dups+p108_clean+quality-filter://"
            "?min-tokens=5&max-tokens=1000&max-punct=0.3&min-stopword=0.01",
            "p108_clean+p108_uniq+dedup://?mode=exact",
            "p108_uniq+p108_packed+sql://"
            f"SELECT source, CAST((cum - ntok) DIV {_Q108_SEQ} AS BIGINT) "
            "AS seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(ntok) AS BIGINT) AS seq_tokens, "
            "CAST(MIN(doc_id) AS BIGINT) AS first_doc FROM ("
            f"  SELECT source, doc_id, {ntok_sql} AS ntok, "
            f"  SUM({ntok_sql}) OVER (PARTITION BY source ORDER BY doc_id "
            "   ROWS UNBOUNDED PRECEDING) AS cum FROM p108_uniq"
            ") GROUP BY 1, 2",
        ],
    )
    return spark.table("p108_packed")
