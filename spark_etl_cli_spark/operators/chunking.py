"""Context-window chunking and sequence packing for training pipelines.

Both pure built-in compositions (codegen'd, no UDFs):

- :func:`chunk_documents` — overlapping word-window chunks via per-row
  explode; zero hash shuffles (plan-gated in tests/test_plans.py).
- :func:`pack_sequences` — greedy packing of documents into <= seq_tokens
  training sequences by running token count, sequential only *within*
  a partition key (each source packs independently), so the op is one
  shuffle and scales with the number of sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_etl_cli_spark.functions.text import token_count, tokens
from spark_etl_cli_spark.operators.util import fan_out


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_idx, chunk_tokens, chunk_text): overlapping windows.

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens); the final
    window may be short. Chunk text is rebuilt with single spaces (the
    tokenizer's normalized form).
    """
    tk = fan_out(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tk")
    ).filter(F.size("__tk") > 0)
    n_chunks = F.greatest(
        F.ceil((F.size("__tk") - F.lit(chunk_tokens)) / F.lit(float(stride))),
        F.lit(0),
    ).cast("bigint")
    chunked = tk.select(
        id_col,
        "__tk",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks)).alias(
            "chunk_idx"
        ),
    )
    piece = F.slice(
        F.col("__tk"), (F.col("chunk_idx") * stride + 1).cast("int"), chunk_tokens
    )
    return chunked.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).cast("bigint").alias("chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    partition_col: str = "source",
    seq_tokens: int = 2048,
) -> DataFrame:
    """Assign each document a packed-sequence id within its partition key.

    seq = floor((cumsum(ntok) - ntok) / seq_tokens) over ``id_col``
    order — the deterministic, distributable form of greedy packing
    (documents longer than ``seq_tokens`` spill into following ids).
    Returns the input plus (ntok, seq_id).
    """
    n = df.withColumn("ntok", token_count(F.col(text_col)))
    w = (
        Window.partitionBy(partition_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("ntok").over(w)
    return n.withColumn(
        "seq_id",
        F.floor((cum - F.col("ntok")) / F.lit(seq_tokens)).cast("bigint"),
    )
