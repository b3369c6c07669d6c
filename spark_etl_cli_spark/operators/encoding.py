"""Vocabulary encoding: text → token-id arrays, the last hop before
tensors in a training-data pipeline.

Shape: posexplode tokens (keeps ordinal), broadcast-join the vocabulary
(map-side, no shuffle — a vocab is small by construction), then ONE
groupBy-doc shuffle of (pos, id) int pairs reassembles order with
``array_sort(collect_list(struct(pos, id)))``. Unknown tokens encode as
``unk_id`` rather than dropping (sequence lengths must survive
encoding).

The alternative — a map-literal lookup inside ``transform`` — avoids
the shuffle but degrades to a per-token linear scan of the vocab
(Spark's GetMapValue on complex literals), hopeless at 50k+ entries;
the join is the scale path.

North-star extension (reference has no text operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_etl_cli_spark.functions.text import tokens


def vocab_encode(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
    token_id_col: str = "token_id",
    unk_id: int = -1,
) -> DataFrame:
    """(id, token_ids array<bigint>, n_tokens, n_unk) per document.

    Empty/blank documents produce an empty array (not a null), so
    downstream packing arithmetic needs no null guards.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode_outer(tokens(F.col(text_col))).alias("__pos", "__tok"),
    )
    v = vocab.select(
        F.col(token_col).alias("__tok"),
        F.col(token_id_col).cast("bigint").alias("__tid"),
    )
    enc = toks.join(F.broadcast(v), "__tok", "left").select(
        F.col(id_col),
        "__pos",
        F.when(F.col("__tok").isNull() | (F.col("__tok") == ""), None)
        .otherwise(F.coalesce("__tid", F.lit(unk_id).cast("bigint")))
        .alias("__tid"),
    )
    return (
        enc.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__pos", "__tid"))
            ).alias("__ps")
        )
        .select(
            F.col(id_col),
            F.filter(
                F.transform(F.col("__ps"), lambda s: s["__tid"]),
                lambda x: x.isNotNull(),
            ).alias("token_ids"),
        )
        .select(
            id_col,
            "token_ids",
            F.size("token_ids").cast("bigint").alias("n_tokens"),
            F.size(
                F.filter(F.col("token_ids"), lambda x: x == unk_id)
            ).cast("bigint").alias("n_unk"),
        )
    )
