"""Join-acceleration query shapes: bloom semi-join pruning and the
bin-packed pure range join (operators/joins.py), oracle-checked.

Both oracles are *exact* joins: bloom pruning has no false negatives
(so prune + join ≡ join), and binning is a lossless decomposition of
the BETWEEN predicate — the approximation/acceleration machinery must
therefore be invisible in the results, which is precisely what the
DuckDB compare verifies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.checksum import checksum_sql
from spark_etl_cli_spark.operators.profile import profile_sql
from spark_etl_cli_spark.plans.registry import (
    SQL_DSUM,
    bcount,
    dsum,
    query,
    t,
)

# --- q103: bloom-filter semi-join pruning --------------------------------
# The runtime-filter pattern made explicit: customers in one market
# segment are ~20% of the table; a 2 MiB-capped bloom filter over their
# keys prunes non-matching orders BEFORE the join shuffle. At 100 TB
# this is the difference between shuffling the whole fact table and
# shuffling ~segment share + fpp of it.
@query(
    "q103_bloom_prune_join",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {SQL_DSUM("o_totalprice", "sum_price")}
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY 1
    """,
)
def q103_bloom_prune_join(spark, sf_dir):
    from spark_etl_cli_spark.operators.joins import bloom_semi_prune

    dim = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    pruned = bloom_semi_prune(
        t(spark, sf_dir, "orders"),
        dim,
        fact_key="o_custkey",
        dim_key="c_custkey",
        fpp=0.01,
    )
    return (
        pruned.join(dim, pruned.o_custkey == dim.c_custkey)
        .groupBy("o_orderpriority")
        .agg(bcount("n_orders"), dsum(F.col("o_totalprice"), "sum_price"))
    )


# --- q104: pure range join via interval binning ---------------------------
# No equi key anywhere: lineitem ship dates against ~80 monthly promo
# windows ([month+4d, month+24d], from orders). Spark would plan the
# raw BETWEEN join as a nested loop; range_join_binned's 16-day bins
# turn it into a hash join (plan gate asserts no BNLJ/cartesian even
# with broadcast disabled).
@query(
    "q104_pure_range_join",
    oracle=f"""
    WITH iv AS (
      SELECT DISTINCT
             CAST(date_trunc('month', o_orderdate) + INTERVAL 4 DAY
                  AS DATE) AS lo_date,
             CAST(date_trunc('month', o_orderdate) + INTERVAL 24 DAY
                  AS DATE) AS hi_date
      FROM orders)
    SELECT lo_date AS period_start,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {SQL_DSUM("l_extendedprice", "sum_price")}
    FROM lineitem JOIN iv
      ON CAST(l_shipdate AS DATE) BETWEEN lo_date AND hi_date
    GROUP BY 1
    """,
)
def q104_pure_range_join(spark, sf_dir):
    from spark_etl_cli_spark.operators.joins import range_join_binned

    epoch = F.lit("1970-01-01").cast("date")
    iv = (
        t(spark, sf_dir, "orders")
        .select(
            F.trunc(F.col("o_orderdate").cast("date"), "month").alias("m")
        )
        .distinct()
        .select(
            F.date_add("m", 4).alias("lo_date"),
            F.datediff(F.date_add("m", 4), epoch).alias("lo_d"),
            F.datediff(F.date_add("m", 24), epoch).alias("hi_d"),
        )
    )
    li = t(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate").cast("date"), epoch).alias("ship_d"),
        "l_extendedprice",
    )
    joined = range_join_binned(
        li, iv, point_col="ship_d", lo_col="lo_d", hi_col="hi_d", bin_width=16
    )
    return joined.groupBy(F.col("lo_date").alias("period_start")).agg(
        bcount("n_items"), dsum(F.col("l_extendedprice"), "sum_price")
    )


# --- q105: distributed dense sequential ids --------------------------------
# The scalable replacement for row_number() over a global ORDER BY
# (which Spark plans into a single partition): range-partition + per-
# partition offsets (operators/ids.py). Oracle = the very window the
# operator refuses to run, exact because (o_orderdate, o_orderkey) is
# a total order.
@query(
    "q105_sequential_ids",
    oracle="""
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) - 1
                AS BIGINT) AS seq_id
    FROM orders
    """,
)
def q105_sequential_ids(spark, sf_dir):
    from spark_etl_cli_spark.operators.ids import assign_sequential_ids

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    with_ids = assign_sequential_ids(o, ["o_orderdate", "o_orderkey"])
    return with_ids.select("o_orderkey", "seq_id")


# --- q106: z-order interleave (multi-dimensional clustering key) ----------
# The clustering key behind OPTIMIZE ZORDER BY, bit-exact across
# engines: interleave (o_custkey % 1024, order-day % 1024) into one
# BIGINT. operators/zorder.py sorts by this to cluster row groups in
# both dimensions; the oracle recomputes the interleave in DuckDB
# integer arithmetic.
def _z_sql(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) >> {i}) & 1) << {2 * i}")
        terms.append(f"((({y}) >> {i}) & 1) << {2 * i + 1}")
    return " + ".join(f"({t})" for t in terms)


_Q106_X = "o_custkey % 1024"
_Q106_Y = "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) % 1024"


@query(
    "q106_zorder_key",
    oracle=f"""
    SELECT o_orderkey,
           CAST({_z_sql(_Q106_X, _Q106_Y, 10)} AS BIGINT) AS zv
    FROM orders
    """,
)
def q106_zorder_key(spark, sf_dir):
    from spark_etl_cli_spark.operators.zorder import z_value

    o = t(spark, sf_dir, "orders")
    x = F.pmod(F.col("o_custkey"), F.lit(1024))
    y = F.pmod(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ),
        F.lit(1024),
    )
    return o.select("o_orderkey", z_value([x, y], 10).alias("zv"))


# --- q107: order-insensitive reconciliation checksum ----------------------
# Cross-system table compare without moving data: 60-bit md5 row hashes
# summed exactly (decimal/HUGEINT) and folded by 2^61-1 — associative
# and commutative, so partitioning and engine cannot change it. The
# oracle recomputes the identical arithmetic in DuckDB.
@query(
    "q107_table_checksum",
    oracle=checksum_sql(
        ["o_orderkey", "o_orderstatus", "o_custkey", "o_day"],
        "(SELECT *, CAST(o_orderdate AS DATE) AS o_day FROM orders)",
        group_by=["o_orderpriority"],
    ),
)
def q107_table_checksum(spark, sf_dir):
    from spark_etl_cli_spark.operators.checksum import table_checksum

    o = t(spark, sf_dir, "orders").withColumn(
        "o_day", F.col("o_orderdate").cast("date")
    )
    return table_checksum(
        o,
        ["o_orderkey", "o_orderstatus", "o_custkey", "o_day"],
        group_by=["o_orderpriority"],
    )


# --- q109: one-pass column profiling --------------------------------------
# Discovery twin of the q102 expectations audit: null rates and exact
# cardinalities for six orders columns in a single aggregation pass
# (one Expand + two-stage agg — not six jobs). Long-form output keeps
# the schema independent of the profiled table.
@query(
    "q109_column_profile",
    oracle=profile_sql(
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
        "orders",
    ),
)
def q109_column_profile(spark, sf_dir):
    from spark_etl_cli_spark.operators.profile import profile_columns
    from spark_etl_cli_spark.operators.util import fan_out

    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority"]
    # the profile is one Expand x(cols+1) + distinct aggregate: spread
    # it when the scan arrives single-partition (see q01)
    return profile_columns(
        fan_out(t(spark, sf_dir, "orders").select(*cols)), cols
    )


# --- q110: vocabulary encoding (text -> token-id arrays) ------------------
# The last hop before tensors: build a deterministic top-500 vocab
# (count desc, token tie-break), broadcast-join it against position-
# exploded tokens, reassemble per-document id arrays in order. The
# oracle rebuilds the identical vocab and arrays in DuckDB (list(...
# ORDER BY ordinal)), so the encoding — ids, order, unk handling — is
# verified element-for-element.
_Q110_V = 500


def _q110_oracle() -> str:
    from spark_etl_cli_spark.plans.textops import SQL_TOKENS

    return f"""
    WITH tk AS (SELECT doc_id, {SQL_TOKENS} AS tk FROM documents),
    tok AS (
      SELECT doc_id, tk[i] AS token, i
      FROM tk, unnest(generate_series(1, greatest(len(tk), 1))) AS s(i)
      WHERE len(tk) >= i AND tk[i] <> ''
    ),
    cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
    top AS (SELECT token, c FROM cnt ORDER BY c DESC, token LIMIT {_Q110_V}),
    vocab AS (
      SELECT token,
             ROW_NUMBER() OVER (ORDER BY c DESC, token) - 1 AS tid
      FROM top
    ),
    enc AS (
      SELECT t.doc_id, t.i,
             CAST(COALESCE(v.tid, -1) AS BIGINT) AS tid
      FROM tok t LEFT JOIN vocab v USING (token)
    ),
    agg AS (
      SELECT doc_id, list(tid ORDER BY i) AS token_ids
      FROM enc GROUP BY doc_id
    )
    SELECT d.doc_id,
           array_to_string(list_transform(
             COALESCE(a.token_ids, CAST([] AS BIGINT[])),
             x -> CAST(x AS VARCHAR)), ',') AS token_ids,
           CAST(COALESCE(len(a.token_ids), 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(list_filter(a.token_ids, x -> x = -1)), 0)
                AS BIGINT) AS n_unk
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """


@query("q110_vocab_encode", oracle=_q110_oracle())
def q110_vocab_encode(spark, sf_dir):
    from pyspark.sql import Window

    from spark_etl_cli_spark.functions.text import tokens
    from spark_etl_cli_spark.operators.encoding import vocab_encode

    d = t(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("token")).filter(
        "token <> ''"
    )
    cnt = tok.groupBy("token").agg(F.count("*").alias("c"))
    # global window over the LIMITed 500-row frame only — a dim build,
    # not a data-path sort
    w = Window.orderBy(F.desc("c"), "token")
    vocab = (
        cnt.orderBy(F.desc("c"), "token")
        .limit(_Q110_V)
        .withColumn("token_id", F.row_number().over(w) - 1)
    )
    # The operator returns real array<long> token_ids; the oracle-facing
    # column is stringified because the driver's canonicalizer cannot
    # hash list cells (round-1 red row).
    return vocab_encode(d, vocab).withColumn(
        "token_ids",
        F.array_join(
            F.transform("token_ids", lambda x: x.cast("string")), ","
        ),
    )
