"""Subquery-heavy relational shapes (EXISTS / NOT EXISTS / scalar).

The reference passes these through ``sql://`` to Catalyst verbatim
(reference ``core/src/main/scala/dev/mauch/spark/dfio/TransformerParser.scala:22-31``);
here each shape is also expressed in the DataFrame API in its
*decorrelated* form — semi/anti joins and aggregate-then-join — which
is exactly what Catalyst's subquery decorrelation rewrites to, so the
plans are scale-equivalent to the SQL while staying explicit about
the join strategy.

- **q87** TPC-H Q21 shape: suppliers whose late line items blocked
  multi-supplier orders where *no other* supplier was late — one
  semi join + one anti join against the same fact table.
- **q88** TPC-H Q9 shape: revenue by nation and order year through a
  4-way dimension join with a pushed-down part filter.
- **q89** correlated scalar subquery: parts priced above their
  type's average, decorrelated to aggregate + broadcast join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_cli_spark.plans.registry import (
    SQL_REV,
    SQL_XSUM,
    bcount,
    dec,
    query,
    rev_col,
    t,
    xsum,
)

# --- q87: multi-supplier late-order blame (TPC-H Q21 shape) --------------
# "Late" = shipped >60 days after the order date (the synthetic schema
# has no receipt/commit dates). For each late line item of a finished
# order: the order must involve another supplier (EXISTS / semi join)
# and no other supplier may be late on it (NOT EXISTS / anti join).
@query(
    "q87_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q87_waiting_suppliers(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supplier = t(spark, sf_dir, "supplier")

    late_cutoff = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > late_cutoff)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    has_other = l1.join(
        l2,
        (F.col("ok2") == F.col("l_orderkey"))
        & (F.col("sk2") != F.col("l_suppkey")),
        "left_semi",
    )
    l3 = li.select(
        F.col("l_orderkey").alias("ok3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    )
    only_late = has_other.join(
        l3,
        (F.col("ok3") == F.col("l_orderkey"))
        & (F.col("sk3") != F.col("l_suppkey"))
        & (F.col("sd3") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        only_late.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(bcount("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


# --- q88: revenue by nation and order year (TPC-H Q9 shape) --------------
# Part filter pushes to the part scan; part/supplier/nation broadcast;
# the only big shuffle is the final (nation, year) aggregation.
@query(
    "q88_nation_year_revenue",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           {SQL_XSUM(SQL_REV, "revenue")}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q88_nation_year_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    orders = t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(xsum(rev_col(), "revenue"))
    )


# --- q89: parts above their type's average price (scalar subquery) -------
# Correlated form: p_retailprice > (SELECT avg ... WHERE same type).
# Decorrelated: per-type exact-decimal average, broadcast back. The
# average is decimal-sum / count so both engines compare against the
# bit-identical double.
@query(
    "q89_above_avg_parts",
    oracle="""
    WITH avgs AS (
      SELECT p_type,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(10,2))) AS DOUBLE)
               / COUNT(*) AS avg_price
      FROM part GROUP BY p_type
    )
    SELECT part.p_type AS p_type,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           MAX(p_retailprice) AS max_price
    FROM part JOIN avgs ON part.p_type = avgs.p_type
    WHERE p_retailprice > avg_price
    GROUP BY 1
    """,
)
def q89_above_avg_parts(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    avgs = part.groupBy(F.col("p_type").alias("t_type")).agg(
        (
            F.sum(dec(F.col("p_retailprice"))).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    return (
        part.join(F.broadcast(avgs), part.p_type == F.col("t_type"))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .groupBy("p_type")
        .agg(
            bcount("n_above"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


# --- q121: recursive CTE (Spark 4 WITH RECURSIVE) -------------------------
# Hierarchy walk as a linear recursion: every supplier climbs a
# synthetic org chart (manager = floor(key / 10)) to the root,
# accumulating depth and a path checksum. The IDENTICAL SQL text runs
# on both engines — Spark 4's recursive-CTE planner (UnionLoop) against
# DuckDB's — so this also pins parser/semantics parity for the
# recursion feature itself. Division goes through floor(x / 10.0): both
# engines' `/` differ on int operands (double vs double), but the
# explicit double form is identical.
_Q121_SQL = """
    WITH RECURSIVE chain AS (
      SELECT s_suppkey AS leaf, s_suppkey AS node, 0 AS depth FROM supplier
      UNION ALL
      SELECT leaf, CAST(floor(node / 10.0) AS BIGINT) AS node,
             depth + 1 AS depth
      FROM chain WHERE node > 0
    )
    SELECT leaf AS s_suppkey,
           CAST(MAX(depth) AS INT) AS hops_to_root,
           CAST(SUM(node) AS BIGINT) AS path_sum
    FROM chain GROUP BY leaf
"""


@query("q121_recursive_hierarchy", oracle=_Q121_SQL)
def q121_recursive_hierarchy(spark, sf_dir):
    t(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_Q121_SQL)


# --- q122: correlated LATERAL subquery with LIMIT -------------------------
# Top-2 orders per customer expressed as a lateral join rather than a
# window — the same SQL text parses and runs on both engines. Spark
# decorrelates this to a ranked join under the hood; the unique
# o_orderkey tie-break keeps the LIMIT deterministic.
_Q122_SQL = """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    WHERE c.c_custkey % 10 = 0
"""


@query("q122_lateral_topn", oracle=_Q122_SQL)
def q122_lateral_topn(spark, sf_dir):
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q122_SQL)
