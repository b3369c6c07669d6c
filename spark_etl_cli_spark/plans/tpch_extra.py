"""Remaining TPC-H-shaped relational coverage (Q7/Q8/Q11/Q12/Q20
analogs, adapted to the reduced synthetic schema) plus unpivot and
exact-percentile shapes.

All of these reach the reference only through its ``sql://``
pass-through transform (reference
``core/src/main/scala/dev/mauch/spark/dfio/TransformerParser.scala:22-31``);
here each is a DataFrame-API plan with the join strategy explicit.

Scale notes inline; the common shape is: filters push to the parquet
scans, every dimension broadcasts, and the single big shuffle is the
final aggregation on the fact table.
"""

from __future__ import annotations

from pyspark.sql import Window as W
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

# --- q65: bilateral nation-pair trade volume (TPC-H Q7 shape) -----------
# Revenue shipped between two nations, both directions, by ship year.
# supplier/customer/nation all broadcast; orders is joined only to
# reach the customer; the one shuffle is the 4-group final agg. The
# nation filter is applied on the *broadcast* sides, so at 100 TB the
# fact scan is pruned by the join itself (dynamic partition pruning
# when the fact table is partitioned by either key).
@query(
    "q65_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {SQL_XSUM("volume", "revenue")}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INT) AS l_year,
             {SQL_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    ) shipping
    GROUP BY 1, 2, 3
    """,
)
def q65_volume_shipping(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nations = ("NATION_3", "NATION_7")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(xsum(rev_col(), "revenue"))
    )


# --- q66: market share of one nation in a region (TPC-H Q8 shape) -------
# share = revenue from NATION_5 suppliers / all revenue into EUROPE
# customers, by order year. Both sums are exact decimals aggregated in
# one pass (conditional agg), then one IEEE double division — so the
# ratio is bit-identical across engines. Single shuffle: group by year.
@query(
    "q66_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                              THEN volume ELSE CAST(0.0000 AS DECIMAL(18,4)) END)
                AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST({SQL_REV} AS DECIMAL(18,4)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE'
    ) nations
    GROUP BY o_year
    """,
)
def q66_market_share(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_cust = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.select("r_regionkey")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    volume = rev_col().alias("volume")
    zero = F.lit("0.0000").cast("decimal(18,4)")
    base = (
        li.join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(euro_cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.cast("decimal(18,4)").alias("volume"),
            "supp_nation",
        )
    )
    return base.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


# --- q67: parts holding an outsized share of revenue (TPC-H Q11 shape) --
# HAVING against a *global* scalar subquery, made scale-invariant: a
# part qualifies when its revenue exceeds 1.25x the mean per-part revenue
# (a fixed fraction of the grand total selects nothing once the part
# count grows). Decorrelated: the 1-row global aggregate is broadcast
# cross-joined into the per-part HAVING filter. Two logical passes over
# the fact table (per-part agg + global agg); the global numbers are
# re-derived FROM the per-part aggregate, so physically it is one scan
# + one tiny re-agg, at any scale.
@query(
    "q67_important_parts",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey, SUM(CAST({SQL_REV} AS DECIMAL(18,4))) AS dval
      FROM lineitem GROUP BY l_partkey
    ),
    total AS (
      SELECT CAST(SUM(dval) AS DOUBLE) AS grand,
             CAST(COUNT(*) AS DOUBLE) AS nparts
      FROM per_part
    )
    SELECT l_partkey AS p_key, CAST(dval AS DOUBLE) AS value
    FROM per_part, total
    WHERE CAST(dval AS DOUBLE) > grand / nparts * 1.25
    """,
)
def q67_important_parts(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    # All sums stay in exact decimal (order-independent across engines);
    # doubles appear only at the final projection/compare.
    per_part = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.sum(rev_col().cast("decimal(18,4)")).alias("dval")
    )
    total = per_part.agg(
        F.sum("dval").cast("double").alias("grand"),
        F.count(F.lit(1)).cast("double").alias("nparts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("dval").cast("double")
            > F.col("grand") / F.col("nparts") * F.lit(1.25)
        )
        .select("p_key", F.col("dval").cast("double").alias("value"))
    )


# --- q68: shipping-delay buckets by priority (TPC-H Q12 shape) ----------
# The synthetic schema has no ship mode or commit date, so the Q12
# two-way conditional count becomes: delay bucket (<=30 / 31-90 / >90
# days from order to ship) x high-vs-low priority counts. One
# broadcast join (orders' date+priority are needed per line item —
# orders is NOT broadcast-small, so this is a shuffle join on
# orderkey) + one small final agg.
@query(
    "q68_ship_delay_priority",
    oracle="""
    SELECT delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
                  WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
                  ELSE 'slow' END AS delay_bucket
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ) delays
    GROUP BY delay_bucket
    """,
)
def q68_ship_delay_priority(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(days <= 30, "fast").when(days <= 90, "normal").otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == F.col("o_orderkey"))
        .select(bucket.alias("delay_bucket"), high.alias("is_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~F.col("is_high"), 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


# --- q69: suppliers with excess shipped volume (TPC-H Q20 shape) --------
# Nested agg subquery -> semi join: suppliers who shipped more than
# 80 units of any 'red%' part in 1999. The inner agg groups the fact
# table by (partkey, suppkey); the outer is a semi join from supplier.
# Part filter broadcasts into the fact scan.
@query(
    "q69_excess_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
        AND l_shipdate >= TIMESTAMP '1999-01-01'
        AND l_shipdate <  TIMESTAMP '2000-01-01'
      GROUP BY l_partkey, l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 80
    )
    ORDER BY s_name
    """,
)
def q69_excess_suppliers(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    red_parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    heavy = (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec(F.col("l_quantity"), 18, 4)).alias("qty"))
        .filter(F.col("qty") > 80)
        .select("l_suppkey")
    )
    supplier = t(spark, sf_dir, "supplier")
    return (
        supplier.join(heavy, supplier.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --- q98: unpivot wide aggregates to (measure, value) rows --------------
# Spark `unpivot` (= SQL stack()) over a per-linestatus aggregate;
# DuckDB twin uses UNION ALL for engine-portability. Melting happens
# AFTER aggregation, so the unpivot input is tiny regardless of SF.
@query(
    "q98_unpivot_measures",
    oracle="""
    WITH agg AS (
      SELECT l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
             CAST(COUNT(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_linestatus
    )
    SELECT l_linestatus, 'sum_qty'  AS measure, sum_qty  AS value FROM agg
    UNION ALL
    SELECT l_linestatus, 'sum_price' AS measure, sum_price AS value FROM agg
    UNION ALL
    SELECT l_linestatus, 'n_items'  AS measure, n_items  AS value FROM agg
    """,
)
def q98_unpivot_measures(spark, sf_dir):
    from spark_etl_cli_spark.operators.util import fan_out
    from spark_etl_cli_spark.plans.registry import dsum

    agg = (
        # spread the decimal partial aggregation when the scan arrives
        # in fewer partitions than cores (single-row-group local file);
        # no-op on a wide scan — see q01
        fan_out(
            t(spark, sf_dir, "lineitem").select(
                "l_linestatus", "l_quantity", "l_extendedprice"
            )
        )
        .groupBy("l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_price"),
            F.count(F.lit(1)).cast("double").alias("n_items"),
        )
    )
    return agg.unpivot(
        ids="l_linestatus",
        values=["sum_qty", "sum_price", "n_items"],
        variableColumnName="measure",
        valueColumnName="value",
    )


# --- q99: exact per-group median ------------------------------------------
# Exact median via the interpolating percentile AGGREGATE (Spark
# percentile / DuckDB quantile_cont on double inputs — identical
# lo + (hi - lo) * frac arithmetic, and l_quantity is integral 1..50 so
# the interpolated value is k or k.5, exactly representable). r6
# verdict #6: the previous rank-window form sorted every group through
# ONE task; the aggregate form gets map-side partial aggregation —
# partial buffers merge across executors, so a dominant group no longer
# serializes. approx_percentile remains the cheap alternative
# (q75_sketch_aggregates covers it).
@query(
    "q99_exact_median",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS median_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q99_exact_median(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_quantity").cast("double"), F.lit(0.5)).alias(
            "median_qty"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --- q197: fulfillment lead-time percentile profile --------------------------
# Supply-chain SLA view: order->ship latency per order priority at
# exact p50/p90/p99 via Spark's interpolating `percentile` aggregate —
# the scale-safe shape the r7 round installed for the median family
# (map-side partial_percentile partials, zero windows, |priorities|
# output rows). Day differences are exact integers; the interpolated
# percentiles are identical rationals in both engines. The join
# shuffles both sides on the order key once (AQE may broadcast the
# smaller at low SF).
@query(
    "q197_leadtime_percentiles",
    oracle="""
    WITH d AS (
      SELECT o.o_orderpriority,
             CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                  AS BIGINT) AS lead_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_cont(CAST(lead_days AS DOUBLE), 0.5) AS p50,
           quantile_cont(CAST(lead_days AS DOUBLE), 0.9) AS p90,
           quantile_cont(CAST(lead_days AS DOUBLE), 0.99) AS p99,
           CAST(MAX(lead_days) AS BIGINT) AS worst
    FROM d GROUP BY 1
    """,
)
def q197_leadtime_percentiles(spark, sf_dir):
    from spark_etl_cli_spark.operators.util import fan_out

    # orders broadcasts; the lineitem side is projected to the 2 join/
    # measure columns and spread so the broadcast join + 3 percentile
    # partials don't serialize onto a single-partition scan (see q01)
    li = fan_out(
        t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    )
    o = t(spark, sf_dir, "orders")
    d = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority",
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("lead_days"),
    )
    ld = F.col("lead_days").cast("double")
    return d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.percentile(ld, F.lit(0.5)).alias("p50"),
        F.percentile(ld, F.lit(0.9)).alias("p90"),
        F.percentile(ld, F.lit(0.99)).alias("p99"),
        F.max("lead_days").cast("bigint").alias("worst"),
    )


# --- q198: revenue by discount band ------------------------------------------
# The pricing-analyst banding: integer cent-bands of l_discount (0-1%,
# 2-3%, ...), exact decimal revenue and forgone-discount sums per
# band. Banding is integer arithmetic on round(discount*100) — exact
# on both engines (discounts are 2-decimal doubles) — and the sums go
# through DECIMAL(18,4); ratios are single final double divisions.
@query(
    "q198_discount_bands",
    oracle=f"""
    WITH b AS (
      SELECT CAST(round(l_discount * 100) AS BIGINT) // 2 AS band,
             CAST(l_extendedprice AS DECIMAL(10,2)) AS px,
             CAST(l_discount AS DECIMAL(4,2)) AS disc
      FROM lineitem
    )
    SELECT band * 2 AS band_lo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(px * (1 - disc)) AS DOUBLE) AS revenue,
           CAST(SUM(px * disc) AS DOUBLE) AS discount_given,
           CAST(SUM(px * disc) AS DOUBLE) / CAST(SUM(px) AS DOUBLE)
             AS effective_discount
    FROM b GROUP BY 1
    """,
)
def q198_discount_bands(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    px = dec(F.col("l_extendedprice"))
    disc = dec(F.col("l_discount"), 4, 2)
    band = F.expr("CAST(round(l_discount * 100) AS BIGINT) div 2")
    b = li.select(band.alias("band"), px.alias("px"), disc.alias("disc"))
    return b.groupBy(
        (F.col("band") * 2).cast("bigint").alias("band_lo_pct")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(F.col("px") * (1 - F.col("disc"))).cast("double").alias(
            "revenue"
        ),
        F.sum(F.col("px") * F.col("disc")).cast("double").alias(
            "discount_given"
        ),
        (
            F.sum(F.col("px") * F.col("disc")).cast("double")
            / F.sum("px").cast("double")
        ).alias("effective_discount"),
    )


# --- q199: order-size histogram (double aggregation) -------------------------
# "How many orders have k line items?" — the classic double
# aggregation (TPC-H Q13's shape, here without the join): lineitem
# collapses to per-order counts, then the counts histogram. Two
# map-side-combinable shuffles, |distinct k| output rows, all BIGINT.
@query(
    "q199_order_size_histogram",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1
    )
    SELECT n_lines,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM per_order GROUP BY 1
    """,
)
def q199_order_size_histogram(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    return per_order.groupBy("n_lines").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
