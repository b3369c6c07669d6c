"""Table-maintenance query shapes: date-spine gap fill + forward fill,
changelog MERGE (upsert/delete), and a declarative data-quality audit.

These exercise operators/maintenance.py end-to-end against DuckDB:

- **q100** densifies a per-customer daily order series (sequence+explode
  spine, one row per key/day) and forward-fills with
  ``last(..., ignorenulls)``; DuckDB verifies with ``generate_series`` +
  ``LAST_VALUE(... IGNORE NULLS)``.
- **q101** treats events as a changelog over a snapshot: latest state per
  user before a cutoff is the base, later events are upserts with
  ``error`` events as tombstones. One union+window shuffle (no
  base-vs-changes join); DuckDB verifies with QUALIFY + FULL JOIN.
- **q102** runs the expectations audit (not-null / accepted values /
  positive / uniqueness / two foreign keys) over orders+lineitem in one
  conditional-aggregate pass per table plus anti-join FK probes.

Determinism: day totals go through exact decimal sums; merge winners are
picked by (ts, event_id) so ties are impossible; balances are copied, not
recomputed. The changelog cutoff is the same 2024-01-21T00:00:00Z
timestamp literal on both engines (events.ts normalized via
``registry.events``; Spark session TZ is UTC).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_etl_cli_spark.plans.registry import SQL_DSUM, dsum, events, query, t

_CUTOFF_SQL = "TIMESTAMP '2024-01-21 00:00:00'"


def _cutoff_ts():
    # built lazily: Column construction needs an active SparkContext, and
    # this module must stay importable before the session exists
    return F.to_timestamp(F.lit("2024-01-21 00:00:00"))


@query(
    "q100_gap_fill_ffill",
    oracle=f"""
    WITH daily AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS day,
             {SQL_DSUM("o_totalprice", "day_total")}
      FROM orders WHERE o_custkey % 100 = 0
      GROUP BY 1, 2),
    span AS (
      SELECT o_custkey, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
    spine AS (
      SELECT o_custkey,
             CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                                         CAST(d1 AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM span)
    SELECT s.o_custkey, s.day, d.day_total,
           LAST_VALUE(d.day_total IGNORE NULLS) OVER (
             PARTITION BY s.o_custkey ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS day_total_filled
    FROM spine s LEFT JOIN daily d
      ON s.o_custkey = d.o_custkey AND s.day = d.day
    """,
)
def q100_gap_fill_ffill(spark, sf_dir):
    from spark_etl_cli_spark.operators.maintenance import gap_fill

    daily = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 100 == 0)
        .groupBy("o_custkey", F.to_date("o_orderdate").alias("day"))
        .agg(dsum(F.col("o_totalprice"), "day_total"))
    )
    return gap_fill(daily, ["o_custkey"], "day", ["day_total"])


@query(
    "q101_changelog_merge",
    oracle=f"""
    WITH base AS (
      SELECT user_id, value AS balance, event_id AS last_event_id
      FROM events WHERE ts < {_CUTOFF_SQL}
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1),
    latest_change AS (
      SELECT user_id, value AS balance, event_id AS last_event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM events WHERE ts >= {_CUTOFF_SQL}
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1)
    SELECT COALESCE(c.user_id, b.user_id) AS user_id,
           CASE WHEN c.user_id IS NULL THEN b.balance ELSE c.balance END
             AS balance,
           CASE WHEN c.user_id IS NULL THEN b.last_event_id
                ELSE c.last_event_id END AS last_event_id,
           CASE WHEN c.user_id IS NULL THEN 'base' ELSE 'change' END AS src
    FROM base b FULL JOIN latest_change c ON b.user_id = c.user_id
    WHERE COALESCE(c.op, 'U') <> 'D'
    """,
)
def q101_changelog_merge(spark, sf_dir):
    from spark_etl_cli_spark.operators.maintenance import merge_changelog

    e = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    cutoff = _cutoff_ts()
    base = (
        e.filter(F.col("ts") < cutoff)
        .withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
        .select(
            "user_id",
            F.col("value").alias("balance"),
            F.col("event_id").alias("last_event_id"),
        )
    )
    changes = e.filter(F.col("ts") >= cutoff).select(
        "user_id",
        F.col("value").alias("balance"),
        F.col("event_id").alias("last_event_id"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    return merge_changelog(
        base, changes, ["user_id"], seq_cols=["ts", "event_id"], op_col="op"
    )


@query(
    "q102_data_quality_audit",
    oracle="""
    SELECT 'not_null:o_custkey' AS "check",
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS violations
    FROM orders
    UNION ALL
    SELECT 'accepted:o_orderstatus',
           CAST(SUM(CASE WHEN o_orderstatus IS NULL
                          OR o_orderstatus NOT IN ('O', 'F', 'P')
                     THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'positive:o_totalprice',
           CAST(SUM(CASE WHEN o_totalprice IS NULL OR NOT (o_totalprice > 0)
                     THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'unique:o_orderkey', CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
          HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'fk:o_custkey->c_custkey', CAST(COUNT(*) AS BIGINT)
    FROM orders
    WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'positive:l_quantity',
           CAST(SUM(CASE WHEN l_quantity IS NULL OR NOT (l_quantity > 0)
                     THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'fk:l_orderkey->o_orderkey', CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    WHERE l_orderkey IS NOT NULL
      AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    """,
)
def q102_data_quality_audit(spark, sf_dir):
    from spark_etl_cli_spark.operators.maintenance import expectations

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    c = t(spark, sf_dir, "customer")
    order_audit = expectations(
        o,
        not_null=["o_custkey"],
        unique=[["o_orderkey"]],
        accepted={"o_orderstatus": ["O", "F", "P"]},
        positive=["o_totalprice"],
        foreign_keys=[("o_custkey", c, "c_custkey")],
    )
    li_audit = expectations(
        li,
        positive=["l_quantity"],
        foreign_keys=[("l_orderkey", o, "o_orderkey")],
    )
    return order_audit.unionByName(li_audit)


# --- q128: mergeable partial-aggregate states (incremental rollup) -------
# The incremental-pipeline primitive: yesterday's partials + today's
# partials merge into the exact full-history aggregate, because every
# state is algebraic (sum/count/min/max merge by sum/sum/min/max —
# averages only at finalize). Here the "increments" are the two
# o_orderkey parity slices of orders; the oracle is the direct
# one-shot aggregate, so a green row PROVES merge(partial(A),
# partial(B)) == aggregate(A union B) — the property that lets a 100 TB
# history roll forward daily without ever rescanning it.
#
# Both aggregation levels are codegen hash-aggs with map-side partial
# aggregation; money sums stay DECIMAL(18,4) end-to-end (exact,
# associative — the reason the merged double equals the one-shot
# double bit-for-bit) and only finalize to DOUBLE.
@query(
    "q128_state_merge_rollup",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*) AS avg_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY 1
    """,
)
def q128_state_merge_rollup(spark, sf_dir):
    from pyspark.sql import types as T

    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.pmod(F.col("o_orderkey"), F.lit(2)).alias("increment"),
        F.col("o_totalprice"),
    )
    partials = o.groupBy("increment", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_count"),
        F.sum(F.col("o_totalprice").cast(T.DecimalType(18, 4))).alias("s_sum"),
        F.min("o_totalprice").alias("s_min"),
        F.max("o_totalprice").alias("s_max"),
    )
    merged = partials.groupBy("o_orderpriority").agg(
        F.sum("s_count").cast("bigint").alias("n_orders"),
        F.sum("s_sum").alias("m_sum"),
        F.min("s_min").alias("m_min"),
        F.max("s_max").alias("m_max"),
    )
    return merged.select(
        "o_orderpriority",
        "n_orders",
        F.col("m_sum").cast("double").alias("total_price"),
        (F.col("m_sum").cast("double") / F.col("n_orders")).alias("avg_price"),
        F.col("m_min").cast("double").alias("min_price"),
        F.col("m_max").cast("double").alias("max_price"),
    )


# --- q178: incremental aggregate-view maintenance ---------------------------
# The materialized-view delta-algebra test: a per-customer COUNT/SUM
# view is maintained INCREMENTALLY from a synthesized CDC batch
# (signed contributions: insert (+1,+v), update (0, new−old), delete
# (−1,−old)) — while the ORACLE recomputes the view from the post-
# change base outright. Equality proves the maintenance algebra, the
# exact-integer sums make it bit-checkable, and the plan shape is the
# 100 TB point: the fact table is scanned once to seed the view (in
# production that state is stored), then the merge is |MV| ⊕ a
# BROADCAST |touched keys| delta — no re-aggregation of facts. The
# three change predicates are disjoint by construction (%97 updates,
# %89∖%97 deletes, %101 inserts under fresh keys).
_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@query(
    "q178_incremental_agg",
    oracle=f"""
    WITH eff AS (
      SELECT o_custkey, {_CENTS} AS cents FROM orders
      WHERE o_orderkey % 97 != 0 AND NOT
            (o_orderkey % 89 = 0 AND o_orderkey % 97 != 0)
      UNION ALL
      SELECT o_custkey, {_CENTS} + 10000 AS cents FROM orders
      WHERE o_orderkey % 97 = 0
      UNION ALL
      SELECT o_custkey, CAST(5000 AS BIGINT) AS cents FROM orders
      WHERE o_orderkey % 101 = 0
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM eff GROUP BY 1
    """,
)
def q178_incremental_agg(spark, sf_dir):
    from spark_etl_cli_spark.operators.maintenance import apply_agg_deltas

    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    key = F.col("o_orderkey")
    is_upd = key % 97 == 0
    is_del = (key % 89 == 0) & ~is_upd
    is_ins = key % 101 == 0

    mv = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(cents).cast("long").alias("total_cents"),
    )
    # signed CDC contributions, reduced per key BEFORE the merge
    upd = o.filter(is_upd).select(
        "o_custkey", F.lit(0).cast("long").alias("dn"),
        F.lit(10000).cast("long").alias("dc"),
    )
    dele = o.filter(is_del).select(
        "o_custkey", F.lit(-1).cast("long").alias("dn"),
        (-cents).alias("dc"),
    )
    ins = o.filter(is_ins).select(
        "o_custkey", F.lit(1).cast("long").alias("dn"),
        F.lit(5000).cast("long").alias("dc"),
    )
    deltas = (
        upd.unionByName(dele).unionByName(ins)
        .groupBy("o_custkey")
        .agg(
            F.sum("dn").cast("long").alias("n_orders"),
            F.sum("dc").cast("long").alias("total_cents"),
        )
    )
    out = apply_agg_deltas(
        mv, deltas, ["o_custkey"], "n_orders", ["total_cents"]
    )
    return out.select(
        "o_custkey",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("total_cents").cast("bigint").alias("total_cents"),
    )
