"""Scalar-function family + Python-UDF-surface coverage.

Rounds out the SURVEY.md §2d matrix: array functions, map functions,
regexp, math, and the PySpark UDF surface (Arrow-vectorized pandas_udf
and a Python UDTF via LATERAL). The engine's design rule stands — no
Python in measured hot paths — q73/q74 exist to prove the *surface*
works and is oracle-checkable, not as the recommended formulation
(q73's oracle-identical q30 does the same work fully codegen'd).

Float discipline for math functions: only IEEE-exact ops appear in
outputs (sqrt, abs, floor, integer pow) — transcendentals (ln/exp) are
libm-dependent and may differ by 1 ulp between JVM and DuckDB.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F

from spark_etl_cli_spark.plans.registry import bcount, events, query, t
from spark_etl_cli_spark.plans.registry import dec as dec2
from spark_etl_cli_spark.plans.textops import SQL_NTOK, SQL_TOKENS


# --- q70: array function family -----------------------------------------
# The array machinery (collect_set/array_sort/size/array_contains) runs
# for real; the oracle-facing `statuses` column is array_join'd to a
# scalar because the driver's canonicalizer (pandas sort_values) cannot
# hash list cells (round-1 red row).
@query(
    "q70_array_functions",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',')
             AS statuses,
           CAST(len(list_distinct(list(o_orderstatus))) AS INT) AS n_statuses,
           list_contains(list(o_orderstatus), 'F') AS has_finished
    FROM orders
    GROUP BY o_custkey
    """,
)
def q70_array_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    statuses = F.array_sort(F.collect_set("o_orderstatus"))
    return o.groupBy("o_custkey").agg(
        F.array_join(statuses, ",").alias("statuses"),
        F.size(statuses).cast("int").alias("n_statuses"),
        F.array_contains(F.collect_list("o_orderstatus"), "F").alias("has_finished"),
    )


# --- q71: map + JSON function family ------------------------------------
# map_keys order is parse-order in Spark but unspecified across
# engines, so the oracle-facing key list is sorted and joined to a
# scalar (same canonicalizer constraint as q70).
@query(
    "q71_map_functions",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(props->>'$.k' AS BIGINT) AS k_val,
           CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod
    FROM events WHERE event_id < 2000
    """,
)
def q71_map_functions(spark, sf_dir):
    e = t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.element_at(m, "k").alias("k_val"),
        (F.element_at(m, "k") % 10).alias("k_mod"),
    )


# --- q72: regexp + exact-math family ------------------------------------
@query(
    "q72_regexp_math",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num,
           sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
           abs(p_size - 25) AS size_dist,
           CAST(floor(p_retailprice / 100) AS BIGINT) AS price_bucket,
           CAST(p_partkey % 7 AS BIGINT) AS key_mod
    FROM part
    """,
)
def q72_regexp_math(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("price_bucket"),
        F.pmod("p_partkey", F.lit(7)).cast("bigint").alias("key_mod"),
    )


# --- q73: Arrow-vectorized pandas_udf (surface parity) -------------------
@query(
    "q73_pandas_udf_tokens",
    oracle=f"""
    SELECT source,
           CAST(SUM({SQL_NTOK}) AS BIGINT) AS total_tokens
    FROM documents GROUP BY source
    """,
)
def q73_pandas_udf_tokens(spark, sf_dir):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def py_token_count(texts: pd.Series) -> pd.Series:
        def n(s):
            s2 = re.sub(r"\s+", " ", s or "").strip()
            return 0 if s2 == "" else len(s2.split(" "))

        return texts.map(n)

    d = t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(py_token_count(F.col("text"))).cast("bigint").alias("total_tokens")
    )


# --- q74: Python UDTF via LATERAL (surface parity) -----------------------
@query(
    "q74_udtf_token_explode",
    oracle=f"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest({SQL_TOKENS}) AS token
          FROM documents WHERE doc_id < 50)
    GROUP BY token
    """,
)
def q74_udtf_token_explode(spark, sf_dir):
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string")
    class TokenEmit:
        def eval(self, text: str):
            s = re.sub(r"\s+", " ", text or "").strip().lower()
            if s:
                for tok in s.split(" "):
                    yield (tok,)

    spark.udtf.register("q74_token_emit", TokenEmit)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "q74_docs"
    )
    return spark.sql(
        """
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM q74_docs, LATERAL q74_token_emit(text)
        GROUP BY token
        """
    )


# --- q75: sketch aggregates, self-validating ------------------------------
# approx_count_distinct (HLL++) and percentile_approx values are
# implementation-specific, so the oracle can't compare them directly.
# Instead the query emits exact values plus BOOLEAN bounds checks the
# sketches must satisfy (HLL++ rsd default 0.05 -> a 15% band is ~3 sigma;
# the approximate percentile must fall inside the true p40..p60 range).
# The oracle states the exact values and TRUE for every bound.
@query(
    "q75_sketch_aggregates",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           TRUE AS approx_within_15pct,
           TRUE AS p50_within_band
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q75_sketch_aggregates(spark, sf_dir):
    # The exact distinct count runs as its OWN two-stage aggregation
    # and joins back (5 rows a side). Mixing countDistinct with the
    # sketch aggregates in one agg makes Spark's one-distinct plan
    # carry every sketch buffer (KB-sized HLL++/percentile digests)
    # per DISTINCT KEY through the expand shuffle — measured 16.8 s
    # for the combined plan vs 0.4 s for the sketches alone at sf0.1.
    # Exact percentiles share one buffer via the array form.
    o = t(spark, sf_dir, "orders")
    exact = (
        o.select("o_orderpriority", "o_custkey")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
    )
    sk = o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("__approx"),
        F.percentile_approx("o_totalprice", 0.5).alias("__pa"),
        F.expr(
            "percentile(o_totalprice, array(0.40, 0.60))"
        ).alias("__p"),
    )
    return exact.join(sk, "o_orderpriority").select(
        "o_orderpriority",
        "n_exact",
        (
            F.abs(F.col("__approx") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(0.15)
        ).alias("approx_within_15pct"),
        (
            (F.col("__pa") >= F.col("__p")[0])
            & (F.col("__pa") <= F.col("__p")[1])
        ).alias("p50_within_band"),
    )


# --- q90: arg-extremum aggregates (max_by / min_by) -----------------------
# "Which row holds the group's extreme value" without a window pass —
# single map-side-combined aggregation. Tie-breaks are made explicit
# with a fixed-width composite ordering key (value then key), since
# both engines' arg-extremum is otherwise nondeterministic on ties.
_SQL_ORD = (
    "lpad(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    " AS VARCHAR), 14, '0') || '-' ||"
    " lpad(CAST(o_orderkey AS VARCHAR), 12, '0')"
)


@query(
    "q90_arg_extremes",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(arg_max(o_orderkey, {_SQL_ORD}) AS BIGINT) AS top_order,
           CAST(arg_min(o_orderkey, {_SQL_ORD}) AS BIGINT) AS bottom_order,
           MAX(o_totalprice) AS top_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q90_arg_extremes(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    ord_key = F.concat_ws(
        "-",
        F.lpad(
            (dec2(F.col("o_totalprice")) * 100).cast("bigint").cast("string"),
            14,
            "0",
        ),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
    )
    return (
        o.withColumn("__ord", ord_key)
        .groupBy("o_orderpriority")
        .agg(
            F.max_by("o_orderkey", F.col("__ord")).cast("bigint")
            .alias("top_order"),
            F.min_by("o_orderkey", F.col("__ord")).cast("bigint")
            .alias("bottom_order"),
            F.max("o_totalprice").alias("top_price"),
        )
    )


# --- q57: latest-record compaction (upsert/CDC read shape) ----------------
# One surviving row per (user_id, event_type): the event with the
# greatest (ts, event_id). The same single-agg arg-max plan compacts a
# changelog into current state at 100 TB — no window, no second pass.
_SQL_EV_ORD = (
    "lpad(CAST(epoch_ns(ts) AS VARCHAR), 20, '0') || '-' ||"
    " lpad(CAST(event_id AS VARCHAR), 12, '0')"
)


@query(
    "q57_latest_per_key",
    oracle=f"""
    SELECT user_id, event_type,
           CAST(arg_max(event_id, {_SQL_EV_ORD}) AS BIGINT) AS last_event_id,
           arg_max(value, {_SQL_EV_ORD}) AS last_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q57_latest_per_key(spark, sf_dir):
    # ordering key = zero-padded epoch-nanos, matching the oracle's
    # epoch_ns(ts) (µs-precision data, so *1000 is exact)
    ev = events(spark, sf_dir)
    ord_key = F.concat_ws(
        "-",
        F.lpad((F.unix_micros("ts") * 1000).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.withColumn("__ord", ord_key)
        .groupBy("user_id", "event_type")
        .agg(
            F.max_by("event_id", F.col("__ord")).cast("bigint")
            .alias("last_event_id"),
            F.max_by("value", F.col("__ord")).alias("last_value"),
        )
    )


# --- q91: fuzzy entity-name matching (edit distance) ----------------------
# Entity-resolution shape: near-identical names across a catalog.
# Aggregate to DISTINCT names first (64 here — the cardinality that
# matters at 100 TB is distinct entities, not rows), then an all-pairs
# compare pruned by the |length difference| <= d implication of
# levenshtein <= d. The distinct set broadcasts; the NL join is over
# entities, never over the fact table.
@query(
    "q91_fuzzy_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def q91_fuzzy_name_pairs(spark, sf_dir):
    names = t(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    # The levenshtein bound lives IN the join condition, explicitly
    # after the cheap predicates: a post-join .filter would be pushed
    # into the condition anyway — but ANDed in *front*, so the ~ns
    # ordering/length prunes would never short-circuit the ~µs edit
    # distance. Conjunct order is preserved as written here.
    return (
        a.join(
            F.broadcast(b),
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 2)
            & (F.levenshtein("name_a", "name_b") <= 2),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("int"))
    )


# --- q92: SCD2 history build from a changelog -----------------------------
# The slowly-changing-dimension type-2 shape every warehouse ETL needs:
# collapse consecutive equal states per key, emit validity intervals
# [valid_from, valid_to) with NULL valid_to for the current state.
# Change detection = lag over (ts, event_id); interval close = lead over
# the change rows only. Two window passes over ONE shuffle (same
# partitioning key, Spark reuses the exchange).
@query(
    "q92_scd2_intervals",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_id, event_type, ts FROM c
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id,
           CAST(event_id AS BIGINT) AS change_id,
           event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS valid_from,
           CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id)))
                AS BIGINT) AS valid_to
    FROM changes
    """,
)
def q92_scd2_intervals(spark, sf_dir):
    from pyspark.sql import Window

    ev = events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    return changes.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("change_id"),
        "event_type",
        F.unix_timestamp("ts").cast("bigint").alias("valid_from"),
        F.unix_timestamp(F.lead("ts").over(w)).cast("bigint").alias("valid_to"),
    )


# --- q93: VARIANT semi-structured extraction (Spark 4) --------------------
# The open-format JSON path: parse_json -> VARIANT column ->
# variant_get typed extraction. Unlike get_json_object (per-access
# string re-parse, q24), the variant value parses once into a binary
# shredded form and every extraction is a typed field read — the right
# plan when several fields are pulled from the same payload.
@query(
    "q93_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(CASE WHEN CAST(props->>'$.k' AS BIGINT) >= 50
                           THEN 1 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def q93_variant_extract(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    v = e.withColumn("pv", F.parse_json("props"))
    k = F.variant_get("pv", "$.k", "bigint")
    return v.groupBy("event_type").agg(
        bcount("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.count(F.when(k >= 50, F.lit(1))).cast("bigint").alias("n_high"),
    )


# --- q94: mergeable HLL sketches (partial build + union rollup) -----------
# The cluster-scale distinct-count pattern: build per-group HLL sketch
# BUFFERS (hll_sketch_agg), then roll them up by merging buffers
# (hll_union_agg) — never re-scanning rows. This is what feeds
# incremental/cube distinct counts at 100 TB: partials are small,
# mergeable, and shippable. Sketch bytes are implementation-specific,
# so (as q75) the oracle states exact values and TRUE for the bound
# each estimate must satisfy.
@query(
    "q94_hll_union_rollup",
    oracle="""
    WITH per_seg AS (
      SELECT c_mktsegment, c_nationkey,
             COUNT(DISTINCT c_custkey) AS nd
      FROM customer GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer c2
                 WHERE c2.c_mktsegment = per_seg.c_mktsegment) AS BIGINT)
             AS nd_exact,
           TRUE AS est_within_10pct
    FROM per_seg
    GROUP BY c_mktsegment
    """,
)
def q94_hll_union_rollup(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    # stage 1: one sketch buffer per (segment, nation)
    per_nation = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch"),
    )
    # stage 2: merge buffers up to segment level — rows never re-read
    rolled = per_nation.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_nations"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"),
    )
    exact = c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").cast("bigint").alias("nd_exact")
    )
    return (
        rolled.join(exact, "c_mktsegment")
        .select(
            "c_mktsegment",
            "n_nations",
            "nd_exact",
            (
                F.abs(F.col("est") - F.col("nd_exact"))
                <= F.col("nd_exact") * F.lit(0.10)
            ).alias("est_within_10pct"),
        )
    )
