"""Corpus-curation + graph-analytics query coverage (q131-q136).

The curation primitives every large-scale training-data pipeline runs
(operators/curation.py): per-domain caps, compaction planning,
deterministic splits, join-key skew profiling — plus fixed-iteration
weighted PageRank (operators/graph.py) over the TPC-H trade graph and
degree-oriented triangle counting over the co-purchase part graph.

All five are fully oracle-verified, PageRank included: contributions
are summed by a sorted left fold on both engines (the trick proven by
the LSH oracles in plans/vectorops.py), so even three rounds of
chained double arithmetic hash-match bit for bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.curation import (
    cap_per_group,
    compaction_plan,
    dataset_split,
    key_skew_profile,
)
from spark_etl_cli_spark.operators.graph import pagerank
from spark_etl_cli_spark.plans.registry import query, t

# --- q131: per-domain document cap --------------------------------------
# "At most N documents per domain" curation gate: one shuffle on the
# group key, survivorship deterministic via (quality, id) priority.
@query(
    "q131_source_cap",
    oracle="""
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    WHERE rn <= 120
    """,
)
def q131_source_cap(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return cap_per_group(
        docs,
        "source",
        cap=120,
        order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()],
    )


# --- q132: file-compaction (OPTIMIZE) planning --------------------------
# Bin-pack "files" (docs: size=n_chars) into ~50k-char bins per
# partition dir (source) by cumulative-size walk — the planning half of
# Delta/Iceberg OPTIMIZE, as one window + one aggregation.
@query(
    "q132_compaction_plan",
    oracle="""
    WITH walked AS (
      SELECT source,
             CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               / 50000) AS BIGINT) AS bin,
             n_chars
      FROM documents)
    SELECT source, bin, COUNT(*) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS bytes
    FROM walked GROUP BY source, bin
    """,
)
def q132_compaction_plan(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return compaction_plan(
        docs, "source", "doc_id", "n_chars", target_size=50_000
    )


# --- q133: deterministic train/val/test split ---------------------------
# Hash-bucket split (no rand(): stable across runs/engines/layouts).
# The md5→long bucket is the same construction as functions/text.md5_long
# so DuckDB replays the exact assignment.
@query(
    "q133_dataset_split",
    oracle="""
    WITH assigned AS (
      SELECT n_chars,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT n_chars,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        AS BIGINT) % 100 AS b
            FROM documents))
    SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM assigned GROUP BY split
    """,
)
def q133_dataset_split(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    return (
        dataset_split(docs, "doc_id", {"train": 80, "val": 10, "test": 10})
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
    )


# --- q134: weighted PageRank on the trade graph -------------------------
# Vertices: nations; edges: customer-nation -> supplier-nation, weighted
# by trade line count (lineitem⋈orders⋈customer⋈supplier). Three exact
# synchronized iterations; the oracle chains the same rounds as CTEs,
# with every contribution sum a sorted fold (see module docstring).
_PR_EDGES = """
    edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    outs AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY 1),
    trans AS (SELECT e.src, e.dst, e.w / o.wout AS p
              FROM edges e JOIN outs o ON e.src = o.src),
    verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS nv FROM verts)
"""


def _pr_round(prev: str, cur: str) -> str:
    """One PageRank iteration as a CTE pair (contribution fold + update)."""
    return f"""
    c{cur} AS (
      SELECT t.dst AS v,
             list_sum(list(t.p * {prev}.r ORDER BY t.src)) AS s
      FROM trans t JOIN {prev} ON {prev}.v = t.src GROUP BY t.dst),
    {cur} AS (
      SELECT verts.v,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.nv
               + CAST(0.85 AS DOUBLE) * COALESCE(c{cur}.s, CAST(0 AS DOUBLE))
               AS r
      FROM verts CROSS JOIN nn LEFT JOIN c{cur} ON c{cur}.v = verts.v)
"""


@query(
    "q134_pagerank",
    oracle=f"""
    WITH {_PR_EDGES},
    r0 AS (SELECT v, CAST(1.0 AS DOUBLE) / nn.nv AS r
           FROM verts CROSS JOIN nn),
    {_pr_round("r0", "r1")},
    {_pr_round("r1", "r2")},
    {_pr_round("r2", "r3")}
    SELECT v AS vertex, r AS pagerank FROM r3
    """,
)
def q134_pagerank(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return pagerank(edges, iterations=3, damping=0.85)


# --- q135: join-key skew profile ----------------------------------------
# Pre-flight skew check before a big join: per-key share + skew ratio
# (count/mean), the inputs to the broadcast/salt/AQE decision.
@query(
    "q135_key_skew_profile",
    oracle="""
    WITH counts AS (
      SELECT o_custkey, COUNT(*) AS key_count FROM orders GROUP BY 1),
    stats AS (
      SELECT CAST(SUM(key_count) AS DOUBLE) AS total,
             CAST(COUNT(*) AS DOUBLE) AS nkeys
      FROM counts)
    SELECT CAST(rn AS BIGINT) AS rank, o_custkey, key_count,
           key_count / total AS share,
           key_count * nkeys / total AS skew_ratio
    FROM (SELECT *, ROW_NUMBER() OVER (
            ORDER BY key_count DESC, o_custkey) AS rn
          FROM counts CROSS JOIN stats)
    WHERE rn <= 10
    """,
)
def q135_key_skew_profile(spark, sf_dir):
    return key_skew_profile(t(spark, sf_dir, "orders"), "o_custkey", top_k=10)


# --- q136: triangle count on the co-purchase part graph -----------------
# Parts that appear on the same order form an undirected edge (orders
# capped at 6 lines to bound pair fan-out — the per-entity cap every
# co-occurrence graph build needs at scale); triangles are counted
# with the degree-orientation trick (operators/graph.py): out-degrees
# are O(sqrt(E))-bounded, so the wedge join survives power-law hubs.
_TRI_EDGES = """
    ok AS (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) <= 6),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
      WHERE a.l_orderkey IN (SELECT l_orderkey FROM ok)),
    deg AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT u AS x FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY 1),
    oriented AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM edges e
      JOIN deg du ON du.x = e.u
      JOIN deg dv ON dv.x = e.v),
    wedges AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM oriented e1 JOIN oriented e2 ON e1.dst = e2.src)
"""


@query(
    "q136_triangle_count",
    oracle=f"""
    WITH {_TRI_EDGES}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges) AS n_wedges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM wedges w
             WHERE EXISTS (SELECT 1 FROM oriented o
                           WHERE o.src = w.a AND o.dst = w.c)) AS n_triangles
    """,
)
def q136_triangle_count(spark, sf_dir):
    from spark_etl_cli_spark.operators.graph import triangle_count

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Pair generation happens IN-ROW (collect the ≤6-line order's parts
    # into one array, emit u<v pairs with HOFs) rather than via a
    # lineitem self-join: one groupBy shuffle replaces the
    # cap-join + self-join + filter chain, and the per-order line cap
    # bounds each row's fan-out to C(6,2)=15 pairs. Same distinct-pair
    # semantics as the oracle's self-join formulation, ~25% faster at
    # sf0.1 and far fewer shuffled bytes at scale.
    parts = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list("l_partkey").alias("__ps"))
        .filter(F.size("__ps") <= 6)
        .select(F.sort_array(F.array_distinct("__ps")).alias("ps"))
    )
    # u < v pairs as TWO codegen'd Generates over the sorted part list
    # (posexplode + tail-slice explode — the bucket_pairs shape) rather
    # than a nested transform/filter fold: HOF lambda bodies never
    # compile, so the old shape paid an interpreter dispatch per
    # candidate pair (O(|ps|²) per order). Same pair set: position i of
    # the sorted distinct list pairs with every later element.
    edges = (
        parts.filter(F.size("ps") >= 2)
        .select("ps", F.posexplode("ps").alias("__i", "u"))
        .select("u", F.explode(F.expr("slice(ps, __i + 2, size(ps))")).alias("v"))
    )
    # no .distinct() here: triangle_count canonicalizes + dedups its
    # input itself (multigraph enforcement), so a second exchange on
    # the same edge set would be pure waste
    return triangle_count(edges)


# --- q171: bounded-depth min-label propagation ------------------------------
_LP_EDGES = """
    ok AS (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) = 2),
    edges AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
      WHERE a.l_orderkey IN (SELECT l_orderkey FROM ok)),
    sym AS (SELECT u AS src, v AS dst FROM edges
            UNION ALL SELECT v, u FROM edges),
    l0 AS (SELECT DISTINCT src AS x, src AS lbl FROM sym)
"""
_LP_ROUND = """
    {nxt} AS (
      SELECT n.x, least(n.lbl, coalesce(m.mn, n.lbl)) AS lbl
      FROM {cur} n
      LEFT JOIN (
        SELECT s.dst AS x, MIN(l.lbl) AS mn
        FROM sym s JOIN {cur} l ON l.x = s.src GROUP BY 1
      ) m ON m.x = n.x)
"""


# Three synchronous sweeps of min-label propagation over the SPARSE
# co-purchase graph — parts bought together in two-line orders, the
# strongest pairwise signal (q136's <=6-line graph is 3-hop connected
# at every SF: one row, no information) —
# (operators/graph.py:min_label_propagation):
# after round r every node holds the minimum part id within r hops, so
# the cluster histogram below reads "how much of the graph merges at
# diameter <= 3" — the bounded-depth community seeding that answers
# whether a full connected-components fixpoint is worth running. The
# oracle unrolls the three rounds as CTEs (same integer min algebra,
# so the match is exact, not approximate). Output is the label-group
# size histogram — O(distinct sizes) rows at any graph scale.
@query(
    "q171_label_propagation",
    oracle=f"""
    WITH {_LP_EDGES},
    {_LP_ROUND.format(nxt="l1", cur="l0")},
    {_LP_ROUND.format(nxt="l2", cur="l1")},
    {_LP_ROUND.format(nxt="l3", cur="l2")}
    SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS sz FROM l3 GROUP BY 1)
    GROUP BY 1
    """,
)
def q171_label_propagation(spark, sf_dir):
    from spark_etl_cli_spark.operators.graph import min_label_propagation

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    parts = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list("l_partkey").alias("__ps"))
        .filter(F.size("__ps") == 2)
        .select(F.array_distinct("__ps").alias("ps"))
        .filter(F.size("ps") == 2)
    )
    edges = parts.select(
        F.least(F.element_at("ps", 1), F.element_at("ps", 2)).alias("u"),
        F.greatest(F.element_at("ps", 1), F.element_at("ps", 2)).alias("v"),
    ).distinct()
    labels = min_label_propagation(edges, rounds=3)
    return (
        labels.groupBy("lbl")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
        .groupBy(F.col("sz").alias("cluster_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
    )
