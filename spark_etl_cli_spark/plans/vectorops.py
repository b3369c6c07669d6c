"""Similarity-search query coverage over ``embeddings`` (array<float>).

North-star extensions (SURVEY.md §2d): exact brute-force cosine top-k,
random-hyperplane LSH top-k (the 100 TB path), embedding near-dup
pairs, and a kNN label-vote classifier shape.

Every query here is oracle-verified, including the LSH ones: the
bucketing uses sign-bit-packed integers (operators/similarity.py) and
deterministic hyperplanes, so the DuckDB twin replicates the *entire*
approximate plan — candidates, re-rank, and output — bit for bit. Dot
products are sequential left-folds over doubles in both engines, which
makes even the floating-point cosine values hash-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.similarity import (
    _hyperplane,
    brute_force_topk,
    cosine_dup_pairs,
    lsh_topk,
)
from spark_etl_cli_spark.plans.registry import bcount, query, t

DIM = 64  # embeddings.parquet vector width (all SFs)


# --- DuckDB twins of functions/vectors.py ------------------------------
def _sql_dot(a: str, b: str) -> str:
    # operands parenthesized: `x::DOUBLE[][i]` is a parse error in DuckDB
    return (
        f"list_sum(list_transform(range(1, len(({a})) + 1), "
        f"i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE)))"
    )


def _sql_unit(v: str) -> str:
    """Twin of vectors.unit: v/||v|| with the same op order (square-sum
    left fold, sqrt, per-element divide). The Spark side normalizes each
    vector once so every candidate pair costs one dot — the oracle must
    produce bit-identical unit vectors for the pair dots to hash-match."""
    vd = f"list_transform(({v}), x -> CAST(x AS DOUBLE))"
    return (
        f"list_transform({vd}, x -> x / "
        f"sqrt(list_sum(list_transform({vd}, y -> y * y))))"
    )


def _sql_dotn(a: str, b: str) -> str:
    """Dot of two already-DOUBLE (unit) lists — twin of _dot_unit."""
    return (
        f"list_sum(list_transform(range(1, len(({a})) + 1), "
        f"i -> ({a})[i] * ({b})[i]))"
    )


def _sql_plane(p: int) -> str:
    return "[" + ", ".join(repr(v) for v in _hyperplane(DIM, p)) + "]::DOUBLE[]"


def _sql_sig(vec: str, num_planes: int) -> str:
    """List of sign bits, one per hyperplane — twin of rp_signature."""
    bits = ", ".join(
        f"CASE WHEN {_sql_dot(vec, _sql_plane(p))} >= 0 THEN 1 ELSE 0 END"
        for p in range(num_planes)
    )
    return f"[{bits}]"


def _sql_banded(src: str, id_expr: str, num_planes: int, bands: int) -> str:
    """CTE body producing (id, v, band, bucket) — twin of _explode_bands.

    ``src`` must provide columns (``{id_expr}``, ``v`` vector, ``sig``).
    """
    rpb = num_planes // bands
    selects = []
    for b in range(bands):
        bucket = " + ".join(
            f"sig[{b * rpb + r + 1}] * {1 << r}" for r in range(rpb)
        )
        selects.append(
            f"SELECT {id_expr}, v, {b} AS band, "
            f"CAST({bucket} AS BIGINT) AS bucket FROM {src}"
        )
    return " UNION ALL ".join(selects)


# --- q40: exact brute-force cosine top-k --------------------------------
# Corpus×queries cross product with the query side broadcast; ranking by
# per-query window. Exact ANN baseline; at 100 TB the broadcast keeps
# the corpus scan shuffle-free and TakeOrdered never materializes the
# full score matrix.
@query(
    "q40_ann_bruteforce",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, {_sql_unit("embedding")} AS qv
               FROM embeddings WHERE vec_id < 10),
         c AS (SELECT vec_id AS neighbor_id, {_sql_unit("embedding")} AS cv
               FROM embeddings),
         s AS (SELECT query_id, neighbor_id,
                      {_sql_dotn("qv", "cv")} AS cosine_sim
               FROM c CROSS JOIN q WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, cosine_sim,
           CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rnk
          FROM s)
    WHERE rnk <= 5
    """,
)
def q40_ann_bruteforce(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    return brute_force_topk(
        corpus=e, queries=e.filter(F.col("vec_id") < 10), k=5
    )


# --- q41: LSH-bucketed approximate top-k --------------------------------
# The scale path: sign-bit band buckets bound the candidate set; exact
# cosine re-ranks candidates only. The oracle replicates the bucketing,
# so this verifies the approximation itself, not just row counts.
@query(
    "q41_ann_lsh",
    oracle=f"""
    WITH c0 AS (SELECT vec_id AS id, {_sql_unit("embedding")} AS v,
                       {_sql_sig("embedding", 16)} AS sig FROM embeddings),
         q0 AS (SELECT * FROM c0 WHERE id < 10),
         cb AS ({_sql_banded("c0", "id", 16, 4)}),
         qb AS ({_sql_banded("q0", "id", 16, 4)}),
         cand AS (
           SELECT DISTINCT qb.id AS query_id, cb.id AS neighbor_id,
                  qb.v AS qv, cb.v AS cv
           FROM cb JOIN qb ON cb.band = qb.band AND cb.bucket = qb.bucket
           WHERE cb.id <> qb.id
         ),
         s AS (SELECT query_id, neighbor_id,
                      {_sql_dotn("qv", "cv")} AS cosine_sim FROM cand)
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rnk
          FROM s)
    WHERE rnk <= 5
    """,
)
def q41_ann_lsh(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    return lsh_topk(
        corpus=e,
        queries=e.filter(F.col("vec_id") < 10),
        k=5,
        num_planes=16,
        bands=4,
        dim=DIM,
    )


# --- q42: embedding near-duplicate pairs --------------------------------
# LSH-bucketed all-pairs with exact-cosine confirmation (embedding-based
# dedup). Threshold 0.3 is calibrated to the synthetic corpus (max pair
# sim ~0.51) so the query does observable work.
@query(
    "q42_cosine_dup_pairs",
    oracle=f"""
    WITH c0 AS (SELECT vec_id AS id, {_sql_unit("embedding")} AS v,
                       {_sql_sig("embedding", 16)} AS sig FROM embeddings),
         cb AS ({_sql_banded("c0", "id", 16, 4)}),
         cand AS (
           SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.v AS va, b.v AS vb
           FROM cb a JOIN cb b
             ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
         )
    SELECT id_a, id_b, cosine_sim FROM (
      SELECT id_a, id_b, {_sql_dotn("va", "vb")} AS cosine_sim FROM cand)
    WHERE cosine_sim >= 0.3
    """,
)
def q42_cosine_dup_pairs(spark, sf_dir):
    return cosine_dup_pairs(
        t(spark, sf_dir, "embeddings"), threshold=0.3, num_planes=16, bands=4,
        dim=DIM,
    )


# --- q202: the EMBEDDING tier of the incremental loop -------------------
# SemDeDup incrementally: a new batch of vectors (odd vec_ids) dedups
# against a persisted corpus (even vec_ids) — hyperplane-LSH band
# probe with the BATCH side broadcast, state scanned never shuffled,
# exact cosine confirming in-row. A batch vector is a duplicate iff a
# state vector or a smaller-id batch vector collides in some band with
# cosine >= 0.3; dup_of = the smallest such neighbor. Completes the
# q200 (minhash) / q201 (exact) incremental family across all three
# dedup tiers.
@query(
    "q202_incremental_cosine_dedup",
    oracle=f"""
    WITH c0 AS (SELECT vec_id AS id, {_sql_unit("embedding")} AS v,
                       {_sql_sig("embedding", 16)} AS sig FROM embeddings),
         cb AS ({_sql_banded("c0", "id", 16, 4)}),
         cand AS (
           SELECT DISTINCT b.id AS id, a.id AS nid, a.v AS av, b.v AS bv
           FROM cb b JOIN cb a
             ON a.band = b.band AND a.bucket = b.bucket
          WHERE b.id % 2 = 1 AND (a.id % 2 = 0 OR a.id < b.id)
         ),
         s AS (SELECT id, nid, {_sql_dotn("av", "bv")} AS cos FROM cand),
         hits AS (
           SELECT id, min(nid) AS dup_of, arg_min(cos, nid) AS cosine_sim
           FROM s WHERE cos >= 0.3 GROUP BY id
         )
    SELECT e.vec_id, h.dup_of, h.cosine_sim
    FROM embeddings e LEFT JOIN hits h ON e.vec_id = h.id
    WHERE e.vec_id % 2 = 1
    """,
)
def q202_incremental_cosine_dedup(spark, sf_dir):
    from spark_etl_cli_spark.operators.similarity import (
        incremental_cosine_dedup,
    )

    e = t(spark, sf_dir, "embeddings")
    dec = incremental_cosine_dedup(
        e.filter(F.col("vec_id") % 2 == 1),
        e.filter(F.col("vec_id") % 2 == 0),
        threshold=0.3,
        num_planes=16,
        bands=4,
        dim=DIM,
    )
    return dec.select(
        F.col("id").alias("vec_id"), "dup_of", "cosine_sim"
    )


# --- q43: kNN label vote (classification shape) -------------------------
# Top-5 exact neighbors per query, majority label with smallest-label
# tie-break — the standard "label my new data by similarity" pipeline.
@query(
    "q43_knn_label_vote",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, {_sql_unit("embedding")} AS qv
               FROM embeddings WHERE vec_id < 50),
         c AS (SELECT vec_id AS neighbor_id, {_sql_unit("embedding")} AS cv,
                      label
               FROM embeddings),
         s AS (SELECT query_id, neighbor_id, label,
                      {_sql_dotn("qv", "cv")} AS cosine_sim
               FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
         top AS (SELECT * FROM (
                   SELECT *, ROW_NUMBER() OVER (
                     PARTITION BY query_id
                     ORDER BY cosine_sim DESC, neighbor_id) AS rnk
                   FROM s) WHERE rnk <= 5),
         votes AS (SELECT query_id, label, COUNT(*) AS n
                   FROM top GROUP BY 1, 2)
    SELECT query_id, CAST(label AS INT) AS pred_label
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY n DESC, label) AS vr
          FROM votes)
    WHERE vr = 1
    """,
)
def q43_knn_label_vote(spark, sf_dir):
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "embeddings")
    labels = e.select(F.col("vec_id").alias("neighbor_id"), "label")
    top = brute_force_topk(
        corpus=e, queries=e.filter(F.col("vec_id") < 50), k=5
    ).join(labels, "neighbor_id")
    votes = top.groupBy("query_id", "label").agg(bcount("n"))
    w = W.partitionBy("query_id").orderBy(F.col("n").desc(), F.col("label"))
    return (
        votes.withColumn("vr", F.row_number().over(w))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").cast("int").alias("pred_label"))
    )


# --- q46: IVF approximate top-k ------------------------------------------
# Coarse-quantize to 16 deterministic centroids, probe the 4 nearest
# cells per query, exact re-rank within cells. The oracle replicates
# assignment, probing, and re-rank — verifying the IVF plan end to end.
@query(
    "q46_ann_ivf",
    oracle=f"""
    WITH cents AS (SELECT vec_id AS cid, {_sql_unit("embedding")} AS cent
                   FROM embeddings WHERE vec_id < 16),
         corpus AS (SELECT vec_id AS id, {_sql_unit("embedding")} AS v
                    FROM embeddings),
         casn AS (
           SELECT id, v, cid FROM (
             SELECT id, v, cid, ROW_NUMBER() OVER (
               PARTITION BY id ORDER BY {_sql_dotn("v", "cent")} DESC, cid) AS cr
             FROM corpus CROSS JOIN cents) WHERE cr <= 1
         ),
         qasn AS (
           SELECT id, v, cid FROM (
             SELECT id, v, cid, ROW_NUMBER() OVER (
               PARTITION BY id ORDER BY {_sql_dotn("v", "cent")} DESC, cid) AS cr
             FROM (SELECT * FROM corpus WHERE id < 10) q CROSS JOIN cents)
           WHERE cr <= 4
         ),
         cand AS (
           SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id,
                  q.v AS qv, c.v AS cv
           FROM casn c JOIN qasn q ON c.cid = q.cid
           WHERE c.id <> q.id
         ),
         s AS (SELECT query_id, neighbor_id,
                      {_sql_dotn("qv", "cv")} AS cosine_sim FROM cand)
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine_sim DESC, neighbor_id) AS rnk
          FROM s)
    WHERE rnk <= 5
    """,
)
def q46_ann_ivf(spark, sf_dir):
    from spark_etl_cli_spark.operators.similarity import ivf_topk

    e = t(spark, sf_dir, "embeddings")
    return ivf_topk(
        corpus=e,
        queries=e.filter(F.col("vec_id") < 10),
        k=5,
        n_centroids=16,
        nprobe=4,
    )


# --- q63: per-dimension embedding statistics ------------------------------
# Feature-normalization stats (the pass before whitening/scaling a
# training set): posexplode to (dim, value), aggregate per dimension.
# Values are scaled to integer micro-units *before* summing, so the
# cross-row aggregation is exact integer math — bit-identical across
# engines and row orders (a raw double sum would be neither).
@query(
    "q63_embedding_dim_stats",
    oracle="""
    WITH x AS (
      SELECT unnest(list_transform(generate_series(1, len(embedding)),
               i -> struct_pack(d := i - 1,
                                m := CAST(floor(CAST(embedding[i] AS DOUBLE)
                                     * 1000000) AS BIGINT)))) AS u
      FROM embeddings
    )
    SELECT CAST(u.d AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(u.m) AS BIGINT) AS sum_micros,
           CAST(MIN(u.m) AS BIGINT) AS min_micros,
           CAST(MAX(u.m) AS BIGINT) AS max_micros
    FROM x GROUP BY 1
    """,
)
def q63_embedding_dim_stats(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    micros = F.floor(F.col("val").cast("double") * 1000000).cast("bigint")
    return (
        e.select(F.posexplode("embedding").alias("dim", "val"))
        .select(F.col("dim").cast("int").alias("dim"), micros.alias("m"))
        .groupBy("dim")
        .agg(
            bcount("n"),
            F.sum("m").cast("bigint").alias("sum_micros"),
            F.min("m").cast("bigint").alias("min_micros"),
            F.max("m").cast("bigint").alias("max_micros"),
        )
    )


# --- q64: int8 scalar quantization ----------------------------------------
# The storage/bandwidth path for ANN at scale: per-vector max-abs scale,
# floor(v / scale * 127) per element. All per-element arithmetic (no
# cross-row float aggregation), identical double ops in both engines.
@query(
    "q64_vector_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             embedding,
             list_max(list_transform(embedding,
                      e -> abs(CAST(e AS DOUBLE)))) AS maxabs
      FROM embeddings
    )
    SELECT vec_id,
           array_to_string(list_transform(embedding,
             e -> CAST(CASE WHEN maxabs = 0 THEN 0
                  ELSE CAST(floor(CAST(e AS DOUBLE) / maxabs * 127) AS INT)
                  END AS VARCHAR)), ',') AS q,
           CAST(floor(maxabs * 1000000) AS BIGINT) AS scale_micros
    FROM s
    """,
)
def q64_vector_quantize(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    quant = F.transform(
        F.col("embedding"),
        lambda v: F.when(F.col("maxabs") == 0, F.lit(0)).otherwise(
            F.floor(v.cast("double") / F.col("maxabs") * 127).cast("int")
        ),
    )
    # oracle-facing q is stringified (driver canonicalizer cannot hash
    # list cells); the int8 array itself is the operator's real output
    return (
        e.withColumn("maxabs", maxabs)
        .select(
            "vec_id",
            F.array_join(
                F.transform(quant, lambda x: x.cast("string")), ","
            ).alias("q"),
            F.floor(F.col("maxabs") * 1000000).cast("bigint")
            .alias("scale_micros"),
        )
    )


# --- q119: deterministic 2-round Lloyd k-means ----------------------------
# The iterative-algorithm showcase (operators/clustering.py): centroids
# live on the driver (k x 64 doubles), each round is one assignment
# pass against broadcast centroid literals + one exact integer
# micro-unit update aggregation. Oracle replays both rounds in SQL.
@query(
    "q119_kmeans_lloyd",
    oracle=(
        lambda: __import__(
            "spark_etl_cli_spark.operators.clustering", fromlist=["kmeans_sql"]
        ).kmeans_sql("embeddings", k=8, iters=2, dim=DIM)
    )(),
)
def q119_kmeans_lloyd(spark, sf_dir):
    from spark_etl_cli_spark.operators.clustering import kmeans_lloyd

    e = t(spark, sf_dir, "embeddings")
    return kmeans_lloyd(e, k=8, iters=2)


# --- q127: SemDeDup cluster-scoped embedding dedup -----------------------
# The scale answer to q42's global near-dup pass: cluster first
# (deterministic lowest-id coarse quantizer, as q46), compare only
# within a cluster, mark every vector that has a lower-id clustermate
# within the cosine threshold. The oracle replays assignment, pair
# generation, and verdict — the entire approximate algorithm, not just
# the output shape.
@query(
    "q127_semantic_dedup",
    oracle=f"""
    WITH cents AS (SELECT vec_id AS cid, {_sql_unit("embedding")} AS cent
                   FROM embeddings WHERE vec_id < 16),
         corpus AS (SELECT vec_id AS id, {_sql_unit("embedding")} AS v
                    FROM embeddings),
         asn AS (
           SELECT id, v, cid FROM (
             SELECT id, v, cid, ROW_NUMBER() OVER (
               PARTITION BY id ORDER BY {_sql_dotn("v", "cent")} DESC, cid) AS cr
             FROM corpus CROSS JOIN cents) WHERE cr <= 1
         ),
         dups AS (
           SELECT DISTINCT b.id
           FROM asn a JOIN asn b ON a.cid = b.cid AND a.id < b.id
           WHERE {_sql_dotn("a.v", "b.v")} >= 0.3
         )
    SELECT a.id AS vec_id, CAST(a.cid AS BIGINT) AS cluster_id,
           (d.id IS NOT NULL) AS is_dup
    FROM asn a LEFT JOIN dups d ON a.id = d.id
    """,
)
def q127_semantic_dedup(spark, sf_dir):
    from spark_etl_cli_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        t(spark, sf_dir, "embeddings"), threshold=0.3, n_clusters=16
    ).withColumnRenamed("id", "vec_id")


# --- q175: per-label embedding cohesion ------------------------------------
# Embedding-QA pass before training a classifier / probing a retrieval
# index: how tight is each label's cluster? Centroid = spherical mean
# of the label's UNIT vectors, cohesion = cosine(unit vector, unit
# centroid). Cross-engine determinism uses the q119/q63 micro-unit
# trick twice: centroid dims are exact BIGINT sums of floor(u_d * 1e6)
# (order-independent), and the per-label mean cosine is an exact BIGINT
# sum of floor(cos * 1e6); the only float steps are correctly-rounded
# divisions and the per-row left-fold dot both engines replay. Plan:
# one posexplode→(label, dim) agg (k×dim rows), centroids broadcast
# back, one linear cosine pass, one map-side-combined final agg —
# nothing quadratic, rows never shuffle by vector.
@query(
    "q175_label_cohesion",
    oracle=f"""
    WITH pts AS (
      SELECT vec_id, label, {_sql_unit("embedding")} AS u FROM embeddings
    ),
    dims AS (
      SELECT label, i AS d,
             SUM(CAST(floor((u[i]) * 1000000) AS BIGINT)) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM pts, range(1, {DIM} + 1) r(i)
      GROUP BY label, i
    ),
    cents AS (
      SELECT label,
             list((CAST(s AS DOUBLE) / n) / 1000000 ORDER BY d) AS c
      FROM dims GROUP BY label
    ),
    cos AS (
      SELECT p.label, p.vec_id,
             {_sql_dotn("p.u", _sql_unit("c.c"))} AS cs
      FROM pts p JOIN cents c ON p.label = c.label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CAST(floor(cs * 1000000) AS BIGINT)) AS DOUBLE)
             / COUNT(*) / 1000000 AS avg_cohesion,
           MIN(cs) AS min_cohesion
    FROM cos GROUP BY label
    """,
)
def q175_label_cohesion(spark, sf_dir):
    from spark_etl_cli_spark.functions.vectors import dot, unit

    pts = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", unit(F.col("embedding")).alias("u")
    )
    dims = (
        pts.select("label", F.posexplode("u").alias("d0", "x"))
        .groupBy("label", "d0")
        .agg(
            F.sum(F.floor(F.col("x") * 1000000).cast("bigint"))
            .cast("bigint")
            .alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    cents = (
        dims.select(
            "label",
            F.struct(
                "d0", ((F.col("s").cast("double") / F.col("n")) / 1000000).alias("c")
            ).alias("dc"),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("dc")), lambda s: s["c"]
            ).alias("c")
        )
    )
    cos = pts.join(F.broadcast(cents), "label").select(
        "label", dot(F.col("u"), unit(F.col("c"))).alias("cs")
    )
    return cos.groupBy("label").agg(
        bcount("n_vecs"),
        (
            F.sum(F.floor(F.col("cs") * 1000000).cast("bigint")).cast("double")
            / F.count(F.lit(1))
            / 1000000
        ).alias("avg_cohesion"),
        F.min("cs").alias("min_cohesion"),
    )


# --- q188: int8 quantization reconstruction-error profile ------------------
# The QA companion to q64: quantize (max-abs scale, floor to int8),
# reconstruct (q·scale/127), and profile the per-vector MAX absolute
# error as a milli-unit histogram — the go/no-go check before shipping
# a quantized ANN index. Every step is the per-element double pipeline
# q64 already pins cross-engine (floor/div/mul are correctly rounded),
# the max over elements is order-free, and the histogram bucket is
# floor(err·1000) — exact BIGINTs into a map-side-combined count.
@query(
    "q188_quantization_error",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      e -> abs(CAST(e AS DOUBLE)))) AS maxabs
      FROM embeddings
    ),
    err AS (
      SELECT vec_id,
             CASE WHEN maxabs = 0 THEN 0.0
                  ELSE list_max(list_transform(embedding,
                    e -> abs(CAST(e AS DOUBLE)
                         - CAST(floor(CAST(e AS DOUBLE) / maxabs * 127)
                                AS BIGINT) * maxabs / 127)))
             END AS max_err
      FROM s
    )
    SELECT CAST(floor(max_err * 1000) AS BIGINT) AS err_milli_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM err GROUP BY 1
    """,
)
def q188_quantization_error(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    maxabs = F.array_max(
        F.transform(F.col("embedding"), lambda v: F.abs(v.cast("double")))
    )
    s = e.select("vec_id", "embedding", maxabs.alias("maxabs"))
    err_el = lambda v: F.abs(  # noqa: E731
        v.cast("double")
        - F.floor(v.cast("double") / F.col("maxabs") * 127).cast("bigint")
        * F.col("maxabs")
        / 127
    )
    max_err = F.when(F.col("maxabs") == 0, F.lit(0.0)).otherwise(
        F.array_max(F.transform(F.col("embedding"), err_el))
    )
    return (
        s.select(F.floor(max_err * 1000).cast("bigint").alias(
            "err_milli_bucket"
        ))
        .groupBy("err_milli_bucket")
        .agg(bcount("n_vectors"))
    )


# --- q192: embedding norm profile (exact micro-unit L2) ----------------------
# Embedding-store hygiene: per label, the distribution of squared L2
# norms — near-zero or exploding norms flag bad encoder batches before
# they poison ANN recall. Exactness: each element contributes
# floor(x²·10¹²) (identical IEEE multiply+floor in both engines), the
# per-vector sum is a fixed left-to-right in-row fold, and cross-row
# aggregation is DECIMAL(38,0) — so min/max/mean hash-match exactly.
# Scale: in-row arithmetic + one map-side-combinable groupBy on label;
# nothing quadratic, no windows.
@query(
    "q192_embedding_norm_profile",
    oracle="""
    WITH n AS (
      SELECT label,
             CAST(list_sum(list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                               * 1e12) AS BIGINT))) AS BIGINT)
               AS norm2_mu
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(norm2_mu) AS BIGINT) AS min_norm2_mu,
           CAST(MAX(norm2_mu) AS BIGINT) AS max_norm2_mu,
           CAST(SUM(CAST(norm2_mu AS DECIMAL(38,0))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mean_norm2_mu
    FROM n GROUP BY 1
    """,
)
def q192_embedding_norm_profile(spark, sf_dir):
    from pyspark.sql import types as T

    e = t(spark, sf_dir, "embeddings")
    norm2 = F.aggregate(
        "embedding",
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * x.cast("double") * F.lit(1e12)).cast(
            "long"
        ),
    ).alias("norm2_mu")
    n = e.select("label", norm2)
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.min("norm2_mu").cast("bigint").alias("min_norm2_mu"),
        F.max("norm2_mu").cast("bigint").alias("max_norm2_mu"),
        (
            F.sum(F.col("norm2_mu").cast(T.DecimalType(38, 0)))
            .cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_norm2_mu"),
    )
