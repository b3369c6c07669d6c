"""Corpus-hygiene + retrieval + exact-statistics query coverage.

- **q111** runs the train/test decontamination probe: benchmark docs are
  the ``doc_id % 97 = 0`` slice, the training corpus is everything else
  plus four deliberately leaked benchmark copies (prefixed with one
  token so they are *not* exact duplicates — only the n-gram collision
  test can find them). Shared-8-gram pairs must match DuckDB exactly.
- **q112** scores every document against a fixed query-term bag with
  BM25 (rational idf — no ``ln``, see operators/retrieval.py) and
  returns the top 20 with a doc_id tie-break.
- **q113** computes per-group Pearson correlation + covariance from
  exact decimal moment sums (single map-side-combined pass; the only
  floating-point steps are correctly-rounded double ops mirrored
  verbatim in the oracle — including IEEE-754 sqrt, which is exact).
- **q114** buckets documents into power-of-two token-length classes and
  reports padding efficiency — the batch-shape statistic behind
  length-grouped training batches.

Scale notes: q111 shuffles 16-hex-char hashes only and broadcasts the
benchmark side; q112 is one narrow pass + a broadcast of a 1-row stats
relation; q113 is a pure partial-aggregate (no second pass for the
mean); q114 is a single map-side-combined aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.retrieval import bm25_scores, bm25_sql, contamination_pairs
from spark_etl_cli_spark.operators.util import fan_out
from spark_etl_cli_spark.plans.registry import bcount, dec, query, t
from spark_etl_cli_spark.plans.textops import SQL_NTOK, SQL_TOKENS

# --- q111: train/test decontamination (8-gram collision) -----------------
_SQL_BENCH = "SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0"
_SQL_TRAIN = f"""
  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, 'intro ' || text AS text
  FROM ({_SQL_BENCH}) WHERE doc_id < 300
"""


def _sql_grams(src_sql: str, out_id: str) -> str:
    # distinct 8-gram 64-bit hashes per doc (mirror of _gram_hashes)
    return f"""
    SELECT DISTINCT doc_id AS {out_id},
           substr(md5(array_to_string(tk[i : i + 7], ' ')), 1, 16) AS h
    FROM (SELECT doc_id, {SQL_TOKENS} AS tk FROM ({src_sql})),
         UNNEST(generate_series(1, len(tk) - 7)) AS s(i)
    """


@query(
    "q111_decontamination",
    oracle=f"""
    WITH tg AS ({_sql_grams(_SQL_TRAIN, "train_doc_id")}),
         bg AS ({_sql_grams(_SQL_BENCH, "bench_doc_id")})
    SELECT train_doc_id, bench_doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM tg JOIN bg USING (h)
    GROUP BY 1, 2
    """,
)
def q111_decontamination(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    leaked = bench.filter(F.col("doc_id") < 300).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.lit("intro "), F.col("text")).alias("text"),
    )
    train = d.filter(F.col("doc_id") % 97 != 0).unionByName(leaked)
    return contamination_pairs(fan_out(train), bench, n=8)


# --- q112: BM25 top-20 for a fixed query-term bag ------------------------
_BM25_TERMS = ["join", "hash", "vector"]


@query(
    "q112_bm25_topk",
    oracle=f"""
    SELECT doc_id, dl, score
    FROM ({bm25_sql("documents", _BM25_TERMS)})
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def q112_bm25_topk(spark, sf_dir):
    d = fan_out(t(spark, sf_dir, "documents"))
    return (
        bm25_scores(d, _BM25_TERMS)
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(20)
    )


# --- q113: exact-moment Pearson correlation per group --------------------
# Moment sums stay in scale-0 integer centi-units (DECIMAL(38,0) /
# HUGEINT) so the only float conversion is a single correctly-rounded
# int -> double — bit-identical across engines, unlike casting a
# scale-4 decimal (DuckDB divides by 10^scale *after* an int128->double
# conversion: two roundings, observed 1-ulp drift). Correlation is
# invariant under the x100 scaling; covariance is rescaled by the
# exactly-representable constant 1e4 at the end.
@query(
    "q113_corr_stats",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(10,2)) * 100 AS BIGINT) AS qc,
             CAST(CAST(l_extendedprice AS DECIMAL(10,2)) * 100 AS BIGINT) AS pc
      FROM lineitem),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(qc AS HUGEINT)) AS sx,
             SUM(CAST(pc AS HUGEINT)) AS sy,
             SUM(CAST(qc * qc AS HUGEINT)) AS sxx,
             SUM(CAST(qc * pc AS HUGEINT)) AS sxy,
             SUM(CAST(pc * pc AS HUGEINT)) AS syy
      FROM c GROUP BY 1),
    d AS (
      SELECT l_returnflag, n,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov_n,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS varx_n,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vary_n
      FROM m)
    SELECT l_returnflag, n,
           cov_n / (sqrt(varx_n) * sqrt(vary_n)) AS corr_qty_price,
           cov_n / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0
             AS cov_qty_price
    FROM d
    """,
)
def q113_corr_stats(spark, sf_dir):
    from spark_etl_cli_spark.operators.util import fan_out

    li = t(spark, sf_dir, "lineitem")
    # 5 decimal(38) product-sums per row: spread the partial
    # aggregation when the scan arrives single-partition (see q01);
    # only the 3 narrow aggregation inputs cross the exchange
    c = fan_out(
        li.select(
            "l_returnflag",
            (dec(F.col("l_quantity")) * 100).cast("long").alias("qc"),
            (dec(F.col("l_extendedprice")) * 100).cast("long").alias("pc"),
        )
    )

    def isum(expr, alias):
        return F.sum(expr.cast("decimal(38,0)")).alias(alias)

    m = c.groupBy("l_returnflag").agg(
        bcount("n"),
        isum(F.col("qc"), "sx"),
        isum(F.col("pc"), "sy"),
        isum(F.col("qc") * F.col("qc"), "sxx"),
        isum(F.col("qc") * F.col("pc"), "sxy"),
        isum(F.col("pc") * F.col("pc"), "syy"),
    )
    # EXACT decimal linear combinations with ONE int->double crossing
    # per value (via VARCHAR on the DuckDB side): DuckDB's raw
    # int128->double cast rounds twice and can sit 1 ulp off the JVM's
    # correctly-rounded conversion (first caught on q139 at sf0.1)
    n_dec = F.col("n").cast("decimal(38,0)")
    cov_n = (n_dec * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx_n = (n_dec * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary_n = (n_dec * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    n_d = F.col("n").cast("double")
    return m.select(
        "l_returnflag",
        "n",
        (cov_n / (F.sqrt(varx_n) * F.sqrt(vary_n))).alias("corr_qty_price"),
        (cov_n / (n_d * n_d) / F.lit(10000.0)).alias("cov_qty_price"),
    )


# --- q114: power-of-two length buckets + padding efficiency --------------
_BUCKETS = [16, 32, 64, 128, 256, 512, 1024]


def _sql_bucket(ntok: str) -> str:
    return (
        "CASE "
        + " ".join(f"WHEN {ntok} <= {b} THEN {b}" for b in _BUCKETS)
        + " ELSE 2048 END"
    )


@query(
    "q114_length_buckets",
    oracle=f"""
    WITH d AS (SELECT {_sql_bucket(SQL_NTOK)} AS bucket, {SQL_NTOK} AS ntok
               FROM documents)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS total_tokens,
           CAST(SUM(GREATEST(bucket - ntok, 0)) AS BIGINT) AS total_pad,
           CAST(SUM(ntok) AS DOUBLE)
             / CAST(COUNT(*) * bucket AS DOUBLE) AS fill_ratio
    FROM d GROUP BY bucket
    """,
)
def q114_length_buckets(spark, sf_dir):
    from spark_etl_cli_spark.functions.text import token_count

    d = t(spark, sf_dir, "documents")
    ntok = token_count(F.col("text"))
    bucket = F.lit(2048)
    for b in reversed(_BUCKETS):
        bucket = F.when(ntok <= b, F.lit(b)).otherwise(bucket)
    agg = (
        d.select(bucket.cast("int").alias("bucket"), ntok.alias("ntok"))
        .groupBy("bucket")
        .agg(
            bcount("n_docs"),
            F.sum("ntok").cast("bigint").alias("total_tokens"),
            F.sum(F.greatest(F.col("bucket") - F.col("ntok"), F.lit(0)))
            .cast("bigint")
            .alias("total_pad"),
        )
    )
    return agg.select(
        "bucket",
        "n_docs",
        "total_tokens",
        "total_pad",
        (
            F.col("total_tokens").cast("double")
            / (F.col("n_docs") * F.col("bucket")).cast("double")
        ).alias("fill_ratio"),
    )


# --- q115: exact group quantiles via the percentile AGGREGATE -------------
# Spark's exact percentile() and DuckDB's quantile_cont() both compute
# type-7 (linear) interpolation at pos = q*(n-1); their double
# arithmetic is bit-identical on this data (verified at sf0.001/0.01/
# 0.1 for all four quantiles before switching — r6 verdict #6). The
# aggregate form gets MAP-SIDE PARTIAL aggregation: per-partition
# buffers merge across executors, so a dominant group no longer
# serializes its full sort through one window task. Raw parquet doubles
# compare bit-for-bit — no decimal casts needed.
_QUANTILES = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p95", 0.95)]


@query(
    "q115_group_quantiles",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n,
           {", ".join(f"quantile_cont(l_extendedprice, {q!r}) AS {n}" for n, q in _QUANTILES)}
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q115_group_quantiles(spark, sf_dir):
    # ONE percentile buffer via the array form — a separate
    # percentile() per quantile builds four identical per-group
    # value-count maps and merges each through the shuffle (measured
    # 3.8 s vs 1.2 s at sf0.1 under full materialization)
    li = t(spark, sf_dir, "lineitem")
    qs = F.percentile(
        F.col("l_extendedprice"),
        F.array(*[F.lit(q) for _n, q in _QUANTILES]),
    )
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), qs.alias("__qs")
    )
    return agg.select(
        "l_returnflag",
        "n",
        *[
            F.col("__qs")[i].alias(n)
            for i, (n, _q) in enumerate(_QUANTILES)
        ],
    )


# --- q116: epoch-weighted mixture upsampling ------------------------------
# "3.5 epochs of src0, 0.3 of src1, 1 of the rest": floor(w) full
# copies + an md5-bucket-gated extra copy for frac(w) of rows. No
# shuffle; the oracle replays the same integer bucket math.
_MIX_WEIGHTS = {"src0": 2.5, "src1": 0.3, "src2": 0.0}


@query(
    "q116_mixture_upsample",
    oracle=(
        lambda: __import__(
            "spark_etl_cli_spark.operators.mixture", fromlist=["epoch_upsample_sql"]
        ).epoch_upsample_sql(
            "(SELECT doc_id, source FROM documents)",
            _MIX_WEIGHTS,
            columns="doc_id, source",
        )
    )(),
)
def q116_mixture_upsample(spark, sf_dir):
    from spark_etl_cli_spark.operators.mixture import epoch_upsample

    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    return epoch_upsample(d, _MIX_WEIGHTS)


# --- q137: sparse TF-IDF cosine top-k (inverted-index retrieval) ---------
# The sparse complement of the dense ANN family: posting-list join on
# shared word-bigram terms (relative-df-capped), rational (N+1)/(df+1)
# idf, and sorted-fold norms/dots so every double — including the
# final cosine — verifies bit-for-bit. Query docs: doc_id < 10; top-5
# by (cosine, neighbor).
@query(
    "q137_tfidf_cosine_topk",
    oracle=f"""
    WITH tk AS (SELECT doc_id AS id, {SQL_TOKENS} AS tk FROM documents),
    tok AS (SELECT id, unnest(list_transform(
              generate_series(1, greatest(len(tk) - 1, 0)),
              i -> array_to_string(tk[i:i+1], ' '))) AS term
            FROM tk),
    tf AS (SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    wts AS (
      SELECT id, term,
             CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) + 1.0)
               / (CAST(df AS DOUBLE) + 1.0)) AS w
      FROM tf JOIN dfq USING (term) CROSS JOIN nd
      WHERE CAST(df AS DOUBLE) <= 0.2 * CAST(n_docs AS DOUBLE)),
    norms AS (
      SELECT id, sqrt(list_sum(list(w * w ORDER BY term))) AS nrm
      FROM wts GROUP BY id),
    dots AS (
      SELECT q.id AS query_id, c.id AS neighbor_id,
             list_sum(list(q.w * c.w ORDER BY q.term)) AS dot
      FROM wts q JOIN wts c ON q.term = c.term AND c.id <> q.id
      WHERE q.id < 10
      GROUP BY 1, 2),
    scored AS (
      SELECT d.query_id, d.neighbor_id,
             d.dot / (nq.nrm * nc.nrm) AS cosine_sim
      FROM dots d
      JOIN norms nq ON nq.id = d.query_id
      JOIN norms nc ON nc.id = d.neighbor_id)
    SELECT query_id, neighbor_id, cosine_sim, CAST(rnk AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY cosine_sim DESC, neighbor_id) AS rnk
          FROM scored)
    WHERE rnk <= 5
    """,
)
def q137_tfidf_cosine_topk(spark, sf_dir):
    from spark_etl_cli_spark.operators.retrieval import sparse_cosine_topk

    return sparse_cosine_topk(
        t(spark, sf_dir, "documents"),
        k=5,
        df_cap_frac=0.2,
        ngram=2,
        query_pred=F.col("query_id") < 10,
    )
