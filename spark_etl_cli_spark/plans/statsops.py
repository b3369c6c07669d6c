"""Statistical profiling + corpus-novelty queries (q139–q143).

Cross-engine determinism strategy (see plans/registry.py): every
aggregate that feeds a floating-point formula is computed as an EXACT
integer/decimal sum first (prices as cents, dates as day offsets), and
only the final scalar arithmetic runs in DOUBLE — identical IEEE-754
operation sequences on exact inputs produce bit-identical results in
Spark and DuckDB (sqrt is correctly rounded per IEEE; ln/exp are NOT
and never appear here). One engine quirk matters: DuckDB's
int128→double cast rounds twice and can sit 1 ulp off the JVM's
correctly-rounded conversion, so every >2^63 exact integer crosses to
double exactly once, and on the DuckDB side via VARCHAR (strtod is
correctly rounded).

Scale notes are inline per query; the common theme: aggregates shrink
to |groups| or |vocabulary| rows before any window/join, so the heavy
shuffles carry map-side-combined partials only.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.profiling import (
    equi_width_histogram,
    group_regression,
    ngram_novelty,
    vocab_coverage,
    zscore_outliers,
)
from spark_etl_cli_spark.operators.util import fan_out
from spark_etl_cli_spark.plans.registry import query, t
from spark_etl_cli_spark.plans.textops import SQL_NTOK, SQL_TOKENS

# Exact integer encodings shared by the price queries: cents as BIGINT
# (o_totalprice is a round(x, 2) double, so round(x*100) recovers the
# exact integer; never lands on a .5 tie) and order date as day offset
# from the epoch start of the synthetic data.
_SQL_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"
_SQL_DAYS = (
    "CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
    " AS BIGINT)"
)


def _cents():
    return F.round(F.col("o_totalprice") * 100).cast("long")


def _days():
    return F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    ).cast("long")


# --- q139: per-group OLS regression (closed form, exact sums) -----------
# Slope/intercept/r² of order value over time per priority class. The
# five sufficient statistics (Σx, Σy, Σxx, Σxy, Σyy) are exact integer/
# decimal sums — one map-side-combined groupBy over |groups| rows — so
# the closed-form doubles match DuckDB bit-for-bit, which float-sum
# regr_slope()/regr_r2() would not (their result depends on partition
# order). Σyy needs DECIMAL(38,0): cents² sums past int64.
@query(
    "q139_group_regression",
    oracle=f"""
    WITH b AS (
      SELECT o_orderpriority AS priority,
             {_SQL_DAYS} AS x, {_SQL_CENTS} AS y
      FROM orders
    ),
    s AS (
      SELECT priority,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM b GROUP BY 1
    ),
    d AS (
      SELECT priority, n,
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE) AS cov,
             CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS varx,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS vary,
             CAST(CAST(sy * sxx - sx * sxy AS VARCHAR) AS DOUBLE) AS inum
      FROM s
    )
    SELECT priority, n,
           CASE WHEN varx <> 0 THEN cov / varx / 100 END AS slope_per_day,
           CASE WHEN varx <> 0 THEN inum / varx / 100 END AS intercept,
           CASE WHEN varx <> 0 AND vary <> 0
                THEN (cov * cov) / (varx * vary) END AS r2
    FROM d
    """,
)
def q139_group_regression(spark, sf_dir):
    b = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        _days().alias("x"),
        _cents().alias("y"),
    )
    r = group_regression(b, "x", "y", ["priority"])
    return r.select(
        "priority",
        "n",
        (F.col("slope") / 100).alias("slope_per_day"),
        (F.col("intercept") / 100).alias("intercept"),
        "r2",
    )


# --- q140: equi-width value histogram (pure integer bucketing) ----------
# 24 × $25,000 buckets over order value; the bucket id is exact integer
# arithmetic (cents/2.5e6 is exact in double below 2^53 before floor),
# so the histogram is engine-independent. One map-side-combined groupBy
# of 24 rows — the profiling primitive that costs one scan at any SF.
@query(
    "q140_price_histogram",
    oracle=f"""
    WITH b AS (
      SELECT CAST(least(floor(CAST({_SQL_CENTS} AS DOUBLE) / 2500000),
                        23) AS INT) AS bucket
      FROM orders
    )
    SELECT bucket,
           CAST(bucket AS DOUBLE) * 25000 AS lo,
           CAST(bucket + 1 AS DOUBLE) * 25000 AS hi,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM b GROUP BY 1
    """,
)
def q140_price_histogram(spark, sf_dir):
    b = t(spark, sf_dir, "orders").select(_cents().alias("cents"))
    h = equi_width_histogram(b, "cents", lo=0.0, width=2_500_000.0, n_buckets=24)
    return h.select(
        "bucket",
        (F.col("bucket").cast("double") * 25000).alias("lo"),
        ((F.col("bucket") + 1).cast("double") * 25000).alias("hi"),
        F.col("n_rows").alias("n_orders"),
    )


# --- q141: tokenizer vocabulary coverage ---------------------------------
# "How many terms cover 95% of token occurrences?" — the vocabulary-
# sizing question every tokenizer build answers first. Token counts
# shrink the corpus to |V| rows before the single global cumulative
# window (|V| ≪ corpus; at 100 TB |V| is the only non-distributed step
# and it is millions of rows, not billions — same shape as the q77/q112
# term tables). All comparisons stay in integers (cum*100 vs 95*total).
@query(
    "q141_vocab_coverage",
    oracle=f"""
    WITH tok AS (SELECT unnest({SQL_TOKENS}) AS term FROM documents),
    tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM tok GROUP BY 1),
    c AS (
      SELECT cnt,
             SUM(cnt) OVER (ORDER BY cnt DESC, term) AS cum,
             SUM(cnt) OVER () AS total
      FROM tf
    )
    SELECT CAST(SUM(CASE WHEN cum * 100 < 95 * total THEN 1 ELSE 0 END)
                + 1 AS BIGINT) AS vocab_size,
           CAST(MIN(CASE WHEN cum * 100 >= 95 * total THEN cum END)
                AS BIGINT) AS covered_tokens,
           CAST(MAX(total) AS BIGINT) AS total_tokens
    FROM c
    """,
)
def q141_vocab_coverage(spark, sf_dir):
    return vocab_coverage(t(spark, sf_dir, "documents"), "text", pct=95)


# --- q142: z-score outliers (exact moments, broadcast stats join) -------
# Classic anomaly flag: |value - μ| > 1.6σ within the group. μ and σ
# come from exact integer/decimal sums per group (5 rows), broadcast
# back over the fact table — Spark's stddev_pop would be partition-
# order dependent; this is not. σ uses sqrt (IEEE correctly rounded).
@query(
    "q142_zscore_outliers",
    oracle=f"""
    WITH b AS (
      SELECT o_orderkey, o_orderpriority AS priority,
             o_totalprice, {_SQL_CENTS} AS y
      FROM orders
    ),
    s AS (
      SELECT priority,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(y) AS sy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM b GROUP BY 1
    ),
    d AS (
      SELECT priority, n,
             CAST(CAST(sy AS VARCHAR) AS DOUBLE) AS syd,
             CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE) AS varnum
      FROM s
    )
    SELECT o_orderkey, b.priority, o_totalprice,
           (CAST(y AS DOUBLE) - syd / CAST(n AS DOUBLE))
             / sqrt(varnum / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS z
    FROM b JOIN d ON b.priority = d.priority
    WHERE abs((CAST(y AS DOUBLE) - syd / CAST(n AS DOUBLE))
              / sqrt(varnum / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) > 1.6
    """,
)
def q142_zscore_outliers(spark, sf_dir):
    b = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        "o_totalprice",
        _cents().alias("y"),
    )
    return zscore_outliers(b, "y", ["priority"], threshold=1.6).select(
        "o_orderkey", "priority", "o_totalprice", "z"
    )


# --- q143: n-gram novelty per document -----------------------------------
# Memorization/near-dup signal used in corpus audits: the share of a
# document's distinct 3-word shingles whose FIRST occurrence (min
# doc_id) is this document. Two shuffles: shingle → min(doc_id), then
# the shingle-keyed join back (both map-side combined / AQE-skew-safe);
# everything after is per-doc integer counts and one double division.
# At 100 TB the join key would be xxhash64(shingle) (16-byte payloads)
# rather than the raw shingle string — kept as the string here so the
# oracle replays byte-for-byte.
@query(
    "q143_ngram_novelty",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(tk) - 2, 0)),
               i -> array_to_string(tk[i:i+2], ' '))) AS s
      FROM (SELECT doc_id, {SQL_TOKENS} AS tk FROM documents)
    ),
    ex AS (SELECT id, unnest(s) AS shingle FROM sh),
    first AS (SELECT shingle, MIN(id) AS first_id FROM ex GROUP BY 1)
    SELECT ex.id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN first_id = ex.id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN first_id = ex.id THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM ex JOIN first ON ex.shingle = first.shingle
    GROUP BY 1
    """,
)
def q143_ngram_novelty(spark, sf_dir):
    return ngram_novelty(
        t(spark, sf_dir, "documents"), id_col="doc_id", text_col="text", k=3
    )


# --- q144: k-anonymity audit ---------------------------------------------
# Privacy pre-release check: quasi-identifier equivalence classes with
# fewer than k members. One map-side-combined groupBy; output bounded
# by |QI combinations|.
@query(
    "q144_k_anonymity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY 1, 2
    HAVING COUNT(*) < 8
    """,
)
def q144_k_anonymity(spark, sf_dir):
    from spark_etl_cli_spark.operators.profiling import k_anonymity

    return k_anonymity(
        t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=8
    )


# --- q145: count-min-sketch heavy hitters --------------------------------
# The sketch operator class: a depth×width counter table whose size is
# INDEPENDENT of corpus size (the 100 TB story — term frequency
# estimation when |V| doesn't fit anywhere), built with one map-side-
# combined groupBy over the 4-fanned token stream. Estimates are
# min-over-rows probes. Hashes are the salted-md5 family, so the
# DuckDB twin rebuilds the bit-identical sketch; the exact top-50
# candidates ride along to expose the (always ≥ 0) overestimate.
@query(
    "q145_cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({SQL_TOKENS}) AS term FROM documents),
    ent AS (
      SELECT term, i AS row,
             CAST(('0x' || substr(md5(term || '#' || CAST(i AS VARCHAR)),
                                  1, 15)) AS BIGINT) % 1024 AS bucket
      FROM tok CROSS JOIN generate_series(0, 3) AS g(i)
    ),
    sketch AS (SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS counter
               FROM ent GROUP BY 1, 2),
    tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM tok GROUP BY 1),
    cand AS (SELECT term, cnt FROM tf ORDER BY cnt DESC, term LIMIT 50),
    probe AS (
      SELECT c.term, c.cnt, i AS row,
             CAST(('0x' || substr(md5(c.term || '#' || CAST(i AS VARCHAR)),
                                  1, 15)) AS BIGINT) % 1024 AS bucket
      FROM cand c CROSS JOIN generate_series(0, 3) AS g(i)
    )
    SELECT p.term, p.cnt AS exact_cnt,
           CAST(MIN(s.counter) AS BIGINT) AS est_cnt
    FROM probe p JOIN sketch s ON p.row = s.row AND p.bucket = s.bucket
    GROUP BY 1, 2
    """,
)
def q145_cms_heavy_hitters(spark, sf_dir):
    from spark_etl_cli_spark.functions.text import tokens
    from spark_etl_cli_spark.operators.profiling import (
        cms_estimate,
        count_min_sketch,
    )

    # the token stream feeds TWO branches (sketch build + exact
    # candidates); materialize the tokenize+explode once instead of
    # re-scanning the corpus per branch (same reuse rationale as the
    # triangle-count edge checkpoint)
    tok = fan_out(t(spark, sf_dir, "documents")).select(
        F.explode(tokens(F.col("text"))).alias("term")
    ).localCheckpoint()
    sketch = count_min_sketch(tok, "term", depth=4, width=1024)
    cand = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "term")
        .limit(50)
    )
    return cms_estimate(sketch, cand, "term", depth=4, width=1024)


# --- q151: degree-distribution power-law fit ------------------------------
# Operator composition: integer-log2 bucketing (length(bin(d))-1 — a
# STRING-length computation, not libm log2, so it is deterministic on
# both engines) feeding the exact-sum OLS operator. Estimates the
# power-law exponent of the orders-per-customer distribution — the
# check that decides whether a key needs skew handling before a join.
# All regression inputs are tiny integers (< 2^53), so the plain
# double casts are exact on both engines.
@query(
    "q151_degree_powerlaw",
    oracle="""
    WITH deg AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS d
                 FROM orders GROUP BY 1),
    b AS (SELECT CAST(length(bin(d)) - 1 AS BIGINT) AS x FROM deg),
    h AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
    pts AS (SELECT x, CAST(length(bin(c)) - 1 AS BIGINT) AS y FROM h),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy,
             SUM(CAST(y AS HUGEINT) * y) AS syy
      FROM pts
    ),
    d AS (
      SELECT n,
             CAST(n * sxy - sx * sy AS DOUBLE) AS cov,
             CAST(n * sxx - sx * sx AS DOUBLE) AS varx,
             CAST(n * syy - sy * sy AS DOUBLE) AS vary,
             CAST(sy * sxx - sx * sxy AS DOUBLE) AS inum
      FROM s
    )
    SELECT n AS n_buckets,
           CASE WHEN varx <> 0 THEN cov / varx END AS slope,
           CASE WHEN varx <> 0 THEN inum / varx END AS intercept,
           CASE WHEN varx <> 0 AND vary <> 0
                THEN (cov * cov) / (varx * vary) END AS r2
    FROM d
    """,
)
def q151_degree_powerlaw(spark, sf_dir):
    from spark_etl_cli_spark.operators.profiling import group_regression

    deg = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    pts = (
        deg.select(
            (F.length(F.bin(F.col("d"))) - 1).cast("long").alias("x")
        )
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            "x",
            (F.length(F.bin(F.col("c"))) - 1).cast("long").alias("y"),
        )
        .withColumn("g", F.lit("all"))
    )
    return group_regression(pts, "x", "y", ["g"]).select(
        F.col("n").alias("n_buckets"), "slope", "intercept", "r2"
    )


# --- q158: MAD-based robust outliers ------------------------------------
# Median-absolute-deviation outliers per language — the robust sibling
# of q142's z-score (immune to the outliers it hunts). Both medians use
# the exact interpolating aggregate (Spark percentile / DuckDB
# quantile_cont): on bigint inputs the interpolated value is k or k+0.5
# — exactly representable in a double on both engines, so the compare
# stays bit-exact while the plan gets MAP-SIDE PARTIAL aggregation
# instead of a single-task-per-group rank sort (r6 verdict #6: a
# dominant language no longer serializes its whole group through one
# window task). Threshold is 2×MAD — 3×MAD never fires on the fixture
# (r6 demerit: vacuous 0-row oracle pass); 2× yields rows at both
# sf0.01 and sf0.1. Two broadcast-size joins (one row per language).
@query(
    "q158_mad_outliers",
    oracle="""
    WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
    med AS (
      SELECT lang, quantile_cont(n_chars, 0.5) AS med FROM d GROUP BY lang
    ),
    dev AS (
      SELECT d.doc_id, d.lang, d.n_chars, med.med,
             ABS(d.n_chars - med.med) AS adev
      FROM d JOIN med USING (lang)
    ),
    mad AS (
      SELECT lang, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY lang
    )
    SELECT doc_id, dev.lang, n_chars, dev.med, mad.mad
    FROM dev JOIN mad USING (lang)
    WHERE adev > 2 * mad.mad
    """,
)
def q158_mad_outliers(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    med = d.groupBy("lang").agg(
        F.percentile(F.col("n_chars"), F.lit(0.5)).alias("med")
    )
    dev = d.join(F.broadcast(med), "lang").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("lang").agg(
        F.percentile(F.col("adev"), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "lang")
        .filter(F.col("adev") > 2 * F.col("mad"))
        .select("doc_id", "lang", "n_chars", "med", "mad")
    )


# --- q161: weighted median ------------------------------------------------
# Token-weighted lower median of document length per source: the
# smallest n_chars value v whose cumulative token weight reaches half
# the source's total — corpus reporting where long documents should
# count by their token mass, not once each. No engine has an exact
# weighted-median aggregate, so BOTH sides spell out the same rank
# arithmetic: one cumulative-sum window ordered (v, doc_id) with an
# explicit ROWS frame, crossing row selected by MIN(CASE...). The
# selected VALUE is tie-order-immune (any order within equal v crosses
# at the same v). Entirely integer: weights are bigint token counts.
@query(
    "q161_weighted_median",
    oracle=f"""
    WITH d AS (
      SELECT source, doc_id, n_chars AS v, {SQL_NTOK} AS w
      FROM documents
    ),
    c AS (
      SELECT source, v, w,
             SUM(w) OVER (PARTITION BY source ORDER BY v, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(w) OVER (PARTITION BY source) AS tw
      FROM d
    )
    SELECT source,
           CAST(MIN(CASE WHEN 2 * cum >= tw THEN v END) AS BIGINT)
             AS wmedian,
           CAST(MAX(tw) AS BIGINT) AS total_w
    FROM c GROUP BY source
    """,
)
def q161_weighted_median(spark, sf_dir):
    from pyspark.sql import Window as W

    from spark_etl_cli_spark.functions.text import token_count

    d = t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.col("n_chars").alias("v"),
        token_count(F.col("text")).alias("w"),
    )
    wc = (
        W.partitionBy("source")
        .orderBy("v", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("source")
    c = d.select(
        "source",
        "v",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wall).alias("tw"),
    )
    return c.groupBy("source").agg(
        F.min(F.when(2 * F.col("cum") >= F.col("tw"), F.col("v")))
        .cast("bigint")
        .alias("wmedian"),
        F.max("tw").cast("bigint").alias("total_w"),
    )


# --- q162: decile profile via ntile ----------------------------------------
# Customer account-balance deciles: ntile(10) over a DETERMINISTIC
# total order (balance, custkey) — both engines define ntile
# identically (equal buckets, earlier buckets take the remainder), so
# bucket membership is bit-stable. The ORACLE spells it as a literal
# ntile window; the Spark plan computes the SAME bucket membership via
# a two-phase distributed rank (a naive ntile here would sort the
# entire customer table through ONE window task — Spark's "No
# Partition Defined" warning, the q99 single-task shape):
#   1. coarse-bucket each row by floor(c_acctbal) — account balances
#      live in a fixed value DOMAIN (TPC-H: [-999.99, 9999.99]), so
#      there are ≤11k coarse buckets regardless of row count;
#   2. per-bucket counts → exclusive prefix offsets + the grand total
#      via one window over the ≤11k-row bucket table (the only
#      unpartitioned window, domain-bounded — plan-invariant
#      whitelisted as a bounded collapse);
#   3. global rank = broadcast-joined bucket offset + row_number
#      PARTITIONED by bucket (distributed; TPC-H balances are uniform
#      so buckets are even — a skewed domain would want finer coarse
#      keys);
#   4. decile from the closed-form ntile formula on (rank, n): with
#      q = n div 10, r = n mod 10 the first r buckets take q+1 rows.
# Net: one hash shuffle on the coarse key instead of a global sort
# through a single task; survives 100× because every per-bucket
# partition stays ~n/11k.
@query(
    "q162_ntile_deciles",
    oracle="""
    WITH r AS (
      SELECT c_acctbal,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
             ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(c_acctbal) AS lo,
           MAX(c_acctbal) AS hi,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM r GROUP BY decile
    """,
)
def q162_ntile_deciles(spark, sf_dir):
    from pyspark.sql import Window as W

    c = t(spark, sf_dir, "customer").select(
        "c_acctbal",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        "c_custkey",
        F.floor("c_acctbal").cast("long").alias("coarse"),
    )
    ctot = c.groupBy("coarse").agg(
        F.count(F.lit(1)).cast("long").alias("ccnt")
    )
    wpre = W.orderBy("coarse").rowsBetween(W.unboundedPreceding, -1)
    wall = W.orderBy("coarse").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    offs = ctot.select(
        "coarse",
        F.coalesce(F.sum("ccnt").over(wpre), F.lit(0)).alias("coff"),
        F.sum("ccnt").over(wall).alias("n_total"),
    )
    wb = W.partitionBy("coarse").orderBy("c_acctbal", "c_custkey")
    ranked = c.join(F.broadcast(offs), "coarse").select(
        "c_acctbal",
        "cents",
        (F.col("coff") + F.row_number().over(wb)).alias("rk"),
        "n_total",
    )
    n = F.col("n_total")
    q10 = F.floor(n / 10)
    r10 = n % 10
    rk = F.col("rk")
    fat = r10 * (q10 + 1)  # rows covered by the first r (larger) buckets
    r = ranked.select(
        "c_acctbal",
        "cents",
        F.when(rk <= fat, F.floor((rk - 1) / (q10 + 1)) + 1)
        .otherwise(r10 + F.floor((rk - fat - 1) / q10) + 1)
        .cast("int")
        .alias("decile"),
    )
    return r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("c_acctbal").alias("lo"),
        F.max("c_acctbal").alias("hi"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


# --- q163: token-distribution Gini coefficient ------------------------------
# Corpus diversity per language: Gini over term frequencies, the
# "is this source one template repeated?" signal. Exact-integer rank
# formula G = (2*Σ(rank*cnt) - (n+1)*Σcnt) / (n*Σcnt) with ranks from
# a deterministic (cnt, term) order; every accumulation is a bigint
# sum over the |vocabulary|-sized term table (map-side combined), and
# the single double division at the end is bit-identical on both
# engines because its integer inputs are exact and < 2^53.
@query(
    "q163_token_gini",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({SQL_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY lang, term
    ),
    r AS (
      SELECT lang, cnt,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt, term)
               AS rnk
      FROM tf
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(cnt) AS BIGINT) AS total_tokens,
           CAST(2 * SUM(rnk * cnt) - (COUNT(*) + 1) * SUM(cnt) AS DOUBLE)
             / CAST(COUNT(*) * SUM(cnt) AS DOUBLE) AS gini
    FROM r GROUP BY lang
    """,
)
def q163_token_gini(spark, sf_dir):
    from pyspark.sql import Window as W

    from spark_etl_cli_spark.functions.text import tokens

    tok = t(spark, sf_dir, "documents").select(
        "lang", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    r = tf.select(
        "lang",
        "cnt",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("cnt", "term"))
        .alias("rnk"),
    )
    return r.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.sum("cnt").cast("bigint").alias("total_tokens"),
        (
            (
                2 * F.sum(F.col("rnk") * F.col("cnt"))
                - (F.count(F.lit(1)) + 1) * F.sum("cnt")
            ).cast("double")
            / (F.count(F.lit(1)) * F.sum("cnt")).cast("double")
        ).alias("gini"),
    )


# --- q169: l-diversity audit ---------------------------------------------
# k-anonymity's blind spot: a group can be large (k-safe) yet carry ONE
# sensitive value — membership alone leaks it (Machanavajjhala et al.
# ICDE'06). The audit reports every quasi-identifier group whose
# sensitive-attribute diversity l = |distinct sensitive| falls below
# the policy floor, with its size (big k + small l = the dangerous
# quadrant). Sensitive attribute here: the customer's account-balance
# band. One hash aggregation with a partial-merge distinct — the same
# map-side-combined shape as q144, no joins, linear at any corpus
# size; groups stream out, never a per-group sort.
@query(
    "q169_l_diversity",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT))
                AS BIGINT) AS l_distinct
    FROM customer
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT CAST(floor(c_acctbal / 2000.0) AS BIGINT)) < 4
    """,
)
def q169_l_diversity(spark, sf_dir):
    band = F.floor(F.col("c_acctbal") / 2000.0).cast("bigint")
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.countDistinct(band).cast("bigint").alias("l_distinct"),
        )
        .filter(F.col("l_distinct") < 4)
    )


# --- q183: one-vs-rest KS drift per source ------------------------------
# Distribution-drift monitor: for each source, the exact two-sample
# Kolmogorov–Smirnov statistic of its doc-length (n_chars)
# distribution against the REST of the corpus — the alarm that a
# crawler/feed started emitting structurally different documents.
# Exact integer arithmetic throughout: at every observed length x the
# step functions' gap is |cum_s·n_rest − cum_rest·n_s| (cross-
# multiplied, no division), maxed per source, divided once at the end.
# Plan: the corpus collapses to |distinct lengths| × |sources| grid
# rows (both factors bounded: lengths are data-bounded ints, sources
# are an enumerable dimension); the grid is |lengths| BROADCAST-
# expanded by the tiny source list — no row-level shuffle survives
# the first aggregation. The per-source cumulative runs partitioned
# by source; the global cumulative runs over |lengths| rows.
@query(
    "q183_ks_drift",
    oracle="""
    WITH cnt AS (
      SELECT source, n_chars AS x, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY 1, 2
    ),
    xs AS (SELECT DISTINCT x FROM cnt),
    srcs AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
             FROM cnt GROUP BY 1),
    gx AS (
      SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM cnt GROUP BY 1
    ),
    gcum AS (
      SELECT x, SUM(cx) OVER (ORDER BY x
               ROWS UNBOUNDED PRECEDING) AS cum_g
      FROM gx
    ),
    grid AS (
      SELECT s.source, s.n_s, xs.x, COALESCE(cnt.c, 0) AS c
      FROM srcs s CROSS JOIN xs
      LEFT JOIN cnt ON cnt.source = s.source AND cnt.x = xs.x
    ),
    scum AS (
      SELECT source, n_s, x,
             SUM(c) OVER (PARTITION BY source ORDER BY x
                  ROWS UNBOUNDED PRECEDING) AS cum_s
      FROM grid
    ),
    gaps AS (
      SELECT s.source, s.n_s,
             (SELECT MAX(cum_g) FROM gcum) AS n_tot,
             abs(s.cum_s * ((SELECT MAX(cum_g) FROM gcum) - s.n_s)
                 - (g.cum_g - s.cum_s) * s.n_s) AS num
      FROM scum s JOIN gcum g ON s.x = g.x
    )
    SELECT source,
           CAST(MIN(n_s) AS BIGINT) AS n_docs,
           CAST(MAX(num) AS BIGINT) AS ks_numerator,
           CAST(MAX(num) AS DOUBLE)
             / CAST(MIN(n_s) * (MIN(n_tot) - MIN(n_s)) AS DOUBLE) AS ks
    FROM gaps GROUP BY source
    """,
)
def q183_ks_drift(spark, sf_dir):
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    cnt = (
        d.groupBy("source", F.col("n_chars").alias("x"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    xs = cnt.select("x").distinct()
    srcs = cnt.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_s")
    )
    gx = cnt.groupBy("x").agg(F.sum("c").cast("bigint").alias("cx"))
    gcum = gx.select(
        "x",
        F.sum("cx")
        .over(W.orderBy("x").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum_g"),
    )
    grid = (
        xs.crossJoin(F.broadcast(srcs))
        .join(cnt, ["source", "x"], "left")
        .select("source", "n_s", "x", F.coalesce("c", F.lit(0)).alias("c"))
    )
    scum = grid.select(
        "source",
        "n_s",
        "x",
        F.sum("c")
        .over(
            W.partitionBy("source").orderBy("x")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .alias("cum_s"),
    )
    n_tot = gcum.agg(F.max("cum_g").cast("bigint").alias("n_tot"))
    gaps = (
        scum.join(gcum, "x")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "source",
            "n_s",
            "n_tot",
            F.abs(
                F.col("cum_s") * (F.col("n_tot") - F.col("n_s"))
                - (F.col("cum_g") - F.col("cum_s")) * F.col("n_s")
            ).alias("num"),
        )
    )
    return gaps.groupBy("source").agg(
        F.min("n_s").cast("bigint").alias("n_docs"),
        F.max("num").cast("bigint").alias("ks_numerator"),
        (
            F.max("num").cast("double")
            / (F.min("n_s") * (F.min("n_tot") - F.min("n_s"))).cast("double")
        ).alias("ks"),
    )


# --- q187: corpus-balance chi-square (lang × source) --------------------
# Is language independent of source, or do some feeds skew? The χ²
# statistic over the lang×source contingency table via the
# zero-cell-free identity χ² = n·(Σ o²⁄(r·c) − 1) — absent cells
# contribute 0, so ONLY observed cells are enumerated (no grid
# expansion, no scalar crossJoin: n = Σo inside the same final
# aggregate). Each cell's o², r·c are exact BIGINTs; the single
# correctly-rounded division is floored to micro-units before the
# exact integer sum, so the statistic is bit-identical across engines
# and row orders. Plan: one groupBy to |cells| rows, two broadcast
# marginal joins, one 1-row aggregate.
@query(
    "q187_chi2_balance",
    oracle="""
    WITH obs AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    r AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
    c AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
    cells AS (
      SELECT obs.o,
             CAST(floor(CAST(obs.o * obs.o AS DOUBLE) * 1000000
                        / CAST(r.rt * c.ct AS DOUBLE)) AS BIGINT) AS term,
             obs.lang, obs.source
      FROM obs JOIN r USING (lang) JOIN c USING (source)
    )
    SELECT CAST(SUM(o) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((COUNT(DISTINCT lang) - 1)
                * (COUNT(DISTINCT source) - 1) AS BIGINT) AS dof,
           CAST(SUM(o) * (SUM(term) - 1000000) AS BIGINT) AS chi2_micro
    FROM cells
    """,
)
def q187_chi2_balance(spark, sf_dir):
    obs = (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    r = obs.groupBy("lang").agg(F.sum("o").cast("bigint").alias("rt"))
    c = obs.groupBy("source").agg(F.sum("o").cast("bigint").alias("ct"))
    cells = (
        obs.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .select(
            "lang",
            "source",
            "o",
            F.floor(
                (F.col("o") * F.col("o")).cast("double")
                * 1000000
                / (F.col("rt") * F.col("ct")).cast("double")
            )
            .cast("bigint")
            .alias("term"),
        )
    )
    return cells.agg(
        F.sum("o").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        (
            (F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1)
        )
        .cast("bigint")
        .alias("dof"),
        (F.sum("o") * (F.sum("term") - 1000000)).cast("bigint").alias(
            "chi2_micro"
        ),
    )
