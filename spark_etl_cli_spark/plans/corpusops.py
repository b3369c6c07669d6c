"""Corpus-curation query coverage: the operations a large-scale
training-data pipeline runs between raw crawl and tokenizer.

Covered here (extending textops.py's dedup/fingerprint family):

- **q47** near-dup *clustering*: LSH/Jaccard emits pairs; connected
  components (operators/dedup.py) turns pairs into dup groups — the
  step that makes "keep one survivor per group" well-defined. Oracle
  is a DuckDB ``WITH RECURSIVE`` reachability query.
- **q48** deterministic stratified sampling: md5-bucket per doc,
  per-source sampling rate — reproducible (re-runs select the same
  rows), shuffle-free, and exactly replicated by the oracle.
- **q49** quality-filter funnel (Gopher/C4-style): successive
  length / punctuation / stopword gates with per-source survivor
  counts at each stage.
- **q76** PII redaction: regex e-mail/phone scrub with per-doc
  redaction counts (PII is injected deterministically first — the
  synthetic corpus has none).
- **q77** per-source top terms (stopword-filtered term frequencies,
  windowed top-k).
- **q78** term rarity: tf x corpus-size / document-frequency scoring,
  most-distinctive term per document (tf-idf shape with exact
  integer-ratio arithmetic so the oracle hash-matches).
- **q79** batch sessionization of the events stream (gap-based, the
  batch twin of streaming q52).

All pure built-in-function plans: one shuffle per groupBy/window, no
Python UDFs, no driver-side data movement (q47's convergence loop
moves only a changed-row count per round).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from spark_etl_cli_spark.functions.text import (
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
)
from spark_etl_cli_spark.operators.dedup import (
    connected_components,
    shingle_pairs_jaccard,
)
from spark_etl_cli_spark.operators.util import fan_out
from spark_etl_cli_spark.plans.registry import bcount, events, query, t
from spark_etl_cli_spark.plans.textops import (
    _STOPWORDS,
    SQL_DOCS_WITH_DUPS,
    SQL_NTOK,
    SQL_PUNCT,
    SQL_SW,
    SQL_TOKENS,
    docs_with_dups,
)

STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it"]

# q47 caps the corpus at doc_id < 2000 (full corpus at sf<=0.01) so the
# quadratic-ish shingle self-join stays bounded in the bench; the
# components algorithm itself is linear per round.
_Q47_CAP = 2000

# --- q47: near-dup clusters via connected components --------------------
# Spark side: shingle-Jaccard pairs -> iterative min-label propagation.
# DuckDB side: the same pair query + WITH RECURSIVE reachability, so
# the oracle verifies the clustering itself, not just row counts.
_Q47_PAIRS = f"""
    sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(tk) - 2, 0)),
               i -> array_to_string(tk[i:i+2], ' '))) AS s
      FROM (SELECT doc_id, {SQL_TOKENS} AS tk FROM documents
            WHERE doc_id < {_Q47_CAP})
    ),
    ex0 AS (SELECT id, unnest(s) AS shingle FROM sh),
    freq AS (SELECT shingle, COUNT(*) AS df FROM ex0 GROUP BY 1),
    ex AS (SELECT id, ex0.shingle FROM ex0
           JOIN freq ON ex0.shingle = freq.shingle AND freq.df <= 1000),
    co AS (
      SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2
    ),
    sz AS (SELECT id, len(s) AS n FROM sh),
    pairs AS (
      SELECT id_a, id_b
      FROM co JOIN sz sa ON id_a = sa.id JOIN sz sb ON id_b = sb.id
      WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE)
            >= 0.5
    )
"""


@query(
    "q47_dup_components",
    oracle=f"""
    WITH RECURSIVE {_Q47_PAIRS},
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, edges.dst
      FROM reach JOIN edges ON edges.src = reach.r
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(MIN(r) AS BIGINT) AS component
    FROM reach GROUP BY id
    """,
)
def q47_dup_components(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < _Q47_CAP)
    pairs = shingle_pairs_jaccard(
        docs, k=3, threshold=0.5, max_shingle_freq=1000
    )
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    comps = connected_components(edges)
    return comps.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("component").cast("bigint").alias("component"),
    )


# --- q48: deterministic stratified sampling ------------------------------
# Bucket = first 8 hex digits of md5(doc_id) mod 100; keep when bucket
# < the source's rate. Hash-gated sampling is the scale idiom: no
# shuffle, no RNG state, identical selection on re-runs and across
# engines (vs. Bernoulli sample(), which is neither reproducible
# cross-engine nor stable under repartitioning).
_SQL_BUCKET = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100"
)
_SQL_RATE = "5 * (1 + CAST(substr(source, 4) AS INT) % 10)"


@query(
    "q48_stratified_sample",
    oracle=f"""
    SELECT doc_id, source, CAST({_SQL_BUCKET} AS BIGINT) AS bucket
    FROM documents
    WHERE {_SQL_BUCKET} < {_SQL_RATE}
    """,
)
def q48_stratified_sample(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.lit(5) * (
        F.lit(1) + F.substring("source", 4, 8).cast("int") % 10
    )
    return (
        d.withColumn("bucket", bucket)
        .filter(F.col("bucket") < rate)
        .select("doc_id", "source", "bucket")
    )


# --- q49: quality-filter funnel (Gopher/C4-style gates) ------------------
# Each stage is the previous stage AND one more gate; per-source counts
# show where documents die. One map-side-combined aggregation.
@query(
    "q49_quality_funnel",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN {SQL_NTOK} BETWEEN 5 AND 1000
                THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
           CAST(SUM(CASE WHEN {SQL_NTOK} BETWEEN 5 AND 1000
                     AND {SQL_PUNCT} <= 0.3
                THEN 1 ELSE 0 END) AS BIGINT) AS n_punct_ok,
           CAST(SUM(CASE WHEN {SQL_NTOK} BETWEEN 5 AND 1000
                     AND {SQL_PUNCT} <= 0.3 AND {SQL_SW} >= 0.01
                THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
    FROM documents
    GROUP BY source
    """,
)
def q49_quality_funnel(spark, sf_dir):
    d = fan_out(t(spark, sf_dir, "documents"))
    txt = F.col("text")
    len_ok = token_count(txt).between(5, 1000)
    punct_ok = len_ok & (punct_ratio(txt) <= 0.3)
    quality = punct_ok & (stopword_ratio(txt) >= 0.01)

    def gate(cond, alias):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(alias)

    return d.groupBy("source").agg(
        bcount("n_total"),
        gate(len_ok, "n_len_ok"),
        gate(punct_ok, "n_punct_ok"),
        gate(quality, "n_quality"),
    )


# --- q76: PII redaction ---------------------------------------------------
# The corpus carries no PII, so a deterministic injector appends
# synthetic e-mail/phone strings first; the scrubber then counts and
# replaces them. Regexes are chosen to parse identically under Java
# regex (Spark) and RE2 (DuckDB).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"
_SQL_PII_TEXT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' and admin@example.org' ELSE '' END"
    " || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@query(
    "q76_pii_redaction",
    oracle=f"""
    WITH pii AS (SELECT doc_id, {_SQL_PII_TEXT} AS txt FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(txt, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(length(regexp_replace(regexp_replace(
                 txt, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                 '{_PHONE_RE}', '[PHONE]', 'g')) AS BIGINT)
             AS redacted_len
    FROM pii
    """,
)
def q76_pii_redaction(spark, sf_dir):
    d = fan_out(t(spark, sf_dir, "documents"))
    txt = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" and admin@example.org"))
        .otherwise(F.lit("")),
        F.lit(" call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(txt, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    return d.select(
        "doc_id",
        F.regexp_count(txt, F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(txt, F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
    )


# --- q77: per-source top terms -------------------------------------------
# explode -> stopword filter -> (source, token) count -> windowed top-5.
# The token-count agg is map-side combined; the window partitions by
# source, so the final shuffle carries only distinct (source, token).
@query(
    "q77_top_terms",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({SQL_TOKENS}) AS token
                 FROM documents),
    f AS (SELECT source, token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok WHERE token NOT IN ({_STOPWORDS}) GROUP BY 1, 2),
    r AS (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY cnt DESC, token) AS rk FROM f)
    SELECT source, token, cnt, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 5
    """,
)
def q77_top_terms(spark, sf_dir):
    d = fan_out(t(spark, sf_dir, "documents"))
    tok = d.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    ).filter(~F.col("token").isin(STOPWORDS))
    counts = tok.groupBy("source", "token").agg(bcount("cnt"))
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("token")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "token", "cnt", F.col("rk").cast("int").alias("rk"))
    )


# --- q78: most-distinctive term per document (tf-idf shape) --------------
# rarity = tf * n_docs / df: integer products and one double division,
# so the score is bit-identical across engines (unlike log-based idf).
@query(
    "q78_term_rarity",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({SQL_TOKENS}) AS token
                 FROM documents),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    s AS (SELECT doc_id, token,
                 CAST(tf * n_docs AS DOUBLE) / CAST(df AS DOUBLE) AS rarity
          FROM tf JOIN df USING (token) CROSS JOIN nd)
    SELECT doc_id, token, rarity
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY rarity DESC, token) AS rk FROM s)
    WHERE rk = 1
    """,
)
def q78_term_rarity(spark, sf_dir):
    d = fan_out(t(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(bcount("tf"))
    df = tf.groupBy("token").agg(bcount("df"))
    nd = d.agg(bcount("n_docs"))
    s = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            (
                (F.col("tf") * F.col("n_docs")).cast("double")
                / F.col("df").cast("double")
            ).alias("rarity"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("rarity").desc(), F.col("token")
    )
    return (
        s.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "token", "rarity")
    )


# --- q79: batch sessionization of the event stream -----------------------
# Gap-based sessions (10 min) via lag + running sum — the batch twin of
# streaming q52 (same oracle family), plus per-session dwell time.
@query(
    "q79_batch_sessions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN ts >= lag(ts) OVER w + INTERVAL 10 MINUTE THEN 1
                  ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM o
    )
    SELECT user_id,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT)
             AS duration_s
    FROM g GROUP BY user_id, grp
    """,
)
def q79_batch_sessions(spark, sf_dir):
    ev = events(spark, sf_dir).select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts") >= F.lag("ts").over(w) + F.expr("INTERVAL 10 MINUTES")),
        1,
    ).otherwise(0)
    grp = F.sum(brk).over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    epoch = F.unix_timestamp("ts").cast("bigint")
    return (
        ev.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(
            F.min(epoch).alias("session_start"),
            bcount("n_events"),
            (F.max(epoch) - F.min(epoch)).cast("bigint").alias("duration_s"),
        )
        .select("user_id", "session_start", "n_events", "duration_s")
    )


# --- q117: hourly OHLC bars (time-series downsampling) -------------------
# One window sort per (user, hour) yields rank + count; open/close are
# conditional-agg picks at rn=1 / rn=cnt (no arithmetic on the doubles,
# so values are exact bit-copies in both engines). rn_desc is derived
# from the count instead of a second opposite-order window — a single
# sort, which is the shape that matters when a day of ticks is 100 GB.
@query(
    "q117_ohlc_bars",
    oracle="""
    WITH r AS (
      SELECT user_id,
             CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour,
             value,
             ROW_NUMBER() OVER w AS rn,
             COUNT(*) OVER (PARTITION BY user_id,
                            date_trunc('hour', ts)) AS cnt
      FROM events
      WINDOW w AS (PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts, event_id))
    SELECT user_id, hour,
           MAX(CASE WHEN rn = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn = cnt THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks
    FROM r GROUP BY 1, 2
    """,
)
def q117_ohlc_bars(spark, sf_dir):
    ev = events(spark, sf_dir).select("user_id", "event_id", "ts", "value")
    hour_ts = F.date_trunc("hour", F.col("ts"))
    w = Window.partitionBy("user_id", hour_ts).orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id", hour_ts)
    r = ev.select(
        "user_id",
        F.unix_timestamp(hour_ts).cast("bigint").alias("hour"),
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("cnt"),
    )
    return r.groupBy("user_id", "hour").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn") == F.col("cnt"), F.col("value"))).alias("close"),
        bcount("n_ticks"),
    )


# --- q118: cross-document boilerplate span detection ---------------------
# C4/CCNet-style hygiene: split each doc into non-overlapping 10-token
# chunks, hash them, and count how many of a doc's chunks also appear
# in other documents. Only 64-bit hash prefixes shuffle; the noised
# duplicate corpus guarantees observable boilerplate (normalization
# makes copies chunk-identical).
_CHUNK_W = 10


@query(
    "q118_boilerplate_chunks",
    oracle=f"""
    WITH docs AS ({SQL_DOCS_WITH_DUPS}),
    ch AS (
      SELECT doc_id,
             substr(md5(array_to_string(tk[i : i + {_CHUNK_W - 1}], ' ')),
                    1, 16) AS h
      FROM (SELECT doc_id, {SQL_TOKENS} AS tk FROM docs),
           UNNEST(generate_series(1, len(tk) - {_CHUNK_W - 1}, {_CHUNK_W}))
             AS s(i)),
    freq AS (
      SELECT h, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
      FROM ch GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate
    FROM ch JOIN freq USING (h)
    GROUP BY 1
    """,
)
def q118_boilerplate_chunks(spark, sf_dir):
    from spark_etl_cli_spark.functions.text import tokens

    d = fan_out(docs_with_dups(spark, sf_dir))
    tk = tokens(F.col("text"))
    grams = F.element_at(
        F.transform(
            F.array(tk),
            lambda a: F.when(
                F.size(a) >= _CHUNK_W,
                F.transform(
                    F.sequence(
                        F.lit(1), F.size(a) - F.lit(_CHUNK_W - 1), F.lit(_CHUNK_W)
                    ),
                    lambda i: F.substring(
                        F.md5(F.concat_ws(" ", F.slice(a, i, _CHUNK_W))), 1, 16
                    ),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
        1,
    )
    ch = d.select("doc_id", F.explode(grams).alias("h"))
    freq = ch.groupBy("h").agg(
        F.count_distinct("doc_id").cast("bigint").alias("nd")
    )
    return (
        ch.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            bcount("n_chunks"),
            F.sum((F.col("nd") >= 2).cast("int"))
            .cast("bigint")
            .alias("n_boilerplate"),
        )
    )


# --- q179: top-p (nucleus) vocabulary truncation ----------------------------
# Tokenizer-sizing curve, per source: how many distinct tokens does it
# take to cover ≥90% of that source's token OCCURRENCES? The companion
# to q141's fixed-vocab coverage — this one derives the vocab size from
# a coverage target. All-integer: per-(source, token) counts, a
# per-source rank/cumsum window ordered by (count DESC, token) — a
# TOTAL order, so ties can't flip ranks — and the 90% gate is the
# cross-multiplied ``cum * 10 >= total * 9`` (no float division until
# the reported coverage share). Plan: the corpus collapses to
# |source|×|vocab| counted rows before the window; the window
# partitions by source (parallel across sources, vocab-bounded state).
@query(
    "q179_top_p_vocab",
    oracle=f"""
    WITH tc AS (
      SELECT source, u.tok AS tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT source, {SQL_TOKENS} AS tk FROM documents),
           UNNEST(tk) AS u(tok)
      GROUP BY 1, 2
    ),
    w AS (
      SELECT source, c,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY c DESC, tok) AS rn,
             SUM(c) OVER (
               PARTITION BY source ORDER BY c DESC, tok
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY source) AS total,
             COUNT(*) OVER (PARTITION BY source) AS vocab
      FROM tc
    )
    SELECT source,
           CAST(MIN(vocab) AS BIGINT) AS vocab_size,
           CAST(MIN(rn) AS BIGINT) AS top_p_tokens,
           CAST(MIN(total) AS BIGINT) AS total_occurrences
    FROM w
    WHERE cum * 10 >= total * 9
    GROUP BY source
    """,
)
def q179_top_p_vocab(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ordw = Window.partitionBy("source").orderBy(F.col("c").desc(), "tok")
    allw = Window.partitionBy("source")
    w = tc.select(
        "source",
        "c",
        F.row_number().over(ordw).alias("rn"),
        F.sum("c").over(ordw.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(allw).alias("total"),
        F.count(F.lit(1)).over(allw).alias("vocab"),
    )
    return (
        w.filter(F.col("cum") * 10 >= F.col("total") * 9)
        .groupBy("source")
        .agg(
            F.min("vocab").cast("bigint").alias("vocab_size"),
            F.min("rn").cast("bigint").alias("top_p_tokens"),
            F.min("total").cast("bigint").alias("total_occurrences"),
        )
    )


# --- q189: temperature-scaled mixture weights -------------------------------
# The multilingual/multi-source sampling recipe (mT5/XLM-R style):
# source i is sampled with probability n_i^alpha / sum n_j^alpha,
# alpha=0.5 — upweights small sources without drowning big ones.
# Determinism: sqrt is IEEE-correctly-rounded in BOTH engines, so
# floor(sqrt(n)*1e6) is a bit-stable BIGINT; the weight is then one
# exact-integer ratio evaluated as a single final double division.
# Scale: the corpus collapses to |sources| rows at the first agg;
# the normalizing window runs over that bounded grid only.
@query(
    "q189_mixture_temperature",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(len({SQL_TOKENS}) AS BIGINT) AS ntok
      FROM documents
    ),
    s AS (
      SELECT source, CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM tok GROUP BY 1
    ),
    w AS (
      SELECT source, n_tokens,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
               AS sqrt_mu
      FROM s
    )
    SELECT source, n_tokens, sqrt_mu,
           CAST(sqrt_mu AS DOUBLE) / CAST(SUM(sqrt_mu) OVER () AS DOUBLE)
             AS weight
    FROM w
    """,
)
def q189_mixture_temperature(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    s = d.select(
        "source", F.size(tokens(F.col("text"))).cast("long").alias("ntok")
    ).groupBy("source").agg(
        F.sum("ntok").cast("bigint").alias("n_tokens")
    )
    w = s.select(
        "source",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1e6)
        .cast("bigint")
        .alias("sqrt_mu"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return w.select(
        "source",
        "n_tokens",
        "sqrt_mu",
        (
            F.col("sqrt_mu").cast("double")
            / F.sum("sqrt_mu").over(wall).cast("double")
        ).alias("weight"),
    )


# --- q190: waterfilling token-budget allocation ------------------------------
# "Spend a 30% token budget across sources, capping the big ones":
# the exact waterfill level t satisfies sum(min(n_i, t)) = B, found
# closed-form on the ASCENDING-sorted source table — the first row
# where taking every smaller source whole and capping the rest at its
# size covers the budget. Every step is BIGINT arithmetic (floor-div
# level, exact prefix sums), so the oracle hash-matches bit-for-bit.
# Scale: all windows run over the |sources| grid (corpus already
# collapsed); nothing table-sized crosses an unpartitioned window.
@query(
    "q190_waterfill_budget",
    oracle=f"""
    WITH tok AS (
      SELECT source, CAST(len({SQL_TOKENS}) AS BIGINT) AS ntok
      FROM documents
    ),
    s AS (
      SELECT source, CAST(SUM(ntok) AS BIGINT) AS n_tokens
      FROM tok GROUP BY 1
    ),
    r AS (
      SELECT source, n_tokens,
             ROW_NUMBER() OVER w AS idx,
             COALESCE(SUM(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED
               PRECEDING AND 1 PRECEDING), 0) AS prefix_prev,
             COUNT(*) OVER () AS m,
             (SUM(n_tokens) OVER () * 3) // 10 AS b
      FROM s WINDOW w AS (ORDER BY n_tokens, source)
    ),
    f AS (
      SELECT *,
             CASE WHEN prefix_prev + (m - idx + 1) * n_tokens >= b
                  THEN idx END AS feas_idx,
             CASE WHEN prefix_prev + (m - idx + 1) * n_tokens >= b
                  THEN (b - prefix_prev) // (m - idx + 1) END AS t_here
      FROM r
    ),
    lvl AS (
      SELECT *,
             MIN(feas_idx) OVER () AS first_idx,
             CAST(b AS BIGINT) AS budget
      FROM f
    )
    SELECT source, n_tokens,
           CAST(LEAST(n_tokens, COALESCE(
             MAX(CASE WHEN idx = first_idx THEN t_here END) OVER (),
             n_tokens)) AS BIGINT) AS alloc,
           budget
    FROM lvl
    """,
)
def q190_waterfill_budget(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    s = d.select(
        "source", F.size(tokens(F.col("text"))).cast("long").alias("ntok")
    ).groupBy("source").agg(
        F.sum("ntok").cast("bigint").alias("n_tokens")
    )
    w = Window.orderBy("n_tokens", "source")
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = s.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("idx"),
        F.coalesce(
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("prefix_prev"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.sum("n_tokens").over(wall).alias("total"),
    ).withColumn(
        # integer floor-division (Spark / is float division and would
        # lose exactness past 2^53)
        "b", F.expr("(total * 3) div 10").cast("long")
    )
    feasible = (
        F.col("prefix_prev")
        + (F.col("m") - F.col("idx") + 1) * F.col("n_tokens")
        >= F.col("b")
    )
    f = r.select(
        "*",
        F.when(feasible, F.col("idx")).alias("feas_idx"),
        F.when(
            feasible,
            F.expr("(b - prefix_prev) div (m - idx + 1)").cast("long"),
        ).alias("t_here"),
    )
    lvl = f.select(
        "*",
        F.min("feas_idx").over(wall).alias("first_idx"),
        F.col("b").cast("bigint").alias("budget"),
    )
    tcap = F.max(
        F.when(F.col("idx") == F.col("first_idx"), F.col("t_here"))
    ).over(wall)
    return lvl.select(
        "source",
        "n_tokens",
        F.least(F.col("n_tokens"), F.coalesce(tcap, F.col("n_tokens")))
        .cast("bigint")
        .alias("alloc"),
        "budget",
    )
