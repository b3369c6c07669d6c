"""Product-analytics query coverage over the events stream table.

The two batch workhorses every event pipeline ends up running (the
reference delegates all relational work to SQL via its ``sql://``
transform — reference ``README.md`` pipeline examples — so these are
coverage of that delegated surface, expressed Spark-first):

- **q124** ordered funnel conversion: view → click → purchase, each
  step's timestamp strictly after the previous step's. ONE shuffle on
  ``user_id``: the three per-user step timestamps are unbounded
  ``min(CASE ...)`` window aggregates over the same partitioning, so
  Catalyst plans a single Exchange reused by all three Window ops and
  the final per-user reduction; the step rollup is a 3-row aggregate.
- **q125** weekly retention cohorts: cohort = ISO week (Monday) of a
  user's first event; a cohort x week-offset matrix of distinct active
  users. Two shuffles (first-event agg on user_id, then the cohort
  cell distinct+count), both with map-side partial aggregation. The
  user_id join is co-partitioned with the first agg's exchange.

Determinism rules as registry.py: timestamps only ever surface as
DATE or epoch BIGINT; counts BIGINT; rates are double divisions of
exact integers (bit-identical across engines). Week arithmetic avoids
``date_trunc('week')`` entirely — the Monday is computed with day
arithmetic from the 1970-01-05 epoch Monday, identical in both
engines regardless of locale/week-start conventions.
"""

from __future__ import annotations

from spark_etl_cli_spark.plans.registry import events, query

# --- q124: ordered funnel conversion --------------------------------------
# Step k counts a user only if their earliest step-k event is strictly
# after their earliest qualifying step-(k-1) event — the textbook
# ordered funnel, not independent per-type counts.
@query(
    "q124_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS c_ts
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS p_ts
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1
    ),
    n AS (
      SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
             CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
             CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase
    )
    SELECT step, step_idx, n_users,
           CAST(n_users AS DOUBLE) / CAST(n_view AS DOUBLE) AS conv_rate
    FROM n, (VALUES ('view', CAST(1 AS BIGINT)), ('click', CAST(2 AS BIGINT)),
                    ('purchase', CAST(3 AS BIGINT))) AS s(step, step_idx),
         LATERAL (SELECT CASE step WHEN 'view' THEN n_view
                                   WHEN 'click' THEN n_click
                                   ELSE n_purchase END AS n_users)
    """,
)
def q124_funnel_conversion(spark, sf_dir):
    from spark_etl_cli_spark.operators.events import funnel_steps

    # Stacked step-window mins over ONE user_id partitioning: each
    # step's window references the previous step's column, and Catalyst
    # reuses the single Exchange across all step Windows (operator
    # docstring + test_plans gate).
    return funnel_steps(
        events(spark, sf_dir), steps=["view", "click", "purchase"]
    )


# --- q125: weekly retention cohorts ---------------------------------------
# cohort_week = the Monday of the week of the user's first event;
# week_offset = whole weeks between that Monday and each active day.
# 1970-01-05 is a Monday, so (d - epoch_monday) % 7 is the weekday
# index in BOTH engines with plain non-negative integer arithmetic.
_EPOCH_MONDAY = "1970-01-05"


@query(
    "q125_retention_cohorts",
    oracle=f"""
    WITH first_ev AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
      FROM events GROUP BY 1
    ),
    cohorts AS (
      SELECT user_id,
             cohort_date - CAST(
               (cohort_date - DATE '{_EPOCH_MONDAY}') % 7 AS INTEGER)
               AS cohort_week
      FROM first_ev
    ),
    cells AS (
      SELECT DISTINCT c.cohort_week,
             CAST((CAST(e.ts AS DATE) - c.cohort_week) // 7 AS BIGINT)
               AS week_offset,
             e.user_id
      FROM events e JOIN cohorts c USING (user_id)
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM cells GROUP BY 1, 2
    """,
)
def q125_retention_cohorts(spark, sf_dir):
    from spark_etl_cli_spark.operators.events import retention_cohorts

    # The user_id join co-partitions with the first-event exchange (or
    # broadcasts when the user dim is small — AQE decides); the cell
    # distinct collapses per-user repeat activity map-side.
    return retention_cohorts(events(spark, sf_dir))


# --- q129: first-order event transition matrix ---------------------------
# The Markov-chain view of the event stream: counts + row-normalized
# probabilities of consecutive (from -> to) transitions per user,
# ordered by (ts, event_id) so timestamp ties can't flip the lead.
@query(
    "q129_transition_matrix",
    oracle="""
    WITH p AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    c AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
    FROM c
    """,
)
def q129_transition_matrix(spark, sf_dir):
    from spark_etl_cli_spark.operators.events import transition_matrix

    return transition_matrix(
        events(spark, sf_dir), order_cols=["event_id"]
    )


# --- q130: funnel time-to-convert statistics ------------------------------
# Composition of the q124 chain with exact latency stats: for each
# adjacent step pair, seconds between the chain timestamps —
# count / mean / min / max, all integer-second arithmetic (epoch
# BIGINTs; the mean is exact-int-sum / count in DOUBLE), so the values
# hash-match the oracle bit-for-bit. Same single user_id exchange as
# q124; the per-pair rollup is a 2-row aggregate.
@query(
    "q130_funnel_latency",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS s0 FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS s1
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.s0 GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS s2
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.s1 GROUP BY 1
    ),
    d AS (
      SELECT 'view->click' AS hop, CAST(1 AS BIGINT) AS hop_idx,
             CAST(floor(epoch(c.s1)) - floor(epoch(v.s0)) AS BIGINT) AS dt
      FROM v JOIN c USING (user_id)
      UNION ALL
      SELECT 'click->purchase', CAST(2 AS BIGINT),
             CAST(floor(epoch(p.s2)) - floor(epoch(c.s1)) AS BIGINT)
      FROM c JOIN p USING (user_id)
    )
    SELECT hop, hop_idx, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(dt) AS DOUBLE) / COUNT(*) AS mean_s,
           CAST(MIN(dt) AS BIGINT) AS min_s,
           CAST(MAX(dt) AS BIGINT) AS max_s
    FROM d GROUP BY 1, 2
    """,
)
def q130_funnel_latency(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.events import funnel_user_times

    steps = ["view", "click", "purchase"]
    per_user = funnel_user_times(events(spark, sf_dir), steps)
    hops = []
    for i in range(len(steps) - 1):
        dt = (
            F.unix_timestamp(f"__s{i + 1}") - F.unix_timestamp(f"__s{i}")
        ).cast("bigint")
        hops.append(
            per_user.filter(F.col(f"__s{i + 1}").isNotNull()).select(
                F.lit(f"{steps[i]}->{steps[i + 1]}").alias("hop"),
                F.lit(i + 1).cast("bigint").alias("hop_idx"),
                dt.alias("dt"),
            )
        )
    union = hops[0]
    for h in hops[1:]:
        union = union.unionByName(h)
    return union.groupBy("hop", "hop_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (F.sum("dt").cast("double") / F.count(F.lit(1))).alias("mean_s"),
        F.min("dt").cast("bigint").alias("min_s"),
        F.max("dt").cast("bigint").alias("max_s"),
    )


# --- q138: last-touch attribution ----------------------------------------
# Every purchase is credited to the user's most recent preceding
# non-purchase event ('direct' when none): one user-key exchange for
# the carry-forward window, then a |event types|-row rollup. The
# window order ties break on event_id so attribution is deterministic
# under duplicate timestamps; value totals go through exact decimals.
@query(
    "q138_last_touch_attribution",
    oracle="""
    WITH touched AS (
      SELECT event_type, value,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      FROM events)
    SELECT COALESCE(touch, 'direct') AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_conversions,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM touched WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q138_last_touch_attribution(spark, sf_dir):
    from spark_etl_cli_spark.operators.events import last_touch_attribution

    return last_touch_attribution(
        events(spark, sf_dir), conversion="purchase", order_cols=["event_id"]
    )


# --- q154: CDC apply-changes snapshot --------------------------------------
# The latest-change-per-key materialization (operators/cdc.py) over the
# events table read as a change log: user_id is the key, (ts, event_id)
# the sequence, and an 'error' event tombstones its user. One shuffle
# on the key + a row_number window — the minimal plan; per-key state is
# bounded by events-per-user. This is the relational core of the
# ?mode=cdc delta sink, proven against the oracle.
@query(
    "q154_cdc_apply",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, CAST(value AS DOUBLE) AS value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    )
    SELECT user_id,
           event_type AS last_type,
           value AS last_value
    FROM ranked WHERE rn = 1 AND event_type <> 'error'
    """,
)
def q154_cdc_apply(spark, sf_dir):
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.cdc import apply_changes_snapshot

    snap = apply_changes_snapshot(
        events(spark, sf_dir),
        keys=["user_id"],
        sequence_cols=["ts", "event_id"],
        change_type_col="event_type",
        delete_values=("error",),
        ignore_values=(),
    )
    return snap.select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").cast("double").alias("last_value"),
    )


# --- q150: per-key EWMA smoothing (deterministic sequential fold) ---------
# Time-series smoothing as a SORTED per-key fold: collect each user's
# values in (ts, event_id) order and fold s = (s + x)/2 — EWMA with
# α = 1/2. The α choice is deliberate: the recurrence contains no
# multiply, so no engine can FMA-contract it (see the q139 divergence),
# and every step is one correctly-rounded add + one exact exponent
# shift — bit-identical across engines and partitionings. Per-key
# arrays are bounded by events-per-user (the same per-entity bound all
# the fold-based operators rely on); the groupBy is map-side combined.
@query(
    "q150_ewma_smoothing",
    oracle="""
    WITH ordered AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs
      FROM events GROUP BY 1
    )
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_events,
           list_reduce(vs, (s, x) -> (s + x) / 2.0) AS ewma
    FROM ordered
    """,
)
def q150_ewma_smoothing(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = events(spark, sf_dir)
    ordered = ev.groupBy("user_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"),
                        F.col("event_id"),
                        F.col("value").cast("double").alias("value"),
                    )
                )
            ),
            lambda s: s["value"],
        ).alias("vs")
    )
    return ordered.select(
        "user_id",
        F.size("vs").cast("bigint").alias("n_events"),
        F.aggregate(
            F.slice(F.col("vs"), 2, F.greatest(F.size("vs") - 1, F.lit(0))),
            F.element_at(F.col("vs"), 1),
            lambda s, x: (s + x) / F.lit(2.0),
        ).alias("ewma"),
    )


# --- q165: peak concurrent sessions (interval sweep line) -------------------
# "What was the maximum number of simultaneously-open sessions, and
# when was it first reached?" — capacity planning's one-liner. Sessions
# are 30-minute-gap islands per user; each becomes a +1/-1 point pair
# and a single running sum over the deterministic point order
# (t, starts-before-ends, user, session) finds the peak. Exactness:
# timestamps surface only as epoch-microsecond BIGINTs; with all +1
# points ordered before -1 at equal t, touching sessions count as
# concurrent and the running max is tie-order-independent. Scale: the
# heavy work (sessionization) is user-partitioned windows + one agg to
# |sessions| rows; the sweep itself is a TWO-PHASE distributed prefix
# sum (per-day delta totals → broadcast day offsets → day-partitioned
# running sums), so no table-sized input ever crosses an unpartitioned
# window — the oracle spells the same sweep as one literal running sum.
@query(
    "q165_peak_concurrency",
    oracle="""
    WITH e AS (SELECT user_id, ts FROM events),
    g AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                       > 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    sess AS (
      SELECT user_id, sid,
             epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
      FROM s GROUP BY user_id, sid
    ),
    pts AS (
      SELECT s_us AS t, 1 AS delta, user_id, sid FROM sess
      UNION ALL
      SELECT e_us AS t, -1 AS delta, user_id, sid FROM sess
    ),
    run AS (
      SELECT t,
             SUM(delta) OVER (ORDER BY t, delta DESC, user_id, sid
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    ),
    m AS (SELECT t, conc, MAX(conc) OVER () AS mx, COUNT(*) OVER () AS np
          FROM run)
    SELECT CAST(MAX(conc) AS BIGINT) AS peak,
           CAST(MIN(CASE WHEN conc = mx THEN t END) AS BIGINT)
             AS peak_at_us,
           CAST(MAX(np) / 2 AS BIGINT) AS n_sessions
    FROM m
    """,
)
def q165_peak_concurrency(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    e = events(spark, sf_dir).select("user_id", "ts")
    wu = W.partitionBy("user_id").orderBy("ts")
    g = e.withColumn(
        "brk",
        F.when(
            F.lag("ts").over(wu).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(wu))
                > 1_800_000_000
            ),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "sid",
        F.sum("brk").over(
            wu.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    sess = s.groupBy("user_id", "sid").agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        F.unix_micros(F.max("ts")).alias("e_us"),
    )
    pts = sess.select(
        F.col("s_us").alias("t"), F.lit(1).alias("delta"), "user_id", "sid"
    ).unionByName(
        sess.select(
            F.col("e_us").alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
            "sid",
        )
    )
    # Distributed prefix sum over the breakpoint stream. A naive
    # SUM(delta) OVER (ORDER BY t, ...) serializes EVERY session
    # boundary through one window task — sessions scale with the
    # corpus, so at 100× that task is the job. Two-phase instead:
    # coarse-bucket breakpoints by DAY (the events table spans a fixed
    # time DOMAIN, so bucket count is calendar-bounded, not
    # corpus-bounded), per-day delta totals → exclusive prefix offsets
    # via one window over the tiny day table, then the running sum
    # PARTITIONED by day resumes from the broadcast day offset.
    # exact integer floor-div (matching q190's b/t_here expressions):
    # float division + cast-to-long truncation is only accidentally
    # correct here and can land boundary micros in the adjacent day.
    day = F.expr("t div 86400000000")
    ptsd = pts.withColumn("dy", day)
    dtot = ptsd.groupBy("dy").agg(F.sum("delta").cast("long").alias("dsum"))
    wpre = W.orderBy("dy").rowsBetween(W.unboundedPreceding, -1)
    offs = dtot.select(
        "dy", F.coalesce(F.sum("dsum").over(wpre), F.lit(0)).alias("doff")
    )
    win = W.partitionBy("dy").orderBy(
        "t", F.col("delta").desc(), "user_id", "sid"
    ).rowsBetween(W.unboundedPreceding, W.currentRow)
    run = ptsd.join(F.broadcast(offs), "dy").select(
        "t", (F.col("doff") + F.sum("delta").over(win)).alias("conc")
    )
    # peak + argmin-t-at-peak in ONE map-side-combinable aggregation:
    # max over (conc, -t) structs is lexicographic, so it picks the
    # highest concurrency and, among ties, the earliest instant — no
    # MAX() OVER () global window, no second pass.
    best = F.max(F.struct(F.col("conc").alias("c"), (-F.col("t")).alias("nt")))
    return run.agg(
        best.getField("c").cast("bigint").alias("peak"),
        (-best.getField("nt")).cast("bigint").alias("peak_at_us"),
        (F.count(F.lit(1)) / 2).cast("bigint").alias("n_sessions"),
    )


# --- q166: rolling 7-day distinct users (exact) ----------------------------
# Exact rolling MAU/DAU-style reach: for every active day, how many
# DISTINCT users were active in the 7-day window ending that day.
# Window functions cannot do DISTINCT over a frame, so each (user, day)
# pair is replicated to the ≤7 window-end days it contributes to
# (explode of a 0..6 day-offset sequence — linear ×7 blowup of the
# already-deduplicated per-day activity, NOT of raw events) and one
# countDistinct per window-end day finishes it. Integer day ordinals,
# bigint counts; windows whose end day saw no activity are not emitted
# (both engines agree on that contract).
@query(
    "q166_rolling_dau",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM act),
    contrib AS (
      SELECT a.user_id, a.d + o.o AS wend
      FROM act a, UNNEST(generate_series(0, 6)) AS o(o)
    )
    SELECT wend AS day_ordinal,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_7d
    FROM contrib JOIN days ON days.d = contrib.wend
    GROUP BY wend
    """,
)
def q166_rolling_dau(spark, sf_dir):
    from pyspark.sql import functions as F

    act = (
        events(spark, sf_dir)
        .select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("bigint")
            .alias("d"),
        )
        .distinct()
    )
    days = act.select("d").distinct()
    contrib = act.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
        "d",
    ).select("user_id", (F.col("d") + F.col("o")).alias("wend"))
    return (
        contrib.join(
            F.broadcast(days.withColumnRenamed("d", "wend")), "wend"
        )
        .groupBy(F.col("wend").alias("day_ordinal"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("users_7d"))
    )


# --- q167: day-over-day change detection ------------------------------------
# Daily event volume with the previous ACTIVE day's count and an
# integer-exact spike flag (count more than doubled or halved against
# a prior day at most 3 days back) — the freshness/volume monitor every
# ingest pipeline alerts on. One groupBy to |days| rows, one global
# LAG window over that tiny aggregate; the flag is pure integer
# cross-multiplication, no float ratios.
@query(
    "q167_dod_change",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT d, n,
             LAG(d) OVER (ORDER BY d) AS prev_d,
             LAG(n) OVER (ORDER BY d) AS prev_n
      FROM daily
    )
    SELECT d AS day_ordinal, n, prev_n,
           CAST(
             prev_n IS NOT NULL AND d - prev_d <= 3
             AND (n > 2 * prev_n OR 2 * n < prev_n)
             AS BOOLEAN) AS spike
    FROM w
    """,
)
def q167_dod_change(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    daily = (
        events(spark, sf_dir)
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("bigint")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = W.orderBy("d")
    out = daily.select(
        "d",
        "n",
        F.lag("d").over(w).alias("prev_d"),
        F.lag("n").over(w).alias("prev_n"),
    )
    return out.select(
        F.col("d").alias("day_ordinal"),
        "n",
        "prev_n",
        (
            F.col("prev_n").isNotNull()
            & (F.col("d") - F.col("prev_d") <= 3)
            & (
                (F.col("n") > 2 * F.col("prev_n"))
                | (2 * F.col("n") < F.col("prev_n"))
            )
        )
        .cast("boolean")
        .alias("spike"),
    )


# --- q170: frequent 3-step event paths --------------------------------------
# Sequence mining at depth 3 (the order-2 extension of q129's
# first-order transition matrix): per user, order events by
# (ts, event_id) — a TOTAL order, so simultaneous events can't make
# the answer run-dependent — and slide a window of two leads; count
# each (e1 -> e2 -> e3) path corpus-wide and keep the ones with
# above-average support (a RELATIVE floor, so it separates hot paths
# from cold at every scale — a fixed count can't). Plan: one window
# (partitioned per user, bounded state) + one map-side-combined hash
# agg + a broadcast scalar; no top-k sort — the support floor replaces
# LIMIT so the result is tie-stable for hashing. At 100 TB the window
# state is per-user-bounded and the path-count agg carries at most
# |event_types|^3 groups out of the shuffle.
@query(
    "q170_event_paths",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS support
      FROM ordered WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
    )
    SELECT e1, e2, e3, support FROM paths
    WHERE CAST(support AS DOUBLE)
          >= (SELECT AVG(CAST(support AS DOUBLE)) FROM paths)
    """,
)
def q170_event_paths(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events(spark, sf_dir).select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    paths = (
        ordered.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    floor = paths.agg(
        F.avg(F.col("support").cast("double")).alias("__floor")
    )
    return (
        paths.join(F.broadcast(floor))
        .filter(F.col("support").cast("double") >= F.col("__floor"))
        .select("e1", "e2", "e3", "support")
    )


# --- q176: event-type co-occurrence (market-basket pairs) -------------------
# Which behaviors travel together: for every UNORDERED pair of event
# types, how many users exhibit both, and what share of the user base
# that is. The itemset universe is |event_types|², tiny and bounded, so
# pair generation happens IN-ROW from each user's sorted distinct-type
# set (the q159 pattern — no user×user or event×event join exists
# anywhere in the plan). Plan: distinct → per-user set (bounded by
# |event_types|) → in-row ordered pairs → map-side-combined count; the
# user-base denominator is a broadcast 1-row scalar. Support is exact
# integers until one correctly-rounded division.
@query(
    "q176_event_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE)
             AS support
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def q176_event_cooccurrence(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = events(spark, sf_dir)
    ut = ev.select("user_id", "event_type").distinct()
    sets = ut.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(ts, (a, i) -> "
                "transform(slice(ts, i + 2, size(ts) - i - 1), "
                "b -> struct(a, b))))"
            )
        ).alias("p")
    )
    tot = ev.select(
        F.countDistinct("user_id").cast("bigint").alias("n")
    )
    counted = pairs.groupBy(
        F.col("p.a").alias("type_a"), F.col("p.b").alias("type_b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    return counted.crossJoin(F.broadcast(tot)).select(
        "type_a",
        "type_b",
        "n_users",
        (F.col("n_users").cast("double") / F.col("n").cast("double")).alias(
            "support"
        ),
    )


# --- q177: churn-return (reactivation) by month -----------------------------
# Users coming back after a silence longer than the fixture's
# typical cadence (>2 inactive days; the threshold is a knob), counted per RETURN day
# ordinal — the lifecycle metric between q125's fixed cohort
# retention and q166's rolling DAU. Per-user LAG over a TOTAL order
# (ts, event_id) — ties can't reorder the answer; gaps are exact
# integer day ordinals. Plan: one per-user window (key-partitioned,
# bounded state) over events already projected to (user, day) distinct
# — at 100 TB the window input is per-user ACTIVE DAYS, not raw events
# — then a map-side-combined per-day rollup of |active days| rows max.
@query(
    "q177_reactivation",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
      FROM events
    ),
    w AS (
      SELECT user_id, d,
             LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
      FROM act
    )
    SELECT d AS return_day,
           CAST(COUNT(*) AS BIGINT) AS n_reactivations,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM w
    WHERE prev_d IS NOT NULL AND d - prev_d > 2
    GROUP BY 1
    """,
)
def q177_reactivation(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    act = (
        events(spark, sf_dir)
        .select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("bigint")
            .alias("d"),
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("d")
    re = act.select(
        "user_id", "d", F.lag("d").over(w).alias("prev_d")
    ).filter(F.col("prev_d").isNotNull() & (F.col("d") - F.col("prev_d") > 2))
    return re.groupBy(F.col("d").alias("return_day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reactivations"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# --- q185: traffic concentration (pareto point) per event type --------------
# How many of the most-active users does it take to cover 80% of each
# event type's volume — the load-skew diagnostic behind partitioning
# and rate-limit decisions. q179's top-p math on the BEHAVIORAL axis:
# per-(type, user) counts (map-side combined), a per-type rank/cumsum
# window over the per-user aggregate (bounded by |users|), integer
# cross-multiplied 80% gate, one final min per type.
@query(
    "q185_user_pareto",
    oracle="""
    WITH uc AS (
      SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, c,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY c DESC, user_id) AS rn,
             SUM(c) OVER (
               PARTITION BY event_type ORDER BY c DESC, user_id
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS total,
             COUNT(*) OVER (PARTITION BY event_type) AS n_users
      FROM uc
    )
    SELECT event_type,
           CAST(MIN(n_users) AS BIGINT) AS n_users,
           CAST(MIN(rn) AS BIGINT) AS users_for_80pct,
           CAST(MIN(total) AS BIGINT) AS total_events
    FROM w
    WHERE cum * 10 >= total * 8
    GROUP BY event_type
    """,
)
def q185_user_pareto(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    uc = (
        events(spark, sf_dir)
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ordw = W.partitionBy("event_type").orderBy(F.col("c").desc(), "user_id")
    allw = W.partitionBy("event_type")
    w = uc.select(
        "event_type",
        F.row_number().over(ordw).alias("rn"),
        F.sum("c").over(ordw.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
        F.sum("c").over(allw).alias("total"),
        F.count(F.lit(1)).over(allw).alias("n_users"),
    )
    return (
        w.filter(F.col("cum") * 10 >= F.col("total") * 8)
        .groupBy("event_type")
        .agg(
            F.min("n_users").cast("bigint").alias("n_users"),
            F.min("rn").cast("bigint").alias("users_for_80pct"),
            F.min("total").cast("bigint").alias("total_events"),
        )
    )


# --- q191: inter-event burstiness (exact CV² per event type) ----------------
# "Is this event type steady or bursty?" — the squared coefficient of
# variation of inter-event gaps per (user, type) stream, aggregated
# per type. CV² = (n·Σg² − (Σg)²) / (Σg)²: every accumulation is an
# exact DECIMAL(38,0) sum of SECOND-granularity integer gaps (micros
# would square past 128 bits at corpus scale; seconds keep Σg² under
# 10²² even at 10⁹ gaps), so both engines compute the identical
# rational and the single final double cast is bit-stable. Scale: one
# user-partitioned lag window + one map-side-combinable agg.
@query(
    "q191_interevent_cv",
    oracle="""
    WITH e AS (SELECT user_id, event_type, ts, event_id FROM events),
    g AS (
      SELECT event_type,
             (epoch_us(ts) - epoch_us(LAG(ts) OVER w)) // 1000000 AS gap_s
      FROM e WINDOW w AS (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id)
    ),
    a AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(CAST(gap_s AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sg,
             CAST(SUM(CAST(gap_s AS DECIMAL(38,0))
                      * CAST(gap_s AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sg2
      FROM g WHERE gap_s IS NOT NULL GROUP BY 1
    )
    SELECT event_type, n_gaps,
           CAST(sg AS BIGINT) AS sum_gap_s,
           CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
           CAST(n_gaps * sg2 - sg * sg AS DOUBLE)
             / CAST(sg * sg AS DOUBLE) AS cv2
    FROM a
    """,
)
def q191_interevent_cv(spark, sf_dir):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    e = events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - unix_micros(lag(ts) over (partition by "
            "user_id, event_type order by ts, event_id))) div 1000000"
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    dec38 = T.DecimalType(38, 0)
    a = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(F.col("gap_s").cast(dec38)).cast(dec38).alias("sg"),
        F.sum(F.col("gap_s").cast(dec38) * F.col("gap_s").cast(dec38))
        .cast(dec38)
        .alias("sg2"),
    )
    return a.select(
        "event_type",
        "n_gaps",
        F.col("sg").cast("bigint").alias("sum_gap_s"),
        (F.col("sg").cast("double") / F.col("n_gaps").cast("double")).alias(
            "mean_gap_s"
        ),
        (
            (
                F.col("n_gaps").cast(dec38) * F.col("sg2")
                - F.col("sg") * F.col("sg")
            ).cast("double")
            / (F.col("sg") * F.col("sg")).cast("double")
        ).alias("cv2"),
    )


# --- q194: audience overlap between event types ------------------------------
# "Do clickers also purchase?" — pairwise Jaccard of the distinct-user
# audiences of every event-type pair. Pair-free at user level: each
# user's type set collapses to ONE row (bounded by |event types|, not
# activity), pairs generate IN-ROW from the sorted set, and the final
# agg runs over ≤ C(|types|,2) groups. Exact integer intersection /
# union counts, one final double division. The oracle spells the same
# thing as a distinct self-join.
@query(
    "q194_event_audience_overlap",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM ut GROUP BY 1
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ta.n_users AS n_a, tb.n_users AS n_b,
           CAST(p.n_both AS DOUBLE)
             / CAST(ta.n_users + tb.n_users - p.n_both AS DOUBLE)
             AS jaccard
    FROM pairs p
    JOIN tot ta ON ta.event_type = p.type_a
    JOIN tot tb ON tb.event_type = p.type_b
    """,
)
def q194_event_audience_overlap(spark, sf_dir):
    from pyspark.sql import functions as F

    ut = events(spark, sf_dir).select("user_id", "event_type").distinct()
    sets = ut.groupBy("user_id").agg(
        F.sort_array(F.collect_set("event_type")).alias("ts")
    )
    # in-row ordered pairs: bounded by C(|types|,2) per user
    pair = F.filter(
        F.flatten(
            F.transform(
                F.col("ts"),
                lambda a: F.transform(
                    F.col("ts"), lambda b: F.struct(a.alias("a"), b.alias("b"))
                ),
            )
        ),
        lambda p: p["a"] < p["b"],
    )
    pairs = (
        sets.select(F.explode(pair).alias("p"))
        .groupBy(
            F.col("p.a").alias("type_a"), F.col("p.b").alias("type_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    tot = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    ta = tot.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    tb = tot.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .select(
            "type_a", "type_b", "n_both", "n_a", "n_b",
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


# --- q195: weekday seasonality (chi-square vs uniform) ----------------------
# "Is this event type weekday-driven?" — per type, the chi-square
# statistic of its weekday profile against a uniform 1/7 expectation.
# Weekday indices use the 1970-01-05 epoch-Monday arithmetic (q125's
# trick: engine-independent, locale-free), and the statistic uses the
# zero-cell-free identity chi2 = 7·Σo²/n − n (absent weekdays
# contribute exactly their (0−n/7)²/(n/7) share without ever
# materializing) — exact integers until one final double division.
@query(
    "q195_weekday_seasonality",
    oracle="""
    WITH d AS (
      SELECT event_type,
             CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT)
               AS wd
      FROM events
    ),
    c AS (
      SELECT event_type, wd, CAST(COUNT(*) AS BIGINT) AS o
      FROM d GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(o) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS weekdays_active,
           CAST(7 * SUM(o * o) - SUM(o) * SUM(o) AS DOUBLE)
             / CAST(SUM(o) AS DOUBLE) AS chi2
    FROM c GROUP BY 1
    """,
)
def q195_weekday_seasonality(spark, sf_dir):
    from pyspark.sql import functions as F

    d = events(spark, sf_dir).select(
        "event_type",
        (
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-05").cast("date"))
            % 7
        ).cast("long").alias("wd"),
    )
    c = d.groupBy("event_type", "wd").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    return c.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("weekdays_active"),
        (
            (
                7 * F.sum(F.col("o") * F.col("o"))
                - F.sum("o") * F.sum("o")
            ).cast("double")
            / F.sum("o").cast("double")
        ).alias("chi2"),
    )


# --- q196: new vs returning users per day -----------------------------------
# The growth-accounting daily split: how many of a day's active users
# were seen for the FIRST time that day? One distinct (user, day)
# collapse, a per-user min-day aggregate joined back on user (both
# sides already user-partitioned from their aggs), exact counts and a
# single final ratio division.
@query(
    "q196_new_vs_returning",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    fs AS (
      SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1
    )
    SELECT ud.day,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(SUM(CASE WHEN ud.day = fs.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN ud.day = fs.first_day THEN 0 ELSE 1 END)
                AS BIGINT) AS returning_users,
           CAST(SUM(CASE WHEN ud.day = fs.first_day THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS new_ratio
    FROM ud JOIN fs USING (user_id)
    GROUP BY 1
    """,
)
def q196_new_vs_returning(spark, sf_dir):
    from pyspark.sql import functions as F

    ud = (
        events(spark, sf_dir)
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    fs = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_flag = F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
    return (
        ud.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.sum(new_flag).cast("bigint").alias("new_users"),
            F.sum(1 - new_flag).cast("bigint").alias("returning_users"),
            (
                F.sum(new_flag).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("new_ratio"),
        )
    )
