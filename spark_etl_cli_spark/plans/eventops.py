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
