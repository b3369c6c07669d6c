"""Event-stream analytics operators: ordered funnels, retention cohorts.

Generalizations of the q124/q125 plan shapes (plans/eventops.py) into
reusable operators with URI-transform surfaces (operators/transforms.py).
Scale shapes:

- :func:`funnel_steps` — ONE exchange on the user key shared by all
  step windows and the per-user reduction; the rollup is an
  n-steps-row aggregate.
- :func:`retention_cohorts` — first-event aggregation + cohort-cell
  distinct, both with map-side partial aggregation; the user-key join
  broadcasts when the user dimension is small and co-partitions with
  the first aggregation's exchange otherwise (AQE decides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# a Monday; (d - EPOCH_MONDAY) % 7 is the weekday index in any engine
EPOCH_MONDAY = "1970-01-05"


def funnel_user_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per user with each step's earliest qualifying timestamp.

    Columns ``__s0..__s{n-1}`` hold the greedy min-chain: step k's
    earliest event strictly after step k-1's chosen time (NULL once the
    chain breaks). All step windows and the per-user reduction share
    ONE ``user_col`` exchange.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    cur = df.select(user_col, type_col, ts_col)
    prev_col = None
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev_col is not None:
            cond = cond & (F.col(ts_col) > F.col(prev_col))
        col = f"__s{i}"
        cur = cur.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_col = col
    return cur.groupBy(user_col).agg(
        *[F.max(f"__s{i}").alias(f"__s{i}") for i in range(len(steps))]
    )


def funnel_steps(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: each step's event strictly after the previous.

    Returns one row per step: (step, step_idx, n_users, conv_rate)
    where conv_rate is relative to step 1. A user counts for step k
    only if their earliest step-k event is strictly later than their
    earliest *qualifying* step-(k-1) event — the textbook ordered
    funnel, not independent per-type counts.
    """
    per_user = funnel_user_times(df, steps, user_col, type_col, ts_col)
    counts = per_user.agg(
        *[
            F.count(f"__s{i}").cast("bigint").alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(step).alias("step"),
                F.lit(i + 1).cast("bigint").alias("step_idx"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, step in enumerate(steps)
        ]
    )
    # conv_rate is NULL (not an ANSI divide-by-zero) when nobody
    # reached step 1 — found by the hypothesis reference test
    return counts.select(F.col("__n0"), F.explode(rows).alias("s")).select(
        "s.step",
        "s.step_idx",
        "s.n_users",
        F.when(
            F.col("__n0") > 0,
            F.col("s.n_users").cast("double") / F.col("__n0").cast("double"),
        ).alias("conv_rate"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_active) distinct-user retention matrix.

    cohort_week is the Monday of the week of the user's first event,
    computed with plain day arithmetic from the 1970-01-05 epoch Monday
    (no ``date_trunc('week')`` — week-start conventions differ across
    engines/locales; integer arithmetic doesn't).
    """
    ev = df.select(user_col, F.col(ts_col).cast("date").alias("__d"))
    monday = F.lit(EPOCH_MONDAY).cast("date")
    first = ev.groupBy(user_col).agg(F.min("__d").alias("__cd"))
    cohorts = first.select(
        user_col,
        F.date_sub(
            F.col("__cd"), F.pmod(F.datediff(F.col("__cd"), monday), F.lit(7))
        ).alias("cohort_week"),
    )
    cells = (
        ev.join(cohorts, user_col)
        .select(
            "cohort_week",
            F.floor(F.datediff(F.col("__d"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
            user_col,
        )
        .distinct()
    )
    return cells.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition counts between consecutive events.

    Returns (from_type, to_type, n, prob) where prob is row-normalized
    per from_type. One exchange: the per-user lead window; the
    (from, to) rollup and the per-from normalization then operate on a
    |types|²-row frame, so the share window over the aggregate is a
    dim-sized sort, not a data-path one. Pass ``order_cols`` (e.g. an
    event id) to break timestamp ties deterministically.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.select(
            user_col,
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias("prob"),
    )


def last_touch_attribution(
    df: DataFrame,
    conversion: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    direct_label: str = "direct",
) -> DataFrame:
    """Attribute each conversion to the user's most recent prior touch.

    Classic last-touch marketing attribution: for every ``conversion``
    event, the credited touch is the latest preceding non-conversion
    event of the same user (``direct_label`` when the conversion is the
    user's first event). Returns one row per touch type with conversion
    count and total attributed value.

    Scale shape: ONE exchange on the user key (the carry-forward window
    and nothing else), then a map-side-combined rollup over at most
    |event types| rows. The per-conversion attribution (pre-rollup) is
    the same plan minus the final aggregate. Ordering ties are broken
    by ``order_cols`` (pass the event's unique id) so attribution is
    deterministic under duplicate timestamps.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col(type_col) != conversion, F.col(type_col)),
        ignorenulls=True,
    ).over(w)
    conv = (
        df.withColumn("__touch", touch)
        .filter(F.col(type_col) == conversion)
        .select(
            F.coalesce(F.col("__touch"), F.lit(direct_label)).alias(
                "touch_type"
            ),
            F.col(value_col),
        )
    )
    return conv.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.sum(F.col(value_col).cast("decimal(18,4)"))
        .cast("double")
        .alias("total_value"),
    )
