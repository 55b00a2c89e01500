"""Funnel and cohort analytics over keyed event streams — the
dashboard-tier queries that sit one step above the reference's
group-by/top-k panels (`/root/reference/ec2_data/app.py` builds its
panels from exactly this events shape): conversion within a window
and weekly retention cohorts.

Both are compositions of per-key aggregates and equi-joins — one
shuffle on the user key each, no windows over the whole corpus, no
driver passes — and both are exactly SQL-expressible for the oracle.
Date arithmetic sticks to day-granularity ``datediff`` against fixed
anchors (identical semantics in Spark and DuckDB); week boundaries
derive from integer day arithmetic, never engine-specific week
truncation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    step_a: str,
    step_b: str,
    within_seconds: int,
) -> DataFrame:
    """Two-step funnel: of the users whose FIRST ``step_a`` event
    exists, how many performed ``step_b`` within ``within_seconds``
    AFTER it (first qualifying occurrence).  Returns one row:
    ``n_step_a`` users entering the funnel, ``n_converted``, and
    ``conversion_rate`` (4 dp).

    Anchoring on the first ``step_a`` and requiring ``step_b``
    strictly at-or-after it is the standard product-analytics
    definition — a purchase BEFORE the signup does not convert.

    Scale: one aggregate per step keyed on the user (map-side
    combinable min), one equi-join between them — the events table is
    shuffled on the user key once per step and never self-joined
    row-to-row.  Gap comparison uses wall-clock ``timestamp_diff``
    microseconds (NTZ-safe, q91's convention).
    """
    first_a = (
        events.filter(F.col(type_col) == step_a)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_ts_a"))
    )
    b_events = events.filter(F.col(type_col) == step_b).select(
        F.col(user_col), F.col(ts_col).alias("_ts_b")
    )
    gap_us = F.timestamp_diff("MICROSECOND", F.col("_ts_a"), F.col("_ts_b"))
    converted = (
        first_a.join(b_events, user_col)
        .filter(
            (gap_us >= 0) & (gap_us <= F.lit(within_seconds * 1_000_000))
        )
        .select(user_col)
        .distinct()
        .withColumn("_converted", F.lit(1))
    )
    # one aggregate over the flagged funnel entrants — no 1x1 cross
    # join of separate count frames (a BroadcastNestedLoopJoin the
    # plan audit would count, however harmless at one row each)
    return (
        first_a.join(converted, user_col, "left")
        .agg(
            F.count(F.lit(1)).alias("n_step_a"),
            F.count("_converted").alias("n_converted"),
        )
        .select(
            "n_step_a",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_step_a"), 4).alias(
                "conversion_rate"
            ),
        )
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    epoch: str = "2024-01-01",
) -> DataFrame:
    """Weekly retention matrix: users bucket into the week (since
    ``epoch``) of their FIRST event — the cohort — and each row counts
    how many of them were active ``week_offset`` weeks later.
    ``week_offset = 0`` is the cohort's own size; dashboards plot each
    cohort's row as its survival curve.

    Week indexes are ``floor(datediff(day) / 7)`` against the fixed
    ``epoch`` — pure integer day arithmetic, bit-identical across
    engines, immune to locale week-start and ISO-week edge cases.

    Scale: first-event aggregate (one shuffle on the user), broadcast-
    friendly join back, then a count-distinct per (cohort, offset) —
    cardinality bounded by users, output by weeks².
    """
    ep = F.lit(epoch).cast("date")

    def week_idx(c: Column) -> Column:
        return F.floor(F.datediff(c.cast("date"), ep) / 7).cast("int")

    first = events.groupBy(user_col).agg(F.min(ts_col).alias("_first_ts"))
    joined = events.select(F.col(user_col), F.col(ts_col)).join(
        first, user_col
    )
    return (
        joined.select(
            F.col(user_col),
            week_idx(F.col("_first_ts")).alias("cohort_week"),
            (
                week_idx(F.col(ts_col)) - week_idx(F.col("_first_ts"))
            ).alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("n_active_users"))
    )
