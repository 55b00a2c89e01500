"""k-step funnel boundary tests (r7 VERDICT "do this" #2): ordered
chaining, out-of-order and repeated events, the whole-funnel window
(edge-inclusive, anchored at step 1), duplicate-step rejection, and
the k=1 / two-step degenerate forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_podcast_etl_spark.operators.funnels import (
    funnel_conversion,
    funnel_steps,
)


def _events(spark, rows):
    """rows: (user_id, event_type, ts-string)."""
    return spark.createDataFrame(
        [(i, u, t, ts) for i, (u, t, ts) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _run(spark, rows, steps, within=None):
    out = funnel_steps(
        _events(spark, rows),
        user_col="user_id",
        type_col="event_type",
        ts_col="ts",
        steps=steps,
        within_seconds=within,
    ).collect()
    assert [r["step_index"] for r in out] == list(
        range(1, len(steps) + 1)
    )
    assert [r["step"] for r in out] == steps
    return {r["step_index"]: (r["n_users"], r["conversion_rate"]) for r in out}


def test_three_step_chain_and_out_of_order(spark):
    rows = [
        # u1 completes a->b->c in order
        (1, "a", "2024-01-01 00:00:00"),
        (1, "b", "2024-01-01 01:00:00"),
        (1, "c", "2024-01-01 02:00:00"),
        # u2: c arrives BEFORE b's anchor -> reaches step 2 only
        (2, "a", "2024-01-01 00:00:00"),
        (2, "c", "2024-01-01 00:30:00"),
        (2, "b", "2024-01-01 01:00:00"),
        # u3: b before a -> never leaves step 1
        (3, "b", "2024-01-01 00:00:00"),
        (3, "a", "2024-01-01 01:00:00"),
        # u4: b and c only -> not in the funnel at all
        (4, "b", "2024-01-01 00:00:00"),
        (4, "c", "2024-01-01 01:00:00"),
    ]
    got = _run(spark, rows, ["a", "b", "c"])
    assert got == {1: (3, 1.0), 2: (2, 0.6667), 3: (1, 0.3333)}


def test_repeated_events_use_earliest_qualifying(spark):
    rows = [
        # u1's SECOND b is the first at-or-after a; c then qualifies
        # against that b anchor, not the pre-a one
        (1, "b", "2024-01-01 00:00:00"),
        (1, "a", "2024-01-01 01:00:00"),
        (1, "b", "2024-01-01 02:00:00"),
        (1, "b", "2024-01-01 05:00:00"),
        (1, "c", "2024-01-01 03:00:00"),
    ]
    got = _run(spark, rows, ["a", "b", "c"])
    assert got == {1: (1, 1.0), 2: (1, 1.0), 3: (1, 1.0)}


def test_window_is_whole_funnel_from_step1_edge_inclusive(spark):
    rows = [
        # u1: c lands exactly AT the window edge from the a anchor
        (1, "a", "2024-01-01 00:00:00"),
        (1, "b", "2024-01-01 00:30:00"),
        (1, "c", "2024-01-01 01:00:00"),
        # u2: each gap is under the window but c is beyond it from a
        (2, "a", "2024-01-01 00:00:00"),
        (2, "b", "2024-01-01 00:50:00"),
        (2, "c", "2024-01-01 01:30:00"),
    ]
    got = _run(spark, rows, ["a", "b", "c"], within=3600)
    assert got == {1: (2, 1.0), 2: (2, 1.0), 3: (1, 0.5)}


def test_same_timestamp_converts_at_or_after(spark):
    rows = [
        (1, "a", "2024-01-01 00:00:00"),
        (1, "b", "2024-01-01 00:00:00"),
    ]
    got = _run(spark, rows, ["a", "b"])
    assert got == {1: (1, 1.0), 2: (1, 1.0)}


def test_two_step_form_matches_funnel_conversion(spark):
    rows = [
        (1, "signup", "2024-01-01 00:00:00"),
        (1, "purchase", "2024-01-01 01:00:00"),
        (2, "purchase", "2024-01-02 00:00:00"),
        (2, "signup", "2024-01-02 01:00:00"),
        (3, "signup", "2024-01-03 00:00:00"),
        (3, "purchase", "2024-01-03 02:00:01"),
        (4, "purchase", "2024-01-04 00:00:00"),
    ]
    ev = _events(spark, rows)
    two = funnel_conversion(
        ev, "user_id", "event_type", "ts", "signup", "purchase", 3600
    ).first()
    got = _run(spark, rows, ["signup", "purchase"], within=3600)
    assert got[1][0] == two["n_step_a"]
    assert got[2] == (two["n_converted"], two["conversion_rate"])


def test_single_step_degenerates_to_entry_count(spark):
    rows = [
        (1, "a", "2024-01-01 00:00:00"),
        (2, "a", "2024-01-01 01:00:00"),
        (3, "b", "2024-01-01 02:00:00"),
    ]
    got = _run(spark, rows, ["a"])
    assert got == {1: (2, 1.0)}


def test_duplicate_consecutive_steps_rejected(spark):
    with pytest.raises(ValueError, match="consecutive duplicate"):
        funnel_steps(
            _events(spark, [(1, "a", "2024-01-01 00:00:00")]),
            "user_id",
            "event_type",
            "ts",
            ["a", "a"],
        )
    with pytest.raises(ValueError, match="at least one step"):
        funnel_steps(
            _events(spark, [(1, "a", "2024-01-01 00:00:00")]),
            "user_id",
            "event_type",
            "ts",
            [],
        )


def test_empty_funnel_yields_zero_counts_null_rates(spark):
    """No user has a step-1 event: counts are 0 and rates NULL —
    ANSI `/` raised DIVIDE_BY_ZERO here before the r8 try_divide fix
    (found by the hypothesis differential test); DuckDB's `/` is
    NULL-on-zero, so the oracle semantics agree."""
    rows = [(1, "b", "2024-01-01 00:00:00"), (2, "c", "2024-01-01 01:00:00")]
    out = funnel_steps(
        _events(spark, rows), "user_id", "event_type", "ts", ["a", "b", "c"]
    ).collect()
    assert [(r["n_users"], r["conversion_rate"]) for r in out] == [
        (0, None),
        (0, None),
        (0, None),
    ]
    two = funnel_conversion(
        _events(spark, rows), "user_id", "event_type", "ts",
        "a", "b", 3600,
    ).first()
    assert (two["n_step_a"], two["n_converted"], two["conversion_rate"]) == (
        0, 0, None,
    )


def test_nonconsecutive_repeat_type_allowed(spark):
    # a -> b -> a again: legal (non-consecutive); the second 'a'
    # anchor must be a DIFFERENT, later event than the first
    rows = [
        (1, "a", "2024-01-01 00:00:00"),
        (1, "b", "2024-01-01 01:00:00"),
        (1, "a", "2024-01-01 02:00:00"),
        # u2 never returns to 'a'
        (2, "a", "2024-01-01 00:00:00"),
        (2, "b", "2024-01-01 01:00:00"),
    ]
    got = _run(spark, rows, ["a", "b", "a"])
    assert got == {1: (2, 1.0), 2: (2, 1.0), 3: (1, 0.5)}
