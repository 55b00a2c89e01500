"""Join operators beyond plain equi-joins.

Reference parity (SURVEY.md §2.3):
  J1 broadcast dim-lookup join  → ``dim_lookup_join``
    (reference: src/lambda_2.py:222-230 pulls the whole podcast dim into
     a Python dict; here: an explicit broadcast hash join)
  J3 positional zip join        → ``zip_join``
    (reference: src/lambda_71.py:74-89 aligns sentences[i] with
     sentiment_output[i] by list index)
  J4 offset interval as-of join → ``asof_join`` / ``range_join``
    (reference: src/lambda_72.py:66-118 two-pointer merge assigning
     entity char offsets to sentence spans)

Scale notes: ``asof_join`` uses the union + last(ignore-nulls) window
formulation — ONE shuffle on the key, no broadcast-nested-loop, no
cross product; this is the formulation that survives 100 TB.
``range_join`` is the literal inequality-join formulation kept for
cross-checking; Spark executes it as BroadcastNestedLoopJoin unless the
span side is small, so prefer ``asof_join`` at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dim_lookup_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Broadcast hash join of a fact table against a small dimension.

    The reference materializes the dimension as an in-memory dict
    (src/lambda_2.py:222-230, src/lambda_3.py:40-48); the Spark-native
    equivalent is an explicit broadcast hint so the join never shuffles
    the fact side.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def zip_join(
    left: DataFrame,
    right: DataFrame,
    left_order: list[str],
    right_order: list[str],
    partition_by: list[str] | None = None,
    pos_col: str = "pos",
) -> DataFrame:
    """Positional (zip) join: row i of left ↔ row i of right.

    Both sides get a deterministic 0-based ``row_number`` (ordered by
    the given columns, optionally per partition key) and are equi-joined
    on it.  Reference: src/lambda_71.py:74-89 (sentence ↔ sentiment by
    list index).

    At scale this is a single shuffle per side on
    ``partition_by + [pos]``; with no ``partition_by`` the row numbering
    is a global sort — acceptable only for small sides (documented).
    """
    pkeys = partition_by or []

    def with_pos(df: DataFrame, order: list[str]) -> DataFrame:
        w = Window.partitionBy(*pkeys).orderBy(*order) if pkeys else Window.orderBy(*order)
        return df.withColumn(pos_col, F.row_number().over(w) - F.lit(1))

    lhs = with_pos(left, left_order)
    rhs = with_pos(right, right_order)
    return lhs.join(rhs, on=pkeys + [pos_col], how="inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_right_first: bool = True,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Implemented as the scalable union-window formulation:
      1. tag both sides, union by a common schema,
      2. one window per key ordered by (ts, side, tiebreak),
      3. ``last(right_value, ignorenulls=True)`` over the running frame,
      4. keep only left rows.

    This shuffles each side once on the key — no range/nested-loop join,
    no broadcast requirement, skew handled by AQE.  Reference semantics:
    src/lambda_72.py:92-118 (forward-only cursor ⇒ "latest span at or
    before the offset"); ``tie_right_first=True`` means a right row at
    exactly ``left_ts`` matches (the reference's inclusive lower bound,
    src/lambda_72.py:105).
    """
    side_order = [0, 1] if tie_right_first else [1, 0]

    lhs = left.withColumn("_side", F.lit(side_order[1]))
    rhs = right.withColumn("_side", F.lit(side_order[0]))

    left_payload = [c for c in left.columns if c not in (on, left_ts)]
    rhs_u = rhs.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.col("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
    )
    lhs_u = lhs.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.col("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
        *[F.col(c) for c in left_payload],
    )

    unioned = rhs_u.unionByName(lhs_u)
    order = [F.col("_ts"), F.col("_side")]
    if right_tiebreak is not None:
        # Deterministic pick among right rows sharing (key, ts): the
        # max tiebreak value wins (nulls — i.e. left rows — sort first).
        order.append(F.col(f"_r_{right_tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_cols
        ],
    )
    out = filled.filter(F.col("_side") == side_order[1]).select(
        F.col(on),
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in left_payload],
        *[F.col(f"_asof_{c}").alias(c) for c in right_cols],
    )
    return out


def range_join(
    probe: DataFrame,
    spans: DataFrame,
    probe_point: str,
    span_start: str,
    span_end: str,
    on: list[str] | None = None,
    broadcast_spans: bool = True,
) -> DataFrame:
    """Interval containment join: span_start <= point < span_end.

    Literal formulation of the reference's offset→sentence assignment
    (src/lambda_72.py:92-105).  Kept for cross-checking ``asof_join``;
    Spark plans pure inequality joins as nested-loop, so this is only
    viable when ``spans`` is broadcastable — assert that intent with the
    hint and prefer ``asof_join`` at scale.
    """
    rhs = F.broadcast(spans) if broadcast_spans else spans
    cond = (probe[probe_point] >= spans[span_start]) & (probe[probe_point] < spans[span_end])
    if on:
        for k in on:
            cond = cond & (probe[k] == spans[k])
        return probe.alias("p").join(rhs.alias("s"), cond, "left").drop(*[spans[k] for k in on])
    return probe.join(rhs, cond, "left")


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread a hot key across ``salt_buckets``
    reducers by salting the skewed side and replicating the small side
    once per salt value.

    AQE's skew-join split handles sort-merge skew at runtime, but not
    every shape (aggregation-followed joins, streaming, or when the
    skewed side must stay hash-partitioned for a later stage) — this
    is the explicit form.  The salt is a deterministic hash of the
    whole row (xxhash64), so reruns produce identical partitioning;
    identical duplicate rows share a bucket (acceptable: skew comes
    from hot KEYS, not duplicated full rows).  Cost: |small| ×
    salt_buckets replication — keep the replicated side genuinely
    small (same contract as a broadcast).
    """
    salted = skewed.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)).cast("int"),
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return salted.join(replicated, on=[on, "_salt"], how=how).drop("_salt")
