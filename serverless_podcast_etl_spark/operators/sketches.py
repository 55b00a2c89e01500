"""Deterministic distinct-count sketches: KMV (k minimum values).

q41's HLL++ profile (``approx_count_distinct``) is the built-in
constant-memory tier, but it is approximate BY IMPLEMENTATION — its
value depends on Spark's HLL internals, so it can only ever be
rows-only-checked.  KMV is the certifiable alternative: hash every
value with the engine's portable 48-bit md5 hash
(``functions.hashing.portable_hash48`` — identical in Spark and
DuckDB), keep the k smallest DISTINCT hashes, and estimate

    distinct ≈ (k − 1) · 2^48 / h_(k)

(exact count when fewer than k distinct hashes survive).  Everything
is integer arithmetic plus one division, so sketch, estimate AND
merge are bit-identical across engines — an approximate operator
with an exact oracle, the q117 property in sketch form.

Why KMV at 100 TB when HLL exists: the sketch is a MERGEABLE bounded
summary (k longs per group) with a trivial merge law — the k-min of
a union is the k-min of the concatenated sketches — so per-shard /
per-day sketches combine into corpus-wide distinct counts without
rescanning anything, and the merge itself is certifiable.  Profile
each ingest batch once, fold summaries forever (the band-index /
trained-IVF staged-materialization story, profiling edition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash48

#: hash space size: portable_hash48 is uniform on [0, 2^48)
_KMV_SPACE = 2**48


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_col: str | None = None,
) -> DataFrame:
    """Build the per-group KMV sketch: ``(group?, sketch, n_kept)``
    where ``sketch`` is the ASCENDING array of the ≤k smallest
    distinct 48-bit hashes of ``value_col``.

    Plan shape: distinct (group, hash) pairs — one hash-aggregate
    shuffle, same key-volume as an exact ``count_distinct`` — then a
    per-group window keeping k rows.  The payoff over exact counting
    is not this first pass but every pass AFTER it: the sketch is the
    bounded artifact you persist and merge (``kmv_merge``) instead of
    rescanning the corpus.  NULL values are ignored (the
    ``count_distinct`` convention).

    ``value_col`` must be a STRING column (md5's input type; Spark
    raises an AnalysisException otherwise).  Casting numerics
    yourself is deliberate: an implicit cast here would hide that
    float→string formatting differs across engines, which would
    silently break the DuckDB twin — cast to a canonical string
    form at the call site.
    """
    grp = [group_col] if group_col else []
    hashed = (
        df.filter(F.col(value_col).isNotNull())
        .select(*grp, portable_hash48(F.col(value_col)).alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*grp).orderBy(F.asc("_h"))
    kept = hashed.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return kept.groupBy(*grp).agg(
        F.sort_array(F.collect_list("_h")).alias("sketch"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def kmv_estimate(
    sketches: DataFrame, k: int = 256, round_to: int = 2
) -> DataFrame:
    """Distinct-count estimate from a sketch frame: exact ``n_kept``
    when the sketch never filled, else ``(k−1)·2^48 / h_(k)``.  The
    numerator is an exact integer whose double conversion is exact
    (≤ 48 + log2(k) significant bits), the k-th min is an exact
    integer, so the single division produces the identical double in
    any engine; rounded to ``round_to``.  Scalar output columns keep
    the frame oracle-hashable (arrays are not)."""
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float((k - 1) * _KMV_SPACE))
        / F.element_at("sketch", k).cast("double")
    )
    return sketches.select(
        *[c for c in sketches.columns if c not in ("sketch", "n_kept")],
        "n_kept",
        F.round(est, round_to).alias("est_distinct"),
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, k: int = 256, group_col: str | None = None
) -> DataFrame:
    """Fold two sketch frames into one: per group, the k smallest
    distinct hashes of the concatenated sketches — EXACTLY the sketch
    of the unioned underlying data (the KMV merge law, deterministic,
    so merge order can never change a result).  Cost is bounded by
    sketch sizes (≤2k rows per group after explode), never by data.
    Groups present in only one input pass through unchanged."""
    grp = [group_col] if group_col else []
    exploded = (
        a.select(*grp, "sketch")
        .unionByName(b.select(*grp, "sketch"))
        .select(*grp, F.explode("sketch").alias("_h"))
        .distinct()
    )
    w = Window.partitionBy(*grp).orderBy(F.asc("_h"))
    kept = exploded.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return kept.groupBy(*grp).agg(
        F.sort_array(F.collect_list("_h")).alias("sketch"),
        F.count(F.lit(1)).alias("n_kept"),
    )
