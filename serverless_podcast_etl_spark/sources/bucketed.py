"""Bucketed-table helpers: co-located joins without a shuffle.

At 100 TB the dominant cost of fact⋈fact joins is shuffling both
sides.  Hive-style bucketing (``bucketBy`` on the join key at write
time) pre-partitions the data on disk so Spark's planner can join
bucket-to-bucket with NO Exchange on either side — the write pays the
shuffle once, every subsequent join rides it.

Bucketed writes require a managed table (``saveAsTable``); plain
path-based parquet cannot carry bucket metadata.  The warehouse keeps
path-based INSERT IGNORE for the podcast dims (small, broadcast
anyway); bucketing is the tool for the big fact tables (sentences,
entities, chunk payloads) keyed by episode.

Verified by ``tests/test_plans.py::test_bucketed_join_has_no_shuffle``:
the joined plan contains SortMergeJoin but zero hashpartitioning
exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a managed parquet table bucketed (and
    optionally sorted) on the join key."""
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two tables bucketed on the same key — bucket-to-bucket,
    shuffle-free when bucket counts match."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
