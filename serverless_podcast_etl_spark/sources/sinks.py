"""Stage sinks (S13/S14): transcript sentences as ordered text and
JSON-array files.

The reference writes each episode's transcript as (a) a .txt with one
sentence per line (src/lambda_5.py:90-97 — the Comprehend
ONE_DOC_PER_LINE input) and (b) a .json sentence array
(src/lambda_5.py:88,98).  The engine's preferred form is the exploded
(episode_id, sentence_index, sentence_text) table; these sinks
materialize the reference's file shapes from it when a downstream
consumer needs them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_sentences_text(sentences: DataFrame, path: str) -> None:
    """One text file tree per episode, one sentence per line, in
    sentence_index order (S13).

    partitionBy routes each episode to its own directory; rows are
    sorted within partitions BEFORE the write, so line order in each
    file is the sentence order — no driver-side collect at any size.
    """
    (
        sentences.select("episode_id", "sentence_index", "sentence_text")
        .repartition("episode_id")
        .sortWithinPartitions("episode_id", "sentence_index")
        .select("episode_id", "sentence_text")
        .write.mode("overwrite")
        .partitionBy("episode_id")
        .text(path)
    )


def write_sentences_json(sentences: DataFrame, path: str) -> None:
    """One JSON record per episode carrying the ordered sentence array
    (S14) — array_sort over (index, text) structs keeps the order
    inside the aggregate, one shuffle on episode_id.
    """
    (
        sentences.groupBy("episode_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("sentence_index").alias("i"),
                            F.col("sentence_text").alias("t"),
                        )
                    )
                ),
                lambda x: x["t"],
            ).alias("sentences")
        )
        .write.mode("overwrite")
        .json(path)
    )


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write sized for scan pruning.

    Two 100 TB concerns in one writer: (a) directory partitioning on
    the filter columns lets every downstream scan prune whole
    partitions before reading a byte (PartitionFilters in the plan —
    asserted in tests/test_plans.py); (b) repartitioning on the same
    columns first collapses output to ONE file per partition directory
    instead of one small file per task per partition — the small-files
    problem that otherwise throttles the next reader's listing and
    task scheduling.  (A partition too big for one file would add a
    within-partition bucket column to the repartition — not needed at
    this corpus's partition sizes.)
    """
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
