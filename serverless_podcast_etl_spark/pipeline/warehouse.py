"""Parquet-backed warehouse with INSERT IGNORE append semantics.

The reference's warehouse is MySQL with UNIQUE-key INSERT IGNORE
(src/lambda_2.py:205-238); ours is parquet directories with anti-join
dedup before every append — the same idempotency contract, columnar.
A real deployment would swap the format for Delta/Iceberg and the
anti-join for MERGE; the interface here is format-agnostic.

Surrogate keys: ``AUTO_INCREMENT`` is emulated with
``row_number().over(Window.orderBy(natural_key)) + max(existing)`` —
deterministic given the natural key (SURVEY §7.4.1).  The global
window is single-partition: fine for dimension tables (podcasts,
episodes — thousands of rows), NOT for fact-scale data; fact tables
(sentence/entity) key on natural composite keys instead, and their
surrogate ids are zipWithIndex-free dense ranks per partition batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import schemas
from ..operators.aggregates import dedup_insert

DIM_SCHEMAS = {
    "time_dimension": schemas.TIME_DIM,
    "podcast_dimension": schemas.PODCAST_DIM,
    "episode_dimension": schemas.EPISODE_DIM,
    "sentence_dimension": schemas.SENTENCE_DIM,
    "entity_dimension": schemas.ENTITY_DIM,
}


class Warehouse:
    """A directory of parquet tables with idempotent appends."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.exists(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )

    def read(self, table: str) -> DataFrame:
        if self.exists(table):
            return self.spark.read.parquet(self.path(table))
        return self.spark.createDataFrame([], DIM_SCHEMAS[table])

    def insert_ignore(self, table: str, incoming: DataFrame) -> int:
        """Append rows whose natural key is new (INSERT IGNORE, A7).

        Returns the number of rows appended.  Re-delivery of the same
        batch is a no-op — the idempotency contract every stage of the
        reference relies on (FIFO dedup + INSERT IGNORE).
        """
        keys = schemas.NATURAL_KEYS[table]
        existing = self.read(table)
        fresh = dedup_insert(existing, incoming, keys)
        n = fresh.count()
        if n:
            fresh.select(*[f.name for f in DIM_SCHEMAS[table].fields]).write.mode(
                "append"
            ).parquet(self.path(table))
        return n

    def update_rows(
        self, table: str, updates: DataFrame, keys: list[str]
    ) -> int:
        """Keyed column UPDATE (src/lambda_3.py:127-133's ``UPDATE …
        SET downloaded=TRUE, num_chunks=N``).

        Non-key columns of ``updates`` replace the stored values for
        matching keys; rows with no update and columns not present in
        ``updates`` are untouched (null update values keep the stored
        value).  Parquet has no in-place update, so this is
        read → merge → overwrite with the lineage broken by an eager
        localCheckpoint; a production deployment swaps this for a
        Delta/Iceberg ``MERGE`` — the call signature is the contract.
        Returns the number of matched (updated) rows.
        """
        existing = self.read(table)
        upd_cols = [c for c in updates.columns if c not in keys]
        aliased = updates.select(
            *keys, *[F.col(c).alias(f"_u_{c}") for c in upd_cols]
        )
        n_matched = existing.join(F.broadcast(aliased), keys, "left_semi").count()
        merged = existing.join(F.broadcast(aliased), keys, "left")
        for c in upd_cols:
            merged = merged.withColumn(c, F.coalesce(F.col(f"_u_{c}"), F.col(c)))
        merged = merged.select(*[f.name for f in DIM_SCHEMAS[table].fields])
        if self.exists(table):
            # break lineage so the overwrite doesn't read its own input
            merged = merged.localCheckpoint(eager=True)
        merged.write.mode("overwrite").parquet(self.path(table))
        return n_matched

    def next_surrogate_base(self, table: str, id_col: str) -> int:
        existing = self.read(table)
        row = existing.agg(F.max(id_col).alias("m")).collect()[0]
        return (row["m"] or 0) + 1


def with_surrogate_key(
    df: DataFrame,
    id_col: str,
    natural_order: list[str],
    base: int = 1,
) -> DataFrame:
    """Deterministic AUTO_INCREMENT emulation (SURVEY §7.4.1).

    row_number over the natural UNIQUE key, offset by the current max —
    reruns over the same input produce identical ids.  Single-partition
    global sort: dimension-scale only (documented; fact tables use
    composite natural keys).
    """
    w = Window.orderBy(*natural_order)
    return df.withColumn(
        id_col, (F.row_number().over(w) + F.lit(base - 1)).cast("long")
    )
