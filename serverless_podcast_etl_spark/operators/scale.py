"""Scale helpers shared by compute-heavy operators.

Text-hashing operators (MinHash, SimHash, fingerprints, tokenize) are
CPU-bound per row, so their wall-clock is set by how many cores the
scan fans out to — not by bytes.  A small corpus stored as one parquet
row group is unsplittable and would pin the whole job to a single
task.  ``ensure_parallelism`` round-robins such inputs across the
cluster's default parallelism; on a real many-file 100 TB input the
partition count already exceeds the core count and this is a no-op
(no shuffle is added).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism * min_factor``
    when the physical scan has fewer partitions; pass through (zero
    cost) otherwise.  Streaming frames pass through untouched —
    micro-batch partitioning belongs to the source (and ``df.rdd``,
    used for the partition-count probe, is illegal on streams)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
