"""Scale helpers shared by compute-heavy operators.

Text-hashing operators (MinHash, SimHash, fingerprints, tokenize) are
CPU-bound per row, so their wall-clock is set by how many cores the
work fans out to — not by bytes.  A small corpus stored as one parquet
row group is unsplittable and would pin the whole job to a single
task.  ``ensure_parallelism`` round-robins such inputs across the
cluster's default parallelism; on a real many-file 100 TB input the
split estimate exceeds the core count and this is a no-op (no shuffle
is added).

Optimization-round rework (guide §1.2 "per-task work" + §2.5 "input
skew"): the original probe was ``df.rdd.getNumPartitions()``, which
builds the full physical plan on the driver — measured 0.2-1.0 s of
catalyst work PER CALL, paid again on every re-plan because bench/
driver runs construct fresh DataFrames.  Worse, the static partition
count is blind to AQE: a frame behind a shuffle reports
``spark.sql.shuffle.partitions`` statically, but AQE coalesces the
runtime exchange down to 1-2 partitions when the shuffled BYTES are
small, serializing the md5/shingle scan that follows (measured: the
q99 admission path hashed ~4.4k docs on 2 tasks, 0.8 s/stage).  The
probe now estimates SCAN SPLITS from the frame's input files
(analysis-only, ~5 ms): when the estimate covers the target the frame
is left alone exactly as before; when the input is split-starved the
frame is round-robined with an explicit numbered repartition, which
AQE never coalesces — so the fan-out survives to runtime even behind
a small shuffle.  Frames with no input files at all (in-memory test
fixtures, checkpoint scans) keep the original exact ``.rdd`` probe.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame

_SIZE_SUFFIX = {
    "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
}


def _parse_bytes(s: str) -> int:
    """Parse a Spark byte-size conf string ('128MB', '134217728b')."""
    s = s.strip().lower()
    num = s.rstrip("kmgtb")
    suffix = s[len(num):] or "b"
    return int(float(num) * _SIZE_SUFFIX.get(suffix, 1))


def _estimated_scan_splits(files: list[str], max_partition_bytes: int) -> int:
    """Lower-bound estimate of the scan's task count from file sizes:
    each file contributes ceil(size / maxPartitionBytes) splits (a
    small file is one split).  Unstat-able paths (remote filesystems)
    count as one split each — an UNDER-estimate, which errs toward
    repartitioning; callers on genuinely large remote inputs clear the
    ``len(files) >= target`` early-out long before sizes matter."""
    splits = 0
    for f in files:
        p = urlparse(f).path or f
        try:
            size = os.stat(p).st_size
        except OSError:
            size = 0
        splits += max(1, -(-size // max_partition_bytes))
    return splits


def local_frame(spark, rows, schema) -> DataFrame:
    """Driver-known rows as a DataFrame WITHOUT Python workers at
    execution time.

    ``spark.createDataFrame(list)`` parallelizes pickled rows over
    default-parallelism PYTHON partitions: every action over the frame
    (broadcast builds included) launches a Python worker per partition
    — ~0.5-1.5 s for a frame of a few rows (NOTES fact 23).  Routing
    the same rows through pandas takes the Arrow path into the JVM, so
    execution reads JVM-side batches and no Python worker ever spawns.
    Same rows, same schema, positional column mapping.  Falls back to
    the plain path for empty inputs (nothing to optimize) or if the
    pandas conversion is rejected (exotic types).
    """
    rows = list(rows)
    if rows:
        try:
            import pandas as pd

            return spark.createDataFrame(
                pd.DataFrame(rows), schema=schema
            )
        except Exception:
            pass
    return spark.createDataFrame(rows, schema)


def keyed_parallelism(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Hash-repartition on ``key_cols`` with an EXPLICIT partition
    count, for shuffles feeding CPU-bound Python stages
    (``mapInPandas``/``applyInPandas``).

    A bare ``df.repartition(*cols)`` is a REPARTITION_BY_COL shuffle,
    which AQE freely coalesces by BYTE size — measured on the EWMA
    path: ~2 MB of shuffled events coalesced to 2 partitions,
    serializing 2.7 s of per-row pandas work onto 2 tasks.  Bytes say
    nothing about downstream Python cost, so these shuffles pin their
    count: max(configured shuffle partitions, default parallelism) —
    the cluster-tuned width at scale, the core count locally — which
    AQE leaves alone (REPARTITION_BY_NUM).
    """
    spark = df.sparkSession
    try:
        # no fallback argument: Spark 4 VALIDATES a supplied default
        # against the conf's requirement (a "0" sentinel throws);
        # without one the session's effective value comes back
        conf_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        conf_n = 0
    n = max(conf_n, spark.sparkContext.defaultParallelism)
    return df.repartition(n, *key_cols)


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism * min_factor``
    when its input cannot fan the scan out that wide; pass through
    (zero cost) otherwise.  Streaming frames pass through untouched —
    micro-batch partitioning belongs to the source.

    The returned repartition is an explicit numbered one
    (REPARTITION_BY_NUM), deliberately: AQE's byte-based partition
    coalescing must not undo the fan-out — the operators calling this
    are CPU-bound per ROW, and their small shuffled byte size says
    nothing about the md5/tokenize work downstream.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * min_factor
    files = df.inputFiles()
    if len(files) >= target:
        # many-file input: the scan already fans out at least one task
        # per file — the 100 TB no-op path, decided without touching
        # the physical planner
        return df
    if not files:
        # no file source (in-memory fixtures, checkpoint scans): fall
        # back to the exact physical probe — rare, and such frames
        # already carry an executed partitioning
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
        return df
    try:
        max_pb = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes")
        )
    except Exception:
        max_pb = 128 << 20
    if _estimated_scan_splits(files, max_pb) >= target:
        return df
    return df.repartition(target)
