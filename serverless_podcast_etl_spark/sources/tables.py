"""Parquet table loaders for the driver's synthetic star schema.

Tables (see TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under a
scale-factor directory.

Nanosecond-timestamp handling: the synthetic parquet stores
``TIMESTAMP(NANOS)``, which Spark 4 rejects outright.  The loader flips
``spark.sql.legacy.parquet.nanosAsLong`` (nanos arrive as LongType),
sniffs which columns were timestamp[ns] from the parquet footer via
pyarrow, and rebuilds proper TimestampType columns with
``timestamp_micros(ns div 1000)`` — floor-truncation to µs, matching
what DuckDB/Python deliver for the same files.

Scale notes: plain ``spark.read.parquet`` keeps predicate pushdown and
column pruning available to Catalyst; the ns→µs conversion is a
projection on top and does not block either (verify: filters on other
columns still appear under ``PushedFilters`` in ``.explain``).
No ``.cache()`` here: at 100 TB you want the scan, not a
materialization, and AQE handles sizing.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_nanos_cols_cache: dict[str, list[str]] = {}


def _nanos_columns(path: str) -> list[str]:
    """Column names stored as timestamp[ns] in the parquet footer.

    ``path`` may be a single file (the driver's testdata layout) or a
    Spark-written directory of part files (the cluster norm) — for a
    directory the first part file's footer speaks for the table."""
    if path not in _nanos_cols_cache:
        probe = path
        if os.path.isdir(path):
            parts = sorted(
                f
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            if not parts:
                _nanos_cols_cache[path] = []
                return _nanos_cols_cache[path]
            probe = os.path.join(path, parts[0])
        schema = pq.read_schema(probe)
        _nanos_cols_cache[path] = [
            f.name
            for f in schema
            if str(f.type).startswith("timestamp[ns")
        ]
    return _nanos_cols_cache[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, normalizing ns-timestamps to µs."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for c in _nanos_columns(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic table under ``sf_dir`` as a DataFrame."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            out[name] = load_table(spark, sf_dir, name)
    return out


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (for spark.sql)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
