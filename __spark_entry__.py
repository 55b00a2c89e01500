"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2
(plus the corpus-curation surface) as ``(spark, sf_dir) -> DataFrame``
callables; ``oracle_sql()`` gives each one's DuckDB twin where
SQL-expressible.  The real catalog lives in
``serverless_podcast_etl_spark/plans/catalog.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from serverless_podcast_etl_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Mention counts descending — the reference dashboard's headline
    bar-plot query (ec2_data/app.py:180-187) over the events table.
    """
    return catalog.q02_event_type_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
