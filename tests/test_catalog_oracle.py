"""Every oracle-backed catalog query must match DuckDB exactly —
the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from serverless_podcast_etl_spark.plans.catalog import CATALOG

from .oracle import compare

ORACLE_QUERIES = sorted(n for n, d in CATALOG.items() if d.sql is not None)
ROWS_ONLY_QUERIES = sorted(n for n, d in CATALOG.items() if d.sql is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    d = CATALOG[name]
    df = d.fn(spark, sf_dir)
    problems = compare(df, d.sql, sf_dir)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    d = CATALOG[name]
    df = d.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
