"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then compares row count + column names + an
order-insensitive multiset of normalized values (columns sorted by
name, like the driver's value-hash).
"""

from __future__ import annotations

import datetime
import math
from collections import Counter
from decimal import Decimal

import duckdb

from serverless_podcast_etl_spark.sources.tables import TABLE_NAMES


def _normalize(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / representation noise at the driver's hash level
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_normalize(x) for x in v)
    return v


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    s_idx = {c: i for i, c in enumerate(s_cols)}
    o_idx = {c: i for i, c in enumerate(o_cols)}

    def key(row, idx):
        return tuple(_normalize(row[idx[s_cols[i]]]) for i in order)

    s_multiset = Counter(key(r, s_idx) for r in s_rows)
    o_multiset = Counter(key(r, o_idx) for r in o_rows)
    if s_multiset != o_multiset:
        only_s = list((s_multiset - o_multiset).items())[:3]
        only_o = list((o_multiset - s_multiset).items())[:3]
        problems.append(
            f"value multisets differ; spark-only sample={only_s} oracle-only sample={only_o}"
        )
    return problems
