"""KMV distinct sketches (r14 groundwork, catalog wiring deferred):
deterministic hash-certifiable distinct counting + the merge law.
``_kmv_sql`` is the oracle generator to lift into catalog.py when
wiring the r15 entry (group-by-source words profile)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from serverless_podcast_etl_spark.operators.sketches import (
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def _kmv_sql(k: int) -> str:
    """DuckDB twin of kmv_sketch→kmv_estimate over per-source words of
    the documents table (the engine's word_tokens tokenization and
    portable 48-bit md5 hash, both already certified twins)."""
    return f"""
WITH w AS (
  SELECT source, unnest(list_filter(
      regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS v
  FROM documents),
h AS (SELECT DISTINCT source,
             CAST(('0x' || substr(md5(v), 1, 12)) AS BIGINT) AS h
      FROM w),
kept AS (
  SELECT source, h FROM (
    SELECT source, h, row_number() OVER (
        PARTITION BY source ORDER BY h ASC) AS rn
    FROM h) WHERE rn <= {k}),
agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
               max(h) AS kth
        FROM kept GROUP BY source)
SELECT source, n_kept,
       round(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                  ELSE {(k - 1) * 2**48} / CAST(kth AS DOUBLE) END,
             2) AS est_distinct
FROM agg
"""


def _words(spark, sf_dir):
    from serverless_podcast_etl_spark.functions import text as text_fns
    from serverless_podcast_etl_spark.plans.catalog import _t

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "source",
        F.explode(text_fns.word_tokens(F.col("text"))).alias("v"),
    )


def test_kmv_duckdb_parity_capped_and_exact(spark):
    """k=64 exercises the estimator branch; k=100000 the exact branch
    (distinct words per source ≪ 100k at sf0.001) — both hash-exact."""
    from .oracle import compare

    sf_dir = "/root/testdata/sf0.001"
    w = _words(spark, sf_dir)
    for k in (64, 100_000):
        est = kmv_estimate(
            kmv_sketch(w, "v", k=k, group_col="source"), k=k
        )
        problems = compare(est, _kmv_sql(k), sf_dir)
        assert not problems, f"k={k}: " + "; ".join(problems)


def test_kmv_merge_law_on_real_data(spark):
    """sketch(A) ⊕ sketch(B) == sketch(A ∪ B), exactly — the property
    that makes per-batch profiling foldable."""
    sf_dir = "/root/testdata/sf0.001"
    w = _words(spark, sf_dir)
    k = 32
    whole = {
        r["source"]: (r["sketch"], r["n_kept"])
        for r in kmv_sketch(w, "v", k=k, group_col="source").collect()
    }
    a = kmv_sketch(
        w.filter(F.length("v") % 2 == 0), "v", k=k, group_col="source"
    )
    b = kmv_sketch(
        w.filter(F.length("v") % 2 == 1), "v", k=k, group_col="source"
    )
    merged = {
        r["source"]: (r["sketch"], r["n_kept"])
        for r in kmv_merge(a, b, k=k, group_col="source").collect()
    }
    assert merged == whole and len(whole) > 0


def test_kmv_estimate_accuracy(spark):
    """k=256 → rsd ≈ 1/sqrt(k−2) ≈ 6%; assert every per-source
    estimate within 20% of the exact distinct count."""
    sf_dir = "/root/testdata/sf0.01"
    w = _words(spark, sf_dir)
    exact = {
        r["source"]: r["d"]
        for r in w.distinct()
        .groupBy("source")
        .agg(F.countDistinct("v").alias("d"))
        .collect()
    }
    est = {
        r["source"]: r["est_distinct"]
        for r in kmv_estimate(
            kmv_sketch(w, "v", k=256, group_col="source"), k=256
        ).collect()
    }
    assert set(est) == set(exact)
    for s, d in exact.items():
        assert abs(est[s] - d) / d < 0.20, (s, est[s], d)


_VALS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    min_size=0, max_size=30,
)


@settings(max_examples=8, deadline=None)
@given(_VALS, _VALS, st.integers(min_value=1, max_value=8))
def test_kmv_merge_law_hypothesis(spark, xs, ys, k):
    mk = lambda vals: spark.createDataFrame(
        [(v,) for v in vals] or [(None,)], "v string"
    ).filter(F.col("v").isNotNull())
    whole = kmv_sketch(mk(xs + ys), "v", k=k).collect()
    merged = kmv_merge(
        kmv_sketch(mk(xs), "v", k=k), kmv_sketch(mk(ys), "v", k=k), k=k
    ).collect()
    w = [(r["sketch"], r["n_kept"]) for r in whole]
    m = [(r["sketch"], r["n_kept"]) for r in merged]
    assert w == m
    # exact branch: when distinct < k the estimate IS the count
    n_distinct = len(set(xs + ys))
    if 0 < n_distinct < k:
        est = kmv_estimate(
            kmv_sketch(mk(xs + ys), "v", k=k), k=k
        ).collect()[0]
        assert est["est_distinct"] == float(n_distinct)


def test_kmv_merge_one_sided_group(spark):
    a = kmv_sketch(
        spark.createDataFrame([("s1", "x")], "g string, v string"),
        "v", k=4, group_col="g",
    )
    b = kmv_sketch(
        spark.createDataFrame([("s2", "y")], "g string, v string"),
        "v", k=4, group_col="g",
    )
    merged = {r["g"]: r["n_kept"] for r in kmv_merge(a, b, k=4, group_col="g").collect()}
    assert merged == {"s1": 1, "s2": 1}
