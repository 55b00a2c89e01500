"""bm25_prf_topk (r14 groundwork, catalog wiring deferred to r15):
two-pass BM25 with pseudo-relevance-feedback query expansion.

``_prf_sql`` below is the oracle generator to lift into catalog.py
when wiring the entry — it extends the shared ``_bm25_ctes`` body
with the feedback / term-mining / weighted-rescore CTEs and is
first-run certified here at two parameter sets on the real sf0.001
table.  Directed tests pin the semantics (expansion reaches
documents sharing NO original query term; the persisted-index path
is row-identical to the corpus path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from serverless_podcast_etl_spark.operators.retrieval import (
    bm25_prf_topk,
    load_bm25_index,
    write_bm25_index,
)


def _prf_sql(
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 10,
    alpha: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    n_q_tokens: int = 8,
    query_pred: str = "doc_id < 3",
) -> str:
    """DuckDB twin: the shared BM25 body (pass 1) + feedback top docs
    + rounded rational term mining + per-query-max normalization +
    weighted rescore.  Every ranking ranks on ROUNDED values with
    id/term tiebreaks; float literals via repr (the q120
    conventions)."""
    from serverless_podcast_etl_spark.plans.catalog import _bm25_ctes

    body = _bm25_ctes(
        k1=k1, b=b, n_q_tokens=n_q_tokens, query_pred=query_pred
    )
    return f"""
WITH {body},
fb AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id, row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rn
    FROM scored) WHERE rn <= {fb_docs}),
mined AS (
  SELECT query_id, term,
         round(SUM(tf * ((n + 1) / (df + 0.5))), 4) AS w
  FROM postings JOIN dfreq USING (term) JOIN fb USING (neighbor_id)
       CROSS JOIN stats
  GROUP BY query_id, term),
fbw AS (
  SELECT query_id, term,
         round({alpha!r} * w / wmax, 4) AS fbw
  FROM (SELECT query_id, term, w,
               max(w) OVER (PARTITION BY query_id) AS wmax,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY w DESC, term ASC) AS rn
        FROM mined)
  WHERE rn <= {fb_terms}),
combined AS (
  SELECT coalesce(o.query_id, f.query_id) AS query_id,
         coalesce(o.term, f.term) AS term,
         coalesce(o.ow, CAST(0.0 AS DOUBLE))
           + coalesce(f.fbw, CAST(0.0 AS DOUBLE)) AS weight
  FROM (SELECT query_id, term, CAST(1.0 AS DOUBLE) AS ow FROM qterms) o
  FULL JOIN fbw f ON o.query_id = f.query_id AND o.term = f.term),
scored2 AS (
  SELECT query_id, neighbor_id,
         round(SUM(weight * ((n + 1) / (df + 0.5)) * (tf * {k1 + 1.0!r})
                   / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl))),
               4) AS score
  FROM postings JOIN dfreq USING (term) JOIN combined USING (term)
       CROSS JOIN stats
  WHERE query_id <> neighbor_id
  GROUP BY query_id, neighbor_id)
SELECT query_id, neighbor_id, score, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY score DESC, neighbor_id ASC) AS rank FROM scored2)
WHERE rank <= {k}
"""


def _probes(spark, sf_dir, pred, n_tokens):
    from serverless_podcast_etl_spark.functions import text as text_fns
    from serverless_podcast_etl_spark.plans.catalog import _t

    docs = _t(spark, sf_dir, "documents")
    return docs, docs.filter(pred).select(
        "doc_id",
        F.array_join(
            F.slice(text_fns.word_tokens(F.col("text")), 1, n_tokens), " "
        ).alias("text"),
    )


def test_prf_duckdb_parity(spark):
    from .oracle import compare

    sf_dir = "/root/testdata/sf0.001"
    docs, probes = _probes(spark, sf_dir, F.col("doc_id") < 3, 8)
    df = bm25_prf_topk(probes, docs, "doc_id", "doc_id", k=10)
    problems = compare(df, _prf_sql(k=10), sf_dir)
    assert not problems, "; ".join(problems)


def test_prf_duckdb_parity_alternate_params(spark):
    """The generator pin (q117/q119/q120 convention)."""
    from .oracle import compare

    sf_dir = "/root/testdata/sf0.001"
    docs, probes = _probes(spark, sf_dir, F.col("doc_id") % 131 == 2, 5)
    df = bm25_prf_topk(
        probes, docs, "doc_id", "doc_id",
        k=6, fb_docs=3, fb_terms=4, alpha=0.8, k1=1.5, b=0.6,
    )
    sql = _prf_sql(
        k=6, fb_docs=3, fb_terms=4, alpha=0.8, k1=1.5, b=0.6,
        n_q_tokens=5, query_pred="doc_id % 131 = 2",
    )
    problems = compare(df, sql, sf_dir)
    assert not problems, "; ".join(problems)


def test_prf_reaches_beyond_query_vocabulary(spark):
    """The point of PRF: doc 3 shares no term with the query, but
    shares 'beta' with the feedback docs — plain BM25 can never
    return it, PRF ranks it."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "alpha beta"),
            (3, "beta gamma"),
            (4, "delta epsilon"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "alpha")], "doc_id long, text string"
    )
    plain = {
        r["neighbor_id"]
        for r in bm25_prf_topk(
            queries, corpus, "doc_id", "doc_id", k=4, fb_docs=2,
            fb_terms=0,  # expansion off -> original terms only
        ).collect()
    }
    expanded = {
        r["neighbor_id"]
        for r in bm25_prf_topk(
            queries, corpus, "doc_id", "doc_id", k=4, fb_docs=2, fb_terms=3
        ).collect()
    }
    assert plain == {1, 2}
    assert expanded == {1, 2, 3}  # beta mined from feedback reaches doc 3
    # doc 4 shares nothing with query or feedback: never returned
    assert 4 not in expanded


def test_prf_persisted_index_path_is_identical(spark, tmp_path):
    from serverless_podcast_etl_spark.plans.catalog import _t

    sf_dir = "/root/testdata/sf0.001"
    docs, probes = _probes(spark, sf_dir, F.col("doc_id") < 3, 8)
    path = str(tmp_path / "prf_index")
    write_bm25_index(docs, path, "doc_id")
    index, meta = load_bm25_index(spark, path)
    direct = bm25_prf_topk(probes, docs, "doc_id", "doc_id", k=10)
    probed = bm25_prf_topk(
        probes, None, "doc_id", k=10, index=index, meta=meta
    )
    want = sorted(map(tuple, direct.collect()))
    assert sorted(map(tuple, probed.collect())) == want
    assert len(want) > 0

    with pytest.raises(ValueError, match="meta"):
        bm25_prf_topk(probes, None, "doc_id", index=index)
    with pytest.raises(ValueError, match="corpus"):
        bm25_prf_topk(probes, None, "doc_id")
