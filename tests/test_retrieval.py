"""q120 (r14): BM25 keyword retrieval.  Cross-engine exactness is
certified by the catalog oracle; these tests pin the SEMANTICS with a
hypothesis differential against a plain-Python BM25 (both idf forms),
plus directed edges (self-match drop, no-shared-term exclusion,
repeated query terms, empty query)."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from serverless_podcast_etl_spark.operators.retrieval import bm25_topk

# -- plain-Python twin --------------------------------------------------------


def _toks(t):
    return [w for w in re.split(r"\s+", t.lower()) if w]


def _py_bm25(query_rows, corpus_rows, k, k1=1.2, b=0.75, idf="rational"):
    corpus = {i: _toks(t) for i, t in corpus_rows}
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / max(n, 1)
    df: dict[str, int] = {}
    for ts in corpus.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qt in query_rows:
        terms = set(_toks(qt))
        scores = {}
        for did, ts in corpus.items():
            if did == qid:
                continue
            tfs: dict[str, int] = {}
            for t in ts:
                tfs[t] = tfs.get(t, 0) + 1
            s, hit = 0.0, False
            for t in sorted(terms):
                tf = tfs.get(t, 0)
                if tf == 0:
                    continue
                hit = True
                w = (
                    (n + 1) / (df[t] + 0.5)
                    if idf == "rational"
                    else math.log1p((n - df[t] + 0.5) / (df[t] + 0.5))
                )
                s += w * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * len(ts) / avgdl)
                )
            if hit:
                scores[did] = round(s, 4)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, s, r + 1) for r, (d, s) in enumerate(ranked)]
    return out


# -- strategies: small vocab so term overlap actually happens -----------------

_WORD = st.sampled_from(
    ["the", "cat", "sat", "mat", "dog", "ran", "far", "sun", "Pig", "ox"]
)
_DOC = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=4, max_size=12)


def _dfs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@settings(max_examples=8, deadline=None)
@given(_CORPUS, st.sampled_from(["rational", "lucene"]))
def test_bm25_matches_python(spark, docs, idf):
    rows = list(enumerate(docs))
    queries = rows[:2]
    got: dict = {q: [] for q, _ in queries}
    res = bm25_topk(
        _dfs(spark, queries), _dfs(spark, rows), "doc_id", "doc_id",
        k=5, idf=idf,
    ).collect()
    for r in res:
        got[r["query_id"]].append(
            (r["neighbor_id"], r["score"], r["rank"])
        )
    want = _py_bm25(queries, rows, k=5, idf=idf)
    assert {q: sorted(v) for q, v in got.items()} == {
        q: sorted(v) for q, v in want.items()
    }


def test_bm25_directed_edges(spark):
    corpus = [
        (0, "alpha beta gamma"),
        (1, "alpha alpha beta"),
        (2, "delta epsilon zeta"),
        (3, ""),
    ]
    # repeated query terms dedupe in-row; doc 2/3 share nothing
    queries = [(0, "alpha alpha beta"), (9, "")]
    res = bm25_topk(
        _dfs(spark, queries), _dfs(spark, corpus), "doc_id", "doc_id", k=5
    ).collect()
    by_q: dict = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # self-match dropped, non-overlapping docs absent, empty query empty
    assert by_q == {0: [1]}
    want = _py_bm25(queries, corpus, k=5)
    assert [(n,) for n in by_q[0]] == [(d,) for d, _, _ in want[0]]


def test_bm25_oracle_generator_at_alternate_params(spark):
    """Pin the GENERATOR (the q117/q119 convention): different k1/b/k,
    probe length and query set must still hash-match the engine on the
    real sf0.001 table."""
    from serverless_podcast_etl_spark.functions import text as text_fns
    from serverless_podcast_etl_spark.plans.catalog import _bm25_sql, _t

    from .oracle import compare

    sf_dir = "/root/testdata/sf0.001"
    docs = _t(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.array_join(
            F.slice(text_fns.word_tokens(F.col("text")), 1, 5), " "
        ).alias("text"),
    )
    df = bm25_topk(
        probes, docs, "doc_id", "doc_id", k=4, k1=1.6, b=0.6
    )
    sql = _bm25_sql(
        k=4, k1=1.6, b=0.6, n_q_tokens=5, query_pred="doc_id % 7 = 0"
    )
    problems = compare(df, sql, sf_dir)
    assert not problems, "; ".join(problems)
