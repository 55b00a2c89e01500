"""mmr_rerank (r14 groundwork, catalog wiring deferred to r15):
greedy maximal-marginal-relevance diversification.  Exactness is by
construction (int8-quantized similarity → order-free integer sums +
single IEEE ops — see the operator docstring); these tests pin

* the semantics with a hypothesis differential against a plain-Python
  greedy twin that replicates the kernel's arithmetic path op-for-op,
* directed edges (near-dup demotion, lam=1 pure relevance, parameter
  and group-size guards), and
* a DuckDB k-step CTE unroll (the q117 Lloyd precedent) producing the
  IDENTICAL rows on the real sf0.001 embeddings — the oracle the r15
  catalog entry will register.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from serverless_podcast_etl_spark.operators.retrieval import mmr_rerank

# -- plain-Python twin (kernel arithmetic, op for op) -------------------------


def _py_mmr(rows, k, lam):
    """rows: [(id, rel, int_vector)] with max|component| = 127 so the
    int8 quantization is the identity (scale = 1.0, codes = values)."""
    rows = sorted(rows)
    n = len(rows)
    lam1 = 1.0 - lam
    sim = [[0.0] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            na = sum(a * a for a in rows[i][2])
            nb = sum(b * b for b in rows[j][2])
            if na > 0 and nb > 0:
                cos = sum(
                    a * b for a, b in zip(rows[i][2], rows[j][2])
                ) / math.sqrt(na * nb)
                sim[i][j] = math.floor(cos * 10000.0) / 10000.0
    taken = [False] * n
    maxsim = None
    out = []
    for step in range(min(k, n)):
        best, best_obj = None, None
        for i in range(n):
            if taken[i]:
                continue
            obj = (
                lam * rows[i][1]
                if maxsim is None
                else lam * rows[i][1] - lam1 * maxsim[i]
            )
            if best is None or obj > best_obj:  # ids ascend: ties -> lower id
                best, best_obj = i, obj
        taken[best] = True
        out.append((rows[best][0], best_obj, step + 1))
        col = [sim[i][best] for i in range(n)]
        maxsim = (
            col if maxsim is None else [max(a, b) for a, b in zip(maxsim, col)]
        )
    return out


_VEC = st.lists(
    st.integers(min_value=-127, max_value=127), min_size=3, max_size=3
).map(lambda t: [127] + t)  # anchor 127 -> scale exactly 1.0
_REL = st.integers(min_value=-9999, max_value=9999).map(lambda r: r / 10000.0)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(_REL, _VEC), min_size=2, max_size=10),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.integers(min_value=1, max_value=6),
)
def test_mmr_matches_python(spark, cands, lam, k):
    rows = [(i, rel, vec) for i, (rel, vec) in enumerate(cands)]
    df = spark.createDataFrame(
        [(0, i, rel, [float(x) for x in vec]) for i, rel, vec in rows],
        "query_id long, neighbor_id long, score double, embedding array<double>",
    )
    got = [
        (r["neighbor_id"], r["mmr_score"], r["rank"])
        for r in mmr_rerank(df, k=k, lam=lam)
        .orderBy("rank")
        .collect()
    ]
    want = _py_mmr(rows, k=k, lam=lam)
    assert [(i, rk) for i, _, rk in got] == [(i, rk) for i, _, rk in want]
    for (_, gs, _), (_, ws, _) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-6)


def test_mmr_directed_edges(spark):
    # doc 1 and 2 are near-duplicates with top relevance; doc 3 is
    # orthogonal with lower relevance.  Pure relevance (lam=1) keeps
    # the duplicate pair adjacent; balanced MMR demotes the duplicate
    # below the orthogonal doc.
    rows = [
        (0, 1, 0.99, [127.0, 0.0, 0.0]),
        (0, 2, 0.98, [127.0, 1.0, 0.0]),
        (0, 3, 0.50, [0.0, 127.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows,
        "query_id long, neighbor_id long, score double, embedding array<double>",
    )
    by_rank = lambda res: [
        r["neighbor_id"] for r in res.orderBy("rank").collect()
    ]
    assert by_rank(mmr_rerank(df, k=3, lam=1.0)) == [1, 2, 3]
    assert by_rank(mmr_rerank(df, k=3, lam=0.5)) == [1, 3, 2]

    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(df, k=2, lam=1.5)
    with pytest.raises(Exception, match="max_candidates"):
        mmr_rerank(df, k=2, max_candidates=2).collect()


# -- DuckDB k-step unroll parity ----------------------------------------------


def _mmr_sql(
    k: int = 5,
    lam: float = 0.5,
    n_cand: int = 12,
    q_pred: str = "vec_id < 2",
) -> str:
    """DuckDB twin: q22-shaped candidate generation, the certified q54
    quantization CTE, then the greedy loop unrolled into k CTE steps
    (the q117 convention).  Every float op mirrors the kernel: integer
    dots as exact doubles, cos = dot/sqrt(na·nb), floor(cos·1e4)/1e4,
    lam·rel − lam1·max(sim), ties to the lower id."""
    lam_r, lam1_r = repr(float(lam)), repr(1.0 - float(lam))
    sim = (
        "CASE WHEN c.nq > 0 AND sq.nq > 0 THEN "
        "floor((list_dot_product(c.qs, sq.qs) / sqrt(c.nq * sq.nq)) "
        "* 10000.0) / 10000.0 ELSE 0.0 END"
    )
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at
    # every reference, and each unroll step references sel_{i-1} three
    # times -> EXPONENTIAL expansion in k (k=8 ran the machine out of
    # file handles re-opening the parquet); materializing cq and the
    # sel chain makes the unroll linear.
    steps = []
    for i in range(2, k + 1):
        prev = f"sel{i - 1}"
        steps.append(f"""
pick{i} AS MATERIALIZED (
  SELECT query_id, neighbor_id, mmr, {i} AS rank FROM (
    SELECT query_id, neighbor_id, mmr, row_number() OVER (
        PARTITION BY query_id ORDER BY mmr DESC, neighbor_id ASC) AS rn
    FROM (
      SELECT c.query_id, c.neighbor_id,
             {lam_r} * c.cosine - {lam1_r} * max({sim}) AS mmr
      FROM cq c
      JOIN {prev} s ON s.query_id = c.query_id
      JOIN cq sq ON sq.query_id = s.query_id
                AND sq.neighbor_id = s.neighbor_id
      WHERE NOT EXISTS (SELECT 1 FROM {prev} x
                        WHERE x.query_id = c.query_id
                          AND x.neighbor_id = c.neighbor_id)
      GROUP BY c.query_id, c.neighbor_id, c.cosine))
  WHERE rn = 1),
sel{i} AS MATERIALIZED (
  SELECT * FROM {prev} UNION ALL SELECT * FROM pick{i})""")
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
s AS (SELECT vec_id, e,
             list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
      FROM v),
codes AS (SELECT vec_id,
                 list_transform(e, x -> CASE WHEN scale > 0
                                             THEN round(x / scale)
                                             ELSE 0 END) AS qs
          FROM s),
cand AS (
  SELECT query_id, neighbor_id, cosine FROM (
    SELECT query_id, neighbor_id, cosine, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
    FROM (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(list_dot_product(q.e, c.e) /
                       (sqrt(list_dot_product(q.e, q.e)) *
                        sqrt(list_dot_product(c.e, c.e))), 4) AS cosine
          FROM (SELECT * FROM v WHERE {q_pred}) q, v c
          WHERE q.vec_id <> c.vec_id))
  WHERE rn <= {n_cand}),
cq AS MATERIALIZED (
  SELECT cand.query_id, cand.neighbor_id, cand.cosine, codes.qs,
         list_dot_product(codes.qs, codes.qs) AS nq
  FROM cand JOIN codes ON cand.neighbor_id = codes.vec_id),
sel1 AS MATERIALIZED (
  SELECT query_id, neighbor_id, {lam_r} * cosine AS mmr, 1 AS rank FROM (
    SELECT query_id, neighbor_id, cosine, row_number() OVER (
        PARTITION BY query_id
        ORDER BY {lam_r} * cosine DESC, neighbor_id ASC) AS rn
    FROM cq) WHERE rn = 1),{','.join(steps)}
SELECT query_id, neighbor_id, round(mmr, 6) AS mmr_score,
       CAST(rank AS INT) AS rank
FROM sel{k}
"""


def _spark_mmr(spark, sf_dir, k, lam, n_cand, q_filter):
    from serverless_podcast_etl_spark.operators.similarity import (
        brute_force_topk,
    )
    from serverless_podcast_etl_spark.plans.catalog import _t

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(q_filter)
    cands = brute_force_topk(queries, emb, "vec_id", "vec_id", k=n_cand)
    with_vec = cands.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    return mmr_rerank(with_vec, k=k, lam=lam, rel_col="cosine")


def test_mmr_duckdb_unroll_parity(spark):
    from .oracle import compare

    sf_dir = "/root/testdata/sf0.001"
    df = _spark_mmr(spark, sf_dir, k=5, lam=0.5, n_cand=12,
                    q_filter=F.col("vec_id") < 2)
    problems = compare(df, _mmr_sql(k=5, lam=0.5, n_cand=12), sf_dir)
    assert not problems, "; ".join(problems)


def test_mmr_duckdb_unroll_parity_alternate_params(spark):
    """The generator pin (q117/q119/q120 convention): different k,
    lam, candidate width and query set must still hash-match."""
    from .oracle import compare

    sf_dir = "/root/testdata/sf0.001"
    df = _spark_mmr(spark, sf_dir, k=3, lam=0.7, n_cand=8,
                    q_filter=F.col("vec_id") % 150 == 1)
    problems = compare(
        df, _mmr_sql(k=3, lam=0.7, n_cand=8, q_pred="vec_id % 150 = 1"),
        sf_dir,
    )
    assert not problems, "; ".join(problems)


def test_mmr_null_vector_is_refused(spark):
    df = spark.createDataFrame(
        [(0, 1, 0.9, [127.0, 0.0, 0.0]), (0, 2, 0.8, None)],
        "query_id long, neighbor_id long, score double, embedding array<double>",
    )
    with pytest.raises(Exception, match="NULL 'embedding'"):
        mmr_rerank(df, k=2).collect()
