"""q117 (r13): trained deterministic integer k-means quantizer + IVF
ANN.  Cross-engine exactness is certified by the catalog oracle (the
unrolled-training SQL twin); these tests pin the SEMANTICS with a
hypothesis differential against a plain-Python reimplementation of
the full pipeline (quantize → digest init → Lloyd rounds → invert →
probe → score), plus directed edge cases the fuzz corpus may not
reach (empty-cluster carry-over, partitioning invariance)."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_podcast_etl_spark.operators.similarity import (
    train_kmeans_int8,
    trained_ivf_topk,
)

# -- plain-Python twin --------------------------------------------------------


def _round_half_away(v: float) -> int:
    return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)


def _quantize(vec):
    scale = max(abs(x) for x in vec) / 127.0
    if scale <= 0:
        return [0] * len(vec)
    return [_round_half_away(x / scale) for x in vec]


def _sqdist(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _py_train(rows, k, n_iter, seed):
    codes = {i: _quantize(v) for i, v in rows}
    order = sorted(
        codes, key=lambda i: hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    )
    cents = [list(codes[i]) for i in order[:k]]
    for _ in range(n_iter):
        groups: dict[int, list[list[int]]] = {}
        for q in codes.values():
            d = [_sqdist(q, c) for c in cents]
            groups.setdefault(d.index(min(d)), []).append(q)
        cents = [
            [sum(col) // len(g) for col in zip(*g)]
            if (g := groups.get(c))
            else cents[c]
            for c in range(len(cents))  # k clamps to available rows
        ]
    return cents


def _py_topk(query_rows, corpus_rows, k, n_clusters, n_iter, nprobe, seed):
    cents = _py_train(corpus_rows, n_clusters, n_iter, seed)
    codes = {i: _quantize(v) for i, v in corpus_rows}
    inv: dict[int, list[int]] = {}
    for i, q in codes.items():
        d = [_sqdist(q, c) for c in cents]
        inv.setdefault(d.index(min(d)), []).append(i)
    out = set()
    for qi, qv in query_rows:
        qq = _quantize(qv)
        qn = math.sqrt(sum(x * x for x in qq))
        probes = sorted(
            range(len(cents)), key=lambda c: (_sqdist(qq, cents[c]), c)
        )[:nprobe]
        scored = []
        for p in probes:
            for ni in inv.get(p, []):
                if ni == qi:
                    continue
                cq = codes[ni]
                cn = math.sqrt(sum(x * x for x in cq))
                dot = sum(a * b for a, b in zip(qq, cq))
                if qn == 0 or cn == 0:
                    continue  # degenerate; excluded from the strategy
                scored.append((ni, round(dot / (qn * cn), 4)))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (ni, cos) in enumerate(scored[:k], start=1):
            out.add((qi, ni, cos, rank))
    return out


# -- strategies ---------------------------------------------------------------

_DIM = st.shared(st.integers(min_value=2, max_value=5), key="dim")

# non-zero integer vectors: at least one coordinate != 0 so norms are
# positive and quantization is non-degenerate
_VEC = _DIM.flatmap(
    lambda d: st.lists(
        st.integers(min_value=-31, max_value=31), min_size=d, max_size=d
    ).filter(lambda v: any(x != 0 for x in v))
)

_CORPUS = st.lists(_VEC, min_size=6, max_size=20)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


# -- differentials ------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(_CORPUS, st.integers(min_value=2, max_value=4))
def test_trained_codebook_matches_python(spark, vecs, k):
    rows = list(enumerate(vecs))
    got = train_kmeans_int8(
        _df(spark, rows), "vec_id", n_clusters=k, n_iter=2, seed="hyp"
    )
    assert got == _py_train(rows, k, 2, "hyp")


@settings(max_examples=8, deadline=None)
@given(
    _CORPUS,
    st.integers(min_value=2, max_value=4),
    st.integers(min_value=1, max_value=2),
)
def test_trained_ivf_topk_matches_python(spark, vecs, k_clusters, nprobe):
    rows = list(enumerate(vecs))
    queries = rows[:2]
    got = {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in trained_ivf_topk(
            _df(spark, queries),
            _df(spark, rows),
            "vec_id",
            "vec_id",
            k=5,
            n_clusters=k_clusters,
            n_iter=2,
            nprobe=nprobe,
            seed="hyp",
        ).collect()
    }
    assert got == _py_topk(queries, rows, 5, k_clusters, 2, nprobe, "hyp")


# -- directed edges -----------------------------------------------------------


def test_empty_cluster_keeps_previous_centroid(spark):
    # every vector identical → all rows land in ONE cluster from round
    # 1 on; the other centroid must survive both updates unchanged
    rows = [(i, [10.0, 20.0]) for i in range(6)]
    cents = train_kmeans_int8(
        _df(spark, rows), "vec_id", n_clusters=2, n_iter=2, seed="e"
    )
    code = _quantize([10.0, 20.0])
    assert cents == [code, code]  # init picked the same code twice
    assert cents == _py_train(rows, 2, 2, "e")


def test_training_is_partitioning_invariant(spark):
    rows = [
        (i, [float((i * 7) % 13 - 6), float((i * 11) % 17 - 8), float(i % 5)])
        for i in range(30)
    ]
    one = train_kmeans_int8(
        _df(spark, rows).coalesce(1), "vec_id", n_clusters=3, n_iter=2
    )
    many = train_kmeans_int8(
        _df(spark, rows).repartition(16), "vec_id", n_clusters=3, n_iter=2
    )
    assert one == many == _py_train(rows, 3, 2, "km0")


def test_trained_ivf_ranks_are_contiguous_per_query(spark):
    rows = [
        (i, [float((i * 3) % 7 - 3), float((i * 5) % 11 - 5)])
        for i in range(25)
    ]
    res = trained_ivf_topk(
        _df(spark, rows[:3]),
        _df(spark, rows),
        "vec_id",
        "vec_id",
        k=4,
        n_clusters=3,
        n_iter=2,
        nprobe=2,
    ).collect()
    per_query: dict[int, list[int]] = {}
    for r in res:
        per_query.setdefault(r["query_id"], []).append(r["rank"])
        assert r["neighbor_id"] != r["query_id"]
    for ranks in per_query.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 4


def test_assignment_kernel_matches_expression_tier(spark):
    """The exact-int64 Arrow kernel (_nearest_trained_int) must be
    bit-identical to the interpreted expression fold
    (_assign_trained_cluster) — same distances, same tie order —
    including on ties (duplicate centroids) and all-zero codes."""
    from pyspark.sql import functions as F

    from serverless_podcast_etl_spark.operators.similarity import (
        _assign_trained_cluster,
        _nearest_trained_int,
        quantize_embeddings_int8,
    )

    rows = [
        (i, [float((i * 7) % 13 - 6), float((i * 5) % 9 - 4), float(i % 3)])
        for i in range(40)
    ] + [(100, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes = quantize_embeddings_int8(df, "vec_id").select("vec_id", "q")
    # duplicate centroid (index 1 == index 2) forces tie-breaking
    cents = [[-6, -4, 0], [3, 2, 1], [3, 2, 1], [0, 0, 2]]
    expr = {
        r["vec_id"]: r["c"]
        for r in codes.select(
            "vec_id", _assign_trained_cluster(F.col("q"), cents).alias("c")
        ).collect()
    }
    kern = {
        r["vec_id"]: r["_nc"][0]
        for r in _nearest_trained_int(codes, cents, "q", 1, "_nc").collect()
    }
    assert expr == kern and len(expr) == 41


def test_trained_ivf_oracle_generator_at_alternate_params(spark):
    """The catalog certifies _trained_ivf_sql at its fixed constants
    (8 clusters / 2 rounds / nprobe 2 / k 10); this pins the GENERATOR
    itself — a different unroll depth, cluster count, probe width and
    seed must still hash-match the engine on the real sf0.001 table."""
    from serverless_podcast_etl_spark.plans.catalog import (
        _t,
        _trained_ivf_sql,
    )
    from serverless_podcast_etl_spark.operators import similarity

    from .oracle import compare

    sf_dir = "/root/testdata/sf0.001"
    emb = _t(spark, sf_dir, "embeddings")
    df = similarity.trained_ivf_topk(
        emb.filter(emb.vec_id < 5), emb, "vec_id", "vec_id",
        k=5, n_clusters=3, n_iter=3, nprobe=1, seed="alt",
    )
    sql = _trained_ivf_sql(
        n_clusters=3, n_iter=3, nprobe=1, k=5, seed="alt"
    )
    problems = compare(df, sql, sf_dir)
    assert not problems, "; ".join(problems)


def test_more_clusters_than_rows_trains_with_what_exists(spark):
    """n_clusters > corpus rows must clamp (the oracle's init CTE
    shrinks the same way), not IndexError."""
    rows = [(0, [1.0, 2.0]), (1, [-3.0, 4.0]), (2, [5.0, -6.0])]
    cents = train_kmeans_int8(
        _df(spark, rows), "vec_id", n_clusters=5, n_iter=2, seed="few"
    )
    assert len(cents) == 3
    assert cents == _py_train(rows, 5, 2, "few")


def test_trained_index_roundtrip_prune_and_parity(spark, tmp_path):
    """The persisted trained index: write partitionBy(cluster), reload,
    probe with pruning — results identical to the one-shot
    trained_ivf_topk AND to probing the in-memory index, and the
    pruned disk scan carries static PartitionFilters."""
    from pyspark.sql import functions as F

    from serverless_podcast_etl_spark.operators.similarity import (
        build_trained_ivf_index,
        trained_ivf_probe_topk,
        trained_ivf_topk,
    )
    from serverless_podcast_etl_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    queries = emb.filter(F.col("vec_id") < 4)
    kw = dict(n_clusters=4, n_iter=2, seed="idx")

    index, codebook = build_trained_ivf_index(emb, "vec_id", **kw)
    path = str(tmp_path / "trained_ivf")
    index.write.partitionBy("cluster").parquet(path)
    disk_index = spark.read.parquet(path)

    one_shot = trained_ivf_topk(
        queries, emb, "vec_id", "vec_id", k=8, nprobe=2, **kw
    )
    mem = trained_ivf_probe_topk(
        queries, index, codebook, "vec_id", k=8, nprobe=2
    )
    disk = trained_ivf_probe_topk(
        queries, disk_index, codebook, "vec_id", k=8, nprobe=2
    )
    a = sorted(map(tuple, one_shot.collect()))
    assert a == sorted(map(tuple, mem.collect()))
    assert a == sorted(map(tuple, disk.collect()))
    assert a  # non-vacuous

    plan = disk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters", 1)[1][:200]


def test_empty_corpus_degenerates_with_clear_errors(spark):
    """r13 ADVICE: an empty corpus must not surface as a numpy
    AxisError from the assignment kernel's closure build — training
    returns an empty codebook, the kernel and the index builder
    reject [] with messages that name the actual problem."""
    import pytest

    from serverless_podcast_etl_spark.operators.similarity import (
        _nearest_trained_int,
        build_trained_ivf_index,
    )

    empty = _df(spark, [])
    assert train_kmeans_int8(empty, "vec_id", n_clusters=3, seed="e") == []
    with pytest.raises(ValueError, match="empty codebook"):
        _nearest_trained_int(empty, [], "embedding", 1, "_nc")
    with pytest.raises(ValueError, match="empty corpus"):
        build_trained_ivf_index(empty, "vec_id", n_clusters=3, seed="e")
