"""q103 cluster-balanced embedding sampling (r10): quantizer-cell
assignment + per-cell digest quota.  Cross-engine exactness is
certified by the catalog oracle; these tests pin the SEMANTICS."""

from __future__ import annotations

from serverless_podcast_etl_spark.operators.similarity import (
    cluster_balanced_sample,
    spherical_assign,
)

#: two orthogonal unit centroids — vectors along +x land in cell 1,
#: along +y in cell 2 (DuckDB/Spark array positions are 1-based)
_CENTROIDS = [[1.0, 0.0], [0.0, 1.0]]


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _dense_mode_corpus(spark):
    """9 vectors in the +x cell (the dense mode), 2 in the +y cell."""
    rows = [(i, [1.0, 0.01 * i]) for i in range(1, 10)]
    rows += [(100, [0.0, 1.0]), (101, [0.05, 1.0])]
    return _emb(spark, rows)


def test_per_cell_quota_flattens_the_dense_mode(spark):
    out = cluster_balanced_sample(
        _dense_mode_corpus(spark),
        id_col="vec_id",
        n_per_cell=3,
        centroids=_CENTROIDS,
    ).collect()
    by_cell: dict[int, list] = {}
    for r in out:
        by_cell.setdefault(r["cell"], []).append(r)
    # dense mode capped at 3, sparse cell keeps its 2 — coverage is
    # flattened instead of following the corpus density
    assert len(by_cell[1]) == 3
    assert len(by_cell[2]) == 2
    assert sorted(r["rank_in_cell"] for r in by_cell[1]) == [1, 2, 3]
    assert sorted(r["rank_in_cell"] for r in by_cell[2]) == [1, 2]


def test_sample_is_deterministic_and_seed_sensitive(spark):
    df = _dense_mode_corpus(spark)
    a = sorted(
        map(
            tuple,
            cluster_balanced_sample(
                df, "vec_id", 3, _CENTROIDS
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            cluster_balanced_sample(
                df, "vec_id", 3, _CENTROIDS
            ).collect(),
        )
    )
    assert a == b
    # a different seed is a fresh draw: same per-cell counts, and the
    # digest order over 9 dense-mode ids virtually never agrees
    c = sorted(
        map(
            tuple,
            cluster_balanced_sample(
                df, "vec_id", 3, _CENTROIDS, seed="other"
            ).collect(),
        )
    )
    assert len(c) == len(a)
    assert {t[1] for t in c} == {t[1] for t in a}


def test_quota_matches_assignment_stage(spark):
    """Every sampled row's cell must equal spherical_assign's cell —
    the sampler may not re-derive assignment differently."""
    df = _dense_mode_corpus(spark)
    cells = {
        r["vec_id"]: r["cluster"]
        for r in spherical_assign(df, _CENTROIDS).collect()
    }
    for r in cluster_balanced_sample(
        df, "vec_id", 100, _CENTROIDS
    ).collect():
        assert r["cell"] == cells[r["vec_id"]]
