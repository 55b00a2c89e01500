"""DSIR-style target-affinity selection (r9): hashed n-gram feature
distributions fit on target + raw, per-doc rational affinity score,
deterministic top-k.  The cross-engine hash-exactness is certified by
the q100 catalog oracle; these tests pin the SEMANTICS."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_podcast_etl_spark.operators.selection import (
    select_by_target_affinity,
    target_affinity_scores,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_like_docs_score_higher(spark):
    target = _docs(spark, [(100, "alpha beta gamma"), (101, "alpha beta")])
    raw = _docs(
        spark,
        [
            (1, "alpha beta gamma"),  # pure target vocabulary
            (2, "zzz qqq www eee"),  # disjoint vocabulary
            (3, "alpha beta zzz qqq"),  # half-and-half
        ],
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in target_affinity_scores(
            raw, target, "text", "doc_id"
        ).collect()
    }
    assert scores[1] > scores[3] > scores[2]


def test_tokenless_docs_emit_no_row(spark):
    target = _docs(spark, [(100, "alpha beta")])
    raw = _docs(spark, [(1, "alpha"), (2, "   "), (3, None)])
    out = target_affinity_scores(raw, target, "text", "doc_id").collect()
    assert [r["doc_id"] for r in out] == [1]


def test_scores_partitioning_invariant(spark):
    target = _docs(spark, [(100, "alpha beta gamma delta")])
    rows = [(i, f"alpha beta w{i % 7} w{i % 5} gamma") for i in range(60)]
    raw = _docs(spark, rows)
    a = sorted(
        tuple(r)
        for r in target_affinity_scores(raw, target, "text", "doc_id").collect()
    )
    b = sorted(
        tuple(r)
        for r in target_affinity_scores(
            raw.repartition(13), target, "text", "doc_id"
        ).collect()
    )
    assert a == b


def test_select_top_k_deterministic_order(spark):
    target = _docs(spark, [(100, "alpha beta")])
    raw = _docs(
        spark,
        [
            (5, "alpha beta"),
            (2, "alpha beta"),  # identical text: tie broken by doc_id
            (9, "zzz qqq"),
        ],
    )
    out = select_by_target_affinity(
        raw, target, "text", "doc_id", k=2
    ).collect()
    assert [r["doc_id"] for r in out] == [2, 5]


def test_predicate_fit_path_matches_two_frame_fit(spark):
    # the subset-target fast path (one conditional-count fit pass)
    # must be output-identical to fitting the filtered frame
    rows = [
        (i, f"alpha w{i % 7} beta w{i % 5} gamma", "en" if i % 3 == 0 else "de")
        for i in range(40)
    ]
    raw = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    via_frames = sorted(
        tuple(r)
        for r in target_affinity_scores(
            raw, raw.filter(F.col("lang") == "en"), "text", "doc_id"
        ).collect()
    )
    via_predicate = sorted(
        tuple(r)
        for r in target_affinity_scores(
            raw, None, "text", "doc_id",
            target_predicate=F.col("lang") == "en",
        ).collect()
    )
    assert via_frames == via_predicate

    import pytest as _pytest

    with _pytest.raises(ValueError, match="target"):
        target_affinity_scores(raw, None, "text", "doc_id")


def test_log_ratio_weight_form(spark):
    # the paper-faithful weights: same domain contract, deterministic
    # within Spark, and the same qualitative ranking on a corpus with
    # clear target/non-target separation
    target = _docs(spark, [(100, "alpha beta gamma"), (101, "alpha beta")])
    raw = _docs(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "zzz qqq www eee"),
            (3, "alpha beta zzz qqq"),
        ],
    )
    scores = {
        r["doc_id"]: r["score"]
        for r in target_affinity_scores(
            raw, target, "text", "doc_id", weight_form="log_ratio"
        ).collect()
    }
    assert scores[1] > scores[3] > scores[2]
    # repeatable run-to-run (precomputed driver-side weights, fixed
    # in-row fold order)
    again = {
        r["doc_id"]: r["score"]
        for r in target_affinity_scores(
            raw, target, "text", "doc_id", weight_form="log_ratio"
        ).collect()
    }
    assert scores == again

    import pytest as _pytest

    with _pytest.raises(ValueError, match="weight_form"):
        target_affinity_scores(
            raw, target, "text", "doc_id", weight_form="nope"
        )


def test_bigram_evidence_counts(spark):
    # same unigrams, different ORDER: only bigram features separate
    # them, so the in-order doc must outscore the shuffled one
    target = _docs(spark, [(100, "new york city")] * 1)
    raw = _docs(spark, [(1, "new york city"), (2, "city new york")])
    scores = {
        r["doc_id"]: r["score"]
        for r in target_affinity_scores(
            raw, target, "text", "doc_id"
        ).collect()
    }
    assert scores[1] > scores[2]


def test_weight_forms_rank_agreement_at_sf01(spark):
    """Scale-sized pin of the production weight-form choice (r9
    VERDICT #7): score the full sf0.1 corpus (5,000 docs) under BOTH
    weight forms through the q100 subset-target fast path and assert
    the measured rank relationship between them.

    The forms are NOT interchangeable, and this test pins that fact
    honestly: with add-1 smoothing the log form amplifies rare-gram
    evidence (log of a ratio of tiny smoothed probabilities) while the
    rational difference form weighs frequent grams (p_t − p_r ∝ raw
    frequency), so on a corpus whose "target" subset shares its whole
    vocabulary with the rest — exactly what the templated sf0.1
    documents table is; its `lang` column labels rows but draws text
    from ONE shared word pool — the two rankings correlate positively
    but far from perfectly.  Measured once, deterministic thereafter
    (both forms precompute weights driver-side and fold in gram
    order): Spearman 0.620, top-100 overlap 35, top-500 overlap 229
    at the default 1024 buckets.  On corpora with true lexical
    separation both forms agree on strong signals — pinned by
    test_log_ratio_weight_form's ordering case.
    """
    import numpy as np

    from serverless_podcast_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    pred = F.col("lang") == "en"

    def score(form):
        return {
            r["doc_id"]: (r["score"], r["n_grams"])
            for r in target_affinity_scores(
                docs,
                None,
                "text",
                "doc_id",
                target_predicate=pred,
                weight_form=form,
            ).collect()
        }

    diff, logr = score("difference"), score("log_ratio")
    # identical domain + identical evidence counts: the forms differ
    # ONLY in the per-bucket weight table
    assert set(diff) == set(logr) and len(diff) == 5000
    assert all(diff[i][1] == logr[i][1] for i in diff)

    ids = sorted(diff)
    a = np.array([diff[i][0] for i in ids])
    b = np.array([logr[i][0] for i in ids])

    def ranks(x):
        order = np.argsort(x, kind="stable")
        r = np.empty(len(x))
        r[order] = np.arange(len(x))
        return r

    rho = float(np.corrcoef(ranks(a), ranks(b))[0, 1])
    assert 0.55 <= rho <= 0.70, f"spearman drifted: {rho}"
    top = lambda x, k: set(np.array(ids)[np.argsort(-x, kind="stable")][:k])  # noqa: E731
    assert len(top(a, 100) & top(b, 100)) >= 25
    assert len(top(a, 500) & top(b, 500)) >= 180

    # deterministic re-run: the log form's scores are repeatable at
    # scale, not just on the toy corpus
    again = score("log_ratio")
    assert again == logr
