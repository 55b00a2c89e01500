"""The r12 session-2 ``materialize`` knobs must be PURE plan-shape
switches: ``materialize=True`` (localCheckpoint the expensive hashing
scan at its fan-out, NOTES facts 18/19) and ``materialize=False``
(the lazy zero-intermediate composition, streaming-safe) must return
row-identical results for every operator that grew the knob —
minhash_lsh_pairs, ngram_jaccard_pairs, containment_pairs,
incremental_neardup_admission/incremental_refresh, and the affinity
family (target_affinity_scores / target_coverage_audit).

A hypothesis corpus would duplicate tests/test_property_r8.py's
differential coverage; these are directed parity checks on a corpus
built to exercise every branch (near-dup pairs above and below the
verify threshold, stop-shingles above the df cap, an asymmetric
containment pair, a predicate-defined target slice)."""

from __future__ import annotations

import pytest

from serverless_podcast_etl_spark.operators import dedup, selection


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en"),
        (2, base + " tail drift", "en"),                     # near-dup of 1
        (3, "completely different words entirely here now ok", "en"),
        (4, "the quick brown fox", "de"),                    # contained in 1
        (5, base.replace("lazy", "sleepy"), "de"),           # near-dup of 1
        (6, "short", "en"),                                  # shingle-less
        (7, "boiler plate boiler plate boiler plate boiler", "de"),
    ] + [
        # df-cap fodder: one shared boilerplate shingle across many docs
        (100 + i, f"common shared boilerplate ngram run {i}", "en")
        for i in range(8)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_lsh_pairs_parity(corpus):
    kw = dict(text_col="text", id_col="doc_id", n=3, num_hashes=8,
              bands=4, verify_threshold=0.2)
    assert _rows(dedup.minhash_lsh_pairs(corpus, materialize=True, **kw)) == \
        _rows(dedup.minhash_lsh_pairs(corpus, materialize=False, **kw))


def test_ngram_jaccard_pairs_parity(corpus):
    for cap in (None, 3):
        kw = dict(text_col="text", id_col="doc_id", n=2, threshold=0.1,
                  max_doc_freq=cap)
        a = _rows(dedup.ngram_jaccard_pairs(corpus, materialize=True, **kw))
        b = _rows(dedup.ngram_jaccard_pairs(corpus, materialize=False, **kw))
        assert a == b and (cap is not None or a)


def test_containment_pairs_parity(corpus):
    kw = dict(text_col="text", id_col="doc_id", n=2, threshold=0.4,
              max_doc_freq=5)
    a = _rows(dedup.containment_pairs(corpus, materialize=True, **kw))
    b = _rows(dedup.containment_pairs(corpus, materialize=False, **kw))
    assert a == b


def test_admission_parity(corpus):
    new = corpus.filter("doc_id >= 100 or doc_id in (2, 5)")
    old = corpus.filter("doc_id < 100 and doc_id not in (2, 5)")
    kw = dict(text_col="text", id_col="doc_id", n=2, num_hashes=8,
              bands=4, verify_threshold=0.2)
    a = _rows(dedup.incremental_neardup_admission(
        new, old, materialize=True, **kw))
    b = _rows(dedup.incremental_neardup_admission(
        new, old, materialize=False, **kw))
    assert a == b
    # at least one rejection: docs 2/5 near-dup doc 1 in the corpus
    rejected = [r for r in a if r[2] == 0]
    assert len(rejected) >= 1


def test_admission_parity_with_plugged_index(corpus):
    """corpus_bands path: the corpus side must stay LAZY under
    materialize=True (no full-corpus checkpoint) yet agree with the
    self-signing form."""
    new = corpus.filter("doc_id in (2, 5)")
    old = corpus.filter("doc_id not in (2, 5)")
    kw = dict(text_col="text", id_col="doc_id", n=2, num_hashes=8,
              bands=4, verify_threshold=0.2)
    idx = dedup.minhash_bands(old, "text", "doc_id", n=2, num_hashes=8,
                              bands=4)
    a = _rows(dedup.incremental_neardup_admission(
        new, old, materialize=True, corpus_bands=idx, **kw))
    b = _rows(dedup.incremental_neardup_admission(
        new, old, materialize=True, **kw))
    assert a == b


def test_affinity_scores_parity(corpus):
    # predicate form, both weight forms
    for form in ("difference", "log_ratio"):
        a = _rows(selection.target_affinity_scores(
            corpus, None, "text", "doc_id", num_buckets=64, max_n=2,
            target_predicate=corpus.lang == "en", weight_form=form,
            materialize=True))
        b = _rows(selection.target_affinity_scores(
            corpus, None, "text", "doc_id", num_buckets=64, max_n=2,
            target_predicate=corpus.lang == "en", weight_form=form,
            materialize=False))
        assert a == b and a
    # separate-target-frame form
    tgt = corpus.filter("lang = 'en'")
    a = _rows(selection.target_affinity_scores(
        corpus, tgt, "text", "doc_id", num_buckets=64, max_n=2,
        materialize=True))
    b = _rows(selection.target_affinity_scores(
        corpus, tgt, "text", "doc_id", num_buckets=64, max_n=2,
        materialize=False))
    assert a == b


def test_coverage_audit_parity(corpus):
    kw = dict(text_col="text", id_col="doc_id", k=3, num_buckets=64,
              max_n=2)
    a = _rows(selection.target_coverage_audit(
        corpus, target_predicate=corpus.lang == "en",
        materialize=True, **kw))
    b = _rows(selection.target_coverage_audit(
        corpus, target_predicate=corpus.lang == "en",
        materialize=False, **kw))
    assert a == b and len(a) == 2


def test_embedding_neardup_broadcast_vs_shuffle_parity(spark):
    """ADVICE r12: the LSH bucket self-join's broadcast hint gained an
    opt-out (``broadcast_candidates=False`` restores the shuffle
    bucket-join for corpora too large to broadcast).  Both plan shapes
    must emit the identical pair set — same dual the materialize knobs
    keep."""
    import random

    from serverless_podcast_etl_spark.operators import similarity

    rng = random.Random(7)
    rows = []
    for i in range(60):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((2 * i, base))
        # near-dup partner for every even id → pairs above threshold
        rows.append((2 * i + 1, [x + rng.uniform(-0.01, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(4)]
    kw = dict(id_col="vec_id", vec_col="embedding", planes=planes,
              threshold=0.98)
    bcast = _rows(similarity.embedding_neardup_pairs(
        df, broadcast_candidates=True, **kw))
    shuf = _rows(similarity.embedding_neardup_pairs(
        df, broadcast_candidates=False, **kw))
    assert bcast == shuf and bcast
