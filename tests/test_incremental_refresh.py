"""incremental_refresh (snapshot diff -> admission gate): removed
docs produce no ingest row, a changed doc is never compared to its
own stale copy, delta docs are not compared to each other, and an
added near-dup of a retained doc is rejected while novel content is
admitted."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (fixture parity)

from serverless_podcast_etl_spark.operators.dedup import (
    incremental_refresh,
)

# Distinct word soups (no shared 3-gram shingles between families);
# ~12 tokens each so a one-word edit stays far above Jaccard 0.3.
_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
_B = "nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
_C = "one two three four five six seven eight nine ten eleven twelve"
_D = "red orange yellow green blue indigo violet cyan magenta teal navy plum"


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _refresh(spark, old_rows, new_rows, **kw):
    out = incremental_refresh(
        _snap(spark, old_rows),
        _snap(spark, new_rows),
        text_col="text",
        id_col="doc_id",
        verify_threshold=0.3,
        **kw,
    ).collect()
    return {r["doc_id"]: (r["status"], r["n_matches"], r["admitted"]) for r in out}


def test_refresh_statuses_and_admission(spark):
    old = [(1, _A), (2, _B), (3, _C), (4, _D)]
    new = [
        (1, _A),                    # unchanged -> retained corpus
        (2, _B + " tweaked"),       # changed: still only near _B itself (gone)
        (4, _D),                    # unchanged -> retained corpus
        (5, _A + " extra"),         # added: near-dup of retained 1 -> reject
        (6, "totally fresh words nothing shared here at all by design"),
        # doc 3 removed -> no ingest row
    ]
    got = _refresh(spark, old, new)
    assert set(got) == {2, 5, 6}
    # changed doc 2: its old copy is NOT in the corpus any more and
    # nothing retained resembles _B -> admitted (never self-compared)
    assert got[2] == ("changed", 0, 1)
    # added doc 5: near-dup of RETAINED doc 1 -> rejected
    assert got[5][0] == "added"
    assert got[5][1] >= 1 and got[5][2] == 0
    # added doc 6: novel -> admitted
    assert got[6] == ("added", 0, 1)


def test_delta_docs_not_compared_to_each_other(spark):
    # two near-identical ADDED docs with no retained sibling: both
    # must admit (each judged against the settled corpus only, q76's
    # batch semantics)
    old = [(1, _A)]
    new = [(1, _A), (10, _C), (11, _C + " v2")]
    got = _refresh(spark, old, new)
    assert got[10] == ("added", 0, 1)
    assert got[11] == ("added", 0, 1)


def test_changed_doc_rejected_by_retained_near_dup(spark):
    # doc 2's new text drifts INTO doc 1's neighborhood -> rejected
    old = [(1, _A), (2, _B)]
    new = [(1, _A), (2, _A + " drifted")]
    got = _refresh(spark, old, new)
    assert got[2][0] == "changed"
    assert got[2][1] >= 1 and got[2][2] == 0


def test_pure_removal_yields_empty(spark):
    old = [(1, _A), (2, _B)]
    new = [(1, _A)]
    assert _refresh(spark, old, new) == {}


def test_stale_band_index_is_candidate_noise_not_matches(spark):
    """A persisted index built BEFORE the snapshot still carries the
    changed/removed docs' old signatures — including a changed doc's
    own.  Those stale entries may only create false CANDIDATES: the
    verify join re-derives shingles from the retained corpus, where
    those docs have no rows, so results must equal the index-free
    run (the docstring's stale-index safety contract)."""
    from serverless_podcast_etl_spark.operators.dedup import (
        minhash_bands,
    )

    old_rows = [(1, _A), (2, _B), (3, _C), (4, _D)]
    new_rows = [
        (1, _A),
        (2, _B + " tweaked"),   # changed; old signature stays in index
        (4, _D),
        (5, _A + " extra"),     # added near-dup of retained 1
        # doc 3 removed; its signature stays in the stale index
    ]
    stale_index = minhash_bands(
        _snap(spark, old_rows), text_col="text", id_col="doc_id",
        n=3, num_hashes=8, bands=4,
    )
    fresh = _refresh(spark, old_rows, new_rows)
    with_stale = incremental_refresh(
        _snap(spark, old_rows),
        _snap(spark, new_rows),
        text_col="text",
        id_col="doc_id",
        verify_threshold=0.3,
        corpus_bands=stale_index,
    ).collect()
    got = {
        r["doc_id"]: (r["status"], r["n_matches"], r["admitted"])
        for r in with_stale
    }
    assert got == fresh
