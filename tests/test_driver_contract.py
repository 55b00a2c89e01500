"""Driver-contract shape guards.

The round-2 driver certified exactly the first 50 entries of
``queries()`` (CORRECTNESS_r02.json holds q01–q50 and nothing else),
so the driver-facing dicts split the catalog into 50 priority entries
(canonical qNN names, one per operator family) plus overflow entries
re-keyed with an ``x`` prefix that sorts after every qNN name.  These
tests pin that shape so a future catalog edit cannot silently push a
family out of the certified window.
"""

from __future__ import annotations

import importlib.util
import os

from serverless_podcast_etl_spark.plans.catalog import (
    CATALOG,
    DRIVER_OVERFLOW,
    driver_name,
    oracle_sql,
    queries,
)

#: rows-only-by-contract entries allowed inside the 50 driver slots
#: (approximate / seeded / Python-UDF — non-SQL-expressible).
EXPECTED_PRIORITY_ROWS_ONLY = {
    "q29_image_decode",
    "q41_corpus_profile_sketches",
    "q53_grouped_ewma",
    "q62_ann_recall_panel",
}


#: the round-14 rotation (r13 VERDICT #1, executed as pinned): the
#: full remaining backlog (q113/q114 + the two r12 additions + the
#: r13 addition q117) in, the r13-certified five (all first-time
#: driver hash-green in CORRECTNESS_r13) out — pinned so a catalog
#: edit cannot silently undo the rotation before the driver certifies
#: it.  This rotation drains the never-driver-certified backlog to 0
#: for the first time since r4; from here every addition should enter
#: the window within two rounds of landing (r13 VERDICT #7).
ROTATED_IN_R14 = {
    "q113_duplicate_chunk_rate",
    "q114_source_quality_profile",
    "q115_pps_token_sample",
    "q116_encoding_anomalies",
    "q117_trained_ivf_ann",
}
ROTATED_OUT_R14 = {
    "q105_token_window_chunks",
    "q108_collocations",
    "q109_vocab_coverage",
    "q111_embedding_norm_outliers",
    "q112_tokenizer_fertility",
}

#: the round-15 rotation (r14 VERDICT #6, executed as pinned): the
#: full r14-addition backlog — the persisted trained-IVF + drift
#: lifecycle and the BM25/RRF retrieval family — in; the five r14
#: rotations-in (all first-time driver hash-green in CORRECTNESS_r14)
#: out, each family keeping a green window sibling (see the
#: DRIVER_OVERFLOW note in catalog.py).  Backlog after this rotation:
#: 0 — r15 is an optimization round and adds no queries.
ROTATED_IN_R15 = {
    "q118_persisted_trained_ivf",
    "q119_codebook_drift",
    "q120_bm25_retrieval",
    "q121_hybrid_rrf",
    "q122_bm25_indexed_retrieval",
}
ROTATED_OUT_R15 = ROTATED_IN_R14


def test_round14_rotation_membership():
    # superseded by the r15 rotation for the rotated-in set (those
    # five are now overflow again); the r14 rotations-out remain out
    assert ROTATED_OUT_R14 <= DRIVER_OVERFLOW


def test_round15_rotation_membership():
    assert ROTATED_IN_R15.isdisjoint(DRIVER_OVERFLOW)
    assert ROTATED_OUT_R15 <= DRIVER_OVERFLOW


def test_priority_window_is_exactly_50():
    q = queries()
    priority = [n for n in q if not n.startswith("x")]
    assert len(priority) == 50, (
        f"driver window must hold exactly 50 priority entries, got "
        f"{len(priority)}"
    )


def test_overflow_sorts_and_inserts_after_priority():
    q = list(queries())
    priority = [n for n in q if not n.startswith("x")]
    overflow = [n for n in q if n.startswith("x")]
    assert set(overflow) == {driver_name(n) for n in DRIVER_OVERFLOW}
    # insertion order: all priority entries first
    assert q[: len(priority)] == priority
    # sorted order: every priority name before every overflow name
    assert max(priority) < min(overflow)
    # both first-50 rules land on the same set
    assert sorted(q)[:50] == sorted(priority)
    assert q[:50] == priority


def test_every_catalog_entry_exposed_exactly_once():
    q = queries()
    assert len(q) == len(CATALOG)
    assert {driver_name(n) for n in CATALOG} == set(q)


def test_oracle_keys_match_queries_and_rows_only_set():
    q = queries()
    sql = oracle_sql()
    assert set(sql) <= set(q)
    priority = [n for n in q if not n.startswith("x")]
    rows_only_priority = {n for n in priority if n not in sql}
    assert rows_only_priority == EXPECTED_PRIORITY_ROWS_ONLY
    # 46 of the 50 certified slots carry a full DuckDB oracle (q26
    # graduated from rows-only in r7 via the sentinel-split oracle,
    # q52 in r9 via the md5-digest twin)
    assert len([n for n in priority if n in sql]) == 46
    # overflow entries keep their oracles (pytest replica certifies them)
    for n in DRIVER_OVERFLOW:
        d = CATALOG[n]
        if d.sql is not None:
            assert sql[driver_name(n)] == d.sql


def test_spark_entry_reexports_catalog_dicts():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries()) == list(queries())
    assert mod.oracle_sql() == oracle_sql()
