"""Unit tests for bench.py's golden-baseline self-grading (r4).

Pure-Python: no SparkSession.  The full-protocol path (median-of-N
sessions) is exercised by tools/make_bench_golden.py itself; these
pin the comparison semantics every future BENCH_r{N}.json relies on.
"""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _golden(per_query, n_sessions=3, sf=0.1):
    return {"n_sessions": n_sessions, "sf": sf, "per_query": per_query}


def test_vs_golden_typical_session_ratio_one():
    g = _golden(
        {
            "q1": {"median": 1.0, "lo": 0.9, "hi": 1.1},
            "q2": {"median": 2.0, "lo": 1.8, "hi": 2.4},
        }
    )
    out = bench._vs_golden({"q1": 1.0, "q2": 2.0}, g)
    assert out["median_ratio"] == 1.0
    assert out["n_compared"] == 2
    assert out["above_2x_band"] == []
    assert out["golden_sessions"] == 3


def test_vs_golden_flags_only_beyond_2x_band_max():
    g = _golden(
        {
            "q1": {"median": 1.0, "lo": 0.9, "hi": 1.5},
            "q2": {"median": 1.0, "lo": 0.9, "hi": 1.1},
        }
    )
    # q1: 2.9 < 2*hi(1.5)=3.0 -> granted as variance; q2: 2.3 > 2.2 -> flagged
    out = bench._vs_golden({"q1": 2.9, "q2": 2.3}, g)
    assert out["above_2x_band"] == ["q2"]
    # ratios are vs the median anchor, not the band
    assert out["median_ratio"] == round((2.9 / 1.0 + 2.3 / 1.0) / 2, 3)


def test_vs_golden_ignores_queries_absent_from_anchor():
    g = _golden({"q1": {"median": 1.0, "lo": 1.0, "hi": 1.0}})
    out = bench._vs_golden({"q1": 1.2, "q_new": 9.9}, g)
    assert out["n_compared"] == 1
    assert out["above_2x_band"] == []


def test_driver_contract_line_fits_2000_chars():
    """BENCH_r04.json parsed as null because the stdout line outgrew
    the driver's 2000-char record (r4 verdict, What's wrong #1).  Pin
    the r5 fix: the compact contract line — qNN-prefix keys,
    worst-case 4-digit-seconds values for every HEADLINE query — stays
    under the budget with headroom for catalog growth (full-name keys
    would have re-broken the record at 68 queries).  Detail incl.
    full-name timings lives in the BENCH_DETAIL.json sidecar."""
    shorts = [bench.short_name(n) for n in bench.HEADLINE]
    assert len(set(shorts)) == len(shorts), "qNN prefixes must be unique"
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 9999.999,
            "unit": "sec",
            "queries": {s: 9.999 for s in shorts},
            "sf": 0.01,
        },
        separators=(",", ":"),
    )
    assert len(line) < 2000, len(line)
    # headroom: ~30 more queries fit before the record binds again
    # (~13 chars per query; bumped from 1200 at 93 headline queries,
    # from 1400 at 110)
    assert len(line) < 1600, len(line)


def test_headline_plus_excluded_covers_catalog_exactly():
    """No silent bench exclusions (r4 VERDICT "do this" #3): every
    CATALOG entry is benched or carries a stated reason in
    bench.EXCLUDED."""
    from serverless_podcast_etl_spark.plans.catalog import CATALOG

    assert set(bench.HEADLINE) | bench.EXCLUDED == set(CATALOG)
    assert not set(bench.HEADLINE) & bench.EXCLUDED
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_load_golden_sf_mismatch_and_missing(tmp_path, monkeypatch):
    # missing file -> None (bench runs without an anchor)
    monkeypatch.setattr(
        bench.os.path, "exists", lambda p: False
    )
    assert bench._load_golden(0.1) is None
    monkeypatch.undo()
    # sf mismatch -> None (an sf0.1 anchor must not grade an sf0.01 run)
    gpath = tmp_path / "BENCH_GOLDEN.json"
    gpath.write_text(json.dumps(_golden({}, sf=0.1)))
    real_join = os.path.join
    monkeypatch.setattr(
        bench.os.path,
        "join",
        lambda *a: str(gpath) if a[-1] == "BENCH_GOLDEN.json" else real_join(*a),
    )
    assert bench._load_golden(0.01) is None
    assert bench._load_golden(0.1) is not None


def test_vs_golden_matches_short_keyed_anchor():
    """Anchors frozen after the r5 key-shortening store qNN keys; the
    comparison must resolve full query names against them."""
    g = _golden({"q01": {"median": 2.0, "lo": 1.8, "hi": 2.2}})
    out = bench._vs_golden({"q01_pricing_summary": 2.0}, g)
    assert out["n_compared"] == 1
    assert out["median_ratio"] == 1.0
