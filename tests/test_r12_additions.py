"""q115/q116 (r12): PPS systematic weighted sampling and
encoding-anomaly scoring.  Cross-engine exactness is certified by the
catalog oracle; these tests pin the SEMANTICS, each with a hypothesis
differential against a plain-Python reimplementation."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_podcast_etl_spark.functions.textstats import (
    CONTROL_CHAR_PATTERN,
    MOJIBAKE_PATTERN,
    encoding_anomaly_scores,
)
from serverless_podcast_etl_spark.operators.selection import (
    pps_systematic_sample,
)

# -- q115 PPS systematic sampling --------------------------------------------


def _py_pps(rows, k, seed, offset_seed):
    """Plain-Python twin: same md5 order, same integer pick formula."""
    rows = [(i, w) for i, w in rows if w > 0]
    rows.sort(
        key=lambda r: (
            hashlib.md5(f"{seed}:{r[0]}".encode()).hexdigest(),
            r[0],
        )
    )
    total = sum(w for _, w in rows)
    if total == 0:
        return {}
    o = offset_seed % total
    out, cum = {}, 0
    for i, w in rows:
        s, e = cum, cum + w
        cum = e
        c = (k * e - o - 1 + total) // total - (
            k * s - o - 1 + total
        ) // total
        if c > 0:
            out[i] = (w, c)
    return out


def _weighted(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, wt long")


def test_pps_total_picks_is_exactly_k(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(1, 40)]
    out = pps_systematic_sample(
        _weighted(spark, rows), "doc_id", "wt", k=17, seed="s", offset_seed=5
    ).collect()
    assert sum(r["n_picks"] for r in out) == 17
    assert all(r["n_picks"] >= 1 for r in out)


def test_pps_expected_counts_within_systematic_bound(spark):
    # systematic PPS: each row's pick count is floor or ceil of k*w/W
    rows = [(i, w) for i, w in enumerate([1, 5, 10, 3, 100, 7, 2], start=1)]
    total = sum(w for _, w in rows)
    k = 32
    out = {
        r["doc_id"]: r["n_picks"]
        for r in pps_systematic_sample(
            _weighted(spark, rows), "doc_id", "wt", k=k, seed="b",
            offset_seed=99991,
        ).collect()
    }
    for i, w in rows:
        exp = k * w / total
        got = out.get(i, 0)
        assert int(exp) <= got <= int(exp) + 1, (i, w, exp, got)


def test_pps_drops_nonpositive_weights_and_empty_input(spark):
    rows = [(1, 0), (2, -3), (3, 4)]
    out = pps_systematic_sample(
        _weighted(spark, rows), "doc_id", "wt", k=3, seed="z", offset_seed=0
    ).collect()
    assert {r["doc_id"] for r in out} == {3}
    assert out[0]["n_picks"] == 3  # all mass on one row → all picks on it
    empty = pps_systematic_sample(
        _weighted(spark, [(1, 0)]), "doc_id", "wt", k=3
    )
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "doc_id", "weight", "n_picks",
    ]


@settings(max_examples=20, deadline=None)
@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=50), min_size=1, max_size=25
    ),
    k=st.integers(min_value=1, max_value=40),
    offset_seed=st.integers(min_value=0, max_value=10**9),
)
def test_pps_matches_python(spark, weights, k, offset_seed):
    rows = [(i + 1, w) for i, w in enumerate(weights)]
    want = _py_pps(rows, k, "hy", offset_seed)
    got = {
        r["doc_id"]: (r["weight"], r["n_picks"])
        for r in pps_systematic_sample(
            _weighted(spark, rows), "doc_id", "wt",
            k=k, seed="hy", offset_seed=offset_seed,
        ).collect()
    }
    assert got == want
    if want:
        assert sum(c for _, c in got.values()) == k


# -- q116 encoding anomalies ---------------------------------------------------


def _texts(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_encoding_anomalies_planted_counts(spark):
    texts = [
        "clean plain text",            # nothing
        "bad � byte �",      # 2 replacement chars
        "bell\x07 and esc\x1b here",   # 2 control chars
        "cafÃ© naÃ¯ve",  # 2 mojibake pairs (Ã© Ã¯)
    ]
    out = {r["doc_id"]: r for r in encoding_anomaly_scores(
        _texts(spark, texts), "text", "doc_id"
    ).collect()}
    assert out[1]["replacement_chars"] == 0
    assert out[1]["control_chars"] == 0
    assert out[1]["mojibake_pairs"] == 0
    assert out[1]["anomaly_rate"] == 0.0
    assert out[1]["is_suspect"] == 0
    assert out[2]["replacement_chars"] == 2
    assert out[2]["is_suspect"] == 1   # any U+FFFD flags unconditionally
    assert out[3]["control_chars"] == 2
    assert out[3]["is_suspect"] == 1   # 2/19 chars >> 0.001
    assert out[4]["mojibake_pairs"] == 2
    assert out[4]["is_suspect"] == 1


def test_encoding_anomalies_empty_text_carries_no_evidence(spark):
    r = encoding_anomaly_scores(_texts(spark, [""]), "text", "doc_id").collect()[0]
    assert r["n_chars"] == 0
    assert r["anomaly_rate"] is None
    assert r["is_suspect"] is None  # three-valued: no chars, no verdict


def test_encoding_anomalies_tab_newline_are_not_anomalies(spark):
    r = encoding_anomaly_scores(
        _texts(spark, ["a\tb\nc\rd"]), "text", "doc_id"
    ).collect()[0]
    assert r["control_chars"] == 0
    assert r["is_suspect"] == 0


_ANOMALY_ALPHABET = "ab �\x07\x1b\x00ÃÂ©é"


@settings(max_examples=25, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet=_ANOMALY_ALPHABET, min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    )
)
def test_encoding_anomalies_match_python_re(spark, texts):
    out = {r["doc_id"]: r for r in encoding_anomaly_scores(
        _texts(spark, texts), "text", "doc_id"
    ).collect()}
    for i, t in enumerate(texts, start=1):
        r = out[i]
        assert r["n_chars"] == len(t)
        assert r["replacement_chars"] == t.count("�")
        assert r["control_chars"] == len(re.findall(CONTROL_CHAR_PATTERN, t))
        assert r["mojibake_pairs"] == len(re.findall(MOJIBAKE_PATTERN, t))
        n_bad = (
            r["replacement_chars"] + r["control_chars"] + r["mojibake_pairs"]
        )
        if len(t) == 0:
            assert r["anomaly_rate"] is None
        else:
            assert r["anomaly_rate"] == round(n_bad / len(t), 6)


def test_pps_large_weights_no_overflow(spark):
    # BIGINT bound exercise: billion-scale weights with k in the
    # thousands — k*W ~ 4e12, well-formed long arithmetic end to end
    rows = [(i, 10**9 + i * 7_919) for i in range(1, 30)]
    k = 4_096
    out = pps_systematic_sample(
        _weighted(spark, rows), "doc_id", "wt",
        k=k, seed="big", offset_seed=10**18,
    ).collect()
    assert sum(r["n_picks"] for r in out) == k
    want = _py_pps(rows, k, "big", 10**18)
    got = {r["doc_id"]: (r["weight"], r["n_picks"]) for r in out}
    assert got == want
