"""J4 offset→sentence alignment: the as-of join must replicate the
reference's forward-cursor loop exactly (src/lambda_72.py:66-118),
including messy-capture straddles and boundary equality.

``cursor_align`` re-implements the documented semantics (SURVEY
§7.4.4) independently in Python; hypothesis checks the pure-math
equivalence (cursor == last-span-start ≤ offset), and a Spark test
checks ``align_entities`` against the cursor on a randomized batch.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from serverless_podcast_etl_spark.pipeline.nlp import align_entities, sentence_spans


def spans_from_lengths(lengths: list[int]) -> list[tuple[int, int]]:
    """[start, end) per sentence; each sentence includes its trailing
    '\\n' (src/lambda_72.py:60,69)."""
    spans, start = [], 0
    for n in lengths:
        spans.append((start, start + n + 1))
        start += n + 1
    return spans


def cursor_align(lengths: list[int], begins: list[int]) -> list[int]:
    """Direct re-implementation of the reference's forward-only cursor:
    entities in offset order; advance while the begin offset lies past
    the current sentence's span; assign the current sentence."""
    spans = spans_from_lengths(lengths)
    out, idx = [], 0
    for b in sorted(begins):
        while idx < len(spans) - 1 and b >= spans[idx][1]:
            idx += 1
        out.append(idx)
    return out


@given(
    lengths=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30),
    data=st.data(),
)
@settings(max_examples=300, deadline=None)
def test_cursor_equals_asof_formula(lengths, data):
    """cursor assignment == last span with start <= begin (the as-of
    formulation align_entities uses)."""
    total = sum(n + 1 for n in lengths)
    begins = data.draw(
        st.lists(st.integers(min_value=0, max_value=total - 1), min_size=1, max_size=50)
    )
    spans = spans_from_lengths(lengths)
    expect = cursor_align(lengths, begins)
    for b, got_idx in zip(sorted(begins), expect):
        asof = max(i for i, (s, _) in enumerate(spans) if s <= b)
        assert asof == got_idx, (lengths, b)


def test_align_entities_matches_cursor(spark):
    rng = random.Random(123)
    rows_sent, rows_ent, expected = [], [], {}
    for ep in range(1, 6):
        lengths = [rng.randint(3, 30) for _ in range(rng.randint(2, 12))]
        spans = spans_from_lengths(lengths)
        total = spans[-1][1]
        for i, n in enumerate(lengths):
            rows_sent.append((ep, i, "x" * n))
        begins = sorted(rng.sample(range(total), k=min(15, total)))
        assigned = cursor_align(lengths, begins)
        for j, (b, sidx) in enumerate(zip(begins, assigned)):
            rows_ent.append((ep, f"ent_{ep}_{j}", "PERSON", b, b + 3))
            expected[(ep, f"ent_{ep}_{j}")] = sidx

    sentences = spark.createDataFrame(
        rows_sent, "episode_id long, sentence_index int, sentence_text string"
    )
    entities = spark.createDataFrame(
        rows_ent,
        "episode_id long, Text string, Type string, BeginOffset long, EndOffset long",
    )
    spans_df = sentence_spans(sentences)
    out = align_entities(entities, spans_df)
    got = {
        (r["episode_id"], r["entity_text"]): r["sentence_index"]
        for r in out.collect()
    }
    assert got == expected


def test_straddle_assigned_to_begin_sentence(spark):
    """Messy capture: an entity spanning a sentence boundary belongs to
    the sentence containing its BEGIN offset (src/lambda_72.py:113-116);
    boundary equality: an entity starting exactly at a sentence start
    belongs to that sentence (src/lambda_72.py:92,105)."""
    sentences = spark.createDataFrame(
        [(1, 0, "abcde"), (1, 1, "fghij"), (1, 2, "klmno")],
        "episode_id long, sentence_index int, sentence_text string",
    )  # spans: [0,6) [6,12) [12,18)
    entities = spark.createDataFrame(
        [
            (1, "straddle", "PERSON", 4, 9),   # begins in s0, ends in s1 → s0
            (1, "boundary", "PERSON", 6, 8),   # begins exactly at s1 start → s1
            (1, "inside", "PERSON", 13, 15),   # fully inside s2 → s2
        ],
        "episode_id long, Text string, Type string, BeginOffset long, EndOffset long",
    )
    out = align_entities(entities, sentence_spans(sentences))
    got = {r["entity_text"]: r["sentence_index"] for r in out.collect()}
    assert got == {"straddle": 0, "boundary": 1, "inside": 2}


@given(
    lengths=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25)
)
@settings(max_examples=10, deadline=None)
def test_prefix_sum_spans_contiguous(spark, lengths):
    """Property: spans start at 0, are contiguous (+1 separator), and
    each ends at start + len + 1 (A10; src/lambda_72.py:66-71)."""
    from serverless_podcast_etl_spark.operators.windows import prefix_sum_spans

    rows = [(1, i, n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "ep long, idx int, _len int")
    out = (
        prefix_sum_spans(df, "_len", ["ep"], ["idx"], sep_len=1)
        .orderBy("idx")
        .collect()
    )
    pos = 0
    for r, n in zip(out, lengths):
        assert r["start_offset"] == pos
        assert r["end_offset"] == pos + n + 1
        pos = r["end_offset"]
