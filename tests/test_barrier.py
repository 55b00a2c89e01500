"""Barrier semantics (SURVEY §5.2.4; src/lambda_5.py:62-68): deliver
k of n chunks → no output; deliver the rest → exactly-once output."""

from __future__ import annotations

from pyspark.sql import functions as F

from serverless_podcast_etl_spark.pipeline.transcripts import (
    incomplete_episodes,
    reduce_transcripts,
)


def _payload(text: str) -> str:
    return (
        '{"results": {"transcripts": [{"transcript": "' + text + '"}]}}'
    )


def test_barrier_holds_then_releases(spark):
    expected = spark.createDataFrame(
        [(1, 3), (2, 2)], "episode_id long, num_chunks int"
    )
    partial = spark.createDataFrame(
        [
            (1, 1, _payload("one")),
            (1, 2, _payload("two")),  # chunk 3 of episode 1 missing
            (2, 1, _payload("alpha")),
            (2, 2, _payload("beta")),
        ],
        "episode_id long, chunk_num int, payload string",
    )
    out = reduce_transcripts(partial, expected)
    rows = {r["episode_id"]: r["transcript"] for r in out.collect()}
    assert rows == {2: "alpha beta"}  # episode 1 held back

    stalled = incomplete_episodes(partial, expected).collect()
    assert [(r["episode_id"], r["arrived_chunks"]) for r in stalled] == [(1, 2)]

    # late chunk arrives → exactly one complete output, in chunk order
    full = partial.union(
        spark.createDataFrame(
            [(1, 3, _payload("three"))],
            "episode_id long, chunk_num int, payload string",
        )
    )
    out2 = reduce_transcripts(full, expected)
    rows2 = {r["episode_id"]: r["transcript"] for r in out2.collect()}
    assert rows2 == {1: "one two three", 2: "alpha beta"}
    assert out2.groupBy("episode_id").count().filter(F.col("count") > 1).count() == 0
