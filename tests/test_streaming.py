"""Streaming orchestration: AvailableNow drain over a staging dir with
barrier re-evaluation across triggers (SURVEY §2.9)."""

from __future__ import annotations

import json
import os

from serverless_podcast_etl_spark.streaming.orchestrate import stream_chunk_payloads


def _write_chunk(d: str, ep: int, num: int, text: str) -> None:
    rec = {
        "podcast_name": "p",
        "episode_id": ep,
        "chunk_num": num,
        "payload": json.dumps(
            {"results": {"transcripts": [{"transcript": text}]}}
        ),
    }
    with open(os.path.join(d, f"ep{ep}_chunk{num}.json"), "w") as f:
        f.write(json.dumps(rec))


def test_streaming_barrier_across_triggers(spark, tmp_path):
    chunks_dir = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(chunks_dir)
    expected = spark.createDataFrame([(1, 2)], "episode_id long, num_chunks int")

    outputs: list[dict[int, str]] = []

    def on_transcript(df):
        outputs.append({r["episode_id"]: r["transcript"] for r in df.collect()})

    # trigger 1: only chunk 1 staged → barrier holds
    _write_chunk(chunks_dir, 1, 1, "hello")
    stream_chunk_payloads(spark, None, chunks_dir, ckpt, expected, on_transcript)
    assert outputs[-1] == {}

    # trigger 2: chunk 2 arrives → barrier releases with BOTH chunks
    # (re-evaluated over the full staging dir, not just the new file)
    _write_chunk(chunks_dir, 1, 2, "world")
    stream_chunk_payloads(spark, None, chunks_dir, ckpt, expected, on_transcript)
    assert outputs[-1] == {1: "hello world"}
