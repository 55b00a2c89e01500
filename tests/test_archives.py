"""S11/S12: tar.gz staging extraction — archive → JSONL lines / whole
JSON, matching the reference's Comprehend-output unpacking
(src/lambda_71.py:16-46, src/lambda_72.py:16-40)."""

from __future__ import annotations

import io
import json
import tarfile

import pytest

from pyspark.sql import functions as F

from serverless_podcast_etl_spark.pipeline.ml_udfs import (
    ENTITY_RESULT,
    SENTIMENT_RESULT,
    fake_entities,
    fake_sentiment,
)
from serverless_podcast_etl_spark.sources.archives import (
    extract_targz_lines,
    extract_targz_text,
    read_targz,
)


def _write_targz(path, members: dict[str, str]) -> None:
    with tarfile.open(path, "w:gz") as tar:
        for name, text in members.items():
            data = text.encode("utf-8")
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def test_targz_jsonl_lines_ordered_and_member_filtered(spark, tmp_path):
    lines = [json.dumps({"Line": i, "v": f"doc{i}"}) for i in range(3)]
    _write_targz(
        tmp_path / "a.tar.gz",
        {"output": "\n".join(lines) + "\n", "ignored.txt": "nope"},
    )
    archives = read_targz(spark, str(tmp_path))
    got = extract_targz_lines(archives, member="output").collect()
    assert [r["line_index"] for r in got] == [0, 1, 2]
    assert all(r["member"] == "output" for r in got)
    assert [json.loads(r["line"])["v"] for r in got] == ["doc0", "doc1", "doc2"]


def test_targz_whole_json_member(spark, tmp_path):
    ents = fake_entities("Alice met Bob in Paris")
    _write_targz(
        tmp_path / "e.tar.gz", {"output": json.dumps({"Entities": ents})}
    )
    archives = read_targz(spark, str(tmp_path))
    txt = extract_targz_text(archives, member="output")
    parsed = txt.select(
        F.explode(
            F.from_json(
                F.col("text"), f"struct<Entities: {ENTITY_RESULT.simpleString()}>"
            )["Entities"]
        ).alias("e")
    ).select("e.Text", "e.Type", "e.BeginOffset")
    got = sorted(
        (r["Text"], r["Type"], r["BeginOffset"]) for r in parsed.collect()
    )
    want = sorted((e["Text"], e["Type"], e["BeginOffset"]) for e in ents)
    assert got == want


def test_targz_member_in_subdirectory_matches_basename(spark, tmp_path):
    _write_targz(tmp_path / "s.tar.gz", {"job-123/output": '{"x": 1}\n'})
    archives = read_targz(spark, str(tmp_path))
    got = extract_targz_lines(archives, member="output").collect()
    assert len(got) == 1
    assert got[0]["member"] == "job-123/output"


def test_targz_sentiment_staging_matches_direct_udf_path(spark, tmp_path):
    """Golden variant of the lambda_71 leg: sentiment staged as
    per-episode .tar.gz JSONL must align to sentences IDENTICALLY to
    the in-pipeline UDF path (same deterministic fake, so the aligned
    rows must be equal, not merely similar)."""
    from serverless_podcast_etl_spark.pipeline.ml_udfs import sentiment_udf
    from serverless_podcast_etl_spark.pipeline.nlp import align_sentiment

    sents = [
        (1, 0, "Alice speaks first."),
        (1, 1, "Bob replies at length."),
        (1, 2, "A third remark."),
        (2, 0, "Another episode opens."),
        (2, 1, "And closes."),
    ]
    sentences = spark.createDataFrame(
        sents, "episode_id long, sentence_index int, sentence_text string"
    )

    # stage: one archive per episode, JSONL line i = sentiment of
    # sentence i (Comprehend ONE_DOC_PER_LINE positional contract)
    stage = tmp_path / "comprehend"
    stage.mkdir()
    for ep in (1, 2):
        lines = [
            json.dumps(fake_sentiment(t))
            for e, _, t in sents
            if e == ep
        ]
        _write_targz(
            stage / f"episode_id_{ep}.tar.gz", {"output": "\n".join(lines)}
        )

    archives = read_targz(spark, str(stage))
    staged = (
        extract_targz_lines(archives, member="output")
        .select(
            F.regexp_extract(F.col("archive"), r"episode_id_(\d+)", 1)
            .cast("long")
            .alias("episode_id"),  # P10 key-path parsing
            F.col("line_index"),
            F.from_json(F.col("line"), SENTIMENT_RESULT).alias("r"),
        )
        .select(
            "episode_id",
            "line_index",
            F.col("r.Sentiment").alias("Sentiment"),
            F.col("r.SentimentScore").alias("SentimentScore"),
        )
    )
    via_staging = align_sentiment(sentences, staged)

    direct_lines = sentences.select(
        "episode_id",
        F.col("sentence_index").alias("line_index"),
        sentiment_udf(F.col("sentence_text")).alias("r"),
    ).select(
        "episode_id",
        "line_index",
        F.col("r.Sentiment").alias("Sentiment"),
        F.col("r.SentimentScore").alias("SentimentScore"),
    )
    via_udf = align_sentiment(sentences, direct_lines)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(via_staging) == canon(via_udf)


def test_targz_corrupt_archive_raises_cleanly(spark, tmp_path):
    (tmp_path / "bad.tar.gz").write_bytes(b"not a tar archive")
    archives = read_targz(spark, str(tmp_path))
    with pytest.raises(Exception, match="(?i)tar|gzip|file"):
        extract_targz_lines(archives).collect()
