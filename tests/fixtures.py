"""Deterministic podcast-domain fixtures (FIXTURES.md shapes)."""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from serverless_podcast_etl_spark import schemas

WORDS = (
    "game season player coach team trade draft score win loss quarter "
    "defense offense league playoff contract injury record stadium fans"
).split()

NAMES = ["Alice Johnson", "Bob Smith", "Carol Davis", "The Ringer", "Tom Brady"]


def make_rss_docs(spark: SparkSession, n_podcasts: int = 3, n_items: int = 4) -> DataFrame:
    """Nested RSS docs incl. one unparseable pubDate (null path,
    src/lambda_2.py:112-114)."""
    rng = random.Random(42)
    rows = []
    for p in range(n_podcasts):
        items = []
        for i in range(n_items):
            day = rng.randint(1, 28)
            pub = f"Mon, {day:02d} May 2023 10:30:00 +0000"
            if p == 0 and i == 0:
                pub = "not-a-date"  # permissive-parse fixture
            items.append(
                {
                    "title": f"Episode {i} of podcast {p}",
                    "description": " ".join(rng.choices(WORDS, k=8)),
                    "pubDate": pub,
                    "enclosure": {"url": f"https://example.com/p{p}/e{i}.mp3"},
                }
            )
        rows.append(
            {
                "rss": {
                    "channel": {
                        "title": f"Podcast {p}",
                        "description": f"About podcast {p}",
                        "item": items,
                    }
                }
            }
        )
    return spark.createDataFrame(rows, schemas.RSS_DOC)


def make_transcript_text(rng: random.Random, n_sentences: int) -> str:
    """'\\n'-joinable sentences with planted capitalized entities."""
    sentences = []
    for _ in range(n_sentences):
        words = rng.choices(WORDS, k=rng.randint(5, 12))
        if rng.random() < 0.6:
            pos = rng.randint(0, len(words) - 1)
            words[pos] = rng.choice(NAMES)
        sent = " ".join(words) + "."
        sentences.append(sent[0].upper() + sent[1:])
    return " ".join(sentences)


def make_audio(spark: SparkSession, episode_ids: list[int], chunk_bytes: int = 200) -> DataFrame:
    """audio(episode_id, content): utf-8 text payloads sized to split
    into 3-6 chunks at the given chunk size (the fake transcriber
    round-trips utf-8, so chunk text is ASCII-only words)."""
    rng = random.Random(7)
    rows = []
    for eid in episode_ids:
        text = make_transcript_text(rng, n_sentences=rng.randint(8, 15))
        rows.append((eid, text.encode("ascii", "replace")))
    return spark.createDataFrame(rows, "episode_id long, content binary")
