"""Pluggable ML-service seams (S15) with deterministic local stand-ins.

The reference calls AWS Transcribe (src/lambda_4.py:21-34) and AWS
Comprehend (src/lambda_6.py:29-62); output shapes are fixed by the
consumers (src/lambda_5.py:79, src/lambda_71.py:77-81,
src/lambda_72.py:50).  Here each service is a ``pandas_udf`` — swap in
a real client by passing a different callable; tests use the
deterministic fakes so golden outputs are stable.

Fake determinism: every score derives from md5 of the input text —
stable across runs, machines, and engines.
"""

from __future__ import annotations

import hashlib
import json
import re

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SENTIMENT_RESULT = StructType(
    [
        StructField("Sentiment", StringType()),
        StructField(
            "SentimentScore",
            StructType(
                [
                    StructField("Negative", FloatType()),
                    StructField("Neutral", FloatType()),
                    StructField("Positive", FloatType()),
                    StructField("Mixed", FloatType()),
                ]
            ),
        ),
    ]
)

ENTITY_RESULT = ArrayType(
    StructType(
        [
            StructField("Text", StringType()),
            StructField("Type", StringType()),
            StructField("BeginOffset", LongType()),
            StructField("EndOffset", LongType()),
            StructField("Score", FloatType()),
        ]
    )
)

_SENTIMENTS = ["NEUTRAL", "POSITIVE", "NEGATIVE", "MIXED"]
_ENTITY_TYPES = [
    "PERSON",
    "ORGANIZATION",
    "LOCATION",
    "COMMERCIAL_ITEM",
    "EVENT",
    "DATE",
    "QUANTITY",
    "TITLE",
    "OTHER",
]


def _digest(text: str) -> bytes:
    return hashlib.md5(text.encode("utf-8")).digest()


def fake_transcribe_payload(audio: bytes) -> str:
    """Deterministic Transcribe stand-in: the payload JSON a chunk job
    would produce (shape fixed by src/lambda_5.py:79).

    A real client uploads the chunk and polls the async job; the fake
    'transcribes' utf-8 text chunks verbatim (tests feed text-as-audio)
    and otherwise derives a stable pseudo-transcript from the bytes.
    """
    try:
        transcript = audio.decode("utf-8")
    except (UnicodeDecodeError, AttributeError):
        h = hashlib.md5(audio).hexdigest()
        transcript = f"synthetic transcript {h[:8]}"
    return json.dumps({"results": {"transcripts": [{"transcript": transcript}]}})


@F.pandas_udf(StringType())
def transcribe_udf(audio: pd.Series) -> pd.Series:
    return audio.map(lambda b: fake_transcribe_payload(bytes(b)))


def fake_sentiment(text: str) -> dict:
    """Deterministic Comprehend-sentiment stand-in (shape per
    src/lambda_71.py:77-81): 4 scores in [0,1) summing to ~1, 4dp."""
    d = _digest(text)
    raw = [d[0] + 1, d[1] + 1, d[2] + 1, d[3] + 1]
    total = sum(raw)
    scores = [round(r / total, 4) for r in raw]
    label = _SENTIMENTS[max(range(4), key=lambda i: raw[i]) % 4]
    return {
        "Sentiment": label,
        "SentimentScore": {
            "Negative": scores[0],
            "Neutral": scores[1],
            "Positive": scores[2],
            "Mixed": scores[3],
        },
    }


@F.pandas_udf(SENTIMENT_RESULT)
def sentiment_udf(texts: pd.Series) -> pd.DataFrame:
    rows = texts.map(fake_sentiment)
    return pd.DataFrame(
        {
            "Sentiment": rows.map(lambda r: r["Sentiment"]),
            "SentimentScore": rows.map(lambda r: r["SentimentScore"]),
        }
    )


_CAPITALIZED = re.compile(r"\b[A-Z][a-z]+(?: [A-Z][a-z]+)*")


def fake_entities(text: str) -> list[dict]:
    """Deterministic Comprehend-entities stand-in (shape per
    src/lambda_72.py:50): capitalized word-runs become entities with
    char offsets into the document; type derives from the text hash."""
    out = []
    for m in _CAPITALIZED.finditer(text):
        d = _digest(m.group(0))
        out.append(
            {
                "Text": m.group(0),
                "Type": _ENTITY_TYPES[d[0] % len(_ENTITY_TYPES)],
                "BeginOffset": m.start(),
                "EndOffset": m.end(),
                "Score": round(0.5 + (d[1] / 512), 4),
            }
        )
    return out


@F.pandas_udf(ENTITY_RESULT)
def entities_udf(texts: pd.Series) -> pd.Series:
    return texts.map(fake_entities)
