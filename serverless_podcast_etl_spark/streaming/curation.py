"""Streaming corpus curation — the ingest-time gate of a training-data
pipeline, as one composable Structured Streaming transform.

Order matters and mirrors the batch pipeline: (1) bounded-state exact
dedup (drop re-deliveries before paying any per-document compute),
(2) quality gate (drop junk before the regex scrub), (3) PII
redaction.  Stages 2-3 are stateless JVM expressions, so the same
code path serves batch frames unchanged; only the dedup tier carries
streaming state, and that state is watermark-bounded
(streaming/dedup.py) — the whole gate runs forever at any volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.pii import pii_columns
from ..functions.text import word_tokens
from ..functions.textstats import (
    encoding_anomaly_columns,
    oov_columns,
    quality_columns,
)
from .dedup import stream_dedup_exact


def curate_stream(
    stream: DataFrame,
    text_col: str,
    id_col: str,
    ts_col: str | None = None,
    dedup_delay: str = "10 minutes",
    min_chars: int = 50,
    min_tokens: int = 10,
    max_punct_ratio: float = 0.2,
    max_stopword_ratio: float = 0.6,
    vocabulary: list[str] | None = None,
    max_oov_rate: float = 0.5,
    max_anomaly_rate: float | None = None,
) -> DataFrame:
    """Documents that survive dedup + quality gating, with their
    quality stats and the PII-redacted text attached.

    ``ts_col=None`` skips the dedup tier (pure stateless gate).  The
    thresholds are plan literals — Catalyst folds them, and the whole
    gate is one projection + filter per micro-batch.

    ``vocabulary`` (r10) adds the q102 vocabulary-OOV tier between
    the quality gate and the PII scrub: documents whose OOV token
    fraction exceeds ``max_oov_rate`` are dropped, survivors carry
    ``oov_tokens``/``oov_rate``.  The vocabulary is FIT OFFLINE on a
    reference corpus (``textstats.build_vocabulary`` — a stream
    cannot fit a global vocabulary online) and ships as an InSet
    inside the plan, so the tier stays stateless and micro-batch-safe
    like the quality gate.

    ``max_anomaly_rate`` (r12) adds the q116 encoding-hygiene tier
    between dedup and the quality gate (mojibake/control junk should
    die before the tokenizer ever sees it): ANY U+FFFD replacement
    char drops the document unconditionally (a decoder already gave
    up on it), as does a rounded anomaly rate above the threshold;
    survivors carry the four count columns + ``anomaly_rate``.
    Token-less/empty documents carry no anomaly evidence (NULL rate)
    and pass this tier — the quality gate's ``min_chars`` is the
    authority on emptiness.  Same in-row expressions as the batch
    scorer (``textstats.encoding_anomaly_columns``), so stream ==
    batch by construction.
    """
    d = stream
    if ts_col is not None:
        with_digest = d.withColumn(
            "_digest", F.md5(F.encode(F.col(text_col), "utf-8"))
        )
        d = stream_dedup_exact(
            with_digest, keys=["_digest"], ts_col=ts_col, delay=dedup_delay
        ).drop("_digest")
    if max_anomaly_rate is not None:
        e = encoding_anomaly_columns(F.col(text_col))
        rate = F.round(
            F.try_divide(
                (
                    e["replacement_chars"]
                    + e["control_chars"]
                    + e["mojibake_pairs"]
                ).cast("double"),
                e["n_chars"].cast("double"),
            ),
            6,
        )
        # n_chars is omitted here — the quality gate below emits the
        # identical expression under the same name
        d = d.select(
            "*",
            *[c.alias(n) for n, c in e.items() if n != "n_chars"],
            rate.alias("anomaly_rate"),
        ).filter(
            (F.col("replacement_chars") == 0)
            & (
                F.coalesce(F.col("anomaly_rate"), F.lit(0.0))
                <= F.lit(max_anomaly_rate)
            )
        )
    q = quality_columns(text_col)
    gated = d.select(
        "*", *[c.alias(n) for n, c in q.items()]
    ).filter(
        (F.col("n_chars") >= min_chars)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("stopword_ratio") <= max_stopword_ratio)
    )
    if vocabulary is not None:
        o = oov_columns(word_tokens(F.col(text_col)), vocabulary)
        gated = gated.select(
            "*", *[c.alias(n) for n, c in o.items()]
        ).filter(F.col("oov_rate") <= max_oov_rate)
    p = pii_columns(text_col)
    return gated.select(
        "*", *[c.alias(n) for n, c in p.items()]
    ).drop(text_col)
