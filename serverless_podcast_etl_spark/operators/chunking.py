"""Sliding token-window chunking — long documents into overlapping
fixed-size training sequences.

The standard pretraining / RAG preprocessing step the reference's
fixed-size chunker (`/root/reference/src/lambda_3.py:91-114` — 10 MB
BYTE chunks for parallel transcription) only approximates: split each
document into windows of ``window`` TOKENS advancing by ``stride``
tokens, so consecutive chunks overlap by ``window - stride`` tokens
and no token is lost at a boundary (the tail chunk may be shorter
than ``window`` but every chunk is non-empty and starts on a stride
multiple).

Scale shape: tokenization is bound once per row behind a Generate
barrier (the ``dedup._once`` pattern), chunk starts are an in-row
``sequence`` and the fan-out is ONE ``posexplode`` — no shuffle, no
Python, perfectly data-parallel at any corpus size.  Output volume is
``ceil(n/stride)`` rows per document, which the caller controls via
``stride``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_tokens
from .dedup import _once
from .scale import ensure_parallelism


def chunk_token_windows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_index, start_token, chunk_tokens, chunk_text) per
    sliding window.

    Chunk starts are ``0, stride, 2*stride, …`` up to the smallest
    start that reaches the last token, i.e. ``1 + ceil(max(n-window,
    0)/stride)`` chunks for an ``n``-token document (token-less
    documents produce no chunks — no evidence, no rows).  The final
    chunk covers the tail and may hold fewer than ``window`` tokens;
    every chunk holds at least one.

    ``F.sequence`` needs its ``n >= 1`` guard only implicitly here:
    the chunk count is ≥ 1 for every surviving (non-empty) document,
    so the sequence bound is never negative.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    # bind the token array once (dedup._once Generate barrier): the
    # slice below is evaluated per chunk and must read a bound
    # attribute, not re-run the tokenizer per window.  word_tokens is
    # the single-sourced whitespace tokenizer (r8 ADVICE) so chunk
    # boundaries cannot drift from textstats/corpus_stats tokenization.
    bound = _once(
        ensure_parallelism(df), id_col, word_tokens(F.col(text_col)), "_t"
    ).filter(F.size("_t") > 0)
    n = F.size("_t")
    n_chunks = 1 + F.floor(
        (F.greatest(n - F.lit(window), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda i: i * F.lit(stride)
    )
    exploded = bound.select(
        F.col(id_col),
        F.col("_t"),
        F.posexplode(starts).alias("chunk_index", "_start"),
    )
    chunk = F.slice(F.col("_t"), F.col("_start") + 1, window)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.col("_start").cast("long").alias("start_token"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def duplicate_chunk_rate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 32,
) -> DataFrame:
    """(id, n_chunks, dup_chunks, dup_chunk_rate) per document: the
    fraction of its NON-overlapping ``window``-token blocks whose
    exact content recurs anywhere in the corpus — block-granular
    boilerplate measurement (the token-window form of C4's
    line-dedup signal; q66/q71 find the spans, this scores documents
    by how much of them is duplicated material).

    Built as a composition of two certified stages: the q105 chunker
    at ``stride == window`` (non-overlapping — overlapping windows
    would alias each other within one document) and the q18 exact
    content-hash groupBy.  The df count is over ALL chunk occurrences
    (cross-document AND within-document repeats both make a block
    non-unique — a page repeating its own nav block is boilerplate
    too).  Shape: chunker (in-row + posexplode) → md5 per chunk →
    one shuffle on the hash for occurrence counts → join back on the
    hash (exchange-reusable) → one tiny doc-level re-aggregate.
    """
    chunks = chunk_token_windows(
        df, text_col=text_col, id_col=id_col, window=window, stride=window
    ).select(
        F.col(id_col), F.md5(F.encode(F.col("chunk_text"), "utf-8")).alias("_h")
    )
    occ = chunks.groupBy("_h").agg(F.count(F.lit(1)).alias("_occ"))
    return (
        chunks.join(occ, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("_occ") > 1, 1).otherwise(0)).alias(
                "dup_chunks"
            ),
        )
        .select(
            id_col,
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.col("dup_chunks").cast("long").alias("dup_chunks"),
            F.round(
                F.col("dup_chunks").cast("double") / F.col("n_chunks"), 6
            ).alias("dup_chunk_rate"),
        )
    )
