"""Sliding token-window chunking — long documents into overlapping
fixed-size training sequences.

The standard pretraining / RAG preprocessing step the reference's
transcript chunker (`lambdas/chunk_transcript`, fixed-size CHARACTER
chunks for parallel transcription) only approximates: split each
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
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    # bind the token array once (Generate barrier): the slice below is
    # evaluated per chunk and must read a bound attribute, not re-run
    # the split/filter per window
    bound = ensure_parallelism(df).select(
        F.col(id_col), F.explode(F.array(toks)).alias("_t")
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
