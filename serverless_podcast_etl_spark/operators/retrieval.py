"""Lexical (keyword) retrieval over text columns: BM25 top-k.

The retrieval family so far is dense (brute cosine → LSH → IVF over
embeddings, operators/similarity.py); this module adds the sparse
side — the classic inverted-index ranking a training-data pipeline
reaches for when there are no embeddings yet: decontamination probes
("which corpus docs score highest against this eval question"),
target-corpus affinity checks, and plain search over a crawl.

Spark-first shape (the 100 TB story): the corpus is tokenized ONCE
into a postings frame ``(doc_id, term, tf, dl)``; document frequency
is a ``groupBy(term)`` whose shuffle the postings⋈df join then reuses
(same key — NOTES fact 19); the tiny query side broadcasts into the
term equi-join, so candidate volume is Σ_{t∈query} df(t) — only
documents sharing a query term are ever touched, never |Q|×|corpus|;
per-(query, doc) scores partial-aggregate map-side; top-k is a
per-query window.  Corpus-level scalars (N, avgdl) are one bounded
1-row collect inlined as literals.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import word_tokens
from .scale import ensure_parallelism


def _idf(df_col: Column, n_docs: int, form: str) -> Column:
    """Per-term inverse document frequency.

    ``rational`` — ``(N + 1) / (df + 0.5)``: the module's certifiable
    default, following the q51 TF-IDF convention (NOTES fact 12:
    ``ln`` differs in the last ulp across runtimes, so a log-free form
    is what lets the whole ranking hash-match a DuckDB oracle).  It
    preserves BM25's defining parts — tf saturation and length
    normalization — but weights rare terms harder than the log form
    (idf grows linearly in N/df instead of logarithmically); fine for
    dedup/decontamination-style probes, documented for search uses.

    ``lucene`` — ``ln(1 + (N − df + 0.5) / (df + 0.5))``: the standard
    BM25+ idf for user-facing ranking; hypothesis-tested against a
    plain-Python twin but not oracle-certified (the ln caveat above).
    """
    if form == "rational":
        return F.lit(float(n_docs + 1)) / (df_col + F.lit(0.5))
    if form == "lucene":
        return F.log1p(
            (F.lit(float(n_docs)) - df_col + F.lit(0.5))
            / (df_col + F.lit(0.5))
        )
    raise ValueError(f"bm25_topk: unknown idf form {form!r}")


def bm25_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    idf: str = "rational",
) -> DataFrame:
    """Top-``k`` corpus documents per query by BM25 over whitespace
    word tokens (``functions.text.word_tokens`` — the engine's single
    tokenizer), ranked ``(query_id, neighbor_id, score, rank)``.

    score(q, d) = Σ_{t ∈ q ∩ d} idf(t) ·
                  tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Query terms are deduplicated IN the row (``array_distinct`` —
    NOTES fact 20), so repeated query words neither re-count nor
    re-shuffle; documents scoring 0 (no shared term) never appear.
    Ties break to the lower neighbor id (``row_number`` over
    score DESC, id ASC — the ANN convention), and the final score is
    rounded to 4 decimals in BOTH engines.

    PRECONDITION (shared id space, the ``ivf_topk`` convention): the
    self-match filter compares ``query_id`` to ``corpus_id`` AS
    VALUES — correct when queries are drawn from the corpus (the
    catalog shape); disambiguate ids (e.g. prefix one side) when the
    two tables are independent.

    Scale: see the module docstring — inverted-list equi-join on
    term, query side broadcast, candidates bounded by posting-list
    lengths, no cartesians.  A skew guard for stopword-heavy queries
    is the caller's ``k1``/stopword hygiene: a term with df ≈ N
    contributes ≈ idf_min per doc but costs a full posting-list scan,
    exactly as in any inverted index.
    """
    toks = ensure_parallelism(corpus).select(
        F.col(corpus_id).alias("neighbor_id"),
        word_tokens(F.col(text_col)).alias("_toks"),
    )
    lens = toks.select("neighbor_id", F.size("_toks").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("tot")
    ).collect()[0]  # bounded: one row (N + total length)
    n_docs, avgdl = int(stats["n"]), float(stats["tot"]) / max(
        int(stats["n"]), 1
    )

    postings = (
        toks.select(
            "neighbor_id", F.size("_toks").alias("dl"),
            F.explode("_toks").alias("term"),
        )
        .groupBy("neighbor_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df over the (neighbor_id, term)-unique postings; the join back
    # on term reuses the term-keyed exchange (fact 19)
    dfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )

    qterms = queries.select(
        F.col(query_id).alias("query_id"),
        F.explode(
            F.array_distinct(word_tokens(F.col(text_col)))
        ).alias("term"),
    )

    norm = F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    contrib = _idf(F.col("df"), n_docs, idf) * (
        F.col("tf") * F.lit(k1 + 1.0)
    ) / (F.col("tf") + F.lit(k1) * norm)

    scored = (
        postings.join(dfreq, "term")
        .join(F.broadcast(qterms), "term")  # queries ≪ corpus
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum(contrib), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    k_rrf: int = 60,
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked lists — the standard way to
    combine a sparse (BM25) and a dense (embedding) retriever without
    calibrating their incomparable score scales:

        rrf(q, d) = Σ_i 1 / (k_rrf + rank_i(q, d))

    with a document absent from system i contributing 0 for that term.
    Each input must carry ``(query_id, neighbor_id, <rank_col>)`` with
    ranks unique per (query, id) — the shape ``bm25_topk`` /
    ``similarity.brute_force_topk`` emit.  Returns
    ``(query_id, neighbor_id, rrf_score, rank)`` with the usual
    (score DESC, neighbor_id ASC) row_number ranking, top-``k``.

    Certifiability: the per-system rank lands in its own column (a
    ``max(when(system = i))`` pivot — integer max, order-free), and the
    fusion is ONE fixed-order expression ``t_0 + t_1 + …`` over those
    columns — no cross-row float aggregation anywhere, so the score is
    bit-identical across engines (the fact-12 concern never arises; a
    ``SUM`` over tagged rows would have reintroduced shuffle-order
    float addition).

    Scale: every input is already top-k-bounded (|Q|·k_i rows), so the
    union + pivot shuffle moves Σ|Q|·k_i rows — fusion cost is bounded
    by the QUERY load regardless of corpus size; the heavy lifting
    stays in the upstream retrievers.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    tagged = [
        r.select(
            "query_id",
            "neighbor_id",
            F.lit(i).alias("_sys"),
            F.col(rank_col).alias("_r"),
        )
        for i, r in enumerate(rankings)
    ]
    u = reduce(lambda a, b: a.unionByName(b), tagged)
    per_sys = u.groupBy("query_id", "neighbor_id").agg(
        *[
            F.max(F.when(F.col("_sys") == i, F.col("_r"))).alias(f"_r{i}")
            for i in range(len(rankings))
        ]
    )
    score: Column = F.lit(0.0)
    for i in range(len(rankings)):  # fixed fold order = the SQL twin's
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(k_rrf)) + F.col(f"_r{i}")),
            F.lit(0.0),
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("neighbor_id")
    )
    return (
        per_sys.withColumn("rrf_score", F.round(score, 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rrf_score", "rank")
    )
