"""Deduplication operators for large-scale corpus curation.

The training-data-pipeline surface (BASELINE.json north star): exact
dedup, shingle/Jaccard near-dup, MinHash+LSH, SimHash, and
embedding-cosine near-dup.  Every operator is pure DataFrame — the
candidate generation is always a self-equi-join on a derived key
(shingle / band bucket / simhash band), never an O(n²) cross join, so
each scales as (corpus size × duplicate density), not corpus².

Portable hashing (functions/hashing.py) keeps MinHash/SimHash
signatures bit-identical between Spark and the DuckDB oracle.

``materialize=True`` contract (every knob in this module, ADVICE
r12): the default eagerly ``localCheckpoint``s the expensive hashing
scan at its fan-out, which (a) runs a Spark job at
DataFrame-CONSTRUCTION time, (b) truncates lineage — localCheckpoint
blocks live on executor local storage, NOT a reliable store, so on a
cluster with executor loss/preemption the blocks are unrecoverable
and the job fails rather than recomputing (same trade
``warehouse.py`` makes; use ``df.checkpoint()`` to a reliable dir if
your cluster preempts), and (c) stops Catalyst pushing downstream
filters/column pruning past the checkpoint into the source scan —
irrelevant for these operators' own plans (every consumer below the
fan-out reads ALL checkpointed columns, and the outputs are computed
pair/score columns no source-level pushdown could reach), but a
caller composing extra source-column predicates UNDER one of these
operators should apply them to ``df`` first.  Pass
``materialize=False`` for the lazy zero-side-effect composition
(mandatory in streaming plans; parity-tested in
tests/test_materialize_parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import hashing
from .scale import ensure_parallelism


def exact_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Exact duplicate groups by content hash.

    Returns one row per distinct content hash with the representative
    (minimum) id and the duplicate count.  Hash-groupBy: map-side
    partial aggregation, one shuffle on the 128-bit digest.
    """
    content = F.col(text_col)
    if normalize:
        content = F.lower(F.trim(content))
    return (
        df.select(F.md5(content).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("n_duplicates"),
        )
    )


def exact_dedup_keep_first(
    df: DataFrame,
    text_col: str,
    id_col: str,
    normalize: bool = True,
) -> DataFrame:
    """The applied form of ``exact_dedup``: the corpus with exact
    duplicates removed, keeping the minimum-id representative of each
    content group.  Same single shuffle (window over the content
    hash) — no join back to the group table needed.
    """
    from pyspark.sql import Window

    content = F.col(text_col)
    if normalize:
        content = F.lower(F.trim(content))
    w = Window.partitionBy(F.md5(content)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _word_tokens(text_col: str):
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")


def shared_token_hash48(
    df: DataFrame, text_col: str, id_col: str, shingle_n: int | None = None
) -> DataFrame:
    """``(id, _th48 array<long>)`` — ONE tokenize→md5 scan, eagerly
    materialized, for sharing across DETECTORS (opt-r15, guide §2.1:
    don't recompute the fan-out source).

    Both token-hash families used by the near-dup detectors are
    prefixes of the same md5 hex digest: MinHash's 32-bit token hash
    is ``portable_hash48 % 2^32`` (the LOW 32 bits of the 48-bit
    value) and SimHash's is the value of the first 8 hex digits —
    exactly ``portable_hash48 >> 16``.  Materializing the 48-bit
    hashes once therefore lets an ensemble run the md5 pass — the
    dominant per-row CPU at corpus scale — exactly once, with each
    detector deriving its own view by cheap integer arithmetic
    (bit-identical to what it computed standalone; pinned by the
    shared-scan parity tests).  Pass the result as ``hashes48=`` to
    ``minhash_lsh_pairs`` and ``simhash_neardup_pairs``; the frames
    must share ``text_col``/``id_col`` semantics with this scan.

    ``shingle_n`` additionally folds and stores the word-``n``-gram
    shingle hashes in the SAME materialization (column
    ``_h32s{n}``): a MinHash consumer then reads its shingle arrays
    straight from this checkpoint instead of paying a second
    corpus-linear materialization pass (read the hash blocks, fold,
    write shingle blocks) — one write of both arrays replaces
    write+read+write.  The column name carries ``n``, so a consumer
    asking for a different shingle width falls back to folding from
    ``_th48`` rather than silently reading the wrong space.

    The eager ``localCheckpoint`` makes this batch-only (the fact-18
    materialize contract in this module's docstring applies)."""
    from ..functions.text import word_tokens_spark_sql

    h48 = F.expr(
        hashing.token_hashes48_spark_sql(word_tokens_spark_sql(text_col))
    )
    bound = _once(ensure_parallelism(df), id_col, h48, "_th48")
    if shingle_n is None:
        return bound.localCheckpoint(eager=True)
    # bind the 32-bit view behind a second Generate (explode keeps the
    # other columns) so the fold's slices read a bound array instead
    # of re-evaluating the mod-transform per reference (fact 31)
    b2 = bound.select(
        F.col(id_col),
        F.col("_th48"),
        F.explode(
            F.array(F.expr(f"transform(_th48, h -> h % {hashing.U32})"))
        ).alias("_th"),
    )
    return b2.select(
        F.col(id_col),
        F.col("_th48"),
        F.expr(
            hashing.shingle_hash_array_spark_sql("_th", shingle_n)
        ).alias(f"_h32s{shingle_n}"),
    ).localCheckpoint(eager=True)


def _bound_token_hashes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    hashes48: DataFrame | None = None,
) -> DataFrame:
    """(id, _th array<long>) with the md5 token hashes materialized
    behind a Generate barrier (see ``_once``) so every downstream
    consumer reads a bound attribute — the md5 pass runs exactly once
    per row.  Also fans a single-row-group scan out across cores.

    ``hashes48`` (a ``shared_token_hash48`` frame) replaces the md5
    scan with a mod-2^32 derivation over the already-materialized
    48-bit hashes — same values bit-for-bit (the 32-bit token hash IS
    the low half of the 48-bit one), no md5 recomputation."""
    from ..functions.text import word_tokens_spark_sql

    if hashes48 is not None:
        return _once(
            hashes48,
            id_col,
            F.expr(f"transform(_th48, h -> h % {hashing.U32})"),
            "_th",
        )
    return _once(
        ensure_parallelism(df),
        id_col,
        F.expr(
            hashing.token_hashes_spark_sql(word_tokens_spark_sql(text_col))
        ),
        "_th",
    )


def shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    shingle_col: str = "shingle",
    hashes48: DataFrame | None = None,
) -> DataFrame:
    """Distinct word n-gram shingle HASHES per document (array<long>
    token hashes folded pairwise — shingle strings never materialize;
    see functions/hashing.py).  All JVM-side; one explode feeding the
    downstream join, no string allocation per shingle.

    Per-doc dedup is the in-row ``array_distinct`` — equivalent to
    the relational ``.distinct()`` it replaces (a shingle can only
    repeat WITHIN a doc; ids differ across docs) with zero exchange,
    where the old form shuffled the whole exploded corpus (measured
    ~0.9 s of the q110 shape at sf0.1).

    PRECONDITION (ADVICE r12): ``id_col`` must uniquely key the input
    rows.  The old relational ``.distinct()`` silently collapsed
    duplicate-id rows; the in-row form emits duplicate
    ``(id, shingle)`` rows for them, inflating ``n_shingles`` and
    shared-shingle counts downstream (intersections can then exceed
    set sizes, skewing Jaccard/containment scores).  Every consumer
    in this module — ``ngram_jaccard_pairs``, ``containment_pairs``,
    ``incremental_neardup_admission``/``incremental_refresh`` and the
    MinHash family via ``_bound_token_hashes`` — inherits this
    contract; run ``exact_dedup``/``dedup_keep_first`` on the id
    first if your corpus can carry duplicate ids.

    ``hashes48`` (a ``shared_token_hash48`` frame) shares the
    tokenize→md5 scan with other detectors — see
    ``shared_token_hash48``.
    """
    hashed = _bound_token_hashes(df, text_col, id_col, hashes48=hashes48)
    grams = F.expr(hashing.shingle_hash_array_spark_sql("_th", n))
    return hashed.select(
        F.col(id_col),
        F.explode(F.array_distinct(grams)).alias(shingle_col),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
    materialize: bool = True,
    hashes48: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    Candidate generation is a self-join on the shingle value (only
    documents sharing ≥1 shingle ever meet — the scalable alternative
    to a cross join), then Jaccard = |A∩B| / (|A|+|B|−|A∩B|) from
    per-doc shingle counts.

    ``max_doc_freq`` removes STOP-SHINGLES — n-grams appearing in more
    than that many documents — from the similarity space before the
    join (exactly what stopword removal does for terms).  A shingle in
    d documents contributes d·(d−1)/2 joined rows, so boilerplate
    n-grams dominate the join quadratically while carrying no
    near-dup signal; the cap bounds the join at Σ min(df,cap)² —
    corpus-linear.  Jaccard is then computed over the capped space on
    BOTH numerator and denominators (self-consistent and
    oracle-expressible).

    ``materialize`` (default) ``localCheckpoint``s the shingle table
    at its fan-out (NOTES fact 18 — the doc-freq cap, the size agg
    and the self-join's exchange-shared side each re-ran the
    tokenize→md5 scan): every consumer reads one executed scan.
    Batch-only; pass ``False`` for lazy/streaming composition.

    ``hashes48`` (a ``shared_token_hash48`` frame) shares the
    tokenize→md5 scan with other detectors over the same corpus
    (bit-identical shingles — the capped similarity space is derived
    downstream and unaffected).
    """
    sh = shingles(df, text_col, id_col, n=n, hashes48=hashes48)
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("sz_b"))
    return (
        shared.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 50,
    materialize: bool = True,
) -> DataFrame:
    """Asymmetric near-dup pairs by n-gram CONTAINMENT — the
    doc-inside-doc detector Jaccard structurally misses.

    containment(A,B) = |A∩B| / min-side size, emitted per direction
    (``containment_a`` = |A∩B|/|A|, ``containment_b`` = |A∩B|/|B|)
    and filtered on the max of the two: a short quote or article fully
    embedded in a long page scores ~1.0 here while its Jaccard is
    ≈ |A|/|B| ≈ 0 — which is also why candidates come from the
    ``ngram_jaccard_pairs`` shingle self-join (perfect recall for any
    pair sharing a shingle) and NOT from MinHash banding, whose
    collision probability tracks JACCARD and would drop exactly the
    asymmetric pairs this operator exists to find.

    ``max_doc_freq`` (default ON, unlike the Jaccard form: containment
    candidates skew toward boilerplate by construction) caps the
    per-shingle join fan-out at Σ min(df,cap)² — corpus-linear; both
    numerator and denominators are computed over the capped space
    (self-consistent, oracle-expressible).

    Sizing the cap for boilerplate-heavy corpora: the candidate join
    is bounded by cap² × (number of distinct shingles at the cap), so
    on a corpus where many shingles saturate the cap (template pages,
    navigation blocks) the REAL bound is cap² × distinct-shingle
    count, not Σ df².  Pick ``max_doc_freq`` ≈ the largest true
    duplicate-cluster size you need to detect (a doc contained in d
    copies needs its shingles to survive at df ≤ d) and no larger —
    halving the cap quarters the worst-case join.  Shingles above the
    cap carry no containment signal by the stop-shingle argument, so
    raising it past the cluster-size bound only buys boilerplate
    pairs.

    ``materialize`` (default) ``localCheckpoint``s the shingle table
    at its fan-out, exactly as in ``ngram_jaccard_pairs`` (measured
    3.10 → 1.98 s on the q110 shape at sf0.1 together with the
    ``shingles`` distinct-shuffle removal); ``False`` keeps the lazy
    composition.
    """
    sh = shingles(df, text_col, id_col, n=n)
    if materialize:
        sh = sh.localCheckpoint(eager=True)
    if max_doc_freq is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sz_a = sizes.select(
        F.col(id_col).alias("id_a"), F.col("n_shingles").alias("sz_a")
    )
    sz_b = sizes.select(
        F.col(id_col).alias("id_b"), F.col("n_shingles").alias("sz_b")
    )
    return (
        shared.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "containment_a", F.round(F.col("n_shared") / F.col("sz_a"), 4)
        )
        .withColumn(
            "containment_b", F.round(F.col("n_shared") / F.col("sz_b"), 4)
        )
        .withColumn(
            "containment",
            F.round(
                F.greatest(
                    F.col("n_shared") / F.col("sz_a"),
                    F.col("n_shared") / F.col("sz_b"),
                ),
                4,
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "id_a", "id_b", "n_shared",
            "containment_a", "containment_b", "containment",
        )
    )


def _once(df: DataFrame, id_col: str, expr, name: str) -> DataFrame:
    """Materialize an expensive per-row expression exactly once.

    Column expressions are duplicated into every consumer after
    ProjectCollapse, so an md5-transform referenced by 8 output
    columns would run 8×.  ``explode(array(expr))`` wraps it in a
    Generate node (always exactly 1 output row per input row), which
    the collapse rule cannot inline through — downstream projections
    see a bound attribute, not the expression tree.
    """
    return df.select(F.col(id_col), F.explode(F.array(expr)).alias(name))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signature per document: num_hashes columns ``mh_i``.

    Each hash i is min over shingles of (a_i·h32(shingle)+b_i) mod p
    with the portable md5-derived base hash — bit-identical to the SQL
    oracle.  Computed entirely inside the row with higher-order array
    functions: ZERO shuffles, perfectly data-parallel at any scale
    (min over duplicate shingles == min over distinct shingles, so no
    dedup pass is needed either).  The md5 base hashes are computed
    once per shingle via the ``_once`` barrier; the per-function mins
    are cheap arithmetic re-scans of that array.

    Documents with fewer than ``n`` tokens have NO shingles and emit
    NO row — they are outside shingle-dedup's domain (use
    ``exact_dedup`` for empty/near-empty docs).  Before the r8 fix
    (found by the signature-portability fuzz test) they emitted
    all-NULL signatures, which the DuckDB twin omits (min over an
    empty relation is no row) AND which ``minhash_bands``' concat_ws
    collapsed into one shared ``""`` bucket — a hot quadratic
    candidate bucket of every short doc in the corpus.
    """
    return _signatures_from_arrays(
        _shingle_arrays(df, text_col, id_col, n, materialize=False),
        id_col,
        num_hashes,
    )


def _shingle_arrays(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    materialize: bool = True,
    hashes48: DataFrame | None = None,
) -> DataFrame:
    """``(id, _h32s array<long>)`` — each doc's word-n-gram shingle
    hashes behind the ``_once`` Generate barrier, shingle-less docs
    dropped.  ``materialize`` ``localCheckpoint``s the frame at its
    fan-out (NOTES fact 18) so signature, banding, and verify
    consumers all read ONE executed tokenize→md5→fold scan; pass
    ``False`` for lazy single-consumer/streaming compositions.
    ``hashes48`` (a ``shared_token_hash48`` frame) replaces the
    tokenize→md5 part of that scan with the cross-detector shared
    materialization — same shingle hashes bit-for-bit.  When the
    shared frame was built with a MATCHING ``shingle_n`` (its
    ``_h32s{n}`` column), the pre-folded shingle arrays are read
    straight from it — no second materialization pass at all."""
    if hashes48 is not None and f"_h32s{n}" in hashes48.columns:
        # the shared checkpoint already stores this width's folds;
        # consumers project + filter it directly (it IS materialized)
        return hashes48.select(
            F.col(id_col), F.col(f"_h32s{n}").alias("_h32s")
        ).filter(F.size(F.col("_h32s")) > 0)
    bound = _bound_token_hashes(df, text_col, id_col, hashes48=hashes48)
    harr = _once(
        bound,
        id_col,
        F.expr(hashing.shingle_hash_array_spark_sql("_th", n)),
        "_h32s",
    ).filter(F.size(F.col("_h32s")) > 0)
    return harr.localCheckpoint(eager=True) if materialize else harr


def _signatures_from_arrays(
    harr: DataFrame, id_col: str, num_hashes: int
) -> DataFrame:
    """MinHash signature columns ``mh_i`` from a ``_shingle_arrays``
    frame: per-function mins are cheap in-row arithmetic re-scans of
    the hash array (min over duplicate shingles == min over distinct,
    so no dedup pass).  One F.expr round-trip per signature column
    (opt-r15) — same universal-hash expression, same int/bigint
    literal widths as the Python-built form."""
    params = hashing.MINHASH_PARAMS[:num_hashes]
    return harr.select(
        F.col(id_col),
        *[
            F.expr(
                f"array_min(transform(_h32s, h -> (h * {a} + {b}) % "
                f"{hashing.MERSENNE_P}))"
            ).alias(f"mh_{i}")
            for i, (a, b) in enumerate(params)
        ],
    )


def minhash_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bucket): the LSH band table — each document's
    signature split into ``bands`` concatenated-bucket keys.  This IS
    the persistent near-dup index of an incremental pipeline: written
    once (bucketed on (band, bucket) via ``sources.bucketed``), every
    future batch joins against it without re-signing the corpus."""
    sig = minhash_signatures(df, text_col, id_col, n=n, num_hashes=num_hashes)
    return _bands_from_signatures(sig, id_col, num_hashes, bands)


def _bands_from_signatures(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, bucket) from a signature frame: each signature split
    into ``bands`` concatenated-bucket keys via one Generate.  The
    struct array enters as ONE F.expr (opt-r15) — same band literals,
    same concat_ws buckets."""
    rows_per_band = num_hashes // bands
    structs = ", ".join(
        f"struct({bi} AS band, concat_ws('_', "
        + ", ".join(
            f"mh_{bi * rows_per_band + r}" for r in range(rows_per_band)
        )
        + ") AS bucket)"
        for bi in range(bands)
    )
    return sig.select(
        F.col(id_col), F.explode(F.expr(f"array({structs})")).alias("bk")
    ).select(
        F.col(id_col),
        F.col("bk.band").alias("band"),
        F.col("bk.bucket").alias("bucket"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    verify_threshold: float = 0.2,
    prune_verify: bool = False,
    materialize: bool = True,
    hashes48: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact Jaccard verification.

    Signature → split into ``bands`` bands of num_hashes/bands rows →
    candidate pairs share any full band (equi-join on the band key —
    the LSH trick that makes near-dup detection O(candidates) instead
    of O(n²)) → verified with exact shingle Jaccard computed ONLY for
    candidate pairs (the whole point of LSH: verification cost scales
    with candidates, never with all n² pairs).

    ``materialize`` (default) ``localCheckpoint``s the per-doc
    shingle-hash ARRAY frame once at its fan-out (NOTES fact 18): the
    banding side and BOTH verify shingle sides read the materialized
    arrays, the per-doc shingle-set sizes become an in-row
    ``size(array_distinct(...))`` (no groupBy shuffle at all), and
    the tokenize→md5 scan runs exactly once — where the lazy plan
    re-ran it per differently-keyed consumer (the band self-join's
    two sides dedupe via ReusedExchange, but the verify sides shuffle
    on different keys and cannot).  Measured 1.92 → 1.00 s at sf0.1,
    parity exact.  The checkpoint makes the call batch-only;
    ``materialize=False`` keeps the original pure-lazy composition
    (streaming-safe, e.g. under ``transformWithState``-free
    foreachBatch callers that re-plan per micro-batch).

    ``prune_verify`` broadcast-semi-joins the shingle tables down to
    candidate doc ids before the (id, shingle) verify shuffle.  Default
    OFF from a measured A/B at sf0.1 (parity exact; baseline
    1.6-2.3 s vs pruned 2.4-2.7 s — two extra broadcast joins cost
    more than the full shingle shuffle saves when the corpus is
    small).  The regime flips when candidates ≪ corpus — at fact
    scale the un-pruned verify shuffles EVERY document's shingles
    while candidates touch a sliver, so a cluster deployment should
    enable it (or Spark's runtime Bloom-filter join injection, the
    engine-native form of the same idea).

    ``hashes48`` (a ``shared_token_hash48`` frame over the same
    corpus/text/id) lets an ENSEMBLE caller share the tokenize→md5
    scan with other detectors — the shingle fold then derives from
    the shared materialization instead of re-hashing (bit-identical
    output; requires ``materialize=True``, since the shared frame is
    itself an eager checkpoint).
    """
    if hashes48 is not None and not materialize:
        raise ValueError(
            "minhash_lsh_pairs: hashes48 requires materialize=True "
            "(the shared scan is an eager checkpoint — a lazy "
            "composition cannot consume it)"
        )
    if materialize:
        harr = _shingle_arrays(df, text_col, id_col, n, hashes48=hashes48)
        banded = _bands_from_signatures(
            _signatures_from_arrays(harr, id_col, num_hashes),
            id_col, num_hashes, bands,
        )
        sh = harr.select(
            F.col(id_col),
            F.explode(F.array_distinct("_h32s")).alias("shingle"),
        )
        sizes = harr.select(
            F.col(id_col),
            F.size(F.array_distinct("_h32s")).alias("n_shingles"),
        )
    else:
        banded = minhash_bands(
            df, text_col, id_col, n=n, num_hashes=num_hashes, bands=bands
        )
        sh = shingles(df, text_col, id_col, n=n)
        sizes = sh.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_shingles")
        )
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    candidates = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # Exact-Jaccard verify restricted to candidates: intersect shingle
    # sets pair-by-pair via two equi-joins (candidate × its shingles),
    # then |A∩B| / (|A|+|B|−|A∩B|).
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    if prune_verify:
        sh_a = sh_a.join(
            F.broadcast(candidates.select("id_a").distinct()), "id_a",
            "left_semi",
        )
        sh_b = sh_b.join(
            F.broadcast(candidates.select("id_b").distinct()), "id_b",
            "left_semi",
        )
    shared = (
        candidates.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("sz_b"))
    return (
        shared.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def incremental_neardup_admission(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    verify_threshold: float = 0.2,
    prune_verify: bool = False,
    corpus_bands: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Admission gate for incremental ingestion: for each NEW document,
    the count of verified near-duplicates already in the corpus —
    admit (``n_matches = 0``) or reject without ever comparing new
    docs to each other or re-pairing the corpus against itself.

    This is the production shape of near-dup dedup at 100 TB: the
    corpus side of the join is exactly ``minhash_bands`` — a
    persistable index (write it bucketed on (band, bucket) via
    ``sources.bucketed.write_bucketed`` and the per-batch candidate
    join is shuffle-free on the corpus side) — so daily batches cost
    O(batch signatures + candidates), never O(corpus²) or a corpus
    re-sign.  Candidate verification re-derives shingles only through
    equi-joins that touch matched documents.

    ``corpus_bands`` plugs that persisted index straight in: a
    DataFrame with columns (``id_col``, band, bucket) — e.g.
    ``spark.table(...)`` over a ``write_bucketed`` table — used for
    the candidate join INSTEAD of re-signing ``corpus_df``.  The
    parameters (n, num_hashes, bands) must match those the index was
    built with; when the table is bucketed on (band, bucket) the
    candidate join reads it with zero Exchange above the scan
    (pinned by ``test_admission_against_bucketed_index_plan``).
    ``corpus_df`` is still consulted for verification shingles —
    combine with ``prune_verify`` so only candidate-matched corpus
    docs are shuffled for the verify step.

    Semantics are exactly ``minhash_lsh_pairs`` over the union,
    restricted to (new × corpus) pairs — pinned by the catalog oracle
    (q76), which computes full-corpus pairs and filters to the split.

    ``prune_verify`` (default off — see the measured A/B on
    ``minhash_lsh_pairs``) semi-joins the CORPUS shingle table down to
    candidate doc ids before the verify shuffle; here the asymmetry is
    extreme (corpus ≫ batch ≫ candidates), so cluster deployments of
    the incremental gate should enable it even though local bench
    scale measures it as overhead.

    ``materialize`` (default) ``localCheckpoint``s each side's
    shingle-hash arrays at their fan-out (banding + verify shingles +
    sizes — NOTES fact 18), so the batch is hashed once, and the
    corpus once instead of up to three times WHEN it is being signed
    here anyway (``corpus_bands is None``); with a plugged index the
    corpus side stays lazy — the production shape hashes only what
    the verify joins touch, and a full-corpus checkpoint would defeat
    exactly that.  Pass ``False`` for per-micro-batch callers (the
    streaming admission gate re-plans every batch; re-checkpointing
    the corpus per batch costs more than the repeated scans).
    """
    if materialize:
        harr_new = _shingle_arrays(new_df, text_col, id_col, n)
        nb = _bands_from_signatures(
            _signatures_from_arrays(harr_new, id_col, num_hashes),
            id_col, num_hashes, bands,
        ).select(F.col(id_col).alias("_id_new"), "band", "bucket")
        sh_new = harr_new.select(
            F.col(id_col).alias("_id_new"),
            F.explode(F.array_distinct("_h32s")).alias("shingle"),
        )
        sz_new = harr_new.select(
            F.col(id_col).alias("_id_new"),
            F.size(F.array_distinct("_h32s")).alias("sz_n"),
        )
    else:
        nb = minhash_bands(
            new_df, text_col, id_col, n=n, num_hashes=num_hashes,
            bands=bands,
        ).select(F.col(id_col).alias("_id_new"), "band", "bucket")
        sh_new = shingles(new_df, text_col, id_col, n=n).select(
            F.col(id_col).alias("_id_new"), "shingle"
        )
        sz_new = sh_new.groupBy("_id_new").agg(
            F.count(F.lit(1)).alias("sz_n")
        )
    harr_old = None
    if corpus_bands is None:
        if materialize:
            harr_old = _shingle_arrays(corpus_df, text_col, id_col, n)
            corpus_bands = _bands_from_signatures(
                _signatures_from_arrays(harr_old, id_col, num_hashes),
                id_col, num_hashes, bands,
            )
        else:
            corpus_bands = minhash_bands(
                corpus_df, text_col, id_col, n=n, num_hashes=num_hashes,
                bands=bands,
            )
    cb = corpus_bands.select(
        F.col(id_col).alias("_id_old"), "band", "bucket"
    )
    candidates = (
        nb.join(cb, ["band", "bucket"]).select("_id_new", "_id_old").distinct()
    )
    if harr_old is not None:
        sh_old = harr_old.select(
            F.col(id_col).alias("_id_old"),
            F.explode(F.array_distinct("_h32s")).alias("shingle"),
        )
        sz_old = harr_old.select(
            F.col(id_col).alias("_id_old"),
            F.size(F.array_distinct("_h32s")).alias("sz_o"),
        )
    else:
        sh_old = shingles(corpus_df, text_col, id_col, n=n).select(
            F.col(id_col).alias("_id_old"), "shingle"
        )
        sz_old = None
    if prune_verify:
        sh_old = sh_old.join(
            F.broadcast(candidates.select("_id_old").distinct()), "_id_old",
            "left_semi",
        )
    shared = (
        candidates.join(sh_new, "_id_new")
        .join(sh_old, ["_id_old", "shingle"])
        .groupBy("_id_new", "_id_old")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    if sz_old is None:
        sz_old = sh_old.groupBy("_id_old").agg(
            F.count(F.lit(1)).alias("sz_o")
        )
    verified = (
        shared.join(sz_new, "_id_new")
        .join(sz_old, "_id_old")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_shared")
                / (F.col("sz_n") + F.col("sz_o") - F.col("n_shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
    )
    matches = verified.groupBy("_id_new").agg(
        F.count(F.lit(1)).alias("n_matches")
    )
    return (
        new_df.select(F.col(id_col))
        .join(matches.withColumnRenamed("_id_new", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_matches"), F.lit(0)).cast("long").alias(
                "n_matches"
            ),
            (F.coalesce(F.col("n_matches"), F.lit(0)) == 0)
            .cast("int")
            .alias("admitted"),
        )
    )


#: Table property stamping a band index with the signature parameters
#: it was built with — appends verify against it so an index never
#: silently mixes incompatible signatures.
_BAND_INDEX_PROP = "spe.minhash.params"


def _band_index_params(n: int, num_hashes: int, bands: int) -> str:
    return f"n={n},num_hashes={num_hashes},bands={bands}"


def write_band_index(
    df: DataFrame,
    table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    n_buckets: int = 32,
) -> None:
    """Create (overwrite) the persistent near-dup band index: sign
    ``df`` once, write the (id, band, bucket) table bucketed + sorted
    on (band, bucket), and stamp the signature parameters as a table
    property.  The 100 TB corpus pays its sign + shuffle exactly here;
    every later admission batch joins the bucketed scan shuffle-free
    (``test_band_index_join_shuffles_batch_side_only``)."""
    from ..sources.bucketed import write_bucketed

    bands_df = minhash_bands(
        df, text_col, id_col, n=n, num_hashes=num_hashes, bands=bands
    )
    write_bucketed(
        bands_df, table, ["band", "bucket"], n_buckets=n_buckets,
        sort_cols=["band", "bucket"],
    )
    df.sparkSession.sql(
        f"ALTER TABLE {table} SET TBLPROPERTIES "
        f"('{_BAND_INDEX_PROP}' = "
        f"'{_band_index_params(n, num_hashes, bands)}')"
    )


def append_to_band_index(
    admitted_df: DataFrame,
    table: str,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    n_buckets: int = 32,
) -> None:
    """Index maintenance — the step after admission that keeps the
    incremental pipeline incremental: sign ONLY the admitted batch and
    append its band rows to the persisted index, so tomorrow's batch
    sees today's documents without the corpus ever being re-signed or
    rewritten.

    The signature parameters are verified against the
    ``spe.minhash.params`` property stamped at ``write_band_index``
    time and the call raises before writing on any mismatch — an index
    mixing signatures from different (n, num_hashes, bands) would
    return silently wrong candidates forever after.  The bucketed
    append itself is validated by Spark against the table's bucket
    spec, so the post-append index keeps its shuffle-free join
    property (pinned by ``test_band_index_append_roundtrip``)."""
    spark = admitted_df.sparkSession
    _verify_band_index_stamp(
        spark, table, n, num_hashes, bands,
        "append called with", "refusing to mix incompatible signatures",
    )
    from ..sources.bucketed import write_bucketed

    bands_df = minhash_bands(
        admitted_df, text_col, id_col, n=n, num_hashes=num_hashes,
        bands=bands,
    )
    write_bucketed(
        bands_df, table, ["band", "bucket"], n_buckets=n_buckets,
        sort_cols=["band", "bucket"], mode="append",
    )


def load_band_index(
    spark,
    table: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Read-path counterpart of the append check: return
    ``spark.table(table)`` after verifying the index's stamped
    ``spe.minhash.params`` matches the caller's signature parameters —
    the safe way to obtain the ``corpus_bands=`` argument for
    ``incremental_neardup_admission`` / the streaming gate.  Raises
    before any query runs on a mismatch; a raw ``spark.table`` call
    skips the check and would consume an incompatible index
    silently."""
    _verify_band_index_stamp(
        spark, table, n, num_hashes, bands,
        "gate configured with", "refusing to consume an incompatible index",
    )
    return spark.table(table)


def _verify_band_index_stamp(
    spark, table: str, n: int, num_hashes: int, bands: int,
    caller: str, refusal: str,
) -> None:
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    expected = _band_index_params(n, num_hashes, bands)
    stamped = props.get(_BAND_INDEX_PROP)
    if stamped != expected:
        raise ValueError(
            f"band index {table} was built with "
            f"{stamped or 'no stamped parameters'}; {caller} "
            f"{expected} — {refusal}"
        )


def cross_corpus_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
) -> DataFrame:
    """Decontamination report: corpus documents sharing at least one
    word n-gram with a benchmark/eval set (train-test leakage check —
    the gate every pretraining pipeline runs before shipping a corpus).

    Returns (id, n_shared_grams, n_eval_docs) for CONTAMINATED corpus
    docs only.  Candidates come from an equi-join on the n-gram shingle
    hash with the benchmark side broadcast (eval sets are tiny next to
    a 100 TB corpus) — the corpus is scanned once, never shuffled on
    data volume, and shingle strings never materialize (hash-folded,
    functions/hashing.py).
    """
    c_sh = shingles(corpus, text_col, id_col, n=n)
    b_sh = shingles(benchmark, text_col, id_col, n=n).select(
        F.col(id_col).alias("_eval_id"), "shingle"
    )
    return (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_shared_grams"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
    )


def _build_bloom(keys_u64, bits_per_key: int, seed: int):
    """Vectorized blocked-free Bloom bitset over uint64 keys.

    m = next power of two ≥ bits_per_key·n (so probes are a multiply +
    shift, no modulo); k ≈ bits_per_key·ln2 multiplicative hash
    functions (odd 64-bit constants — the keys are already uniform
    shingle hashes, so Knuth multiplicative mixing of the TOP log2(m)
    bits suffices).  Returns (packed_words, shift, constants).
    """
    import numpy as np

    n = max(int(keys_u64.size), 1)
    m = 1 << max(int(np.ceil(np.log2(n * bits_per_key))), 6)
    k = max(1, int(round(bits_per_key * 0.6931)))
    rng = np.random.default_rng(seed)
    consts = (
        rng.integers(1, 2**62, size=k, dtype=np.uint64) << np.uint64(1)
    ) | np.uint64(1)
    shift = np.uint64(64 - int(np.log2(m)))
    words = np.zeros(m >> 6, dtype=np.uint64)
    for c in consts:
        pos = (keys_u64 * c) >> shift
        # fancy |= drops duplicate indices; bitwise_or.at accumulates
        np.bitwise_or.at(
            words, pos >> np.uint64(6),
            np.uint64(1) << (pos & np.uint64(63)),
        )
    return words, shift, consts


def _bloom_probe(vals_u64, words, shift, consts):
    import numpy as np

    ok = np.ones(vals_u64.size, dtype=bool)
    for c in consts:
        pos = (vals_u64 * c) >> shift
        ok &= ((words[pos >> np.uint64(6)] >> (pos & np.uint64(63)))
               & np.uint64(1)).astype(bool)
    return ok


def bloom_cross_corpus_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    bits_per_key: int = 16,
    seed: int = 7,
) -> DataFrame:
    """``cross_corpus_overlap`` for eval sets TOO LARGE to broadcast
    as a join hash table — same output contract, exact results.

    Scale shape: the corpus scan carries an in-row Bloom prefilter
    (Arrow-batched pandas UDF probing a broadcast numpy bitset —
    bits_per_key·n_eval_shingles BITS on each executor, ~1/30th of a
    JVM broadcast-hash-join table for the same keys), which drops
    ~every clean shingle at the scan.  Only the tiny survivor set
    (true hits + ~0.04% false positives at 16 bits/key) reaches the
    confirm equi-join, which therefore shuffles almost nothing — and
    the confirm join makes the result EXACT: Bloom false positives
    are eliminated there, and false negatives are impossible by
    construction.  The driver transiently holds the distinct eval
    shingle hash array (Arrow transfer) to build the bitset; the
    executors never hold more than the bitset.
    """
    import numpy as np

    c_sh = shingles(corpus, text_col, id_col, n=n)
    b_sh = shingles(benchmark, text_col, id_col, n=n).select(
        F.col(id_col).alias("_eval_id"), "shingle"
    )
    uniq = (
        b_sh.select("shingle")
        .distinct()
        .toPandas()["shingle"]
        .to_numpy(dtype=np.int64)
        .view(np.uint64)
    )
    words, shift, consts = _build_bloom(uniq, bits_per_key, seed)
    bc = corpus.sparkSession.sparkContext.broadcast((words, shift, consts))

    @F.pandas_udf("boolean")
    def might_contain(s):
        import pandas as pd

        w, sh, cs = bc.value
        vals = s.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
        return pd.Series(_bloom_probe(vals, w, sh, cs))

    survivors = c_sh.filter(might_contain(F.col("shingle")))
    # deliberately NOT broadcast: the whole point is the eval side no
    # longer fits an executor hash table; survivors are tiny, so the
    # shuffle exchanges almost nothing
    return (
        survivors.join(b_sh, "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_shared_grams"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
    )


def _resolve_checkpoint_dir(
    df: DataFrame, checkpoint_dir: str | None
) -> str | None:
    """Set the session checkpoint dir ONCE per iterative-operator
    invocation and return the RESOLVED per-run directory (Spark
    appends a fresh UUID subdir on every ``setCheckpointDir`` call,
    so the resolved path is unique to this invocation).

    Re-pointing the dir on every materialization (pre-r4 behavior)
    mutates global SparkContext state per call: two concurrent runs
    with different ``checkpoint_dir``s would each re-point the shared
    dir and silently write blocks into each other's directories.
    Resolving once up front and asserting the dir is unchanged at
    every subsequent materialization (``_materialize``) turns that
    silent cross-write into a loud error.
    """
    if checkpoint_dir is None:
        return None
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return sc.getCheckpointDir()


def _materialize(df: DataFrame, resolved_dir: str | None) -> DataFrame:
    """Eagerly materialize an iterative loop's frame, truncating
    lineage.

    ``resolved_dir=None`` → ``localCheckpoint``: blocks live on
    executor storage — fastest, but an executor loss makes them
    unrecoverable (the lineage needed to recompute was truncated).
    Fine on local[n] and for short interactive loops.

    ``resolved_dir`` set (the per-run directory returned by
    ``_resolve_checkpoint_dir``) → RELIABLE ``checkpoint()`` into
    that directory (HDFS/S3/DBFS path at cluster scale): blocks
    survive executor loss, which is the mode a 100 TB run must use —
    over a multi-hour iterative job on 1000 executors, losing one
    executor mid-loop is the expected case, not the exception.
    Raises if another run re-pointed the session checkpoint dir
    mid-loop (concurrent iterative runs in one session must use
    distinct SparkSessions or be serialized).
    """
    if resolved_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    current = sc.getCheckpointDir()
    if current != resolved_dir:
        raise RuntimeError(
            "reliable-checkpoint dir changed mid-run (expected "
            f"{resolved_dir!r}, found {current!r}): a concurrent "
            "iterative run re-pointed the session checkpoint dir. "
            "Run iterative operators with conflicting checkpoint_dirs "
            "in separate SparkSessions, or serialize them."
        )
    return df.checkpoint(eager=True)


def _cc_min_label_step(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label-propagation + pointer-jump iteration, returned
    PRE-checkpoint: (_id, _comp, _new) where ``_new`` is the improved
    label.  Factored out so ``tools/plan_audit.py`` can audit the real
    per-iteration join plan — inside the loop the eager checkpoint
    truncates the static plan to a bare RDD scan, which would hide
    the iteration's exchanges from any post-hoc audit."""
    nbr_min = (
        edges.join(
            labels.select(
                F.col("_id").alias("_b"), F.col("_comp").alias("_nc")
            ),
            "_b",
        )
        .groupBy("_a")
        .agg(F.min("_nc").alias("_nbr"))
    )
    stepped = labels.join(
        nbr_min.withColumnRenamed("_a", "_id"), "_id", "left"
    ).select(
        "_id",
        "_comp",
        F.least(
            F.col("_comp"), F.coalesce(F.col("_nbr"), F.col("_comp"))
        ).alias("_new"),
    )
    # pointer jump: follow my (new) label to ITS label — label
    # chains halve every round (O(log n) total for deep chains)
    jump = labels.select(
        F.col("_id").alias("_new"), F.col("_comp").alias("_jc")
    )
    return stepped.join(jump, "_new", "left").select(
        "_id",
        "_comp",
        F.least(
            F.col("_new"), F.coalesce(F.col("_jc"), F.col("_new"))
        ).alias("_new"),
    )


def _cc_driver_union_find(
    pairs: DataFrame, id_a: str, id_b: str, out_id: str, out_comp: str
) -> DataFrame:
    """Small-graph fast path: collect the (bounded) edge list and
    resolve components with driver-side union-find (path compression +
    union-by-min-root, so the representative is the component minimum
    — OUTPUT-IDENTICAL to the distributed min-label loop, pinned by
    the backend-parity tests).  Two jobs total (count + collect)
    instead of ~3 jobs per distributed iteration.

    Driver memory is O(nodes + pairs); the caller's pair bound is also
    a node bound (each pair introduces ≤2 nodes ⇒ nodes ≤ 2×pairs, so
    the default 500k-pair cap ⇒ ≤1M parent-map entries, tens of MB).
    Null ids are rejected by ``connected_components`` before either
    backend runs — this function assumes non-null ids (they are dict
    keys and compared with ``<``)."""
    from pyspark.sql.types import StructField, StructType

    rows = pairs.select(id_a, id_b).collect()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r[0], r[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    id_type = pairs.schema[id_a].dataType
    schema = StructType(
        [
            StructField(out_id, id_type, False),
            StructField(out_comp, id_type, False),
        ]
    )
    labels = [(v, find(v)) for v in parent]
    # JVM-side local relation (operators/scale.local_frame): the label
    # table is consumed by a broadcast join, and a Python-local frame
    # would pay a Python-worker launch per partition to build it
    # (NOTES fact 23)
    from .scale import local_frame

    return local_frame(pairs.sparkSession, labels, schema)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    out_id: str = "id",
    out_comp: str = "component",
    checkpoint_dir: str | None = None,
    small_graph_max: int = 500_000,
) -> DataFrame:
    """Connected components over a near-dup pair list: (id, component)
    with component = the minimum id reachable from the node.

    This is the operator that turns PAIRS into DEDUP DECISIONS — near
    duplicates are transitive in practice (A≈B, B≈C ⇒ one cluster), so
    keeping one representative per component, not per pair, is what a
    corpus dedup actually ships.

    Min-label propagation WITH pointer jumping: each iteration every
    node takes (a) the min of its own and its neighbors' labels, then
    (b) its label's label (path compression — label chains halve each
    round, so deep chains converge in O(log n) rounds, not
    O(diameter)).  Two equi-joins + one partial-agg shuffle per
    iteration, lineage truncated by eager per-iteration
    materialization — ``checkpoint_dir=None`` uses ``localCheckpoint``
    (local/default), a real path switches to RELIABLE
    ``df.checkpoint()`` so a 100 TB run survives executor loss
    mid-loop (see ``_materialize``).  Dup clusters are shallow (stars
    around a template), so 2-4 rounds is typical.  Raises if
    ``max_iter`` rounds don't converge — a silently partial labeling
    must never reach a dedup decision.  Only nodes that appear in
    ``pairs`` are returned — isolated docs are their own (implicit)
    singleton component.

    HYBRID (r4): pair sets at or under ``small_graph_max`` rows
    (default 500k ⇒ ≤1M union-find entries, tens of MB collected) are
    resolved DRIVER-SIDE by union-find — output-identical, two jobs
    instead of ~3 per distributed iteration (same-session alternating
    A/B at sf0.1 on the q48 pipeline: 2.4-3.0 s → 1.65-1.8 s; the
    residual is the upstream LSH candidate generation itself).  The
    bound was raised 200k → 500k in r5 after the sf1 rehearsal's
    250k-pair clone-heavy graph measured union-find at 1.36-1.45 s vs
    1.92-2.2 s for the distributed loop on identical checkpointed
    pairs (3 alternating runs each, exact output parity) — the
    crossover is above this size.  Pair lists are the
    post-verification near-dup
    survivors, orders of magnitude smaller than the corpus; when they
    do exceed the bound (massively duplicated corpora), the
    distributed loop runs unchanged.  Pass ``small_graph_max=0`` to
    force the distributed path.

    Null ids are rejected loudly on BOTH backends (one contract):
    silently dropping a null-endpoint edge (what a bare equi-join
    would do) could split a component and ship a wrong dedup decision.
    """
    ckpt = _resolve_checkpoint_dir(pairs, checkpoint_dir)
    # materialize the upstream pair pipeline ONCE (e.g. the whole
    # MinHash-LSH candidate generation) — both the small-graph fast
    # path (count + collect) and the iterative loop read these rows
    sym = _materialize(
        pairs.select(F.col(id_a).alias("_a"), F.col(id_b).alias("_b")), ckpt
    )
    # One contract for both backends (r4 ADVICE): a null id is
    # malformed input — the equi-joins of the distributed loop would
    # silently DROP the edge while the driver union-find would raise
    # TypeError mid-merge.  Reject loudly before branching; the null
    # audit rides the same aggregate job as the size probe.
    stats = sym.agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(
            F.sum(
                F.col("_a").isNull().cast("long")
                + F.col("_b").isNull().cast("long")
            ),
            F.lit(0),
        ).alias("_nulls"),
    ).collect()[0]
    if stats["_nulls"]:
        raise ValueError(
            f"connected_components: {stats['_nulls']} null id(s) in the "
            f"pair list ({id_a}/{id_b}) — a null edge endpoint cannot "
            f"be labeled; filter or fix upstream candidate generation"
        )
    # pair bound ⇒ node bound: nodes ≤ 2×pairs, so 500k pairs caps the
    # union-find parent map at ≤1M entries (tens of MB driver-side)
    if small_graph_max and stats["_n"] <= small_graph_max:
        return _cc_driver_union_find(sym, "_a", "_b", out_id, out_comp)
    edges = _materialize(
        sym.union(sym.select(F.col("_b").alias("_a"), F.col("_a").alias("_b")))
        .distinct(),
        ckpt,
    )
    labels = _materialize(
        edges.select(F.col("_a").alias("_id"))
        .distinct()
        .withColumn("_comp", F.col("_id")),
        ckpt,
    )
    converged = False
    for _ in range(max_iter):
        # materialize BEFORE the convergence count so the joins run
        # once per iteration (the count then reads materialized rows)
        updated = _materialize(
            _cc_min_label_step(edges, labels), ckpt
        )
        n_changed = updated.filter(F.col("_new") != F.col("_comp")).count()
        labels = updated.select("_id", F.col("_new").alias("_comp"))
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: no convergence within {max_iter} "
            f"iterations — raise max_iter (pointer jumping needs "
            f"~log2(longest chain) rounds)"
        )
    return labels.select(
        F.col("_id").alias(out_id), F.col("_comp").alias(out_comp)
    )


def neardup_dedup_keep_first(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster-aware near-dup removal: resolve ``pairs`` into connected
    components and keep only each component's minimum-id representative
    (docs in no pair survive untouched).  One anti-join against the
    (tiny) non-representative set — the corpus itself is scanned once.
    """
    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    non_reps = comp.filter(F.col("component") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(non_reps, id_col, "left_anti")


def simhash_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    hashes48: DataFrame | None = None,
) -> DataFrame:
    """32-bit SimHash per document from whitespace tokens.

    Bit j of the fingerprint = sign of Σ_tokens (±1 by token-hash bit j)
    — tokens vote per bit position, near-identical documents land at
    small Hamming distance.  Computed inside the row: one md5+conv per
    token (materialized once via the ``_once`` barrier), then ``bits``
    integer bit-test counts over the long array — ZERO shuffles at any
    corpus size, and no per-bit string ops in the codegen'd tree.

    Token-less documents (empty/whitespace-only text) emit NO row —
    same domain contract and r8 rationale as ``minhash_signatures``:
    the DuckDB twin omits them, and a shared all-zero fingerprint
    would otherwise funnel every empty doc in the corpus into one hot
    banding bucket AND emit them all as mutual hamming-0 "near-dups"
    (exact_dedup is the right tool for empty docs).

    ``hashes48`` (a ``shared_token_hash48`` frame) derives the SimHash
    token hash as ``_th48 >> 16`` — exactly the value of the first 8
    md5 hex digits, i.e. bit-identical to the standalone scan — so an
    ensemble caller pays the md5 pass once across detectors.
    """
    if hashes48 is not None:
        hashed = _once(
            hashes48,
            id_col,
            F.transform(F.col("_th48"), lambda h: F.shiftright(h, 16)),
            "_h",
        ).filter(F.size(F.col("_h")) > 0)
    else:
        from ..functions.text import word_tokens_spark_sql

        hashes = F.expr(
            hashing.simhash_token_hashes_spark_sql(
                word_tokens_spark_sql(text_col)
            )
        )
        hashed = _once(ensure_parallelism(df), id_col, hashes, "_h").filter(
            F.size(F.col("_h")) > 0
        )

    # ONE F.expr round-trip for the whole fingerprint (opt-r15): the
    # per-bit Python loop cost ~8 py4j trips per bit × 32 bits — a
    # measured 0.8-1.0 s of pure plan construction per call site
    # (q97 profile) — while the parsed tree is identical: per bit j,
    # vote = size(filter(_h, (h>>j)&1 = 1))*2 − size(_h); fingerprint
    # = Σ (vote_j > 0 ? 2^j : 0), left-folded from 0, cast long.
    def vote_sql(j: int) -> str:
        return (
            f"(size(filter(_h, h -> (shiftright(h, {j}) & 1) = 1)) * 2"
            " - size(_h))"
        )

    terms = " + ".join(
        f"(CASE WHEN {vote_sql(j)} > 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(bits)
    )
    fingerprint_sql = f"CAST(0 + {terms} AS BIGINT)"
    return hashed.select(
        F.col(id_col), F.expr(fingerprint_sql).alias("simhash")
    )


def hamming_banded_pairs(
    fp: DataFrame,
    id_col: str,
    hash_col: str,
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs over ANY integer fingerprint column by banded
    Hamming search: band the fingerprint (pigeonhole — any pair within
    ``max_hamming`` shares at least one exact band when bands >
    max_hamming), equi-join per band, verify Hamming distance via
    bit_count(xor).  The shared engine behind text SimHash (q21/q28)
    and image dHash (r7): in-row banding, one (band, bucket) hash
    shuffle, candidate-bounded verification — corpus-linear at any
    scale for bounded bucket skew.

    Recall contract: TOTAL (every qualifying pair emitted) only when
    bands > max_hamming; with fewer bands the pigeonhole argument
    lapses and this is approximate candidate generation — q28
    deliberately runs there (max_hamming=6 over 4 bands, rows-only by
    contract), so the looser setting is allowed, not raised on.

    Output: (id_a, id_b, hamming), id_a < id_b, one row per verified
    pair.
    """
    n_bands = bits // band_bits
    if bits % band_bits != 0:
        raise ValueError(
            f"band_bits={band_bits} must divide bits={bits} evenly"
        )
    # one F.expr for the band-struct array (opt-r15): same band
    # literals, same shift/mask buckets as the per-band Python loop
    mask = (1 << band_bits) - 1
    structs = ", ".join(
        f"struct({bi} AS band, "
        f"shiftrightunsigned(`{hash_col}`, {bi * band_bits}) & {mask} "
        "AS bucket)"
        for bi in range(n_bands)
    )
    banded = fp.select(
        F.col(id_col),
        hash_col,
        F.explode(F.expr(f"array({structs})")).alias("bk"),
    ).select(F.col(id_col), hash_col, F.col("bk.band"), F.col("bk.bucket"))

    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("sh_a"),
        "band", "bucket",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("sh_b"),
        "band", "bucket",
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    band_bits: int = 8,
    max_hamming: int = 3,
    hashes48: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: ``simhash_fingerprints`` +
    ``hamming_banded_pairs`` (see there for the banding/verify
    contract).  ``hashes48`` shares the tokenize→md5 scan with other
    detectors (see ``shared_token_hash48``)."""
    fp = simhash_fingerprints(
        df, text_col, id_col, bits=bits, hashes48=hashes48
    )
    return hamming_banded_pairs(
        fp,
        id_col,
        "simhash",
        bits=bits,
        band_bits=band_bits,
        max_hamming=max_hamming,
    )


def fingerprint_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    window: int = 8,
) -> DataFrame:
    """Fingerprint-tier decontamination: corpus documents sharing any
    winnowed fingerprint with a benchmark/eval document.

    The sparser companion to ``cross_corpus_overlap`` — TRUE winnowing
    (min k-gram hash per sliding window of ``window`` grams) keeps an
    expected 2/(window+1) of the hashes, so at 100 TB this join
    touches a several-fold smaller signature table, with the winnowing
    GUARANTEE: any shared verbatim span of ≥ window + k − 1 tokens is
    caught deterministically (``winnowed_fingerprint_set``; the
    previous 0-mod-p sampling missed such spans with probability
    ≈ (1−1/p)^window).  Benchmark fingerprints broadcast (eval sets
    are tiny); the corpus is scanned once and shuffled only on the
    matched subset.
    """
    from ..functions.textstats import winnowed_fingerprint_set

    cf = winnowed_fingerprint_set(corpus, text_col, id_col, k=k, window=window)
    bf = (
        winnowed_fingerprint_set(
            benchmark, text_col, id_col, k=k, window=window
        )
        .select("fingerprint")
        .distinct()
    )
    return (
        cf.join(F.broadcast(bf), "fingerprint")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_fingerprints"))
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Exact duplicated-substring detection — the suffix-array-style
    dedup of the training-data literature (flag any ≥k-token span that
    occurs more than once in the corpus), re-expressed relationally.

    Plan: positioned k-gram hashes in-row (posexplode), one corpus
    shuffle on the window hash to find hashes occurring ≥2 times
    (map-side-combinable count), a semi-join back, then per-document
    gaps-and-islands to merge duplicate windows whose COVERAGE
    overlaps or touches into maximal spans (window partitioned by doc
    — parallel across docs).  Returns (id, span_start, span_end,
    n_windows) in token offsets, span_end inclusive.

    Two windows at positions p < q cover overlapping token ranges when
    q − p ≤ k−1 and adjacent ranges when q − p = k, so islands break
    only at q − p > k: the output spans are DISJOINT and non-adjacent
    (interval union of window coverage) — consumers may sum
    ``span_end − span_start + 1`` without double-counting.  (A break
    at q − p > 1 would split overlapping windows into overlapping
    spans whenever a non-duplicated window sits between two duplicated
    ones.)
    """
    from pyspark.sql import Window

    pos_rows = _positioned_window_hashes(df, text_col, id_col, k)
    dup_hashes = (
        pos_rows.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("h")
    )
    dup_pos = pos_rows.join(dup_hashes, "h", "left_semi")
    return _merge_windows_to_spans(dup_pos, id_col, k)


def _positioned_window_hashes(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, pos, h): every k-token window's hash with its 0-based
    token offset — the shared candidate layout of the span family
    (intra-corpus ``duplicated_spans``, cross-doc ``common_spans``)."""
    bound = _bound_token_hashes(df, text_col, id_col)
    grams = hashing.shingle_hash_array(F.col("_th"), k)
    return bound.select(F.col(id_col), F.posexplode(grams).alias("pos", "h"))


def _merge_windows_to_spans(
    dup_pos: DataFrame, id_col: str, k: int
) -> DataFrame:
    """Per-document gaps-and-islands over flagged window positions →
    maximal disjoint spans (see ``duplicated_spans`` for the
    q − p ≤ k break-condition proof)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("pos")
    # new island when this window's coverage neither overlaps nor
    # touches the previous one's (first row: lag null -> break)
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= k, F.lit(0)).otherwise(
        F.lit(1)
    )
    grouped = dup_pos.withColumn("_g", F.sum(brk).over(w))
    return (
        grouped.groupBy(id_col, "_g")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_g")
    )


def common_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 20,
    min_docs: int = 3,
) -> DataFrame:
    """Cross-document boilerplate detection (the CCNet/RefinedWeb
    repeated-content pass): maximal spans of k-token windows that
    occur in ≥ ``min_docs`` DISTINCT documents.

    The intra-document sibling of ``duplicated_spans`` differs in ONE
    predicate: a window is boilerplate by its document frequency, not
    its raw occurrence count — a phrase repeated 50× inside one
    document is repetition (q57's territory), not boilerplate, and a
    header shared verbatim by a third of the corpus is boilerplate
    even though each document contains it once.

    Plan: the same positioned-window layout, then distinct (h, id)
    before the count — two shuffles on the window hash (the distinct
    and the count are co-partitioned, so AQE coalesces them into one
    exchange's worth of data movement), a semi-join back, and the
    per-document island merge.  At 100 TB the df table (hashes with
    ≥ min_docs docs) is a small fraction of the window count and the
    semi-join shuffles only flagged positions.
    """
    pos_rows = _positioned_window_hashes(df, text_col, id_col, k)
    boilerplate = (
        pos_rows.select("h", id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("h")
    )
    flagged = pos_rows.join(boilerplate, "h", "left_semi")
    return _merge_windows_to_spans(flagged, id_col, k)


def leakage_free_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    seed: str = "seed0",
    eval_hex: str = "1a",
) -> DataFrame:
    """Leakage-free train/eval split: assign every document to a split
    by the md5 of its near-duplicate COMPONENT representative, so a
    clone group can never straddle the train/eval boundary (the
    classic contamination-by-construction bug a row-level random split
    commits on a deduplicated-but-clustered corpus).

    ``pairs`` is any near-dup pair list (e.g. ``minhash_lsh_pairs``);
    components come from ``connected_components``; documents in no
    pair are their own representative.  The split is DETERMINISTIC —
    ``md5(seed || ':' || rep)``'s first two hex chars compared against
    ``eval_hex`` ('1a' ⇒ 26/256 ≈ 10% eval) — so it is reproducible
    across runs/engines and oracle-exact, unlike an RNG split.

    Scale: the component table is bounded by the pair list (≪ corpus)
    and broadcast into the one corpus-side join; the corpus itself is
    never shuffled.  Returns (id, split_key, split).
    """
    comp = connected_components(pairs).withColumnRenamed("id", id_col)
    rep = F.coalesce(F.col("component"), F.col(id_col))
    digest = F.md5(
        F.encode(
            F.concat(F.lit(seed), F.lit(":"), rep.cast("string")), "utf-8"
        )
    )
    return (
        df.join(F.broadcast(comp), id_col, "left")
        .select(
            F.col(id_col),
            rep.alias("split_key"),
            F.when(
                F.substring(digest, 1, 2) < F.lit(eval_hex), F.lit("eval")
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


def strip_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Remove token ranges from documents — the applied form of
    ``duplicated_spans`` (boilerplate/duplicate stripping).

    ``spans`` is any (id, span_start, span_end) frame with INCLUSIVE
    0-based token offsets (e.g. ``duplicated_spans`` output, filtered
    by whatever keep-policy the caller wants).  Spans are collected to
    one array per document (tiny — spans ≪ tokens) and tokens are
    dropped in-row with an index lambda; documents without spans pass
    through untouched.  One equi-join on the doc key, no shuffle of
    the corpus beyond it.
    """
    from .scale import ensure_parallelism

    span_arrays = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_spans")
    )
    joined = ensure_parallelism(df).join(span_arrays, id_col, "left")
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    sp = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<s:long,e:long>>"),
    )
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(sp, lambda r: (i >= r["s"]) & (i <= r["e"])),
    )
    return joined.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens_before"),
        F.size(kept).cast("long").alias("n_tokens_after"),
        F.array_join(kept, " ").alias("text_stripped"),
    )


def decontamination_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Eval-set contamination SPANS: maximal ranges of corpus tokens
    covered by a k-token window that appears verbatim anywhere in the
    benchmark corpus — the detection stage of span-level
    decontamination.  Where the q50/q65/q69 family FLAGS contaminated
    documents (the drop-the-whole-doc policy), this locates the
    contaminated ranges so ``strip_contamination`` can remove just
    the leaked text and keep the document — the policy production
    pipelines prefer when eval sentences leak into otherwise-good
    web pages.

    Scale: the benchmark's distinct window-hash set is small relative
    to the corpus (eval suites are fixed-size) and is BROADCAST into
    a semi-join against the corpus's positioned windows, so the
    corpus is never shuffled for candidate generation; only flagged
    positions enter the per-document gaps-and-islands merge.  For
    eval sets beyond broadcast reach, detect docs first with the
    Bloom tier (``bloom_cross_corpus_overlap``) and run this only on
    the flagged subset.

    Returns (id, span_start, span_end, n_windows) with INCLUSIVE
    0-based token offsets — ``strip_spans``' input contract.
    """
    bcol = benchmark_text_col or text_col
    ev = (
        _positioned_window_hashes(
            benchmark.select(F.col(bcol).alias("_bt")).withColumn(
                "_bid", F.monotonically_increasing_id()
            ),
            "_bt",
            "_bid",
            k,
        )
        .select("h")
        .distinct()
    )
    pos = _positioned_window_hashes(corpus, text_col, id_col, k)
    flagged = pos.join(F.broadcast(ev), "h", "left_semi")
    return _merge_windows_to_spans(flagged, id_col, k)


def strip_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    benchmark_text_col: str | None = None,
) -> DataFrame:
    """Applied span-level decontamination: ``strip_spans`` over
    ``decontamination_spans`` — every corpus token covered by a
    benchmark k-gram removed, documents otherwise kept intact.
    Returns (id, n_tokens_before, n_tokens_after, text_stripped)."""
    spans = decontamination_spans(
        corpus, benchmark, text_col, id_col, k, benchmark_text_col
    )
    return strip_spans(corpus, spans, text_col, id_col)


def pair_overlap_stats(
    approx_pairs: DataFrame,
    exact_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Pair-level recall/precision of an approximate near-dup method
    against an exact ground-truth pair set — the go/no-go gate for
    swapping banding (MinHash-LSH, SimHash) in for exact Jaccard,
    symmetric to the ANN recall panel.

    Both inputs are pair lists (already candidate-bounded); ONE full
    outer equi-join on the normalized (lo, hi) pair key with
    membership flags, then a single aggregate — no 1-row cross joins.
    Returns ONE row: n_exact, n_approx, n_overlap, pair_recall,
    pair_precision (null on empty sides, ANSI-safe).
    """

    def norm(df: DataFrame, flag: str) -> DataFrame:
        return (
            df.select(
                F.least(F.col(id_a), F.col(id_b)).alias("_lo"),
                F.greatest(F.col(id_a), F.col(id_b)).alias("_hi"),
            )
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    joined = norm(exact_pairs, "_e").join(
        norm(approx_pairs, "_a"), ["_lo", "_hi"], "full_outer"
    )
    counts = joined.agg(
        F.sum(F.coalesce(F.col("_e"), F.lit(0))).alias("n_exact"),
        F.sum(F.coalesce(F.col("_a"), F.lit(0))).alias("n_approx"),
        F.sum(
            F.coalesce(F.col("_e"), F.lit(0)) * F.coalesce(F.col("_a"), F.lit(0))
        ).alias("n_overlap"),
    )
    return counts.select(
        "n_exact",
        "n_approx",
        "n_overlap",
        F.round(F.try_divide(F.col("n_overlap"), F.col("n_exact")), 4).alias(
            "pair_recall"
        ),
        F.round(F.try_divide(F.col("n_overlap"), F.col("n_approx")), 4).alias(
            "pair_precision"
        ),
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    out_id: str = "id",
    out_comp: str = "component",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    an alternative backend to ``connected_components`` with the same
    output contract.

    Each round rewires edges toward per-neighborhood minima:
    large-star points every neighbor LARGER than the center at the
    neighborhood minimum; small-star does the same for the rest.  The
    edge set converges to stars around component minima in O(log n)
    rounds with per-round cost one groupBy + one join on the node key
    — no global structures, the property that made it the canonical
    web-scale CC.  Preferred over min-label propagation when the graph
    has high-degree hubs: edges REWIRE onto minima instead of
    repeatedly flowing labels through them.
    """

    def canon(e: DataFrame) -> DataFrame:
        return (
            e.filter(F.col("_u") != F.col("_v"))
            .select(
                F.least("_u", "_v").alias("_u"),
                F.greatest("_u", "_v").alias("_v"),
            )
            .distinct()
        )

    def star_round(e: DataFrame, large: bool) -> DataFrame:
        adj = e.union(e.select(F.col("_v").alias("_u"), F.col("_u").alias("_v")))
        if large:
            # large-star(u): every neighbor v > u links to
            # m = min(Γ(u) ∪ {u})
            m = adj.groupBy("_u").agg(
                F.least(F.min("_v"), F.first("_u")).alias("_m")
            )
            emitted = (
                adj.join(m, "_u")
                .filter(F.col("_v") > F.col("_u"))
                .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
            )
        else:
            # small-star(u): neighbors v < u AND u itself link to
            # m = min(Γ<(u) ∪ {u}) — the min over SMALL neighbors only;
            # edges to larger neighbors are processed at that endpoint
            small = adj.filter(F.col("_v") < F.col("_u"))
            m = small.groupBy("_u").agg(F.min("_v").alias("_m"))
            emitted = (
                small.join(m, "_u")
                .select(F.col("_v").alias("_u"), F.col("_m").alias("_v"))
                .union(m.select(F.col("_u"), F.col("_m").alias("_v")))
            )
        return canon(emitted)

    ckpt = _resolve_checkpoint_dir(pairs, checkpoint_dir)
    edges = _materialize(
        canon(pairs.select(F.col(id_a).alias("_u"), F.col(id_b).alias("_v"))),
        ckpt,
    )
    nodes = _materialize(
        # from the RAW pairs, not the canon'd edges: canon drops
        # self-loops, but a node appearing ONLY as (x, x) must still
        # label itself (min-label backend contract; r4 parity fix)
        pairs.select(F.col(id_a).alias("_id"))
        .union(pairs.select(F.col(id_b).alias("_id")))
        .distinct(),
        ckpt,
    )
    converged = False
    for _ in range(max_iter):
        stepped = star_round(star_round(edges, large=True), large=False)
        stepped = _materialize(stepped, ckpt)
        changed = (
            stepped.exceptAll(edges).count() + edges.exceptAll(stepped).count()
        )
        edges = stepped
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components_star: no convergence within {max_iter} "
            f"rounds"
        )
    # converged edges are stars around component minima: label = min
    # over the node's adjacency (the min itself labels as itself)
    adj = edges.union(
        edges.select(F.col("_v").alias("_u"), F.col("_u").alias("_v"))
    )
    labels = adj.groupBy("_u").agg(
        F.least(F.min("_v"), F.first("_u")).alias("_c")
    )
    return (
        nodes.join(labels.withColumnRenamed("_u", "_id"), "_id", "left")
        .select(
            F.col("_id").alias(out_id),
            F.coalesce(F.col("_c"), F.col("_id")).alias(out_comp),
        )
    )


def cross_source_neardup_matrix(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    source_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    score_col: str | None = "jaccard",
) -> DataFrame:
    """Cross-source duplication matrix: for a verified near-dup pair
    list (e.g. ``minhash_lsh_pairs``), count pairs per unordered
    source pair — the artifact a curation run reviews to decide
    dedup scope (within-source only vs global) and to spot snapshot
    overlap/leakage between crawls.

    Output: one row per unordered ``(source_a, source_b)`` with
    ``source_a <= source_b``, the pair count, and (when ``score_col``
    is set) the maximum verified similarity — max, not mean, because
    it is order-independent and exact under value-hash comparison.

    Scale shape: the pair list is orders of magnitude smaller than
    the corpus (LSH-bounded), so it is BROADCAST into the corpus'
    (id, source) projection twice — the corpus is never shuffled, and
    the final aggregate runs on pair-list volume.
    """
    srcs = docs.select(
        F.col(id_col).alias("_cid"), F.col(source_col).alias("_csrc")
    )
    annotated = (
        srcs.join(
            F.broadcast(pairs), srcs["_cid"] == pairs[id_a], "inner"
        )
        .drop("_cid")
        .withColumnRenamed("_csrc", "_src_a")
    )
    annotated = (
        srcs.join(
            F.broadcast(annotated),
            srcs["_cid"] == annotated[id_b],
            "inner",
        )
        .drop("_cid")
        .withColumnRenamed("_csrc", "_src_b")
    )
    aggs = [F.count(F.lit(1)).alias("n_pairs")]
    if score_col is not None:
        aggs.append(F.max(score_col).alias("max_" + score_col))
    return (
        annotated.select(
            F.least("_src_a", "_src_b").alias("source_a"),
            F.greatest("_src_a", "_src_b").alias("source_b"),
            *([score_col] if score_col is not None else []),
        )
        .groupBy("source_a", "source_b")
        .agg(*aggs)
    )


def cross_corpus_overlap_fractions(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 8,
    min_fraction: float = 0.0,
) -> DataFrame:
    """Thresholded decontamination report: per (corpus doc, eval doc)
    pair, the fraction of the EVAL doc's n-grams present in the corpus
    doc — the form production decontamination actually gates on
    (an eval item counts as leaked only when a sizable share of it
    appears, not on any single n-gram; ``cross_corpus_overlap`` is
    the any-overlap flag form).

    Output: (id, eval_id, n_shared_grams, n_eval_grams, overlap_frac)
    for pairs with ``overlap_frac >= min_fraction``, fraction rounded
    to 4 (value-hash stable).

    Scale shape: same as ``cross_corpus_overlap`` — both the eval
    shingle table and the per-eval-doc size table are broadcast (eval
    sets ≪ corpus); the corpus is scanned once and shuffled only on
    the (id, eval_id) pair aggregate, whose volume is bounded by
    shared-shingle matches, not corpus size.
    """
    c_sh = shingles(corpus, text_col, id_col, n=n)
    b_sh = shingles(benchmark, text_col, id_col, n=n).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    b_sizes = b_sh.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("n_eval_grams")
    )
    pairs = (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col, "eval_id")
        .agg(F.countDistinct("shingle").alias("n_shared_grams"))
    )
    return (
        pairs.join(F.broadcast(b_sizes), "eval_id")
        .withColumn(
            "overlap_frac",
            F.round(F.col("n_shared_grams") / F.col("n_eval_grams"), 4),
        )
        .filter(F.col("overlap_frac") >= min_fraction)
        .select(
            id_col, "eval_id", "n_shared_grams", "n_eval_grams",
            "overlap_frac",
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    digest_col: str = "digest",
) -> DataFrame:
    """Incremental-crawl delta between two corpus snapshots: per
    document id, ``added`` (id only in new), ``removed`` (only in
    old), or ``changed`` (both, different content digest).  Unchanged
    documents are NOT emitted — the output is bounded by the churn,
    not the corpus, which is what makes daily snapshot processing
    cheap: downstream stages (re-signing, admission, re-scoring) run
    on this delta only.

    Content identity is ``md5(text)`` computed in-row on each side;
    the only shuffle is the full outer equi-join on ``id_col`` —
    write both snapshots bucketed on the id (``sources.bucketed``)
    and the join is shuffle-free bucket-to-bucket.

    Presence is tracked with explicit join-side markers, NOT digest
    nullity: ``md5(NULL)`` is NULL, so a digest-based test would call
    a document with NULL old text "added", NULL new text "removed",
    and (under three-valued ``!=``) silently drop a NULL↔text change
    as unchanged.  Digests compare null-safely (``eqNullSafe``).
    """
    o = old.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("_d_old"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("_d_new"),
        F.lit(1).alias("_in_new"),
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("_d_old").eqNullSafe(F.col("_d_new")), F.lit("changed")
        )
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            id_col,
            "status",
            F.col("_d_new").alias(digest_col),
        )
    )


def neardup_ensemble(
    pair_sources: dict[str, DataFrame],
    id_a: str = "id_a",
    id_b: str = "id_b",
    **cc_kwargs,
) -> DataFrame:
    """One adjudicated near-dup decision from MANY candidate methods —
    the composition users actually run (r7 VERDICT "do this" #7):
    MinHash-LSH catches shared shingles, SimHash catches bit-level
    drift, SemDeDup/embedding catches paraphrase; each alone has
    blind spots, so production dedup unions their VERIFIED pairs and
    resolves once.

    ``pair_sources`` maps a method name to its verified pair frame
    (any columns; only ``id_a``/``id_b`` are read — pass the direct
    output of ``minhash_lsh_pairs``/``simhash_neardup_pairs``/
    ``embedding_neardup_pairs``/...).  Pairs are normalized to
    ``least < greatest`` so reversed emissions collapse, then grouped:
    one output row per distinct pair with ``methods`` (sorted
    comma-joined provenance — which detectors agree), ``n_methods``,
    and ``component`` — the connected-components label over the WHOLE
    union (``connected_components``; extra kwargs pass through,
    except ``out_id``/``out_comp``, which are pinned here — the
    output join binds them by name), so
    transitive clusters merge even when each edge came from a
    different method and a downstream keep-one-per-component dedup
    has a single table to act on.

    Scale: the union is a few pair lists (post-verification survivors
    — orders of magnitude smaller than the corpus), one (id_a, id_b)
    hash shuffle groups them, and CC runs on exactly that bounded
    edge set; the corpus itself is never touched here.  The
    adjudicated table is MATERIALIZED once (``_materialize``, the CC
    loop's own lineage-truncation contract — pass
    ``checkpoint_dir=...`` through ``cc_kwargs`` for the reliable
    mode) because two consumers read it: the component computation
    and the output join.  Without that, every member's full candidate
    pipeline re-executes per consumer — measured 119 s → 64 s on the
    sf1 rehearsal's clone-heavy 8.3M-pair union (NOTES r8).
    """
    if not pair_sources:
        raise ValueError("neardup_ensemble requires at least one method")
    for k in ("out_id", "out_comp"):
        if k in cc_kwargs:
            # the output join below binds the CC columns by their
            # default names; a renamed passthrough would fail deep in
            # the join with an opaque AnalysisException (r8 ADVICE)
            raise ValueError(
                f"neardup_ensemble pins the CC output columns; {k!r} "
                "is not forwardable (rename on the returned frame)"
            )
    tagged = []
    for method, pairs in sorted(pair_sources.items()):
        lo, hi = F.least(F.col(id_a), F.col(id_b)), F.greatest(
            F.col(id_a), F.col(id_b)
        )
        tagged.append(
            pairs.select(
                lo.alias("id_a"), hi.alias("id_b"), F.lit(method).alias("_m")
            )
        )
    allp = tagged[0]
    for t in tagged[1:]:
        allp = allp.unionByName(t)
    adjudicated = allp.groupBy("id_a", "id_b").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("_m"))).alias("methods"),
        F.count_distinct("_m").cast("int").alias("n_methods"),
    )
    # two consumers (CC + output join) — materialize the member
    # pipelines once; see the docstring's scale note
    adjudicated = _materialize(
        adjudicated,
        _resolve_checkpoint_dir(
            adjudicated, cc_kwargs.get("checkpoint_dir")
        ),
    )
    comp = connected_components(
        adjudicated.select("id_a", "id_b"), **cc_kwargs
    )
    return adjudicated.join(
        comp.withColumnRenamed("id", "id_a"), "id_a"
    ).select("id_a", "id_b", "methods", "n_methods", "component")


def ensemble_dedup_keep_first(
    df: DataFrame,
    pair_sources: dict[str, DataFrame],
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """The APPLIED form of ``neardup_ensemble``: remove from ``df``
    every document that is a non-representative member of an ensemble
    component — one dedup decision over the union of ALL methods'
    verified pairs (keep each component's minimum id, q49's
    convention; docs in no pair survive untouched).

    Pair endpoints outside ``df``'s id space (e.g. embedding-side
    synthetic ids) still participate in component formation but never
    affect which ``df`` rows survive: the representative is the
    minimum over the ids ACTUALLY PRESENT in ``df`` (r8 ADVICE — with
    the naive component-min, a synthetic endpoint that sorted below
    every real id would become the "kept" representative and delete
    every real member of its component), and the final step is one
    anti-join of ``df`` against the non-representative present-id
    set.  A component with no ``df`` member removes nothing.

    Scale: the union of post-verification pair lists is corpus-small,
    CC runs on that edge set only, and the corpus is never shuffled —
    the presence probe and the anti-join both broadcast the tiny
    CC-node/non-representative sides, two map-side passes over
    ``df``.
    """
    if not pair_sources:
        raise ValueError(
            "ensemble_dedup_keep_first requires at least one method"
        )
    frames = [
        p.select(
            F.least(F.col(id_a), F.col(id_b)).alias("id_a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("id_b"),
        )
        for p in pair_sources.values()
    ]
    allp = frames[0]
    for f in frames[1:]:
        allp = allp.unionByName(f)
    comp = connected_components(allp.distinct())
    # restrict to ids present in df BEFORE electing representatives:
    # min over present ids, not over all endpoints (see docstring).
    # Join direction keeps the corpus on the streaming side — comp is
    # pair-endpoint-sized, so AQE broadcasts it and df never shuffles.
    present = df.select(F.col(id_col).alias("id")).join(comp, "id")
    reps = present.groupBy("component").agg(F.min("id").alias("_rep"))
    non_reps = (
        present.join(reps, "component")
        .filter(F.col("id") != F.col("_rep"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(non_reps, id_col, "left_anti")


def incremental_refresh(
    old: DataFrame,
    new: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    verify_threshold: float = 0.3,
    prune_verify: bool = False,
    corpus_bands: DataFrame | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Continuous-crawl corpus refresh — ``snapshot_diff`` composed
    with ``incremental_neardup_admission``, the end-to-end shape of a
    production re-crawl: diff the snapshots, take the added/changed
    documents as the ingest batch, and gate that batch against the
    UNCHANGED retained corpus for near-duplicates.  Returns one row
    per delta document: (``id_col``, status 'added'|'changed',
    n_matches, admitted) — removed ids produce no ingest row.

    A changed document is re-admitted on its NEW text (its old
    content no longer exists to collide with); the corpus side is
    the new snapshot minus the delta, i.e. exactly the documents
    whose content survived the re-crawl unmodified — so admission
    never compares a doc against its own stale copy, and delta docs
    are not compared to each other (each is judged against the
    settled corpus, q76's batch semantics).

    Scale: the diff is one id-keyed full-outer join over in-row
    digests (churn-bounded output); admission is batch-vs-index
    (``corpus_bands`` plugs a persisted band index of the retained
    corpus straight in, and ``prune_verify`` bounds the verify
    shuffle to candidates — see ``incremental_neardup_admission``).
    The corpus is never self-paired and never re-signed when an
    index is supplied.

    Stale-index safety: an index built BEFORE this snapshot may still
    carry band signatures of now-changed/removed docs (including a
    changed doc's own old signature).  Those entries can only create
    false CANDIDATES, never false matches — verification shingles are
    re-derived from the retained corpus, where such docs have no
    rows, so every stale candidate dies at the verify join.  Refresh
    the index with ``append_to_band_index`` on the admission
    survivors per the band-index lifecycle; staleness costs candidate
    work, not correctness.
    """
    delta = snapshot_diff(old, new, id_col=id_col, text_col=text_col)
    ingest_ids = delta.filter(F.col("status") != "removed").select(
        F.col(id_col), "status"
    )
    batch = new.join(ingest_ids.select(id_col), id_col)
    retained = new.join(ingest_ids.select(id_col), id_col, "left_anti")
    adm = incremental_neardup_admission(
        batch,
        retained,
        text_col=text_col,
        id_col=id_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        verify_threshold=verify_threshold,
        prune_verify=prune_verify,
        corpus_bands=corpus_bands,
        materialize=materialize,
    )
    return adm.join(ingest_ids, id_col).select(
        id_col, "status", "n_matches", "admitted"
    )
