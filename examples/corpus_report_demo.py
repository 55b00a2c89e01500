"""Runnable corpus-health report: the r11 analysis surface in one
pass over a corpus.

Usage:  python examples/corpus_report_demo.py [sf_dir]

Where the curation demo TRANSFORMS a corpus (clean → dedup → select →
shard), this one MEASURES it — the read-only report an analyst runs
before deciding what to curate:

1. vocabulary coverage curve (q109) — how many token types cover the
   token mass (V-sizing);
2. tokenizer fertility by language (q112) — chars/bytes per token;
3. per-source TV divergence (q107) — which sources speak a different
   language than the corpus;
4. per-source quality drift (q114) — grouped median/MAD stopword
   profile + outlier counts;
5. n-gram novelty extremes (q106) — most-boilerplate and most-novel
   documents;
6. duplicated-block share (q113) — how much of the corpus is repeated
   material at 8-token granularity;
7. top collocations (q108) — corpus phrase mining;
8. embedding norm outliers (q111) — corrupt-vector count on the
   embeddings table.

Every stage is a certified catalog operator; this file only wires and
prints them.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from serverless_podcast_etl_spark.functions import textstats  # noqa: E402
from serverless_podcast_etl_spark.functions import text as text_fns  # noqa: E402
from serverless_podcast_etl_spark.operators import (  # noqa: E402
    chunking,
    corpus_stats,
    selection,
    similarity,
)
from serverless_podcast_etl_spark.session import get_spark  # noqa: E402
from serverless_podcast_etl_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-report-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # 1. coverage curve: types needed for 50% / 90% of the token mass
    curve = textstats.vocab_coverage_curve(docs, "text", top_n=100).collect()
    for target in (0.5, 0.9):
        hit = next((r for r in curve if r["cum_fraction"] >= target), None)
        print(
            f"coverage {int(target * 100)}%: "
            + (f"{hit['rank']} types" if hit else f">{len(curve)} types")
        )

    # 2. fertility by language
    for r in textstats.tokenizer_fertility_stats(
        docs, "text", "lang"
    ).orderBy("lang").collect():
        print(
            f"fertility[{r['lang']}]: {r['chars_per_token']} chars/tok, "
            f"{r['bytes_per_token']} bytes/tok over {r['n_docs']} docs"
        )

    # 3. source divergence: the 3 most atypical sources
    div = corpus_stats.source_divergence(
        docs, text_col="text", id_col="doc_id", source_col="source"
    ).limit(3).collect()
    print(
        "most divergent sources:",
        [(r["source"], r["tv_divergence"]) for r in div],
    )

    # 4. quality drift: sources with outlier docs
    drift = textstats.source_quality_profile(
        docs, text_col="text", source_col="source"
    )
    flagged = drift.filter(F.col("n_outliers") > 0).count()
    print(f"sources with quality outliers: {flagged}/{drift.count()}")

    # 5. novelty extremes
    nov = corpus_stats.ngram_novelty_scores(
        docs, text_col="text", id_col="doc_id", n=3
    ).localCheckpoint(eager=True)
    lo = nov.orderBy("novelty_rate", "doc_id").limit(1).collect()[0]
    hi = nov.orderBy(F.desc("novelty_rate"), "doc_id").limit(1).collect()[0]
    print(
        f"novelty: most boilerplate doc {lo['doc_id']} "
        f"({lo['novelty_rate']}), most novel doc {hi['doc_id']} "
        f"({hi['novelty_rate']})"
    )

    # 6. duplicated-block share (corpus-level mean of the per-doc rate)
    dup = chunking.duplicate_chunk_rate(
        docs, text_col="text", id_col="doc_id", window=8
    )
    agg = dup.agg(
        F.sum("dup_chunks").alias("d"), F.sum("n_chunks").alias("n")
    ).collect()[0]
    print(
        f"duplicated 8-token blocks: {agg['d']}/{agg['n']} "
        f"({round(agg['d'] / agg['n'], 4)})"
    )

    # 7. top collocations
    top = corpus_stats.collocation_lift(
        docs, text_col="text", id_col="doc_id", min_count=5, top_k=3
    ).collect()
    print(
        "top collocations:",
        [(f"{r['word1']} {r['word2']}", r["lift"]) for r in top],
    )

    # 8. embedding hygiene
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.embedding_norm_outliers(emb, id_col="vec_id")
    n_bad = out.filter(F.col("is_outlier") == 1).count()
    print(f"embedding norm outliers: {n_bad}/{out.count()}")

    # 9. encoding hygiene (q116, r12) — U+FFFD / control / mojibake
    enc = textstats.encoding_anomaly_scores(
        docs, text_col="text", id_col="doc_id"
    )
    n_suspect = enc.filter(F.col("is_suspect") == 1).count()
    print(f"encoding-suspect docs: {n_suspect}/{enc.count()}")

    # 10. a PPS token-weighted audit sample (q115, r12) — exactly 50
    #     picks proportional to token count, the inspection sample a
    #     reviewer reads that over-represents the corpus's mass
    weighted = docs.select(
        "doc_id",
        F.size(text_fns.word_tokens(F.col("text"))).alias("n_tokens"),
    )
    sample = selection.pps_systematic_sample(
        weighted, id_col="doc_id", weight_col="n_tokens",
        k=50, seed="report", offset_seed=7,
    )
    picked = sample.count()
    total_picks = sample.agg(F.sum("n_picks")).collect()[0][0]
    print(f"PPS audit sample: {picked} docs carrying {total_picks} picks")
    assert total_picks == 50

    print("corpus report complete")
    spark.stop()


if __name__ == "__main__":
    main()
