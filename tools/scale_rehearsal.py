"""sf1 scale rehearsal: the 5 heaviest curation queries at 10x bench
scale (r4 VERDICT "do this" #5).

Runs q62/q68/q70/q48/q69 once cold + once warm against the derived
``.scale/sf1`` dataset (``tools/make_scale_rehearsal.py``) and prints
one JSON report with wall-times plus the q48 pair count and an
explicit A/B of BOTH connected-components backends on that pair
graph — the distributed min-label loop is exercised on real volume
every rehearsal regardless of where ``small_graph_max`` sits (r5
raised it to 500k after this A/B measured union-find faster at 250k
pairs), and backend parity is asserted.  Since r10 the rehearsal also
builds an ABOVE-BOUND 15-replica pair graph (in memory, from sf0.1)
so the default dispatch itself picks the distributed loop and its
parity is asserted past the bound.  Results go to NOTES.md's
scale-rehearsal section per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from serverless_podcast_etl_spark.operators import dedup  # noqa: E402
from serverless_podcast_etl_spark.plans.catalog import CATALOG, _t  # noqa: E402
from serverless_podcast_etl_spark.session import get_spark  # noqa: E402

QUERIES = [
    "q48_neardup_clusters",
    "q62_ann_recall_panel",
    "q68_neardup_pair_recall",
    "q69_bloom_decontamination",
    "q70_semantic_dedup",
    # r5 additions: the heaviest new curation op (cross-doc window
    # df + strip), the two-pass global prefix sum, and the
    # incremental batch-vs-corpus admission gate at 10x
    "q72_strip_cross_doc_spans",
    "q74_token_budget_selection",
    "q76_incremental_neardup",
    # r6 additions (r5 VERDICT #5): the recursive-closure split and
    # the per-source quota window at 10x (q77/q78 are in-scan/TakeOrdered
    # — no distributed path to rehearse)
    "q73_leakage_free_split",
    "q75_source_quota_cap",
    # r6 late additions (r6 NOTES): the persisted-IVF build+probe and
    # the two-pass range-shuffle shard assignment at 10x
    "q82_ivf_indexed_ann",
    "q84_deterministic_shuffle",
    # r7 additions (r6 VERDICT #2): the event-time family at 10x
    # users — windowed counts, sessionization, debounce, funnel,
    # retention — now that .scale/sf1 carries an events table
    "q37_windowed_event_counts",
    "q40_sessionization",
    "q91_event_debounce",
    "q93_funnel_conversion",
    "q94_retention_cohorts",
    # r8 additions (r7 VERDICT #2/#7): the k-step funnel's chained
    # user-keyed joins at 10x users, the multi-method ensemble (three
    # full candidate pipelines + CC over the union at 10x docs), and
    # the snapshot-diff -> admission refresh at 10x churn
    "q96_funnel_steps",
    "q97_neardup_ensemble",
    "q99_incremental_refresh",
    # r10 addition (r9 VERDICT #2): the target-affinity selection's
    # claimed shape — two full-corpus hashing scans (joint fit +
    # in-row score), zero joins — measured at 10x docs before its
    # driver-window rotation; cost should scale ~linearly with the
    # corpus (sf0.1 golden median 6.9s)
    "q100_target_importance_select",
    # r10 additions rehearsed the round they land (the q100 lesson:
    # don't let an operator reach its rotation with no 10x row) —
    # the coverage audit's two broadcast-semi corpus scans and the
    # OOV scorer's fit+InSet-scan shape at 10x docs
    "q101_target_coverage_audit",
    "q102_vocab_oov_scores",
    # q103/q104 (late r10 additions, ride from the r11 rehearsal
    # onward): both compositions of already-rehearsed stages —
    # q103 = q70's in-row quantizer assignment + q75's per-group
    # window quota; q104 = q72's positioned-window/island/strip
    # machinery with the benchmark hash set broadcast instead of a
    # df threshold — measured standalone at sf0.1 (1.5 s / 2.2 s)
    # in NOTES r10
    "q103_cluster_balanced_sample",
    "q104_strip_contamination",
    # r11 additions rehearse the round they land (the q100 lesson):
    # q105 is in-row + posexplode (no distributed path, kept for the
    # output-volume shape), q106 shuffles the shingle table twice,
    # q107 explodes the corpus once then reduces, q108 double-scans
    # for unigram/bigram aggregates with the filtered bigram side
    # broadcast
    "q105_token_window_chunks",
    "q106_ngram_novelty",
    "q107_source_divergence",
    "q108_collocations",
    # q110's df-capped containment join is the q19 candidate shape at
    # 10x — the quadratic-bound proof matters more here than anywhere
    # (q109 is TakeOrdered over a bounded table; rehearsed for the
    # explode-once shape)
    "q109_vocab_coverage",
    "q110_containment_neardup",
    # q111's two percentile aggregations read one checkpointed norms
    # table; q112 is one in-row scan + tiny groupBy — rehearsed for
    # the explode/checkpoint shapes
    "q111_embedding_norm_outliers",
    "q112_tokenizer_fertility",
    # q113 composes q105's chunker with the q18 hash groupBy — the
    # chunk-hash shuffle is the distributed path to rehearse
    "q113_duplicate_chunk_rate",
    # q114's one checkpointed scan + broadcast per-source joins
    "q114_source_quality_profile",
    # r12 additions rehearse the round they land (the q100 lesson):
    # q115's distributed two-pass prefix sum over the md5 order is
    # the q84 shape plus in-row pick arithmetic; q116 is three in-row
    # regexp scans (no distributed path, kept for the scan shape)
    "q115_pps_token_sample",
    "q116_encoding_anomalies",
    # r13 addition rehearses the round it lands (the q100 lesson):
    # q117's two bounded-collect training rounds + the broadcast cell
    # join are the distributed paths — training cost must stay flat
    # per round at 10x docs
    "q117_trained_ivf_ann",
    # r14 additions rehearse the round they land: q118 is the
    # persisted form — train + partitionBy(cluster) write + stamped
    # reload + PRUNED probe, so the partition-pruned index scan is
    # rehearsed at sf1 volume, not just fixture scale (r13 VERDICT #6);
    # q119 adds the append + two stats scans of the lifecycle
    "q118_persisted_trained_ivf",
    "q119_codebook_drift",
    # q120's postings build + term-keyed df join + score agg are the
    # distributed paths — the inverted-list join must stay
    # posting-list-bounded at 10x docs
    "q120_bm25_retrieval",
    # q121 composes both retriever arms over the joined corpus
    # (materialized once at its fan-out) + the rank-only fusion; cost
    # must track the arms, the fusion staying |Q|-bounded
    "q121_hybrid_rrf",
    # q122 adds the index WRITE (range-partitioned on term) and the
    # term-pruned probe — build linear in corpus tokens, probe
    # bounded by the query vocabulary's posting lists
    "q122_bm25_indexed_retrieval",
]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, ".scale", "sf1")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", SF1)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="scale_rehearsal",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    # q48's candidate-pair volume at sf1, checkpointed once so the
    # backend A/B below times component resolution only
    pairs = dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        text_col="text",
        id_col="doc_id",
        n=3,
        num_hashes=8,
        bands=4,
        verify_threshold=0.3,
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    n_pairs = pairs.count()
    pair_count_sec = round(time.perf_counter() - t0, 2)

    import inspect

    default_bound = inspect.signature(
        dedup.connected_components
    ).parameters["small_graph_max"].default

    # Both CC backends on the real sf1 graph: warm each once, then
    # time one run each, and assert exact output parity.
    cc_ab: dict = {"pair_count": n_pairs, "default_bound": default_bound}
    for label, bound in (("distributed", 0), ("unionfind", n_pairs + 1)):
        dedup.connected_components(pairs, small_graph_max=bound).write.format(
            "noop"
        ).mode("overwrite").save()
        t0 = time.perf_counter()
        dedup.connected_components(pairs, small_graph_max=bound).write.format(
            "noop"
        ).mode("overwrite").save()
        cc_ab[label + "_sec"] = round(time.perf_counter() - t0, 2)
    a = sorted(
        map(tuple, dedup.connected_components(
            pairs, small_graph_max=0
        ).collect())
    )
    b = sorted(
        map(tuple, dedup.connected_components(
            pairs, small_graph_max=n_pairs + 1
        ).collect())
    )
    cc_ab["backend_parity"] = a == b
    assert cc_ab["backend_parity"], "CC backends diverged on the sf1 graph"

    # r10 (r9 VERDICT #6): an ABOVE-BOUND pair graph, so the DEFAULT
    # small_graph_max organically selects the distributed min-label
    # loop (the A/B above forces both backends regardless of the
    # bound; this one proves the default dispatch itself).  Derived
    # in memory from sf0.1 with 15 replicas per doc — C(15,2)=105
    # within-group pairs x 5,000 groups = 525k alone, past the 500k
    # bound — instead of regenerating .scale/sf1, so every historical
    # rehearsal wall-time stays comparable.
    from pyspark.sql import functions as F

    src01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rep15 = spark.range(15).select(F.col("id").alias("_rep"))
    dense = (
        _t(spark, src01, "documents")
        .crossJoin(F.broadcast(rep15))
        .select(
            (F.col("doc_id") + F.col("_rep") * 10_000).alias("doc_id"),
            F.when(F.col("_rep") == 0, F.col("text"))
            .otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("_rep"))
            )
            .alias("text"),
        )
    )
    dense_pairs = dedup.minhash_lsh_pairs(
        dense,
        text_col="text",
        id_col="doc_id",
        n=3,
        num_hashes=8,
        bands=4,
        verify_threshold=0.3,
    ).localCheckpoint(eager=True)
    n_dense = dense_pairs.count()
    dense_cc: dict = {
        "replicas": 15,
        "pair_count": n_dense,
        "crosses_default_bound": n_dense > default_bound,
    }
    assert dense_cc["crosses_default_bound"], (
        f"dense graph must exceed small_graph_max={default_bound}, "
        f"got {n_dense} pairs"
    )
    dedup.connected_components(dense_pairs).write.format("noop").mode(
        "overwrite"
    ).save()  # warm (default dispatch = distributed at this volume)
    t0 = time.perf_counter()
    dedup.connected_components(dense_pairs).write.format("noop").mode(
        "overwrite"
    ).save()
    dense_cc["default_path_sec"] = round(time.perf_counter() - t0, 2)
    da = sorted(
        map(tuple, dedup.connected_components(dense_pairs).collect())
    )
    db = sorted(
        map(
            tuple,
            dedup.connected_components(
                dense_pairs, small_graph_max=n_dense + 1
            ).collect(),
        )
    )
    dense_cc["backend_parity"] = da == db
    assert dense_cc["backend_parity"], (
        "CC backends diverged on the above-bound dense graph"
    )
    print(
        f"  dense_cc: pairs={n_dense} (bound {default_bound}) "
        f"default_path={dense_cc['default_path_sec']}s parity=True",
        file=sys.stderr,
    )

    report: dict = {
        "sf_dir": sf_dir,
        "q48_pair_count": n_pairs,
        "q48_pair_count_sec": pair_count_sec,
        "crosses_default_bound": n_pairs > default_bound,
        "dense_cc_crossing": dense_cc,
        "cc_backends": cc_ab,
        "queries": {},
    }
    for name in QUERIES:
        fn = CATALOG[name].fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = round(time.perf_counter() - t0, 2)
        report["queries"][name] = {"cold": cold, "warm": warm}
        print(f"  {name}: cold={cold}s warm={warm}s", file=sys.stderr)

    # SemDeDup k-sweep: the certified q70 pins k=16 for oracle
    # exactness, but the operator's scale lever is raising n_clusters
    # with corpus size (within-cell candidate pairs ~ n^2/k).  Measure
    # the lever instead of asserting it: trained-k-means path at
    # 16 / 64 / 256 cells on the same 10x corpus.
    from serverless_podcast_etl_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    report["semantic_dedup_k_sweep"] = {}
    for k in (16, 64, 256):
        t0 = time.perf_counter()
        n = similarity.semantic_dedup(
            emb, id_col="vec_id", n_clusters=k, threshold=0.95, seed=7
        ).count()  # one action: count forces the full pipeline incl. training
        sec = round(time.perf_counter() - t0, 2)
        report["semantic_dedup_k_sweep"][f"k={k}"] = {
            "sec": sec,
            "survivors": n,
        }
        print(f"  semdedup k={k}: {sec}s survivors={n}", file=sys.stderr)
    payload = json.dumps(report, indent=1)
    # JVM gc,alloc warnings print to STDOUT (NOTES fact 22) and can
    # corrupt a redirected artifact; pass an output path to bypass
    # stdout entirely, else the JSON still goes last to stdout.
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(payload + "\n")
        print(f"wrote {sys.argv[1]}", file=sys.stderr)
    else:
        print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
