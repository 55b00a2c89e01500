"""Runnable trained-ANN index lifecycle: build once, probe forever,
append daily, re-train when the drift report says so.

Usage:  python examples/trained_index_lifecycle_demo.py [sf_dir] [work_dir]

The production shape behind catalog entries q117/q118/q119:

1. DAY 0 — train the deterministic integer k-means codebook on the
   corpus and persist the inverted file ``partitionBy("cluster")``
   with its codebook stamp (``write_trained_ivf_index``).  Training
   is order-free integer arithmetic, so a lost codebook is exactly
   re-derivable from the corpus.
2. QUERY — load through the stamp check and probe with
   ``prune=True``: the probed cells become static partition filters,
   so a query batch reads |corpus|·nprobe/n_clusters rows off disk,
   not the corpus (shown live from the executed plan).
3. DAY 1 — append the day's new vectors under the FROZEN codebook
   (``append_to_trained_ivf_index``); a wrong codebook is refused
   before anything is written (shown live).
4. DECIDE — ``trained_ivf_drift_report``: per cell, count share and
   mean squared distance to the frozen centroid vs the stamped
   training baseline.  Ratios near 1 → keep appending; far from 1 →
   the codebook is stale, re-train.
5. RE-TRAIN — ``write_trained_ivf_index`` again over the grown
   corpus: fresh codebook, fresh baseline; the report reads ≈1.

Every stage is a certified catalog operator (q118/q119); this file
only wires and prints them.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from serverless_podcast_etl_spark.operators import similarity  # noqa: E402
from serverless_podcast_etl_spark.session import get_spark  # noqa: E402
from serverless_podcast_etl_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="trained_ivf_demo_")
    )
    path = os.path.join(work, "ann_index")
    spark = get_spark(
        app_name="trained-index-lifecycle-demo",
        master="local[4]",
        shuffle_partitions=8,
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    day0 = emb.filter(F.col("vec_id") % 3 != 0)
    day1 = emb.filter(F.col("vec_id") % 3 == 0)

    # 1. DAY 0 — train + persist with the codebook stamp
    codebook = similarity.write_trained_ivf_index(
        day0, path, "vec_id", n_clusters=8, n_iter=2, seed="demo"
    )
    print(
        f"day 0: trained {len(codebook)}-cell codebook over "
        f"{day0.count()} vectors, index persisted at {path}"
    )

    # 2. QUERY — stamp-checked load, partition-pruned probe
    index, stamped = similarity.load_trained_ivf_index(spark, path)
    queries = emb.filter(F.col("vec_id") < 3)
    hits = similarity.trained_ivf_probe_topk(
        queries, index, stamped, "vec_id", k=5, nprobe=2
    )
    plan = hits._jdf.queryExecution().executedPlan().toString()
    pruned = "PartitionFilters" in plan and "cluster" in (
        plan.split("PartitionFilters", 1)[1][:200]
    )
    print(f"probe: {hits.count()} hits; partition-pruned scan: {pruned}")
    hits.orderBy("query_id", "rank").show(6, truncate=False)

    # 3. DAY 1 — append under the FROZEN codebook; wrong codebook is
    #    refused before any write
    wrong = [[c + 1 for c in row] for row in stamped]
    try:
        similarity.append_to_trained_ivf_index(
            day1, path, "vec_id", codebook=wrong
        )
    except ValueError as exc:
        print(f"mismatched codebook refused: {str(exc)[:60]}...")
    similarity.append_to_trained_ivf_index(day1, path, "vec_id")
    print(f"day 1: appended {day1.count()} vectors under the frozen codebook")

    # 4. DECIDE — the drift report is the re-train signal
    rep = similarity.trained_ivf_drift_report(spark, path)
    rep.show(20, truncate=False)
    worst = rep.agg(
        F.max(F.abs(F.col("share_ratio") - 1)).alias("share_dev"),
        F.max(F.abs(F.col("dist_ratio") - 1)).alias("dist_dev"),
    ).collect()[0]
    stale = (worst["share_dev"] or 0) > 0.5 or (worst["dist_dev"] or 0) > 0.5
    print(
        f"drift: max |share_ratio-1| = {worst['share_dev']}, "
        f"max |dist_ratio-1| = {worst['dist_dev']} -> "
        f"{'RE-TRAIN' if stale else 'keep appending'}"
    )

    # 5. RE-TRAIN — fresh codebook + baseline over the grown corpus;
    #    the report resets to ≈1 by construction
    similarity.write_trained_ivf_index(
        emb, path, "vec_id", n_clusters=8, n_iter=2, seed="demo2"
    )
    fresh = similarity.trained_ivf_drift_report(spark, path)
    all_unity = (
        fresh.filter(
            (F.col("share_ratio") != 1.0) | (F.col("n_now") != F.col("n_train"))
        ).count()
        == 0
    )
    print(f"re-trained over {emb.count()} vectors; fresh baseline reads unity: {all_unity}")

    print("lifecycle demo complete")
    spark.stop()


if __name__ == "__main__":
    main()
