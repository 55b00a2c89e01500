"""Generate the sf1 scale-rehearsal dataset (r4 VERDICT "do this" #5).

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md; /root/testdata is
read-only), so the 10x rehearsal inputs are DERIVED deterministically
from sf0.1 into ``<repo>/.scale/sf1/`` (gitignored): 10 replicas per
source row with offset ids.

Construction choices, on purpose:

* ``documents`` (5,000 -> 50,000): replica 0 is the original; replicas
  1-9 append one `` repN`` token — each original becomes a 10-doc
  near-dup clone group (3-gram Jaccard ~0.95 within the group).  A
  massively duplicated corpus is exactly the case where q48's pair
  list exceeds ``small_graph_max`` (5,000 groups x C(10,2) = 225k
  within-group pairs alone), so the rehearsal exercises the
  DISTRIBUTED connected-components loop on real volume instead of the
  driver union-find fast path.
* ``embeddings`` (2,000 -> 20,000): per-component deterministic
  sinusoidal jitter (amplitude 0.01 on unit-scale components) keeps
  replicas near their original (cosine ~ 1) without being degenerate
  exact duplicates — SemDeDup (q70) and the recall panel (q62) see a
  realistic clustered-with-near-dups distribution at 10x volume.
* ``events`` (100,000 -> 1,000,000; r7, VERDICT r6 #2): replicas get
  offset user_ids — 1,500 -> 15,000 users over the SAME one-month
  range, which is the realistic scale dimension for the event-time
  family (q37/q40/q91/q93/q94 all partition by user or type; more
  users widens the keyed shuffle, a longer range would not).  Each
  replica's stream shifts by ``rep`` seconds so no two replicas
  carry bit-identical timestamps.

Re-running overwrites; output is a function of sf0.1 only.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from serverless_podcast_etl_spark.session import get_spark  # noqa: E402
from serverless_podcast_etl_spark.sources.tables import load_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scale", "sf1")
REPLICAS = 10
ID_STRIDE = 10_000  # > max source id on docs/embeddings at sf0.1
EVENT_ID_STRIDE = 1_000_000  # > max event_id (100k) at sf0.1
USER_ID_STRIDE = 10_000  # > max user_id (1,500) at sf0.1


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="make_scale_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    rep = spark.range(REPLICAS).select(F.col("id").alias("_rep"))

    docs_out = (
        docs.crossJoin(F.broadcast(rep))
        .select(
            (F.col("doc_id") + F.col("_rep") * ID_STRIDE).alias("doc_id"),
            F.when(F.col("_rep") == 0, F.col("text"))
            .otherwise(
                F.concat(F.col("text"), F.lit(" rep"), F.col("_rep"))
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    emb_out = emb.crossJoin(F.broadcast(rep)).select(
        (F.col("vec_id") + F.col("_rep") * ID_STRIDE).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x
                + F.lit(0.01)
                * F.sin(
                    F.col("vec_id") * F.lit(31.0)
                    + F.col("_rep") * F.lit(17.0)
                    + i.cast("double")
                )
                * F.col("_rep").cast("double")
                / F.lit(float(REPLICAS))
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )

    # events: 10x the USERS over the same month (load_table — the
    # source parquet is TIMESTAMP(NANOS)); per-replica ids offset,
    # stream shifted rep seconds so no replica is bit-identical
    events = load_table(spark, src, "events")
    events_out = events.crossJoin(F.broadcast(rep)).select(
        (F.col("event_id") + F.col("_rep") * EVENT_ID_STRIDE).alias(
            "event_id"
        ),
        (F.col("ts") + F.make_dt_interval(secs=F.col("_rep"))).alias("ts"),
        (F.col("user_id") + F.col("_rep") * USER_ID_STRIDE).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )

    os.makedirs(OUT, exist_ok=True)
    docs_out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )
    emb_out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )
    events_out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "events.parquet")
    )
    print(
        f"wrote {OUT}: documents="
        f"{spark.read.parquet(os.path.join(OUT, 'documents.parquet')).count()}"
        f" embeddings="
        f"{spark.read.parquet(os.path.join(OUT, 'embeddings.parquet')).count()}"
        f" events="
        f"{spark.read.parquet(os.path.join(OUT, 'events.parquet')).count()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
