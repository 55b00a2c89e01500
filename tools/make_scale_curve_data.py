"""Generate the sf10 scale-curve dataset: 100x bench scale with the
SAME workload shape as .scale/sf1.

``make_scale_rehearsal.py``'s sf1 recipe cannot simply be re-run with
100 replicas: append-only replicas all share the original's text, so
every family of 100 would collapse into one near-dup clique — within-
group candidate pairs would grow as C(100,2)/C(10,2) = 110x, a
WORKLOAD-shape change (quadratic clique growth), not a scale-up of the
engine's work.  A scaling CURVE needs the shape held fixed while only
the volume moves, so sf10 is built as 10 disjoint FAMILIES x 10
replicas per original document:

* ``documents`` (5,000 -> 500,000): family 0 keeps the original
  tokens; family M>0 prefixes EVERY token with ``fMx`` — token sets
  across families are disjoint, so cross-family shingle Jaccard is 0
  and LSH never pairs them.  Within a family, replica n>0 appends one
  `` repN`` token (the exact sf1 recipe) — near-dup groups stay size
  10, and the expected q48 pair volume is 10x sf1's (50,000 groups x
  C(10,2) = 2.25M within-group pairs), i.e. LINEAR in corpus size.
  The single shared `` repN`` token across families contributes no
  shared 3-gram shingle (its neighbors differ per family).
* ``embeddings`` (2,000 -> 200,000): family copies get a family-keyed
  sinusoidal OFFSET (amplitude 0.5 per component — far apart in
  cosine), then the sf1 per-replica jitter (amplitude 0.01 — near-dup
  within family).  Cluster structure scales in cluster COUNT, not
  cluster size.
* ``events`` (100,000 -> 10,000,000): the sf1 recipe verbatim with
  100 replicas — 150,000 users over the SAME one-month range (the
  event-time family partitions by user/type, so more users is the
  honest scale dimension), each replica's stream shifted ``rep``
  seconds so no two replicas carry bit-identical timestamps.

Output: ``<repo>/.scale/sf10/`` (gitignored).  Re-running overwrites;
the dataset is a deterministic function of sf0.1 only.
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
OUT = os.path.join(REPO, ".scale", "sf10")
FAMILIES = 10
REPLICAS = 10  # per family — group size pinned to sf1's
ID_STRIDE = 10_000  # > max doc/vec id at sf0.1; variant in 0..99
EVENT_ID_STRIDE = 1_000_000  # > max event_id (100k) at sf0.1
USER_ID_STRIDE = 10_000  # > max user_id (1,500) at sf0.1


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="make_scale_curve_data")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    fam = spark.range(FAMILIES).select(F.col("id").alias("_fam"))
    rep = spark.range(REPLICAS).select(F.col("id").alias("_rep"))

    # family M>0: prefix every token -> disjoint vocab per family;
    # replica n>0: append one " repN" token (the sf1 near-dup recipe)
    fam_text = F.when(F.col("_fam") == 0, F.col("text")).otherwise(
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(
                    F.lit("f"), F.col("_fam"), F.lit("x"), t
                ),
            ),
            " ",
        )
    )
    docs_out = (
        docs.crossJoin(F.broadcast(fam))
        .crossJoin(F.broadcast(rep))
        .select(
            (
                F.col("doc_id")
                + (F.col("_fam") * REPLICAS + F.col("_rep")) * ID_STRIDE
            ).alias("doc_id"),
            F.when(F.col("_rep") == 0, fam_text)
            .otherwise(F.concat(fam_text, F.lit(" rep"), F.col("_rep")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )

    emb_out = (
        emb.crossJoin(F.broadcast(fam))
        .crossJoin(F.broadcast(rep))
        .select(
            (
                F.col("vec_id")
                + (F.col("_fam") * REPLICAS + F.col("_rep")) * ID_STRIDE
            ).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x
                    # family offset: large, family-keyed — copies of one
                    # original land in FAMILIES distinct neighborhoods
                    + F.lit(0.5)
                    * F.sin(
                        F.col("_fam") * F.lit(7.0)
                        + F.col("vec_id") * F.lit(3.0)
                        + i.cast("double")
                    )
                    * F.when(F.col("_fam") == 0, F.lit(0.0)).otherwise(
                        F.lit(1.0)
                    )
                    # replica jitter: the sf1 recipe — near its family
                    # anchor without exact duplication
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
    )

    # events: the sf1 recipe verbatim at 100 replicas (load_table —
    # the source parquet is TIMESTAMP(NANOS))
    rep100 = spark.range(FAMILIES * REPLICAS).select(
        F.col("id").alias("_rep")
    )
    events = load_table(spark, src, "events")
    events_out = events.crossJoin(F.broadcast(rep100)).select(
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
    docs_out.repartition(64).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )
    emb_out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )
    events_out.repartition(64).write.mode("overwrite").parquet(
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
