"""Structured Streaming throughput rehearsal at sf1 / sf10.

The streaming surface is parity-tested (stream == batch on every
gate/window/packing operator) but parity says nothing about RATE.
This tool measures sustained micro-batch throughput for the three
streaming tiers a 100 TB/day ingest actually runs, at 10x and 100x
bench scale, so the round record carries measured rows/s instead of
an asserted "bounded state, runs forever":

* ``curation_gate`` — the stateless q38/q43/q116/PII ingest gate
  (``curate_stream`` with ``ts_col=None``): one projection + filter
  per micro-batch, the per-document compute tier.
* ``windowed_counts`` — event-time tumbling aggregation with
  watermark (``windowed_event_counts``): shuffled stateful tier,
  state bounded by open windows.
* ``stream_dedup`` — ``dropDuplicatesWithinWatermark`` keyed dedup
  (``stream_dedup_exact``): the bounded-state exact-dedup tier,
  state ∝ distinct keys per delay window.
* ``stateful_barrier`` (r13) — the ``applyInPandasWithState``
  completion barrier (``stateful_chunk_barrier``): the custom-state
  tier, the one streaming code path that round-trips rows through
  Arrow/pandas per trigger.  Documents stand in as chunks (10 per
  synthetic episode), so every input row passes through the state
  update and 1/10th of groups emit per batch.

Each run: parquet file source with ``maxFilesPerTrigger`` pinned so
the job executes ~8 micro-batches (a real trigger cadence, not one
giant batch), noop sink, ``availableNow`` trigger, fresh checkpoint.
Reported: wall seconds, rows/s, micro-batch count from the query's
progress log, and the per-10x slope (see scale_curve.py; >1.0 means
super-linear cost — the red flag).

Usage:
    python tools/make_scale_rehearsal.py     # .scale/sf1 (once)
    python tools/make_scale_curve_data.py    # .scale/sf10 (once)
    python tools/streaming_rehearsal.py > STREAMING_REHEARSAL_r12.json
"""

from __future__ import annotations

import glob
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from serverless_podcast_etl_spark.session import get_spark  # noqa: E402
from serverless_podcast_etl_spark.streaming.curation import (  # noqa: E402
    curate_stream,
)
from serverless_podcast_etl_spark.streaming.dedup import (  # noqa: E402
    stream_dedup_exact,
)
from serverless_podcast_etl_spark.streaming.stateful import (  # noqa: E402
    stateful_chunk_barrier,
)
from serverless_podcast_etl_spark.streaming.windowed import (  # noqa: E402
    windowed_event_counts,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [
    ("sf1", os.path.join(REPO, ".scale", "sf1")),
    ("sf10", os.path.join(REPO, ".scale", "sf10")),
]
TARGET_BATCHES = 8

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _run_stream(spark, src_dir, schema, transform, ckpt_root, label,
                output_mode="append"):
    """availableNow run of ``transform(readStream)`` into a noop sink;
    returns wall seconds, input rows, micro-batch count."""
    n_files = len(glob.glob(os.path.join(src_dir, "part-*")))
    per_trigger = max(1, n_files // TARGET_BATCHES)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(src_dir)
    )
    out = transform(stream)
    ckpt = os.path.join(ckpt_root, label)
    t0 = time.perf_counter()
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.perf_counter() - t0, 2)
    progress = q.recentProgress
    rows = sum(p["numInputRows"] for p in progress)
    batches = sum(1 for p in progress if p["numInputRows"] > 0)
    return {
        "wall_sec": wall,
        "input_rows": rows,
        "micro_batches": batches,
        "rows_per_sec": round(rows / wall) if wall > 0 else None,
    }


def _slope(lo: dict, hi: dict) -> float:
    if lo["wall_sec"] <= 0.05 or hi["wall_sec"] <= 0.05:
        return float("nan")
    return round(math.log10(hi["wall_sec"] / lo["wall_sec"]), 3)


def main() -> None:
    for _, d in SCALES:
        if not os.path.isdir(d):
            raise SystemExit(
                f"missing {d} — run make_scale_rehearsal.py / "
                f"make_scale_curve_data.py first"
            )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="streaming_rehearsal",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    surfaces = {
        "curation_gate": (
            "documents.parquet",
            DOCS_SCHEMA,
            # project the table's own n_chars away: quality_columns
            # re-derives it and the names would collide
            lambda s: curate_stream(
                s.select("doc_id", "text", "lang", "source"),
                text_col="text",
                id_col="doc_id",
                ts_col=None,  # stateless gate: quality + encoding + PII
                max_anomaly_rate=0.02,
            ),
        ),
        # watermarks require TIMESTAMP (not the file's TIMESTAMP_NTZ);
        # the session runs UTC so the cast is deterministic
        "windowed_counts": (
            "events.parquet",
            EVENTS_SCHEMA,
            lambda s: windowed_event_counts(
                s.withColumn("ts", F.col("ts").cast("timestamp")),
                ts_col="ts",
                window="1 hour",
                watermark="10 minutes",
            ),
        ),
        "stream_dedup": (
            "events.parquet",
            EVENTS_SCHEMA,
            lambda s: stream_dedup_exact(
                s.withColumn("ts", F.col("ts").cast("timestamp")),
                keys=["event_id"],
                ts_col="ts",
                delay="10 minutes",
            ),
        ),
        # documents as synthetic chunk streams: 10 chunks per episode,
        # so the barrier's state store sees every row and one emission
        # per completed 10-row group (episodes straddling micro-batch
        # boundaries exercise the cross-trigger state path)
        "stateful_barrier": (
            "documents.parquet",
            DOCS_SCHEMA,
            lambda s: stateful_chunk_barrier(
                s.select(
                    F.floor(F.col("doc_id") / 10).alias("episode_id"),
                    (F.col("doc_id") % 10).cast("int").alias("chunk_num"),
                    F.col("text").alias("transcript"),
                    F.lit(10).cast("int").alias("num_chunks"),
                )
            ),
            "update",  # applyInPandasWithState(Update) requires it
        ),
    }

    report: dict = {"target_batches": TARGET_BATCHES, "surfaces": {}}
    ckpt_root = tempfile.mkdtemp(prefix="stream_rehearsal_")
    try:
        for name, (table, schema, transform, *mode) in surfaces.items():
            rows: dict = {}
            for lbl, d in SCALES:
                # one warm pass (codegen + state-store init), then the
                # timed pass, each on a fresh checkpoint
                for attempt in ("warm", lbl):
                    res = _run_stream(
                        spark,
                        os.path.join(d, table),
                        schema,
                        transform,
                        ckpt_root,
                        f"{name}-{lbl}-{attempt}",
                        output_mode=mode[0] if mode else "append",
                    )
                rows[lbl] = res
                print(f"  {name}@{lbl}: {res}", file=sys.stderr)
            rows["slope_sf1_sf10"] = _slope(rows["sf1"], rows["sf10"])
            report["surfaces"][name] = rows
    finally:
        shutil.rmtree(ckpt_root, ignore_errors=True)
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
