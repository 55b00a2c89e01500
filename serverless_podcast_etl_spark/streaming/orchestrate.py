"""M5 — event-driven orchestration via Structured Streaming.

The reference wires six S3-notification edges (suffix-filtered object
arrival triggers the next Lambda — main.tf:278-287 etc.); the Spark
mirror is a file-source stream per staging directory with
``Trigger.AvailableNow`` (drain-what-has-arrived batch semantics) and
``foreachBatch`` sinks that append through the warehouse's INSERT
IGNORE — so re-delivery, restarts, and overlapping triggers are all
idempotent, matching the FIFO-dedup + INSERT IGNORE contract.

The lambda_5 barrier keeps its reference semantics in streaming form:
each micro-batch re-evaluates arrived==expected over ALL chunks seen
so far (state lives in the staging dir itself, not in Spark state —
no watermark, no timeout; stalls visible via
``transcripts.incomplete_episodes``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .. import schemas
from ..pipeline import transcripts
from ..pipeline.warehouse import Warehouse


def staged_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "json",
    path_glob: str | None = None,
) -> DataFrame:
    """A file-arrival stream over a staging directory — the Spark twin
    of one S3-notification edge.  ``path_glob`` mirrors the suffix
    filters (*.json / *.mp3 / *.txt / *.gz)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)


def run_available_now(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
) -> None:
    """Drain everything currently staged through ``batch_fn`` and stop
    — the reference's 'process what has arrived' trigger discipline."""
    q = (
        stream_df.writeStream.foreachBatch(lambda df, epoch: batch_fn(df, epoch))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_chunk_payloads(
    spark: SparkSession,
    wh: Warehouse,
    chunks_dir: str,
    checkpoint_dir: str,
    expected: DataFrame,
    on_transcript: Callable[[DataFrame], None],
) -> None:
    """The reduce edge: chunk-payload arrivals re-evaluate the barrier
    over the FULL staging dir (batch semantics inside foreachBatch —
    new arrivals may complete episodes whose other chunks arrived in
    earlier triggers), and completed transcripts flow to
    ``on_transcript`` exactly once per run.
    """
    stream = staged_stream(
        spark, chunks_dir, schema=schemas.TRANSCRIPT_CHUNK, path_glob="*.json"
    )

    def batch_fn(_batch: DataFrame, _epoch: int) -> None:
        all_chunks = spark.read.schema(schemas.TRANSCRIPT_CHUNK).json(chunks_dir)
        complete = transcripts.reduce_transcripts(
            all_chunks.select("episode_id", "chunk_num", "payload"), expected
        )
        on_transcript(complete)

    run_available_now(stream, batch_fn, checkpoint_dir)
