"""Streaming sequence packing — the stateful dual of
``operators/packing.pack_sequences``.

Batch packing is a per-stream window cumsum; on a stream the cumsum
must SURVIVE across micro-batches, so the per-source token fill lives
in Spark's state store (checkpointed — a restart resumes mid-sequence
exactly where the previous run stopped).  Per trigger the work is
O(new documents); state is one integer per source stream, bounded by
stream cardinality forever.

Within a trigger, documents of a source are packed in ``doc_id``
order (deterministic); across triggers, in arrival order — the same
contract a sharded corpus writer has.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("n_tokens", LongType()),
        StructField("start_token", LongType()),
        StructField("seq_id", LongType()),
        StructField("seq_offset", LongType()),
    ]
)

STATE_SCHEMA = StructType([StructField("fill", LongType())])


def _make_packer(budget: int):
    def _pack(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        fill = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            out = {
                "doc_id": [],
                "source": [],
                "n_tokens": [],
                "start_token": [],
                "seq_id": [],
                "seq_offset": [],
            }
            for row in pdf.itertuples(index=False):
                n = int(row.n_tokens)
                out["doc_id"].append(int(row.doc_id))
                out["source"].append(source)
                out["n_tokens"].append(n)
                out["start_token"].append(fill)
                out["seq_id"].append(fill // budget)
                out["seq_offset"].append(fill % budget)
                fill += n
            yield pd.DataFrame(out)
        state.update((fill,))

    return _pack


def pack_stream(
    stream: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    stream_col: str = "source",
    budget: int = 256,
) -> DataFrame:
    """Streaming packing assignment: same output columns as the batch
    ``pack_sequences``, with the per-source fill carried across
    micro-batches (and restarts) in keyed state.

    Token counting stays a JVM expression BEFORE the Python stage —
    the pandas function only does the sequential fill arithmetic, so
    the Arrow payload per doc is three scalars, not the text.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    counted = stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(stream_col).alias("source"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    return counted.groupBy("source").applyInPandasWithState(
        _make_packer(budget),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
