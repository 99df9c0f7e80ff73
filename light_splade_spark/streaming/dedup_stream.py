"""Stateful streaming exact-dedup — first occurrence wins, across batches.

The batch dedup operators (operators/dedup.py) assume the corpus is at
rest; a crawl ingest is a stream, and re-crawls resend documents days
apart — far beyond any watermark. This operator keeps one tiny state cell
per content hash with ``applyInPandasWithState`` (the arbitrary-stateful
Structured Streaming primitive): the first document carrying a hash is
emitted, every later arrival — same micro-batch or any future one — is
dropped. State lives in the streaming checkpoint, so exactly-once holds
across restarts.

Scale shape: state is keyed by md5(text) and holds ONE int per distinct
hash — the state store shards by key across executors, so memory is
|distinct docs| / cluster, not per-driver; no shuffle beyond the groupBy
hash exchange every stateful operator needs. Within a micro-batch the
deterministic winner is the smallest ``id_col`` (re-runs of the same
batch re-emit the same row, which foreachBatch/idempotent sinks need).

The reference has no streaming at all; this is the idiomatic Spark answer
to its batch-only ``drop_duplicates`` step.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "h STRING, doc_id BIGINT, text STRING"
STATE_SCHEMA = "seen INT"


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        # hash already emitted in an earlier batch: drain and drop
        for _ in pdfs:
            pass
        return
    best = None  # (doc_id, text)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        i = pdf["doc_id"].idxmin()
        row = (int(pdf["doc_id"][i]), pdf["text"][i])
        if best is None or row[0] < best[0]:
            best = row
    if best is None:
        return
    state.update((1,))
    yield pd.DataFrame({"h": [key[0]], "doc_id": [best[0]],
                        "text": [best[1]]})


def stream_dedup(stream: DataFrame, output_dir: str, checkpoint_dir: str,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Start an AvailableNow streaming query writing first-occurrence rows
    (h, doc_id, text) to ``output_dir`` parquet. Rerun with the same
    checkpoint to process newly arrived files; previously seen hashes stay
    suppressed via the checkpointed state."""
    keyed = (stream.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("h"))
        .groupBy("h"))
    out = keyed.applyInPandasWithState(
        _dedup_fn, OUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
    return (out.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
