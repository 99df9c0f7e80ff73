"""Doc-level tombstone deletes — the LSM companion to append + compact.

The reference cannot delete (its append-only indexer documents the zombie
caveat, ``sparse_indexer.py:99-101``); at 100 TB deletes are how a
training-data pipeline retracts documents (takedowns, dedup survivors'
losers, quality refilters) without an hours-long rebuild. Design:

* ``delete_docs`` appends doc ids to ``<index_dir>/tombstones/`` parquet —
  an O(|batch|) write, no posting rewrite;
* every query route excludes tombstoned docs at scoring time: the WAND
  kernel (distributed and driver-local) filters decoded postings with a
  numpy mask (ids ship as one broadcast-sized array — fine to ~10^7
  deletes), and the join route excludes inside ``decode_postings`` with a
  distributed anti-join (no size bound);
* corpus statistics stay FROZEN (N, avgdl, idf) — the same contract as
  appends: the build's scoring model does not drift under mutation;
* ``compact_index`` purges: its decode step drops tombstoned postings (it
  reads through ``decode_postings``), and after the atomic liveness
  commit the tombstone files are cleared — a crash between the two leaves
  stale tombstones that exclude already-absent docs, a harmless no-op.
  Single-writer assumption: deletes issued while a compaction is running
  land after its decode snapshot and would be cleared unapplied — serialize
  deletes with compactions (the same discipline appends already need).
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession

TOMBSTONE_DIR = "tombstones"


def delete_docs(spark: SparkSession, index_dir: str,
                doc_ids: list[int] | DataFrame) -> int:
    """Tombstone the given doc ids (idempotent — duplicates are fine, the
    readers use set semantics). Returns the number of ids written."""
    if isinstance(doc_ids, DataFrame):
        from pyspark.sql import functions as F
        # pin BIGINT: an int32 batch next to an int64 one would break the
        # multi-batch tombstone reads with a parquet type conflict
        df = doc_ids.select(
            F.col("doc_id").cast("bigint").alias("doc_id")).distinct()
        n = df.count()
    else:
        df = spark.createDataFrame([(int(d),) for d in doc_ids],
                                   "doc_id BIGINT").distinct()
        n = len(set(doc_ids))
    out = os.path.join(index_dir, TOMBSTONE_DIR, f"batch-{time.time_ns()}")
    df.write.mode("overwrite").parquet(out)
    return n


def tombstones_df(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Distinct tombstoned doc ids as a DataFrame, or None when none."""
    d = os.path.join(index_dir, TOMBSTONE_DIR)
    if not os.path.isdir(d) or not any(
            name.startswith("batch-") for name in os.listdir(d)):
        return None
    return spark.read.parquet(os.path.join(d, "batch-*")) \
        .select("doc_id").distinct()


def load_tombstone_ids(index_dir: str) -> np.ndarray | None:
    """Driver-side sorted int64 tombstone ids (pyarrow read — milliseconds
    up to ~10^7 ids), or None when the index has no tombstones."""
    d = os.path.join(index_dir, TOMBSTONE_DIR)
    if not os.path.isdir(d):
        return None
    import pyarrow.dataset as pds
    files = [os.path.join(d, n, f)
             for n in os.listdir(d) if n.startswith("batch-")
             for f in os.listdir(os.path.join(d, n)) if f.endswith(".parquet")]
    if not files:
        return None
    tab = pds.dataset(files).to_table(columns=["doc_id"])
    ids = np.unique(tab.column("doc_id").to_numpy(zero_copy_only=False))
    return ids.astype(np.int64) if ids.size else None


def clear_tombstones(index_dir: str) -> None:
    """Remove all tombstone batches — called by compact_index after its
    commit (the compacted group no longer contains the deleted docs).
    Idempotent; stale tombstones only ever exclude absent docs."""
    shutil.rmtree(os.path.join(index_dir, TOMBSTONE_DIR),
                  ignore_errors=True)
