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
  The clear is EPOCH-FENCED: batch directories are time-named, and
  ``clear_tombstones(before_ns=...)`` removes only batches older than the
  compaction's decode snapshot — a delete issued while a compaction runs
  survives the compact+clear and keeps excluding (possibly redundantly,
  which is harmless; tested in tests/test_tombstones.py).
* Delete-then-re-append: ``append_batch`` drops tombstones covering the
  batch's doc ids, restoring the reference's documented zombie contract
  (re-indexing an id leaves any not-yet-compacted old postings scoring
  alongside the new ones, ``sparse_indexer.py:99-101``); without the drop
  the stale tombstone would permanently hide the re-added doc.
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


def clear_tombstones(index_dir: str, before_ns: int | None = None) -> None:
    """Remove tombstone batches — called by compact_index after its commit
    (the compacted group no longer contains the deleted docs). Idempotent;
    stale tombstones only ever exclude absent docs.

    ``before_ns`` is the epoch fence: only batches whose time-encoded name
    predates the compaction's decode snapshot are cleared, so a delete
    issued mid-compaction (which the compactor's decode never saw) survives
    and keeps excluding its docs. None clears everything."""
    d = os.path.join(index_dir, TOMBSTONE_DIR)
    if before_ns is None:
        shutil.rmtree(d, ignore_errors=True)
        return
    if not os.path.isdir(d):
        return
    for name in os.listdir(d):
        if not name.startswith("batch-"):
            continue
        try:
            ts = int(name.split("-", 1)[1])
        except ValueError:
            continue  # foreign dir: keep (excluding absent docs is a no-op)
        if ts < before_ns:
            shutil.rmtree(os.path.join(d, name), ignore_errors=True)


def drop_tombstones_for(spark: SparkSession, index_dir: str,
                        doc_ids: DataFrame) -> bool:
    """Remove the given doc ids from the tombstone set (re-append support,
    called by ``append_batch``). Consolidates the remaining ids into one
    new batch, then deletes the old batch directories. Crash window: new
    batch written but old dirs not yet removed -> the union still contains
    the overlapping ids, and the idempotent append retry re-runs this drop.
    Returns True when an overlap existed."""
    from pyspark.sql import functions as F
    tdf = tombstones_df(spark, index_dir)
    if tdf is None:
        return False
    ids = doc_ids.select(
        F.col("doc_id").cast("bigint").alias("doc_id")).distinct()
    if not tdf.join(ids, "doc_id", "left_semi").take(1):
        return False
    d = os.path.join(index_dir, TOMBSTONE_DIR)
    old = [n for n in os.listdir(d) if n.startswith("batch-")]
    remaining = tdf.join(ids, "doc_id", "left_anti")
    new_dir = os.path.join(d, f"batch-{time.time_ns()}")
    remaining.write.mode("overwrite").parquet(new_dir)
    for name in old:
        if os.path.join(d, name) != new_dir:
            shutil.rmtree(os.path.join(d, name), ignore_errors=True)
    return True
