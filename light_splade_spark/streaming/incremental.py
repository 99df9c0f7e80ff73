"""Append-only incremental indexing — batch and Structured Streaming.

The reference's indexer is micro-batch append (``sparse_indexer.py:91-125``)
with a documented no-update caveat: re-indexing an existing doc id leaves the
old row in place as a "zombie" (``sparse_indexer.py:99-101``). We mirror that
contract exactly:

* ``append_batch`` builds postings for the new docs only and writes them as a
  NEW ``shard_group=append-...`` directory — existing groups are immutable
  (idempotent partition writes, the checkpoint-resume property holds).
* Corpus statistics are FROZEN at initial build time (N, avgdl, per-term
  idf), as in the reference where the encoder's weights don't change when
  docs are added. Terms unseen at build time get idf from the frozen N and
  their within-batch df, and are appended to the terms dim.
* ``stream_append`` wraps it in Structured Streaming ``foreachBatch`` with
  ``Trigger.AvailableNow`` — the idiomatic incremental-ingest shape: exactly
  -once per micro-batch via the streaming checkpoint + immutable group dirs
  keyed by batch id.

Query-side: the WAND kernel merges multiple posting rows per (shard, term)
(one per shard_group), so appended docs are visible immediately.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from light_splade_spark.functions.analyzers import doc_terms, get_analyzer
from light_splade_spark.index.build import (
    POSTING_SCHEMA,
    RUN_SCHEMA,
    _encode_groups,
    _merge_groups,
    collect_partition_lineage,
)
from light_splade_spark.index.manifest import IndexManifest, write_lineage
from light_splade_spark.plans.bm25_sql import B, K1

# Query batches above this size route to the distributed join scorer
# instead of collecting to the driver for the WAND kernel (the join
# route's advantage is flat driver memory — BENCH/BASELINE.md §0-r5).
# Shared with jobs/query_job.py's --route auto so the two guards cannot
# drift.
JOIN_ROUTE_THRESHOLD = 50_000


def append_batch(spark: SparkSession, index_dir: str, docs: DataFrame,
                 batch_id: str, id_col: str = "doc_id",
                 text_col: str = "text", _pre_register_hook=None) -> None:
    """Append new docs to an existing complete index (immutable new group).

    Re-running with the same ``batch_id`` overwrites the same group dir —
    idempotent, which is what foreachBatch retries require. (Exception to
    full idempotency: the doc_stats/terms APPENDS can leave duplicate
    audit rows if the first attempt crashed after writing them — scoring
    is unaffected (postings carry precomputed impacts; terms re-append is
    left-anti-guarded) and compaction reads doc_stats only for max(doc_id).
    A retry whose group a compaction already folded is detected via
    ``manifest.retired_groups`` and skipped entirely — re-registering it
    would double-count the batch's postings.)

    SINGLE WRITER: appends, deletes, and compactions must be serialized by
    the caller (jobs/maintain_index_job.py runs them sequentially; a
    streaming sink is one driver). Two concurrent writers can interleave
    manifest saves and lose the other's liveness/pointer update.

    Re-appending a tombstoned doc id drops its tombstone (the doc becomes
    visible again); if its old postings were not yet compacted away they
    score alongside the new ones — the reference's documented zombie
    contract for re-indexed ids (``sparse_indexer.py:99-101``).
    """
    man = IndexManifest.load(index_dir)
    if man.status != "complete":
        raise ValueError("cannot append to an incomplete index")
    if f"append-{batch_id}" in getattr(man, "retired_groups", []):
        # this batch registered on a previous attempt and a compaction has
        # since folded it into the compact group — every doc is already
        # served from there. Re-running the append would double-count the
        # batch (live in compact AND resurrected append group). Complete
        # the one step a post-register crash can leave dangling, then stop.
        # (If the batch re-appended tombstoned ids and the crash predated
        # this drop, the fold purged those ids — the delete wins on this
        # crash path, consistent with the fenced-clear contract.)
        from light_splade_spark.index.tombstones import drop_tombstones_for
        drop_tombstones_for(spark, index_dir,
                            docs.select(F.col(id_col).alias("doc_id")))
        return
    if not docs.take(1):
        return  # empty micro-batch: no group dir, no manifest churn
    t0 = time.time()
    # appended docs MUST be tokenized with the analyzer the index pins
    analyzer = get_analyzer(man.analyzer_version)
    dt = doc_terms(docs, id_col, text_col, analyzer=analyzer).cache()

    start_terms_rel = getattr(man, "terms_dir", "terms")
    terms_path = os.path.join(index_dir, start_terms_rel)
    known = spark.read.parquet(terms_path).select("term", "term_id", "idf", "df")
    batch_terms = dt.groupBy("term").agg(F.count(F.lit(1)).alias("bdf"))

    def _terms_missing_from(known_terms: DataFrame) -> DataFrame:
        # batch terms absent from the given dim, in the dim's row shape:
        # frozen-N idf with batch df (documented approximation: the
        # reference likewise freezes encoder/stats at build time)
        return (
            batch_terms.join(known_terms.select("term"), "term", "left_anti")
            .select(
                "term",
                F.col("bdf").alias("df"),
                F.lit(None).cast("bigint").alias("cf"),
                F.xxhash64("term").alias("term_id"),
                F.xxhash64("term").alias("tid"),
                F.log(1.0 + (F.lit(float(man.n_docs)) - F.col("bdf") + 0.5)
                      / (F.col("bdf") + 0.5)).alias("idf"),
            )
        )

    new_terms = _terms_missing_from(known)
    # align to the existing terms schema before appending
    existing_cols = spark.read.parquet(terms_path).columns
    new_terms.select(*existing_cols).write.mode("append").parquet(terms_path)

    terms_b = F.broadcast(
        spark.read.parquet(terms_path).select("term", "term_id", "idf"))
    # run sizing must use the BATCH's df, not the dim's corpus df: a run
    # holds only this batch's postings, so salting a 1k-doc append by a
    # head term's corpus df (ceil(500k/run_size) ways) would shatter tiny
    # runs for nothing. The initial build's df IS its batch df (batch =
    # corpus), so this is the same rule at every lifecycle stage.
    n_salts_t = F.least(
        F.lit(man.n_salts),
        F.ceil(F.col("bdf") / F.lit(float(man.run_size))).cast("int"))
    max_doc_b, batch_n = docs.agg(
        F.max(id_col), F.count(F.lit(1))).collect()[0]
    posts = (
        dt.join(terms_b, "term")
        .join(F.broadcast(batch_terms), "term")
        .select(
            F.pmod(F.xxhash64("doc_id"), F.lit(man.n_shards)).cast("int").alias("shard"),
            F.pmod(F.col("term_id"), F.lit(man.n_buckets)).cast("int").alias("bucket"),
            "term_id",
            "doc_id",
            (
                F.col("idf") * (F.col("tf") * (K1 + 1.0))
                / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(man.avgdl)))
            ).cast("float").alias("w"),
            F.floor(F.col("doc_id") * n_salts_t / F.lit(int(max_doc_b) + 1))
            .cast("int").alias("salt"),
        )
    )
    # a NAMED function (not functools.partial): applyInPandas infers the
    # eval type from the callable and warns on partials — same pattern as
    # index/wand.py's query kernel
    def encode_kernel(pdf):
        return _encode_groups(pdf, block_size=man.block_size,
                              weight_bits=man.weight_bits)

    if int(batch_n) <= man.run_size:
        # every term's batch df <= run_size -> n_salts_t = 1 for all
        # terms, so the salt groupBy would be a no-op partitioning and
        # phase-2 would merge single-run terms. Fuse both kernels into
        # ONE shuffle: encode the (shard,bucket) slice, then run the
        # merge on its output in-process (identity for single runs, so
        # output bytes are identical to the staged path — asserted in
        # test_compact). Micro-batch appends pay 1 shuffle, not 2.
        def fused_kernel(pdf):
            return _merge_groups(encode_kernel(pdf))

        final = posts.groupBy("shard", "bucket").applyInPandas(
            fused_kernel, POSTING_SCHEMA)
    else:
        runs = posts.groupBy("shard", "bucket", "salt").applyInPandas(
            encode_kernel, RUN_SCHEMA)
        final = runs.groupBy("shard", "bucket").applyInPandas(
            _merge_groups, POSTING_SCHEMA)
    out_dir = os.path.join(index_dir, "postings", f"shard_group=append-{batch_id}")
    (final.repartition(man.n_buckets, "bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))

    # doc_stats append + lineage — dl comes from the already-cached dt
    # (re-running doc_tokens would tokenize the whole batch a second time,
    # the measured hot path); zero-token docs are absent from dt, so the
    # left join restores them with dl=0, one output row per input row
    dls = dt.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    (docs.select(F.col(id_col).alias("doc_id"))
     .join(dls, "doc_id", "left")
     .select("doc_id", F.coalesce("dl", F.lit(0)).cast("int").alias("dl"))
     .write.mode("append").parquet(os.path.join(index_dir, "doc_stats")))
    written = spark.read.schema(POSTING_SCHEMA).parquet(out_dir)
    lineage = collect_partition_lineage(written, t0, analyzer.version,
                                        append_batch=batch_id)
    write_lineage(index_dir, f"append-{batch_id}", lineage)
    if _pre_register_hook is not None:
        # test seam: the group dir is fully written but not yet registered
        # as live — where a racing compaction's commit + GC would land
        _pre_register_hook()
    # register the new group as live (LSM liveness, index/compact.py);
    # set-union keeps foreachBatch retries idempotent. Legacy indexes
    # (live_groups=None) stay legacy: all physical dirs remain live.
    # RE-LOAD the manifest first: a compaction that committed while this
    # append ran flipped live_groups/terms_dir, and saving the stale copy
    # loaded at function start would resurrect GC'd groups and drop the
    # compact pointer (the single-writer contract makes this impossible
    # when followed; the reload makes the accidental overlap non-fatal).
    man = IndexManifest.load(index_dir)
    if man.live_groups is not None:
        group = f"append-{batch_id}"
        if group in getattr(man, "retired_groups", []):
            # a compaction absorbed a previous attempt's registration while
            # this retry was re-writing the group dir: the batch is already
            # live inside the compact group. Registering the rewrite would
            # double-count it — drop the dir instead.
            shutil.rmtree(out_dir, ignore_errors=True)
        elif group not in man.live_groups:
            man.live_groups = [*man.live_groups, group]
            man.save(index_dir)
    # if a compaction flipped the terms-dim pointer while this append ran,
    # its terms_v<epoch> coalesce may predate our new-term rows (they were
    # written to the OLD dir at the top of this function) — re-append
    # whatever the current dim is missing. Idempotent: left-anti against
    # the live dim; a no-op in the single-writer case.
    cur_terms_rel = getattr(man, "terms_dir", "terms")
    if cur_terms_rel != start_terms_rel:
        cur_path = os.path.join(index_dir, cur_terms_rel)
        missing = _terms_missing_from(spark.read.parquet(cur_path))
        if missing.take(1):
            cols = spark.read.parquet(cur_path).columns
            missing.select(*cols).write.mode("append").parquet(cur_path)
    # drop tombstones covering re-appended ids (zombie contract — see
    # docstring); after the group is live so a crash in between leaves the
    # doc hidden only until the idempotent retry completes the drop
    from light_splade_spark.index.tombstones import drop_tombstones_for
    drop_tombstones_for(spark, index_dir,
                        docs.select(F.col(id_col).alias("doc_id")))
    dt.unpersist()


def stream_queries(spark: SparkSession, index_dir: str, stream: DataFrame,
                   output_dir: str, checkpoint_dir: str, top_k: int = 10,
                   threshold: float = 0.0, mode: str = "bmw",
                   join_route_threshold: int = JOIN_ROUTE_THRESHOLD):
    """Streaming query evaluation: a stream of (qid, text) rows is evaluated
    against the index per micro-batch, results appended as parquet.
    ``Trigger.AvailableNow`` + checkpoint → each query batch is answered
    exactly once across restarts. foreachBatch is the idiomatic bridge for
    a sink that needs arbitrary DataFrame plans (joins against static
    postings).

    Route guard (ADVICE r4): batches up to ``join_route_threshold`` queries
    take the WAND kernel (collects the query texts to the driver — the
    documented <=10^5 sizing of that route); larger batches stay fully
    distributed through ``score_index_join`` (query side shuffles on
    term_id, never collected), which is rank-identical to WAND on the same
    index. A huge streamed batch therefore degrades to a bigger join, not
    a driver OOM."""
    from light_splade_spark.index.join_scorer import score_index_join
    from light_splade_spark.index.wand import wand_topk

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # one action decides the route AND collects the small case: take()
        # of threshold+1 rows either proves the batch is big (rows beyond
        # the threshold exist) or IS the full batch the wand route needs
        head = batch_df.take(join_route_threshold + 1)
        if not head:
            return
        if len(head) > join_route_threshold:
            out = score_index_join(spark, index_dir,
                                   batch_df.select("qid", "text"),
                                   top_k=top_k, threshold=threshold)
        else:
            qs = [(int(r["qid"]), r["text"]) for r in head]
            out = wand_topk(spark, index_dir, qs, top_k=top_k,
                            threshold=threshold, mode=mode)
        (out.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(output_dir))

    return (
        stream.writeStream
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_append(spark: SparkSession, index_dir: str, stream: DataFrame,
                  checkpoint_dir: str, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Structured Streaming sink: every micro-batch becomes one immutable
    shard group. Returns the started StreamingQuery (AvailableNow trigger:
    drains what exists, then stops — rerun to pick up new files)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_batch(spark, index_dir, batch_df, str(batch_id),
                     id_col=id_col, text_col=text_col)

    return (
        stream.writeStream
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
