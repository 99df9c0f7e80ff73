"""Distributed inverted-index build: doc-sharded, salted two-phase, VByte.

Spark-first design (NOT a port of ``sparse_indexer.py``'s csr vstack):

* The corpus is **document-sharded**: ``shard = pmod(xxhash64(doc_id),
  n_shards)``. Each shard holds a complete mini inverted index over its docs —
  the layout that lets query-time WAND run document-at-a-time per shard with
  a cheap global top-k merge, and the layout that scales to 10^12 docs
  (a term's global posting list never has to exist in one task).
* Within a shard, posting construction is the **salted two-phase merge** the
  skewed head terms require (Zipf: `the` appears in ~every doc — a single
  collect_list per term would OOM one reducer):
    - phase 1: group by (shard, bucket, salt) where ``salt`` is a doc-id
      RANGE bin — each group sorts + delta-VByte-encodes per-term *runs*;
    - phase 2: group by (shard, bucket) — runs of a term are doc-range
      disjoint and ordered by salt, so the external multi-way merge is O(runs)
      concatenation with one delta patch per boundary (vbyte.concat_runs).
* Posting payload carries the **precomputed float32 BM25 impact** w =
  idf(t) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) (reference index dtype is
  float32, ``sparse_indexer.py:47``), so query scoring is Σ qtf·w — exactly
  the reference's sparse dot product (``sparse_retriever.py:78``) with BM25
  weights.
* **Block-max metadata** (last_doc, max_w per <=block_size postings) is
  computed during encoding and stored as parallel arrays for WAND pruning.
* Output parquet is partitioned by ``bucket`` (= term_id % n_buckets) for
  partition pruning at query time: only buckets containing query terms are
  read.
* **Checkpoint resume**: shards are processed in ``n_shard_groups`` batches;
  each batch commits postings parquet + a lineage JSON, then the manifest.
  A restarted build skips completed groups (see manifest.py).
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from light_splade_spark.functions.analyzers import ANALYZER_VERSION, doc_terms
from light_splade_spark.functions.vbyte import concat_runs, encode_run
from light_splade_spark.index.manifest import IndexManifest, write_lineage
from light_splade_spark.plans.bm25_sql import B, K1
from light_splade_spark.plans.stats import with_dense_id

RUN_SCHEMA = (
    "shard INT, bucket INT, term_id BIGINT, salt INT, first_doc BIGINT, "
    "last_doc BIGINT, n BIGINT, run BINARY, bm_last ARRAY<BIGINT>, "
    "bm_max ARRAY<FLOAT>"
)
POSTING_SCHEMA = (
    "shard INT, bucket INT, term_id BIGINT, df BIGINT, max_w FLOAT, "
    "postings BINARY, bm_last ARRAY<BIGINT>, bm_max ARRAY<FLOAT>"
)


def _encode_groups(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """Phase-1 kernel: one (shard,bucket,salt) slice -> per-term encoded runs."""
    shard = int(pdf["shard"].iloc[0])
    bucket = int(pdf["bucket"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    pdf = pdf.sort_values(["term_id", "doc_id"], kind="mergesort")
    tids = pdf["term_id"].to_numpy()
    docs = pdf["doc_id"].to_numpy()
    ws = pdf["w"].to_numpy(dtype=np.float32)
    bounds = np.flatnonzero(np.diff(tids)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [tids.size]))
    rows = []
    for s, e in zip(starts, ends):
        d, w = docs[s:e], ws[s:e]
        n = d.size
        nb = (n + block_size - 1) // block_size
        bm_last = [int(d[min((i + 1) * block_size, n) - 1]) for i in range(nb)]
        bm_max = [float(w[i * block_size: (i + 1) * block_size].max()) for i in range(nb)]
        rows.append(
            (shard, bucket, int(tids[s]), salt, int(d[0]), int(d[-1]), int(n),
             encode_run(d, w), bm_last, bm_max)
        )
    return pd.DataFrame(
        rows, columns=["shard", "bucket", "term_id", "salt", "first_doc",
                       "last_doc", "n", "run", "bm_last", "bm_max"]
    )


def _merge_groups(pdf: pd.DataFrame) -> pd.DataFrame:
    """Phase-2 kernel: one (shard,bucket) slice -> final posting rows.

    Runs per term are salt-ordered and doc-range disjoint; the merge is the
    cheap external concatenation (analog of the reference's two-phase cache
    merge, ``sparse_indexer.py:105-153``, minus the O(n) re-copy)."""
    out = []
    for (shard, bucket, tid), g in pdf.groupby(["shard", "bucket", "term_id"], sort=True):
        g = g.sort_values("salt")
        runs = list(g["run"])
        spans = list(zip(g["first_doc"].astype(int), g["last_doc"].astype(int)))
        merged = concat_runs(runs, spans)
        bm_last = [x for bl in g["bm_last"] for x in bl]
        bm_max = [x for bm in g["bm_max"] for x in bm]
        out.append((int(shard), int(bucket), int(tid), int(g["n"].sum()),
                    float(max(bm_max)), merged, bm_last, bm_max))
    return pd.DataFrame(
        out, columns=["shard", "bucket", "term_id", "df", "max_w", "postings",
                      "bm_last", "bm_max"]
    )


def build_dims(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """-> (doc_terms_df, terms_df, doc_stats_df, scalars dict). One pass over
    the corpus feeds three aggregations; doc_terms is cached for the build."""
    dt = doc_terms(docs, id_col, text_col).cache()
    row = (
        dt.groupBy("doc_id").agg(F.first("dl").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"),
             F.max("doc_id").alias("max_doc")).collect()[0]
    )
    scalars = {"n_docs": int(row["n"]), "avgdl": float(row["avgdl"]),
               "max_doc": int(row["max_doc"])}
    terms = dt.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
    terms = with_dense_id(terms, [F.desc("df"), F.asc("term")], "term_id")
    terms = terms.withColumn(
        "idf",
        F.log(1.0 + (F.lit(float(scalars["n_docs"])) - F.col("df") + 0.5)
              / (F.col("df") + 0.5)),
    )
    doc_stats = dt.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    return dt, terms, doc_stats, scalars


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    n_buckets: int = 16,
    n_salts: int = 8,
    n_shard_groups: int = 4,
    block_size: int = 128,
    run_size: int = 1 << 16,
    resume: bool = False,
    fail_after_group: int | None = None,  # test hook: simulate a crash
) -> IndexManifest:
    """Build (or resume) the inverted index at ``index_dir``."""
    os.makedirs(index_dir, exist_ok=True)
    if resume and os.path.exists(os.path.join(index_dir, "manifest.json")):
        man = IndexManifest.load(index_dir)
        if man.status == "complete":
            return man
    else:
        man = None

    dt, terms, doc_stats, scalars = build_dims(docs, id_col, text_col)
    if man is None:
        man = IndexManifest(
            analyzer_version=ANALYZER_VERSION, k1=K1, b=B,
            n_docs=scalars["n_docs"], avgdl=scalars["avgdl"],
            n_shards=n_shards, n_buckets=n_buckets, run_size=run_size,
            block_size=block_size, n_shard_groups=n_shard_groups,
        )
        man.created_unix = time.time()
        terms.write.mode("overwrite").parquet(os.path.join(index_dir, "terms"))
        doc_stats.write.mode("overwrite").parquet(os.path.join(index_dir, "doc_stats"))
        man.save(index_dir)

    terms_b = F.broadcast(
        spark.read.parquet(os.path.join(index_dir, "terms"))
        .select("term", "term_id", "idf")
    )
    avgdl = man.avgdl
    # impact = idf * saturated tf (float32, reference index dtype)
    posts = (
        dt.join(terms_b, "term")
        .select(
            F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
            F.pmod(F.col("term_id"), F.lit(n_buckets)).cast("int").alias("bucket"),
            "term_id",
            "doc_id",
            (
                F.col("idf") * (F.col("tf") * (K1 + 1.0))
                / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl)))
            ).cast("float").alias("w"),
        )
    )
    # doc-id RANGE salt: runs within a (shard, term) are disjoint + ordered,
    # so phase 2 merges by concatenation.
    max_doc = scalars["max_doc"]
    width = max(1, (max_doc + n_salts) // n_salts)
    posts = posts.withColumn("salt", (F.col("doc_id") / F.lit(width)).cast("int"))

    shards_per_group = (n_shards + n_shard_groups - 1) // n_shard_groups
    phase1 = functools.partial(_encode_groups, block_size=block_size)
    for group in range(n_shard_groups):
        if group in man.completed_groups:
            continue
        lo, hi = group * shards_per_group, min((group + 1) * shards_per_group, n_shards)
        if lo >= hi:
            man.completed_groups.append(group)
            man.save(index_dir)
            continue
        t0 = time.time()
        gposts = posts.where((F.col("shard") >= lo) & (F.col("shard") < hi))
        runs = gposts.groupBy("shard", "bucket", "salt").applyInPandas(
            phase1, RUN_SCHEMA)
        final = runs.groupBy("shard", "bucket").applyInPandas(
            _merge_groups, POSTING_SCHEMA)
        out_dir = os.path.join(index_dir, "postings", f"shard_group={group}")
        final.write.mode("overwrite").partitionBy("bucket").parquet(out_dir)
        # lineage + metrics per (shard, bucket) partition of this group
        written = spark.read.parquet(out_dir)
        lineage = [
            r.asDict()
            for r in written.groupBy("shard", "bucket").agg(
                F.count(F.lit(1)).alias("n_terms"),
                F.sum("df").alias("n_postings"),
                F.sum(F.length("postings")).alias("postings_bytes"),
                F.max("df").alias("max_df"),
            ).orderBy("shard", "bucket").collect()
        ]
        for r in lineage:
            r["wall_sec"] = round(time.time() - t0, 3)
            r["analyzer_version"] = ANALYZER_VERSION
        write_lineage(index_dir, group, lineage)
        man.completed_groups.append(group)
        man.save(index_dir)
        if fail_after_group is not None and group >= fail_after_group:
            raise RuntimeError(f"simulated crash after shard group {group}")
    man.status = "complete"
    man.save(index_dir)
    dt.unpersist()
    return man


def read_postings(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(index_dir, "postings")).parquet(
        os.path.join(index_dir, "postings")
    )


def read_terms(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, "terms"))
