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

import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from light_splade_spark.functions.analyzers import (
    ANALYZER_V1,
    Analyzer,
    resolve_analyzer,
)
from light_splade_spark.functions.vbyte import (
    _write_varint_scalar,
    vbyte_encode_sized,
)
from light_splade_spark.index.manifest import IndexManifest, write_lineage
from light_splade_spark.partitioning import spread_input
from light_splade_spark.plans.bm25_sql import B, K1
from light_splade_spark.plans.stats import with_dense_id

# bump when the on-disk posting blob layout changes (callers may key cache
# directories on it)
INDEX_FORMAT_VERSION = 2

RUN_SCHEMA = (
    "shard INT, bucket INT, term_id BIGINT, salt INT, first_doc BIGINT, "
    "last_doc BIGINT, n BIGINT, dtail BINARY, wblob BINARY, "
    "bm_last ARRAY<BIGINT>, bm_max ARRAY<FLOAT>"
)
POSTING_SCHEMA = (
    "shard INT, bucket INT, term_id BIGINT, df BIGINT, max_w FLOAT, "
    "postings BINARY, bm_last ARRAY<BIGINT>, bm_max ARRAY<FLOAT>"
)


def _block_meta(docs: np.ndarray, ws: np.ndarray, starts: np.ndarray,
                ends: np.ndarray, block_size: int):
    """Vectorized per-segment block metadata: for each segment [s, e) emit
    blocks of <=block_size postings -> (nb_per_seg, bm_last_all, bm_max_all).
    One reduceat over the whole slice instead of a Python loop per block."""
    lens = ends - starts
    nb = (lens + block_size - 1) // block_size
    total = int(nb.sum())
    if total == 0:
        return (nb, np.empty(0, np.int64), np.empty(0, np.float32),
                np.empty(0, np.int64), np.empty(0, np.int64))
    seg_of_block = np.repeat(np.arange(starts.size), nb)
    first_block = np.concatenate(([0], np.cumsum(nb)[:-1]))
    within = (np.arange(total) - first_block[seg_of_block]) * block_size
    bstart = starts[seg_of_block] + within
    bend = np.minimum(bstart + block_size, ends[seg_of_block])
    bm_max = np.maximum.reduceat(ws, bstart)
    # reduceat quirk: if bstart[i] == len-1 boundary fine; segments are
    # contiguous so reduceat(ws, bstart)[i] reduces [bstart[i], bstart[i+1])
    # which equals [bstart[i], bend[i]) because blocks tile the segments.
    bm_last = docs[bend - 1]
    return nb, bm_last, bm_max.astype(np.float32), bstart, bend


def _encode_groups(pdf: pd.DataFrame, block_size: int,
                   weight_bits: int = 32) -> pd.DataFrame:
    """Phase-1 kernel: one (shard,bucket,salt) slice -> per-term encoded runs.

    Fully vectorized: one sort, one bulk VByte encode of every delta in the
    slice, per-term output assembled by buffer slicing. A run's blob is split
    into ``dtail`` (varints of deltas AFTER the first posting) + ``wblob``
    (raw float32 weights); the first doc id travels as a column so the
    phase-2 merge can patch run boundaries without decoding anything.
    """
    shard = int(pdf["shard"].iloc[0])
    bucket = int(pdf["bucket"].iloc[0])
    salt = int(pdf["salt"].iloc[0])
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["term_id"].to_numpy()))
    tids = pdf["term_id"].to_numpy()[order]
    docs = pdf["doc_id"].to_numpy()[order]
    if docs.size and int(docs.min()) < 0:
        # negative ids would produce negative deltas that corrupt silently
        # through the uint64 cast; fail the build early and loudly instead
        raise ValueError(
            f"doc ids must be non-negative for delta+VByte encoding; "
            f"got min doc_id {int(docs.min())} (remap ids, e.g. "
            f"pmod(xxhash64(id), 2^62), before build_index)")
    ws = pdf["w"].to_numpy(dtype=np.float32)[order]
    m = tids.size
    bounds = np.flatnonzero(np.diff(tids)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [m]))
    # tail deltas (per-term diff; values at segment starts are dropped)
    deltas = np.empty(m, dtype=np.int64)
    deltas[1:] = np.diff(docs)
    deltas[starts] = 0  # placeholder, excluded from tails
    is_tail = np.ones(m, dtype=bool)
    is_tail[starts] = False
    tails = deltas[is_tail].astype(np.uint64)
    buf_bytes, sizes = vbyte_encode_sized(tails)
    buf = memoryview(buf_bytes)
    # per-value end offsets in the tail buffer
    offs = np.concatenate(([0], np.cumsum(sizes)))
    # tail index range per term: tail positions are original positions minus
    # the number of segment starts before them
    tail_rank = np.cumsum(is_tail) - is_tail.astype(np.int64)  # rank at pos
    t_lo = tail_rank[starts]
    t_hi = t_lo + (ends - starts - 1)
    nb, bm_last_all, bm_max_all, bstart, bend = _block_meta(
        docs, ws, starts, ends, block_size)
    nb_off = np.concatenate(([0], np.cumsum(nb)))
    if weight_bits == 8:
        if ws.size and float(ws.min()) < 0:
            # quantization maps into [0, block_max]; a negative impact
            # (possible only via weights_df) would be clipped to 0 silently
            raise ValueError(
                "weight_bits=8 requires non-negative impacts; got "
                f"min weight {float(ws.min())} (impact-mode weights must "
                "be >= 0, as SPLADE's log1p(relu(.)) guarantees)")
        # block-relative quantization: q = round(w / block_max * 255);
        # dequant q*scale/255 <= block_max, so the WAND bound stays valid
        scale_pos = np.repeat(bm_max_all, bend - bstart)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.where(scale_pos > 0, ws / scale_pos, 0.0) * 255.0
        wq = np.clip(np.rint(q), 0, 255).astype(np.uint8)
        wbytes = wq.tobytes()
        wwidth = 1
    else:
        wbytes = ws.tobytes()  # little-endian float32
        wwidth = 4
    o_lo, o_hi = offs[t_lo], offs[t_hi]
    # column-wise construction: no per-row tuple materialization
    return pd.DataFrame({
        "shard": np.full(starts.size, shard, dtype=np.int32),
        "bucket": np.full(starts.size, bucket, dtype=np.int32),
        "term_id": tids[starts],
        "salt": np.full(starts.size, salt, dtype=np.int32),
        "first_doc": docs[starts],
        "last_doc": docs[ends - 1],
        "n": (ends - starts).astype(np.int64),
        "dtail": [bytes(buf[a:b]) for a, b in zip(o_lo, o_hi)],
        "wblob": [wbytes[wwidth * s: wwidth * e] for s, e in zip(starts, ends)],
        "bm_last": [bm_last_all[a:b].tolist()
                    for a, b in zip(nb_off[:-1], nb_off[1:])],
        "bm_max": [bm_max_all[a:b].tolist()
                   for a, b in zip(nb_off[:-1], nb_off[1:])],
    })


def _merge_groups(pdf: pd.DataFrame) -> pd.DataFrame:
    """Phase-2 kernel: one (shard,bucket) slice -> final posting rows.

    The external multi-way merge of the salted runs (analog of the
    reference's two-phase cache merge, ``sparse_indexer.py:105-153``): runs of
    a term are doc-range disjoint and salt-ordered, so merging is pure byte
    concatenation — only the boundary delta between consecutive runs is
    (re)encoded. No decompression happens here at any scale."""
    order = np.lexsort((pdf["salt"].to_numpy(), pdf["term_id"].to_numpy()))
    tids = pdf["term_id"].to_numpy()[order]
    firsts = pdf["first_doc"].to_numpy()[order]
    lasts = pdf["last_doc"].to_numpy()[order]
    ns = pdf["n"].to_numpy()[order]
    dtails = pdf["dtail"].to_numpy()[order]
    wblobs = pdf["wblob"].to_numpy()[order]
    bls = pdf["bm_last"].to_numpy()[order]
    bms = pdf["bm_max"].to_numpy()[order]
    shard = int(pdf["shard"].iloc[0])
    bucket = int(pdf["bucket"].iloc[0])
    bounds = np.flatnonzero(np.diff(tids)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [tids.size]))
    # boundary deltas: first_doc of each run minus last_doc of its
    # predecessor within the term (-1 for the first run of a term)
    prev_last = np.empty(tids.size, dtype=np.int64)
    prev_last[0] = -1
    prev_last[1:] = lasts[:-1]
    prev_last[starts] = -1
    bdeltas = firsts - prev_last
    postings_col = []
    bm_last_col = []
    bm_max_col = []
    max_w_col = []
    totals = np.add.reduceat(ns, starts)
    for i, (s, e) in enumerate(zip(starts, ends)):
        if e - s == 1:
            blob = (_write_varint_scalar(int(totals[i]))
                    + _write_varint_scalar(int(bdeltas[s]))
                    + bytes(dtails[s]) + bytes(wblobs[s]))
            bm_l, bm_m = list(bls[s]), list(bms[s])
        else:
            parts = [_write_varint_scalar(int(totals[i]))]
            for j in range(s, e):
                parts.append(_write_varint_scalar(int(bdeltas[j])))
                parts.append(bytes(dtails[j]))
            parts.extend(bytes(w) for w in wblobs[s:e])
            blob = b"".join(parts)
            bm_l = [int(x) for j in range(s, e) for x in bls[j]]
            bm_m = [float(x) for j in range(s, e) for x in bms[j]]
        postings_col.append(blob)
        bm_last_col.append(bm_l)
        bm_max_col.append(bm_m)
        max_w_col.append(max(bm_m))
    return pd.DataFrame({
        "shard": np.full(starts.size, shard, dtype=np.int32),
        "bucket": np.full(starts.size, bucket, dtype=np.int32),
        "term_id": tids[starts],
        "df": totals.astype(np.int64),
        "max_w": np.asarray(max_w_col, dtype=np.float32),
        "postings": postings_col,
        "bm_last": bm_last_col,
        "bm_max": bm_max_col,
    })


def per_doc_expansion(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      analyzer: Analyzer = ANALYZER_V1) -> DataFrame:
    """(doc_id, dl, pairs ARRAY<STRUCT<term,tf>>) — per-doc term frequencies
    with ZERO shuffle.

    Every token of a document lives in its own row, so TF is a row-local
    computation: sort the token array, run-length-encode it with
    higher-order functions (filter/zip_with over element positions) — all
    inside whole-stage codegen. This replaces the explode + corpus-wide
    groupBy(doc_id, term) hash aggregation, whose exchange shuffled one row
    per distinct (doc, term) (~45M rows at 800k docs) and was the largest
    non-posting shuffle in the build. Zero/NULL-token docs keep a row with
    dl=0 and empty pairs (they count toward N and avgdl).

    Each heavy intermediate (token array, SORTED array, start positions)
    is materialized as a column in its own projection before any lambda
    references it — two reasons: a UDF-based analyzer (the wordpiece pandas
    UDF) may not appear inside higher-order-function lambdas at all, and an
    expression (rather than an attribute) referenced inside a lambda is
    re-evaluated PER ELEMENT — an inlined array_sort inside element_at
    turns O(dl log dl) into O(dl² log dl) per doc. CollapseProject keeps
    the stages separate because the aliased arrays are non-cheap and
    multiply referenced (asserted in tests/test_index_build.py)."""
    # tokenize + run-length encode is the build's big narrow span; guard
    # against an under-partitioned scan running it on one task (guide §2.5
    # input skew — no-op when the source is already well-partitioned)
    toked = spread_input(docs).select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(analyzer.spark_tokens(text_col),
                   F.array().cast("array<string>")).alias("_toks"),
    )
    srt = toked.select(
        "doc_id",
        F.size("_toks").alias("dl"),
        F.array_sort("_toks").alias("_st"),
    )
    t = F.col("_st")
    n = F.col("dl")
    idxs = F.when(n >= 1, F.sequence(F.lit(1), n)) \
        .otherwise(F.array().cast("array<int>"))
    started = srt.select(
        "doc_id", "dl", "_st",
        F.filter(idxs, lambda i: (i == F.lit(1))
                 | (F.element_at(t, i) != F.element_at(t, i - 1)))
        .alias("_starts"),
    )
    starts = F.col("_starts")
    nexts = F.concat(F.slice(starts, F.lit(2), F.size(starts)),
                     F.array(n + 1))
    pair_t = "array<struct<term:string,tf:bigint>>"
    pairs = F.when(n >= 1, F.zip_with(
        starts, nexts,
        lambda s, e: F.struct(F.element_at(t, s).alias("term"),
                              (e - s).cast("bigint").alias("tf")))) \
        .otherwise(F.array().cast(pair_t))
    return started.select("doc_id", "dl", pairs.alias("pairs"))


def _explode_expansion(per_doc: DataFrame) -> DataFrame:
    """Nested per-doc expansion -> (doc_id, dl, term, tf) rows (the shape
    the posting build and terms dim consume); zero-token docs drop out here
    exactly as the old explode+groupBy shape dropped them."""
    return (per_doc.select("doc_id", "dl", F.explode("pairs").alias("p"))
            .select("doc_id", "dl", F.col("p.term").alias("term"),
                    F.col("p.tf").alias("tf")))


def build_dims(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
               doc_stats_path: str | None = None, term_id_mode: str = "hash",
               analyzer: Analyzer = ANALYZER_V1,
               expansion_path: str | None = None,
               compute_avgdl: bool = True):
    """-> (doc_terms_df, terms_df, scalars dict).

    One tokenize pass, ZERO wide shuffles: the per-doc expansion is computed
    row-locally (per_doc_expansion — sorted run-length encode, no
    explode+groupBy exchange) and materialized nested as
    (doc_id, dl, pairs) parquet, which is also ~30% smaller than the flat
    (doc, term, tf, dl) rows (doc_id/dl not repeated per term). Σdl rides
    the write via ``DataFrame.observe``; doc_stats is a column-pruned
    projection of the same file (no join — zero-token docs already have
    their dl=0 rows); N/max_doc come from a separate column-pruned count
    scan. The only aggregation left is the vocab-sized terms dim (map-side
    combined to ~|V| rows). The build's one heavy shuffle is then the
    posting-phase (shard, bucket, salt) groupBy itself.

    term_id_mode='hash' (default): term_id = xxhash64(term) — deterministic
    and pass-free; collision odds ~V^2/2^65 (negligible below 10^8 distinct
    terms, detectable via groupBy(term_id) where a deployment cares).
    'dense': df-descending consecutive ids via the scalable Arrow
    zipWithIndex in plans.stats (two extra lightweight jobs).
    """
    import time as _time

    from pyspark.sql import Observation

    _trace = os.environ.get("SPARK_GRAFT_BUILD_TRACE") == "1"
    _t0 = _time.time()

    def _tr(label: str) -> None:
        if _trace:
            print(f"[dims-trace] {label}: {_time.time() - _t0:.2f}s",
                  flush=True)

    per_doc = per_doc_expansion(docs, id_col, text_col, analyzer)
    got = {"sum_dl": None}
    if expansion_path is not None:
        # materialize as a parquet intermediate (SURVEY S11), the only
        # shape that exists at 10^12 docs — a corpus-sized expansion never
        # fits storage memory, while parquet spills to the scratch tier.
        # N / max_doc / Σdl ALL ride this write via Observation (the
        # expansion keeps one row per doc, zero-token docs included), so
        # no separate corpus scan is needed for the scalars.
        obs = Observation("corpus_scalars")
        per_doc.observe(obs, F.sum("dl").alias("sum_dl"),
                        F.count(F.lit(1)).alias("n"),
                        F.max("doc_id").alias("max_doc")) \
            .write.mode("overwrite").parquet(expansion_path)
        got = obs.get
        r0 = {"n": got["n"], "max_doc": got["max_doc"]}
        _tr("expansion_written")
        per_doc = docs.sparkSession.read.parquet(expansion_path)
    else:
        per_doc = per_doc.cache()
        # light scalars scan: column-pruned count + max id over ALL docs
        r0 = docs.agg(F.count(F.lit(1)).alias("n"),
                      F.max(F.col(id_col)).alias("max_doc")).collect()[0]
        _tr("scalars")
    if int(r0["n"] or 0) == 0:
        raise ValueError("cannot build an index over an empty corpus")
    if doc_stats_path is not None:
        # thin projection of the materialized expansion — no join, no agg
        per_doc.select("doc_id", "dl").write.mode("overwrite") \
            .parquet(doc_stats_path)
        _tr("doc_stats_written")
    if got["sum_dl"] is None and (doc_stats_path is not None or compute_avgdl):
        got = {"sum_dl": per_doc.agg(F.sum("dl")).collect()[0][0]}
    dt = _explode_expansion(per_doc)
    scalars = {"n_docs": int(r0["n"]),
               # None (not 0) when not computed: a caller accidentally
               # scoring with this placeholder fails loudly, not silently
               "avgdl": (int(got["sum_dl"] or 0) / int(r0["n"])
                         if (doc_stats_path is not None or compute_avgdl)
                         else None),
               "max_doc": int(r0["max_doc"])}
    terms = (dt.groupBy("term")
             .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
             .withColumn("tid", F.xxhash64("term")))
    if term_id_mode == "dense":
        terms = with_dense_id(terms, [F.desc("df"), F.asc("term")], "term_id")
    else:
        terms = terms.withColumn("term_id", F.col("tid"))
    terms = terms.select(
        "term", "term_id", "tid", "df", "cf",
        F.log(1.0 + (F.lit(float(scalars["n_docs"])) - F.col("df") + 0.5)
              / (F.col("df") + 0.5)).alias("idf"),
    )
    return dt, terms, scalars


def _impact_dims(weights_df: DataFrame, doc_stats_path: str | None = None):
    """Dims for an impact (encoder-weight) index: -> (dt, terms, scalars).

    dt = (doc_id, term, weight float32); dl here = nonzero terms per doc
    (recorded for stats/lineage — impact scoring never reads dl/avgdl).
    Mirrors build_dims' one-job Observation trick for the scalars."""
    from pyspark.sql import Observation

    dt = weights_df.select(
        "doc_id", "term", F.col("weight").cast("float").alias("weight")
    ).cache()
    doc_stats = dt.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    obs = Observation("impact_scalars")
    doc_stats = doc_stats.observe(
        obs, F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"),
        F.max("doc_id").alias("max_doc"))
    if doc_stats_path is not None:
        doc_stats.write.mode("overwrite").parquet(doc_stats_path)
        got = obs.get
    else:
        r = doc_stats.agg(F.count(F.lit(1)).alias("n"),
                          F.avg("dl").alias("avgdl"),
                          F.max("doc_id").alias("max_doc")).collect()[0]
        got = {"n": r["n"], "avgdl": r["avgdl"], "max_doc": r["max_doc"]}
    if got["n"] is None or int(got["n"]) == 0:
        raise ValueError("cannot build an index over empty weights")
    scalars = {"n_docs": int(got["n"]), "avgdl": float(got["avgdl"]),
               "max_doc": int(got["max_doc"])}
    terms = (
        dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        .withColumn("cf", F.lit(None).cast("bigint"))
        .withColumn("tid", F.xxhash64("term"))
        .withColumn("term_id", F.col("tid"))
        .select(
            "term", "term_id", "tid", "df", "cf",
            F.log(1.0 + (F.lit(float(scalars["n_docs"])) - F.col("df") + 0.5)
                  / (F.col("df") + 0.5)).alias("idf"),
        )
    )
    return dt, terms, scalars


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int | None = None,
    n_buckets: int = 16,
    n_salts: int = 8,
    n_shard_groups: int = 4,
    block_size: int = 128,
    run_size: int = 1 << 16,
    weight_bits: int = 32,
    resume: bool = False,
    analyzer: Analyzer = ANALYZER_V1,
    weights_df: DataFrame | None = None,
    fail_after_group: int | None = None,  # test hook: simulate a crash
) -> IndexManifest:
    """Build (or resume) the inverted index at ``index_dir``.

    ``analyzer`` picks the tokenizer (default ASCII v1; ANALYZER_V2_CJK for
    Japanese/CJK corpora, matching the reference's Japanese-first data). Its
    version is pinned in the manifest; a resumed build re-resolves the
    analyzer from the manifest so a resume can never mix tokenizations.

    ``weights_df`` (doc_id, term, weight) switches the index to IMPACT
    scoring (manifest ``scoring="impact"``): the stored float32 impact is
    the provided weight verbatim — the SPLADE deployment path, fed by
    ``splade_expansion(docs, encoder=...)`` with a real model behind the
    encoder seam (reference ``models/splade.py:196-269``). Query-side, pass
    ``query_weights`` to ``wand_topk``. All scale machinery (sharding,
    salting, two-phase merge, block-max, resume) is identical; a resumed
    impact build must be given the same ``weights_df`` again.
    """
    trace = os.environ.get("SPARK_GRAFT_BUILD_TRACE") == "1"
    _t0 = time.time()

    def _tr(label: str) -> None:
        if trace:
            print(f"[build-trace] {label}: {time.time() - _t0:.2f}s",
                  flush=True)

    os.makedirs(index_dir, exist_ok=True)
    if resume and os.path.exists(os.path.join(index_dir, "manifest.json")):
        man = IndexManifest.load(index_dir)
        if man.status == "complete":
            return man
        # resolve_analyzer: also reconstructs a vocab-driven (wordpiece)
        # analyzer from the vocab file persisted in the index dir
        analyzer = resolve_analyzer(man.analyzer_version, index_dir)
        if (man.scoring == "impact") != (weights_df is not None):
            raise ValueError(
                f"resume scoring mismatch: manifest says {man.scoring!r} "
                f"but weights_df is {'set' if weights_df is not None else 'absent'}")
    else:
        man = None

    doc_stats_future = None
    if weights_df is None:
        expansion_path = os.path.join(index_dir, "_expansion")
        dt, terms, scalars = build_dims(
            docs, id_col, text_col,
            doc_stats_path=None,  # written below, overlapped (guide §2.6)
            analyzer=analyzer,
            expansion_path=expansion_path,
            compute_avgdl=man is None,  # resume reads avgdl from manifest
        )
        scoring = "bm25"
        if man is None:
            # doc_stats is an independent column-pruned projection of the
            # materialized expansion with its own output dir — submit it
            # from a driver thread so it back-fills executors behind the
            # terms and posting jobs instead of serializing before them
            # (guide §2.6, overlap independent jobs); joined before the
            # manifest commits "complete"
            from concurrent.futures import ThreadPoolExecutor

            _ds_pool = ThreadPoolExecutor(max_workers=1)
            _spark_ref = docs.sparkSession

            def _write_doc_stats(path=os.path.join(index_dir, "doc_stats"),
                                 src=expansion_path):
                (_spark_ref.read.parquet(src).select("doc_id", "dl")
                 .write.mode("overwrite").parquet(path))

            doc_stats_future = _ds_pool.submit(_write_doc_stats)
            _ds_pool.shutdown(wait=False)
    else:
        dt, terms, scalars = _impact_dims(
            weights_df,
            doc_stats_path=os.path.join(index_dir, "doc_stats") if man is None else None,
        )
        scoring = "impact"
    if man is None:
        if n_shards is None:
            # target ~25k docs per shard: shard count grows with the corpus
            # (constant per-shard memory), capped to keep tiny corpora sane
            n_shards = max(4, min(scalars["n_docs"] // 25000, 4096))
        man = IndexManifest(
            analyzer_version=analyzer.version, k1=K1, b=B,
            n_docs=scalars["n_docs"], avgdl=scalars["avgdl"],
            n_shards=n_shards, n_buckets=n_buckets, run_size=run_size,
            block_size=block_size, n_shard_groups=n_shard_groups,
            n_salts=n_salts, weight_bits=weight_bits, scoring=scoring,
        )
        man.created_unix = time.time()
        holder = getattr(analyzer.spark_tokens, "backend_holder", None)
        if holder is not None:
            # wp4 family only (the MeCab analyzer has no py/hf backend):
            # record the backend the tokenizer UDF actually PINNED when its
            # plan was built (functions/wordpiece.py ships the driver's
            # decision in the closure); fall back to a fresh resolution
            # only if no tokenization plan has been constructed yet
            from light_splade_spark.functions.wordpiece import (
                resolve_backend_name,
            )
            man.wordpiece_backend = (holder.get("backend")
                                     or resolve_backend_name())
        _tr("dims")
        terms.write.mode("overwrite").parquet(os.path.join(index_dir, "terms"))
        _tr("terms_written")
        man.save(index_dir)
        if getattr(analyzer, "vocab", None):
            # vocab-driven (wordpiece) analyzer: persist the vocab inside
            # the index so any process can resolve the tokenizer from the
            # index dir alone (functions/wordpiece.py)
            from light_splade_spark.functions.wordpiece import save_vocab
            save_vocab(index_dir, analyzer)
    n_shards = man.n_shards

    terms_b = F.broadcast(
        spark.read.parquet(os.path.join(index_dir, "terms"))
        .select("term", "term_id", "idf", "df")
    )
    avgdl = man.avgdl
    max_doc = scalars["max_doc"]
    # df-aware doc-id RANGE salt: only head terms fan out into multiple runs
    # (ceil(df / run_size), capped at n_salts); tail terms stay single-run so
    # the run-row count is ~vocab-sized, not vocab*salts. Runs within a
    # (shard, term) stay disjoint + salt-ordered, so phase 2 merges by
    # concatenation.
    n_salts_t = F.least(
        F.lit(n_salts),
        F.ceil(F.col("df") / F.lit(float(run_size))).cast("int"),
    )
    if scoring == "impact":
        # impact = the encoder weight, float32 verbatim
        w_col = F.col("weight").cast("float").alias("w")
    else:
        # impact = idf * saturated tf (float32, reference index dtype)
        w_col = (
            F.col("idf") * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.lit(avgdl)))
        ).cast("float").alias("w")
    posts = (
        dt.join(terms_b, "term")
        .select(
            F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
            F.pmod(F.col("term_id"), F.lit(n_buckets)).cast("int").alias("bucket"),
            "term_id",
            "doc_id",
            w_col,
            F.floor(F.col("doc_id") * n_salts_t / F.lit(max_doc + 1))
            .cast("int").alias("salt"),
        )
    )

    shards_per_group = (n_shards + n_shard_groups - 1) // n_shard_groups
    wb = man.weight_bits

    # named function, not functools.partial: applyInPandas warns ("cannot
    # infer eval type") on partials, polluting every build log
    def phase1(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_groups(pdf, block_size=block_size, weight_bits=wb)
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
        # coalesce to one writer task per bucket dir before the partitioned
        # write: without this every shuffle task writes every bucket ->
        # O(tasks * buckets) tiny files and a long driver-side commit
        # sortWithinPartitions(term_id): clusters each bucket file's row
        # groups by term id, so interactive queries' parquet min/max
        # pruning skips most row groups (the isin route); negligible cost —
        # the per-bucket rows are already in one task
        (final.repartition(n_buckets, "bucket")
         .sortWithinPartitions("term_id", "shard")  # total order: stable bytes
         .write.mode("overwrite").partitionBy("bucket").parquet(out_dir))
        _tr(f"group{group}_postings_written")
        # lineage + metrics per (shard, bucket) partition of this group.
        # Explicit schema: a shard group whose doc range holds no postings
        # (tiny corpora, sparse tails) writes zero data files, and
        # schema inference would fail on the empty directory
        written = spark.read.schema(POSTING_SCHEMA).parquet(out_dir)
        lineage = collect_partition_lineage(written, t0, analyzer.version)
        write_lineage(index_dir, group, lineage)
        _tr(f"group{group}_lineage_done")
        man.completed_groups.append(group)
        man.save(index_dir)
        if fail_after_group is not None and group >= fail_after_group:
            raise RuntimeError(f"simulated crash after shard group {group}")
    if doc_stats_future is not None:
        # doc_stats must be on disk before the manifest says "complete"
        # (target-restriction and compaction read it); propagate any write
        # failure as a build failure exactly as the serial form did
        doc_stats_future.result()
    man.status = "complete"
    # initial live set = the groups this build wrote (LSM liveness;
    # index/compact.py). Empty groups never wrote a dir — harmless either
    # way, the liveness filter is an allow-list over partition values.
    man.live_groups = [str(g) for g in sorted(man.completed_groups)]
    man.save(index_dir)
    if weights_df is None:
        # the expansion parquet was a build-time intermediate only
        import shutil as _shutil
        _shutil.rmtree(os.path.join(index_dir, "_expansion"),
                       ignore_errors=True)
    else:
        dt.unpersist()
    return man


def collect_partition_lineage(written: DataFrame, t0: float,
                              analyzer_version: str, **extra) -> list[dict]:
    """Per-(shard, bucket) lineage/metrics rows for a just-written posting
    group — the one aggregation shape shared by build, append, and compact
    (manifest.write_lineage consumers)."""
    # driver-side sort instead of .orderBy(): the result is at most
    # shards x buckets rows, and a distributed orderBy adds a range-
    # partitioner sampling pass + an extra exchange to every group commit
    rows = sorted(
        (r.asDict() for r in written.groupBy("shard", "bucket").agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").alias("n_postings"),
            F.sum(F.length("postings")).alias("postings_bytes"),
            F.max("df").alias("max_df"),
        ).collect()),
        key=lambda r: (r["shard"], r["bucket"]))
    for r in rows:
        r["wall_sec"] = round(time.time() - t0, 3)
        r["analyzer_version"] = analyzer_version
        r.update(extra)
    return rows


def read_postings(spark: SparkSession, index_dir: str,
                  live_groups: list[str] | None = None) -> DataFrame:
    # explicit schema (data columns + partition columns): an index whose
    # every doc was tombstoned compacts to a group with zero parquet part
    # files, and schema inference would fail on it — the correct behavior
    # is empty results, not a bricked index (tests/test_compact.py)
    df = (spark.read
          .schema(POSTING_SCHEMA + ", shard_group STRING")
          .option("basePath", os.path.join(index_dir, "postings"))
          .parquet(os.path.join(index_dir, "postings")))
    # LSM liveness (index/compact.py): a manifest carrying live_groups
    # restricts readers to those shard_group partitions, which is what
    # makes the compactor's manifest write an atomic commit (orphan dirs
    # from a crashed GC are invisible). Partition pruning still applies:
    # shard_group is a partition column, so the isin is a directory filter.
    # ``live_groups`` overrides the manifest's set — the compactor passes
    # its decode snapshot here so the groups it folds and the groups it
    # later subtracts from the commit are THE SAME list by construction.
    if live_groups is None:
        man = IndexManifest.load(index_dir)
        live_groups = man.live_groups
    if live_groups is not None:
        df = df.where(F.col("shard_group").cast("string")
                      .isin([str(g) for g in live_groups]))
    return df


def terms_path(index_dir: str) -> str:
    """Current terms-dim directory — the manifest's pointer (compaction
    rewrites terms into terms_v<epoch> and flips it atomically)."""
    man = IndexManifest.load(index_dir)
    return os.path.join(index_dir, getattr(man, "terms_dir", "terms"))


def read_terms(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(terms_path(index_dir))
