"""Block-max WAND top-k query engine over the sharded VByte index.

Query flow (SURVEY.md §3.3 performance path):

1. Tokenize the query batch driver-side (a query batch is tiny by nature).
2. Resolve term -> term_id from the `terms` dim with a pushed-down filter.
3. Scan `postings` with ``bucket IN (query buckets) AND term_id IN (query
   term ids)`` — bucket is a parquet partition column, so non-query buckets
   are pruned at the file-listing level; term_id hits parquet min/max.
4. ``groupBy(shard).applyInPandas(kernel)`` — each shard holds a complete
   mini-index over its documents, so per-shard scoring is exact and shards
   are embarrassingly parallel (the 1000-executor story).
5. Global top-k merge: per-qid window over (rounded score DESC, doc_id ASC) —
   at most shards * k rows per query reach the final merge.

The kernel is **document-at-a-time with block-max pruning**, vectorized:
block boundaries of all query terms partition doc-id space into elementary
intervals; each interval's score upper bound is the sum of covering blocks'
max impacts * qtf. Intervals are processed in descending upper-bound order,
scoring is exact numpy (unique + bincount), and iteration stops once the
bound falls below the running k-th best score minus the rounding guard —
identical results to exhaustive scoring (reference semantics,
``sparse_retriever.py:78-96``), without decoding cold blocks.

Scores: Σ qtf * w  with w the float32 impact stored at build time; rounded to
SCORE_DECIMALS with deterministic (score DESC, doc_id ASC) tie-break, matching
plans/bm25_sql.py.
"""

from __future__ import annotations

import heapq
import os
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from light_splade_spark.functions.analyzers import resolve_analyzer
from light_splade_spark.functions.vbyte import decode_run
from light_splade_spark.index.build import read_postings, read_terms
from light_splade_spark.index.manifest import IndexManifest
from light_splade_spark.plans.bm25_sql import SCORE_DECIMALS

_GUARD = 10.0 ** (-SCORE_DECIMALS)  # rounding guard for the prune bound


def _score_shard(
    pdf: pd.DataFrame,
    qplan: dict[int, list[tuple[int, float]]],
    top_k: int,
    threshold: float,
    mode: str,
    target_docs: np.ndarray | None = None,
    weight_bits: int = 32,
    block_size: int = 128,
    excluded_docs: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact per-shard top-k for every query. pdf: posting rows of ONE shard
    restricted to query terms. ``target_docs`` (sorted int64) restricts
    scoring to a doc subset at decode time — the reference's row-gather
    (sparse_indexer.py:163-168) pushed into the kernel instead of filtering
    a full-corpus result. ``excluded_docs`` (sorted int64) removes docs at
    decode time — the tombstone-delete read path (index/tombstones.py)."""
    raw: dict[int, list] = {}
    for r in pdf.itertuples(index=False):
        docs, ws = decode_run(bytes(r.postings), weight_bits=weight_bits)
        if weight_bits == 8:
            # dequantize against per-block maxima: block end positions are
            # recoverable from bm_last (doc ids are strictly ascending)
            bm_last = np.asarray(r.bm_last, dtype=np.int64)
            bm_max = np.asarray(r.bm_max, dtype=np.float32)
            ends = np.searchsorted(docs, bm_last, side="right")
            sizes = np.diff(np.concatenate(([0], ends)))
            scale = np.repeat(bm_max, sizes)
            ws = (ws.astype(np.float32) / 255.0) * scale
        keep = None
        if target_docs is not None:
            keep = np.isin(docs, target_docs, assume_unique=False)
        if excluded_docs is not None and excluded_docs.size:
            drop = np.isin(docs, excluded_docs, assume_unique=False)
            if drop.any():
                keep = ~drop if keep is None else (keep & ~drop)
        if keep is not None:
            docs, ws = docs[keep], ws[keep]
            if docs.size == 0:
                continue
            # block meta no longer matches the filtered list; rebuild
            bs = block_size
            bstart = np.arange(0, docs.size, bs)
            bm_max = np.maximum.reduceat(ws, bstart).astype(np.float32)
            bm_last = docs[np.minimum(bstart + bs - 1, docs.size - 1)]
            raw.setdefault(int(r.term_id), []).append((docs, ws, bm_last, bm_max))
            continue
        raw.setdefault(int(r.term_id), []).append(
            (docs, ws, np.asarray(r.bm_last, dtype=np.int64),
             np.asarray(r.bm_max, dtype=np.float32)))
    decoded: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = {}
    for tid, rows in raw.items():
        if len(rows) == 1:
            decoded[tid] = rows[0]
            continue
        # multiple posting rows per (shard, term): appended shard groups
        # (streaming/incremental) — merge-sort by doc id and rebuild block
        # metadata over the merged list
        docs = np.concatenate([r[0] for r in rows])
        ws = np.concatenate([r[1] for r in rows])
        order = np.argsort(docs, kind="mergesort")
        docs, ws = docs[order], ws[order]
        bs = block_size
        bstart = np.arange(0, docs.size, bs)
        bm_max = np.maximum.reduceat(ws, bstart).astype(np.float32)
        bm_last = docs[np.minimum(bstart + bs - 1, docs.size - 1)]
        decoded[tid] = (docs, ws, bm_last, bm_max)
    if len(qplan) >= 64 and target_docs is None:
        # large batches: per-query block-max pruning stops paying (the
        # batch touches most postings anyway) while per-query concat+unique
        # dominates. Switch to the shared-structure exact scorer: one
        # local-index precompute per term, one scatter-add per (query,term).
        return _taat_shared(decoded, qplan, top_k, threshold)
    out_q, out_d, out_s = [], [], []
    for qid, tlist in qplan.items():
        terms = [(qtf, *decoded[tid]) for tid, qtf in tlist if tid in decoded]
        if not terms:
            continue
        if mode == "taat" or len(terms) == 1:
            docs, scores = _taat(terms)
        else:
            docs, scores = _bmw(terms, top_k)
        # pre-filter with the rounding guard; the exact (rounded) threshold
        # semantics are enforced after the global round in wand_topk
        keep = scores >= threshold - _GUARD
        docs, scores = docs[keep], scores[keep]
        k = top_k if top_k and top_k > 0 else docs.size
        if docs.size > k:
            # per-shard cut must agree with the GLOBAL order, which ranks on
            # round(score, SCORE_DECIMALS) with doc_id tie-break. Cutting on
            # raw scores could drop a lower-doc_id doc whose raw score is a
            # hair below a same-rounded higher-id doc. So: keep every doc
            # whose ROUNDED score ties or beats the k-th largest rounded
            # score (ties kept; the global window resolves them by doc_id).
            r = np.round(scores, SCORE_DECIMALS)
            kth = np.partition(r, r.size - k)[r.size - k]
            keep2 = r >= kth
            docs, scores = docs[keep2], scores[keep2]
        out_q.extend([qid] * docs.size)
        out_d.extend(docs.tolist())
        out_s.extend(scores.tolist())
    return pd.DataFrame({"qid": out_q, "doc_id": out_d, "score": out_s})


def _taat_shared(decoded, qplan, top_k: int, threshold: float) -> pd.DataFrame:
    """Exact batch scorer with shared per-term structure (semantics
    identical to _taat per query; exercised vs the per-query route in
    tests/test_wand_kernel.py).

    Per shard: map every decoded posting's doc id to a local dense index
    ONCE per term (searchsorted against the union doc list), then each
    query is a scatter-add into a reusable accumulator + a gather of its
    touched slots — O(matched postings) per query with no per-query
    concat/unique over raw ids. This is what makes 10^3-10^4-query batches
    CPU-cheap; the per-query block-max path remains for interactive use."""
    if not decoded:
        return pd.DataFrame({"qid": [], "doc_id": [], "score": []})
    all_docs = np.unique(np.concatenate([d[0] for d in decoded.values()]))
    local: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for tid, (docs, ws, _, _) in decoded.items():
        local[tid] = (np.searchsorted(all_docs, docs),
                      ws.astype(np.float64))
    acc = np.zeros(all_docs.size, dtype=np.float64)
    out_q, out_d, out_s = [], [], []
    for qid, tlist in qplan.items():
        idxs = []
        for tid, qtf in tlist:
            ent = local.get(tid)
            if ent is None:
                continue
            idx, w = ent
            acc[idx] += w * float(qtf)  # idx unique per term -> safe
            idxs.append(idx)
        if not idxs:
            continue
        touched = (np.unique(np.concatenate(idxs)) if len(idxs) > 1
                   else idxs[0])
        scores = acc[touched].copy()
        acc[touched] = 0.0  # O(touched) reset, accumulator reused
        docs_t = all_docs[touched]
        keep = scores >= threshold - _GUARD
        docs_t, scores = docs_t[keep], scores[keep]
        k = top_k if top_k and top_k > 0 else docs_t.size
        if docs_t.size > k:
            r = np.round(scores, SCORE_DECIMALS)
            kth = np.partition(r, r.size - k)[r.size - k]
            keep2 = r >= kth
            docs_t, scores = docs_t[keep2], scores[keep2]
        out_q.extend([qid] * docs_t.size)
        out_d.extend(docs_t.tolist())
        out_s.extend(scores.tolist())
    return pd.DataFrame({"qid": out_q, "doc_id": out_d, "score": out_s})


def _taat(terms) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive vectorized term-at-a-time scoring (parity baseline)."""
    all_docs = np.concatenate([t[1] for t in terms])
    all_w = np.concatenate([
        t[2].astype(np.float64) * float(t[0]) for t in terms
    ])
    docs, inv = np.unique(all_docs, return_inverse=True)
    scores = np.bincount(inv, weights=all_w)
    return docs, scores


def _bmw(terms, top_k: int) -> tuple[np.ndarray, np.ndarray]:
    """Block-max pruned document-at-a-time scoring over elementary intervals.

    Exact: intervals partition doc-id space; a doc's full score lives in one
    interval. Pruning skips intervals whose summed block-max bound cannot
    reach the current k-th best score (minus the rounding guard)."""
    # elementary interval boundaries = union of all terms' block last-docs
    uppers = np.unique(np.concatenate([t[3] for t in terms]))  # sorted
    n_int = uppers.size
    ub = np.zeros(n_int, dtype=np.float64)
    per_term_block = []
    for qtf, docs, ws, bm_last, bm_max in terms:
        # which block of this term covers each interval (by interval upper)
        blk = np.searchsorted(bm_last, uppers, side="left")
        valid = blk < bm_last.size
        contrib = np.zeros(n_int, dtype=np.float64)
        # interval must start after previous block's last doc to overlap blk;
        # conservative bound: use the covering block's max (0 beyond list end)
        contrib[valid] = bm_max[blk[valid]].astype(np.float64) * float(qtf)
        ub += contrib
        per_term_block.append(blk)
    order = np.argsort(-ub, kind="stable")
    cand_docs: list[np.ndarray] = []
    cand_scores: list[np.ndarray] = []
    heap: list[float] = []  # min-heap of top_k scores seen
    kth = -np.inf
    if not top_k or top_k <= 0:
        top_k = 0
    lowers = np.concatenate(([np.int64(-1)], uppers[:-1]))
    for ii in order:
        if top_k and len(heap) >= top_k and ub[ii] < kth - _GUARD:
            break
        lo, hi = int(lowers[ii]), int(uppers[ii])
        seg_docs = []
        seg_w = []
        for (qtf, docs, ws, _, _), _blk in zip(terms, per_term_block):
            a = np.searchsorted(docs, lo, side="right")
            b = np.searchsorted(docs, hi, side="right")
            if b > a:
                seg_docs.append(docs[a:b])
                seg_w.append(ws[a:b].astype(np.float64) * float(qtf))
        if not seg_docs:
            continue
        d = np.concatenate(seg_docs)
        w = np.concatenate(seg_w)
        u, inv = np.unique(d, return_inverse=True)
        s = np.bincount(inv, weights=w)
        cand_docs.append(u)
        cand_scores.append(s)
        if top_k:
            for val in s:
                if len(heap) < top_k:
                    heapq.heappush(heap, float(val))
                elif val > heap[0]:
                    heapq.heapreplace(heap, float(val))
            if len(heap) >= top_k:
                kth = heap[0]
    if not cand_docs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return np.concatenate(cand_docs), np.concatenate(cand_scores)


# per-process cache of term -> term_id lookups, keyed by index identity
# (terms dir mtime changes when incremental append adds new term files);
# only ever holds terms that queries actually asked for
_TERMS_CACHE: dict[tuple[str, float], dict[str, int | None]] = {}


def build_query_plan(
    spark: SparkSession, index_dir: str,
    queries: list[tuple[int, str]] | None = None,
    query_weights: list[tuple[int, dict[str, float]]] | None = None,
) -> tuple[dict[int, list[tuple[int, float]]], list[int], list[int]]:
    """-> (qid -> [(term_id, qweight)], term_ids, buckets).

    ``queries`` = (qid, text) pairs tokenized with the index's pinned
    analyzer, weight = term frequency (BM25 scoring). ``query_weights`` =
    (qid, {term: weight}) — the encoder seam's query side: weights come from
    a model (e.g. ``splade_expansion(encoder=...)`` on the query text) and
    are used verbatim, matching the reference's query-CSR dot product
    (``sparse_retriever.py:78``)."""
    import os as _os

    if (queries is None) == (query_weights is None):
        raise ValueError("pass exactly one of queries / query_weights")
    man = IndexManifest.load(index_dir)
    # resolve the analyzer the index was built with (raises on unknown
    # versions — tokenization must be identical on both sides)
    ana = resolve_analyzer(man.analyzer_version, index_dir)
    if query_weights is not None:
        qmaps: list[tuple[int, dict[str, float]]] = [
            (qid, dict(m)) for qid, m in query_weights]
        for qid, m in qmaps:
            neg = [t for t, w in m.items() if w < 0]
            if neg:
                # block-max pruning bounds assume non-negative query
                # weights (as SPLADE's log1p∘relu guarantees); a negative
                # weight would silently void the _bmw upper bound
                raise ValueError(
                    f"query {qid} has negative weights for terms {neg[:3]}; "
                    "query weights must be >= 0 (WAND bounds require it)")
    else:
        qmaps = [(qid, dict(Counter(ana.py_tokenize(text))))
                 for qid, text in queries]
    vocab_needed = sorted({t for _, m in qmaps for t in m})
    tmap = resolve_term_ids(spark, index_dir, vocab_needed, man=man)
    qplan: dict[int, list[tuple[int, float]]] = {}
    for qid, counts in qmaps:
        lst = [(tmap[t], c) for t, c in sorted(counts.items()) if t in tmap]
        if lst:
            qplan[qid] = lst
    tids = sorted({tid for lst in qplan.values() for tid, _ in lst})
    buckets = sorted({tid % man.n_buckets for tid in tids})
    return qplan, tids, buckets


def resolve_term_ids(
    spark: SparkSession, index_dir: str, terms: list[str],
    man: IndexManifest | None = None,
) -> dict[str, int]:
    """term -> term_id for the given ALREADY-ANALYZED terms, through the
    per-process ``_TERMS_CACHE`` (absent terms are cached as absent and
    omitted from the result). One pushed-down terms-dim lookup per cache
    miss set; zero Spark jobs on a warm cache — shared by the WAND query
    planner and the conjunctive/NOT routes (index/phrase.py), which need
    literal ids to keep posting-scan pruning."""
    import os as _os

    if man is None:
        man = IndexManifest.load(index_dir)
    # resolve the terms dir from the manifest directly (terms_path() would
    # re-read manifest.json on every call)
    tdir = _os.path.join(index_dir, getattr(man, "terms_dir", "terms"))
    key = (index_dir, _os.path.getmtime(tdir))
    # evict keys of superseded terms-dir versions for this index: each
    # append/compaction changes the key, and a long-running server would
    # otherwise strand one dead vocab dict per epoch
    for k in [k for k in _TERMS_CACHE if k[0] == index_dir and k != key]:
        del _TERMS_CACHE[k]
    cached = _TERMS_CACHE.setdefault(key, {})
    missing = [t for t in terms if t not in cached]
    if missing:
        terms_df = read_terms(spark, index_dir)
        if len(missing) > 256:
            # a giant isin literal costs seconds of driver-side Catalyst/
            # codegen work (serial!); for big query batches ship the term
            # list as a broadcast semi-join instead
            mdf = spark.createDataFrame([(t,) for t in missing],
                                        "term STRING")
            matched = terms_df.join(F.broadcast(mdf), "term", "left_semi")
        else:
            matched = terms_df.where(F.col("term").isin(missing))
        found = {
            r["term"]: int(r["term_id"])
            for r in matched.select("term", "term_id").collect()
        }
        for t in missing:
            cached[t] = found.get(t)  # None = known-absent, cached too
    return {t: cached[t] for t in terms if cached[t] is not None}


# interactive point queries skip Spark job scheduling entirely (see
# _wand_local); batches above this go through the distributed plan
LOCAL_PATH_MAX_QUERIES = 4

_RESULT_SCHEMA = "qid BIGINT, rank INT, doc_id BIGINT, score DOUBLE"


def _round_half_up(x: float, decimals: int = SCORE_DECIMALS) -> float:
    """Replicates Spark's F.round on DOUBLE: java BigDecimal.valueOf(d)
    (shortest decimal repr, same as Python repr) + HALF_UP."""
    import decimal
    q = decimal.Decimal(1).scaleb(-decimals)
    return float(decimal.Decimal(repr(x)).quantize(
        q, rounding=decimal.ROUND_HALF_UP))


def _wand_local(spark, index_dir, qplan, tids, buckets, top_k, threshold,
                mode, target, man, excluded=None) -> DataFrame:
    """Driver-local execution of the SAME shard kernel for point queries.

    A 1-4 query lookup against a built index is dominated by Spark job
    scheduling (two stages + a Python-worker round trip ≈ 0.6 s at sf0.1),
    not by work: the posting rows it touches are a few MB. This path reads
    exactly those rows with a pyarrow dataset filter (hive partition
    pruning on bucket + parquet row-group stats on term_id — the same
    pruning the distributed scan does), runs ``_score_shard`` per shard
    in-process, and applies the identical round/threshold/rank semantics
    (HALF_UP like F.round, score DESC / doc_id ASC). Rank-identity with
    the distributed plan is asserted in tests/test_wand_kernel.py and
    gate-checked by Q:wand_point. Scale story: cost ∝ query-term posting
    bytes, independent of corpus partitions — the same reason a serving
    layer reads an index directly instead of launching a job."""
    import pyarrow as pa
    import pyarrow.dataset as pds

    # explicit string-typed shard_group: hive inference would type an
    # all-numeric group set as int, breaking the liveness isin below
    part = pds.partitioning(
        pa.schema([("shard_group", pa.string()), ("bucket", pa.int32())]),
        flavor="hive")
    data = pds.dataset(os.path.join(index_dir, "postings"),
                       partitioning=part)
    if not data.files:
        # fully-tombstoned index compacted to an empty group: no parquet
        # fragments at all -> empty result, not a schema error
        return spark.createDataFrame([], _RESULT_SCHEMA)
    flt = pds.field("bucket").isin(buckets) & pds.field("term_id").isin(tids)
    if man.live_groups is not None:
        # LSM liveness (index/compact.py) — same allow-list the
        # distributed read_postings applies
        flt = flt & pds.field("shard_group").isin(
            [str(g) for g in man.live_groups])
    tab = data.to_table(
        filter=flt,
        columns=["shard", "term_id", "postings", "bm_last", "bm_max"])
    pdf = tab.to_pandas()
    parts = []
    for _, g in pdf.groupby("shard", sort=False):
        parts.append(_score_shard(g, qplan=qplan, top_k=top_k,
                                  threshold=threshold, mode=mode,
                                  target_docs=target,
                                  weight_bits=man.weight_bits,
                                  block_size=man.block_size,
                                  excluded_docs=excluded))
    if parts:
        hits = pd.concat(parts, ignore_index=True)
    else:
        hits = pd.DataFrame({"qid": [], "doc_id": [], "score": []})
    if len(hits):
        hits["score"] = hits["score"].map(_round_half_up)
        hits = hits[hits["score"] >= threshold]
        hits = hits.sort_values(["qid", "score", "doc_id"],
                                ascending=[True, False, True],
                                kind="mergesort")
        hits["rank"] = hits.groupby("qid").cumcount() + 1
        if top_k and top_k > 0:
            hits = hits[hits["rank"] <= top_k]
    else:
        hits["rank"] = []
    out = pd.DataFrame({
        "qid": hits["qid"].astype("int64"),
        "rank": hits["rank"].astype("int32") if len(hits)
        else pd.Series([], dtype="int32"),
        "doc_id": hits["doc_id"].astype("int64"),
        "score": hits["score"].astype("float64"),
    })
    return spark.createDataFrame(out, schema=_RESULT_SCHEMA)


def wand_topk(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str]] | None = None,
    top_k: int = 10,
    threshold: float = 0.0,
    mode: str = "bmw",
    target_doc_ids: list[int] | None = None,
    query_weights: list[tuple[int, dict[str, float]]] | None = None,
    local: str = "auto",
) -> DataFrame:
    """-> DataFrame(qid, rank, doc_id, score) — rank-identical to the exact
    SQL path (plans/bm25_sql.score_bm25) on the same corpus.

    Sizing note: the query plan (qid -> [(term_id, qtf)]) is shipped inside
    the kernel closure, so this path is for *interactive/batch* query sets up
    to ~10^5 queries. For corpus-scale query workloads (mining millions of
    queries against the index) use index/join_scorer.score_index_join — the
    same semantics (rank-identical, asserted in tests/test_join_scorer.py)
    expressed as a shuffle join over the decoded index, which scales with
    the cluster instead of the driver.

    ``local``: "auto" (default) serves point lookups (<= 4 queries with a
    finite top_k against a locally readable index) driver-side with the
    same kernel — no Spark job, ~10x lower latency; "never" forces the
    distributed plan; "force" demands the local path (raises if the index
    dir is not a local filesystem path)."""
    qplan, tids, buckets = build_query_plan(spark, index_dir, queries,
                                            query_weights)
    target = (np.unique(np.asarray(target_doc_ids, dtype=np.int64))
              if target_doc_ids is not None else None)
    if not qplan:
        return spark.createDataFrame([], _RESULT_SCHEMA)
    man_early = IndexManifest.load(index_dir)
    from light_splade_spark.index.tombstones import load_tombstone_ids
    excluded = load_tombstone_ids(index_dir)
    if local not in ("auto", "never", "force"):
        raise ValueError(f"unknown local={local!r} (auto/never/force)")
    want_local = (
        local == "force"
        or (local == "auto" and len(qplan) <= LOCAL_PATH_MAX_QUERIES
            and top_k and top_k > 0
            and os.path.isdir(os.path.join(index_dir, "postings"))))
    if want_local:
        if not os.path.isdir(os.path.join(index_dir, "postings")):
            raise ValueError(
                f"local='force' but {index_dir} is not a local filesystem "
                "index")
        return _wand_local(spark, index_dir, qplan, tids, buckets, top_k,
                           threshold, mode, target, man_early,
                           excluded=excluded)
    posts = read_postings(spark, index_dir).where(
        F.col("bucket").isin(buckets))  # partition pruning (<= n_buckets)
    if len(tids) > 256:
        # big batches: broadcast semi-join on term_id — same row set, but
        # avoids an O(|tids|)-literal predicate whose codegen is serial
        # driver work (the measured constant that killed query-batch scaling)
        tdf = spark.createDataFrame([(t,) for t in tids], "term_id BIGINT")
        posts = posts.join(F.broadcast(tdf), "term_id", "left_semi")
    else:
        # small batches: isin literal keeps parquet min/max pushdown
        posts = posts.where(F.col("term_id").isin(tids))
    posts = posts.select("shard", "term_id", "postings", "bm_last", "bm_max")
    wb, bs = man_early.weight_bits, man_early.block_size

    # a NAMED function (not functools.partial): applyInPandas infers the
    # eval type from the callable and warns on partials — noise in every
    # driver log at scale
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _score_shard(pdf, qplan=qplan, top_k=top_k,
                            threshold=threshold, mode=mode,
                            target_docs=target, weight_bits=wb,
                            block_size=bs, excluded_docs=excluded)

    shard_hits = posts.groupBy("shard").applyInPandas(
        kernel, "qid BIGINT, doc_id BIGINT, score DOUBLE"
    )
    scored = shard_hits.select(
        "qid", "doc_id", F.round("score", SCORE_DECIMALS).alias("score")
    ).where(F.col("score") >= F.lit(threshold))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if top_k and top_k > 0:
        ranked = ranked.where(F.col("rank") <= top_k)
    return ranked.select("qid", "rank", "doc_id", "score")
