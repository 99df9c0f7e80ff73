"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file holds the guide-§1 instrumentation: per-operator noop-sink timings,
A/B micro-benchmarks, and build-phase traces). Usage:

    python bench_extra.py suite          # per-op timings, current code
    python bench_extra.py ab             # input-spread A/B per operator
    python bench_extra.py explain NAME   # print .explain('formatted')

Reads $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] like bench.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


_SERVE_WORKER = r"""
# One serving process: the _wand_local path MINUS the Spark result wrap —
# term ids from the index's terms parquet (read once, pyarrow), posting
# bytes via the same pyarrow dataset filter (hive bucket pruning + term_id
# stats), the _score_shard kernel, pandas round/rank. No JVM at all: this
# is what a serving layer runs per query against an immutable index.
import json, os, sys, time
from collections import Counter
sys.path.insert(0, {root!r})
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pds
import pyarrow.parquet as pq
from light_splade_spark.functions.analyzers import resolve_analyzer
from light_splade_spark.index.manifest import IndexManifest
from light_splade_spark.index.wand import _round_half_up, _score_shard

idx = {idx!r}
man = IndexManifest.load(idx)
ana = resolve_analyzer(man.analyzer_version, idx)
tdir = os.path.join(idx, getattr(man, "terms_dir", "terms"))
tt = pq.read_table(tdir, columns=["term", "term_id"])
tmap = dict(zip(tt["term"].to_pylist(), tt["term_id"].to_pylist()))
part = pds.partitioning(pa.schema([("shard_group", pa.string()),
                                   ("bucket", pa.int32())]), flavor="hive")
data = pds.dataset(os.path.join(idx, "postings"), partitioning=part)
qs = [(i, "t%05d t%05d t%05d" % ((7*i) % 30000, (13*i) % 30000,
                                 (29*i) % 30000)) for i in range(200)]

def run(qid, text):
    counts = Counter(ana.py_tokenize(text))
    qplan = {{qid: [(tmap[t], c) for t, c in sorted(counts.items())
                    if t in tmap]}}
    tids = sorted({{tid for tid, _ in qplan[qid]}})
    buckets = sorted({{t % man.n_buckets for t in tids}})
    flt = pds.field("bucket").isin(buckets) & pds.field("term_id").isin(tids)
    if man.live_groups is not None:
        flt = flt & pds.field("shard_group").isin(
            [str(g) for g in man.live_groups])
    pdf = data.to_table(filter=flt, columns=[
        "shard", "term_id", "postings", "bm_last", "bm_max"]).to_pandas()
    parts = [_score_shard(g, qplan=qplan, top_k=10, threshold=0.0,
                          mode="bmw", target_docs=None,
                          weight_bits=man.weight_bits,
                          block_size=man.block_size)
             for _, g in pdf.groupby("shard", sort=False)]
    hits = pd.concat(parts, ignore_index=True) if parts else None
    if hits is None or not len(hits):
        return 0
    hits["score"] = hits["score"].map(_round_half_up)
    hits = hits.sort_values(["qid", "score", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
    return len(hits.head(10))

run(*qs[0]); run(*qs[1])  # warm: page cache, numpy, dataset machinery
lat = []
t_all = time.time()
for q in qs[2:{n_queries}+2]:
    t0 = time.time(); run(*q); lat.append(time.time() - t0)
wall = time.time() - t_all
lat.sort()
print(json.dumps({{"n": len(lat), "wall": round(wall, 3),
                   "qps": round(len(lat) / wall, 2),
                   "p50": round(lat[len(lat)//2], 4),
                   "p95": round(lat[min(len(lat)-1, int(len(lat)*0.95))], 4)}}))
"""


def _serve_mode() -> None:
    """VERDICT r6 #3: MULTI-PROCESS point-query serving over one immutable
    index — the r6 thread ladder found the GIL ceiling (2 threads 20.4 qps,
    8 threads 9.2) and asserted (did not measure) that separate processes
    are the production shape. Spawn 1/2/4/8 serving processes, each running
    the _wand_local serving path WITHOUT the Spark result wrap (terms
    parquet -> pyarrow pruned posting read -> _score_shard -> pandas rank;
    no JVM per query) against a shared 200k-doc wb=8 index; report
    aggregate qps and per-process p50/p95."""
    import subprocess

    from light_splade_spark.fixtures import make_corpus_df
    from light_splade_spark.index.build import build_index
    from light_splade_spark.session import get_spark

    root = os.path.dirname(os.path.abspath(__file__))
    corpus = "/tmp/lss_corpus_200k"
    spark = get_spark(app_name="serve-build",
                      extra_conf={"spark.sql.shuffle.partitions": "64"})
    if not os.path.exists(corpus):
        make_corpus_df(spark, 200_000).write.mode("overwrite").parquet(corpus)
    idx = tempfile.mkdtemp(prefix="lss_serve_idx_")
    build_index(spark, spark.read.parquet(corpus), idx, n_shards=None,
                n_buckets=16, n_salts=8, n_shard_groups=1, run_size=4096,
                weight_bits=8)
    spark.stop()
    out = {"index_docs": 200_000, "weight_bits": 8, "levels": []}
    try:
        for n_proc in (1, 2, 4, 8):
            code = _SERVE_WORKER.format(root=root, idx=idx, n_queries=150)
            procs = [subprocess.Popen([sys.executable, "-c", code],
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.DEVNULL, text=True)
                     for _ in range(n_proc)]
            rows = [json.loads(p.communicate()[0].strip().splitlines()[-1])
                    for p in procs]
            level = {
                "processes": n_proc,
                "aggregate_qps": round(sum(r["qps"] for r in rows), 2),
                "p50_max": max(r["p50"] for r in rows),
                "p95_max": max(r["p95"] for r in rows),
                "per_proc": rows,
            }
            out["levels"].append(level)
            print(json.dumps({k: level[k] for k in
                              ("processes", "aggregate_qps", "p50_max",
                               "p95_max")}), flush=True)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps(out))


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "suite"
    if mode == "serve":
        _serve_mode()
        return
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from light_splade_spark.fixtures import DOCUMENTS_QUERY_SET
    from light_splade_spark.functions import text_quality as tq
    from light_splade_spark.index.build import build_index
    from light_splade_spark.index.phrase import conjunctive_topk
    from light_splade_spark.index.wand import wand_topk
    from light_splade_spark.operators import dedup, similarity
    from light_splade_spark.operators.snippets import snippets
    from light_splade_spark.plans import bm25_sql
    from light_splade_spark.session import get_spark

    spark = get_spark(app_name="lss-bench-extra",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    if mode == "ab":
        # input-spread A/B (guide §2.5: single-row-group parquet = one scan
        # task; measure each op against a pre-spread copy of the input)
        sdocs = docs.repartition(32).cache()
        semb = emb.repartition(32).cache()
        sdocs.count(), semb.count()
        ops = {
            "text_quality": lambda d: tq.all_quality_metrics(d),
            "lang_id": lambda d: tq.lang_id(d),
            "simhash": lambda d: dedup.simhash(d),
            "minhash_pairs": lambda d: dedup.minhash_lsh_pairs(
                d, k=16, band_size=4, shingle_n=3),
            "exact_dedup": lambda d: dedup.exact_dedup(d),
            "bm25_sql": lambda d: bm25_sql.bm25_topk_docs(
                d, DOCUMENTS_QUERY_SET, top_k=10),
        }
        out = {}
        for name, fn in ops.items():
            # warm codegen with a spread run first, then measure both twice
            _noop(fn(sdocs))
            a = min(_timed(lambda: _noop(fn(docs))) for _ in range(2))
            b = min(_timed(lambda: _noop(fn(sdocs))) for _ in range(2))
            out[name] = {"base": round(a, 3), "spread": round(b, 3)}
            print(name, out[name], flush=True)
        vops = {
            "cosine_topk": lambda e: similarity.brute_force_topk(
                e, list(range(10)), k=5),
            "ann_lsh": lambda e: similarity.ann_lsh_topk(
                e, list(range(10)), k=5, n_planes=6),
            "ivf": lambda e: similarity.ivf_topk(e, list(range(10)), k=5),
        }
        for name, fn in vops.items():
            _noop(fn(semb))
            a = min(_timed(lambda: _noop(fn(emb))) for _ in range(2))
            b = min(_timed(lambda: _noop(fn(semb))) for _ in range(2))
            out[name] = {"base": round(a, 3), "spread": round(b, 3)}
            print(name, out[name], flush=True)
        print(json.dumps(out))
        return

    if mode == "suite":
        q = {}
        idx_dir = tempfile.mkdtemp(prefix="lss_bx_idx_")
        try:
            spark.sparkContext.setJobDescription("bx: index_build")
            q["index_build"] = _timed(lambda: build_index(
                spark, docs, idx_dir, n_shards=None, n_buckets=16,
                n_salts=8, n_shard_groups=1, run_size=4096))
            spark.sparkContext.setJobDescription("bx: wand_batch")
            q["wand_batch"] = _timed(lambda: _noop(wand_topk(
                spark, idx_dir, DOCUMENTS_QUERY_SET, top_k=10, mode="bmw")))
            spark.sparkContext.setJobDescription("bx: conjunctive")
            q["conjunctive"] = _timed(lambda: _noop(conjunctive_topk(
                spark, idx_dir, DOCUMENTS_QUERY_SET, top_k=10)))
        finally:
            shutil.rmtree(idx_dir, ignore_errors=True)
        spark.sparkContext.setJobDescription("bx: bm25_sql")
        q["bm25_sql"] = _timed(lambda: _noop(bm25_sql.bm25_topk_docs(
            docs, DOCUMENTS_QUERY_SET, top_k=10)))
        spark.sparkContext.setJobDescription("bx: minhash_pairs")
        q["minhash_pairs"] = _timed(lambda: _noop(dedup.minhash_lsh_pairs(
            docs, k=16, band_size=4, shingle_n=3)))
        spark.sparkContext.setJobDescription("bx: simhash")
        q["simhash"] = _timed(lambda: _noop(dedup.simhash(docs)))
        spark.sparkContext.setJobDescription("bx: jaccard_200")
        q["jaccard_200"] = _timed(lambda: _noop(dedup.ngram_jaccard_pairs(
            docs.where(F.col("doc_id") < 200), n=1, threshold=0.8)))
        spark.sparkContext.setJobDescription("bx: exact_dedup")
        q["exact_dedup"] = _timed(lambda: _noop(dedup.exact_dedup(docs)))
        spark.sparkContext.setJobDescription("bx: text_quality")
        q["text_quality"] = _timed(lambda: _noop(
            entry.q_quality_score(spark, SF_DIR)))
        spark.sparkContext.setJobDescription("bx: lang_id")
        q["lang_id"] = _timed(lambda: _noop(tq.lang_id(docs)))
        spark.sparkContext.setJobDescription("bx: cosine_topk")
        q["cosine_topk"] = _timed(lambda: _noop(
            similarity.brute_force_topk(emb, list(range(10)), k=5)))
        spark.sparkContext.setJobDescription("bx: ann_lsh")
        q["ann_lsh"] = _timed(lambda: _noop(
            similarity.ann_lsh_topk(emb, list(range(10)), k=5, n_planes=6)))
        spark.sparkContext.setJobDescription("bx: ivf")
        q["ivf"] = _timed(lambda: _noop(
            similarity.ivf_topk(emb, list(range(10)), k=5)))
        spark.sparkContext.setJobDescription("bx: ranking_metrics")
        q["ranking_metrics"] = _timed(lambda: _noop(
            entry.q_ranking_metrics(spark, SF_DIR)))
        spark.sparkContext.setJobDescription("bx: snippets_e2e")
        res = bm25_sql.bm25_topk_docs(docs, DOCUMENTS_QUERY_SET,
                                      top_k=10).persist()
        q["snippets_e2e"] = _timed(lambda: _noop(snippets(
            res, docs, DOCUMENTS_QUERY_SET)))
        res.unpersist()
        q["TOTAL"] = round(sum(q.values()), 3)
        print(json.dumps({k: round(v, 3) for k, v in q.items()}))
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
