"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

`--scaling` mode additionally runs index build + batch query at local[8] and
local[32] on identical input with a FIXED shuffle-partition count (so only
parallelism varies) and reports throughput scaling efficiency — the sandbox
stand-in for the north rule's N vs 4N executor criterion.
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
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def run_suite(master: str, shuffle_partitions: int = 32) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from light_splade_spark.fixtures import DOCUMENTS_QUERY_SET
    from light_splade_spark.index.build import build_index, read_postings
    from light_splade_spark.index.wand import wand_topk
    from light_splade_spark.operators import dedup, similarity
    from light_splade_spark.plans import bm25_sql
    from light_splade_spark.session import get_spark

    spark = get_spark(app_name=f"lss-bench-{master}", master=master,
                      extra_conf={
                          "spark.sql.shuffle.partitions": str(shuffle_partitions)})
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs = docs.count()
    q: dict[str, float] = {}
    extras: dict = {"n_docs": n_docs}

    idx_dir = tempfile.mkdtemp(prefix="lss_bench_idx_")
    try:
        q["index_build"], _ = _timed(lambda: build_index(
            spark, docs, idx_dir, n_shards=16, n_buckets=16, n_salts=8,
            n_shard_groups=1))
        extras["index_build_docs_per_sec"] = round(n_docs / q["index_build"], 1)
        pb = read_postings(spark, idx_dir).agg(
            F.sum(F.length("postings")).alias("b"),
            F.sum("df").alias("p")).collect()[0]
        extras["postings_bytes_per_posting"] = round(pb["b"] / pb["p"], 3)
        extras["raw_bytes_per_posting"] = 12.0  # int64 doc_id + float32 weight

        # batch query: the reference query set, per-query latency measured as
        # one batch (amortized) + loop for p50/p95
        q["wand_batch"], _ = _timed(lambda: _noop(
            wand_topk(spark, idx_dir, DOCUMENTS_QUERY_SET, top_k=10, mode="bmw")))
        lat = []
        for qid, text in DOCUMENTS_QUERY_SET:
            t, _ = _timed(lambda qq=[(qid, text)]: _noop(
                wand_topk(spark, idx_dir, qq, top_k=10, mode="bmw")))
            lat.append(t)
        lat.sort()
        extras["query_p50_sec"] = round(lat[len(lat) // 2], 3)
        extras["query_p95_sec"] = round(lat[min(len(lat) - 1, int(len(lat) * 0.95))], 3)
        extras["query_qps_batch"] = round(len(DOCUMENTS_QUERY_SET) / q["wand_batch"], 2)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    q["bm25_sql"], _ = _timed(lambda: _noop(
        bm25_sql.bm25_topk_docs(docs, DOCUMENTS_QUERY_SET, top_k=10)))
    q["minhash_pairs"], _ = _timed(lambda: _noop(
        dedup.minhash_lsh_pairs(docs, k=16, band_size=4, shingle_n=3)))
    q["simhash"], _ = _timed(lambda: _noop(dedup.simhash(docs)))
    q["jaccard_200"], _ = _timed(lambda: _noop(dedup.ngram_jaccard_pairs(
        docs.where(F.col("doc_id") < 200), n=1, threshold=0.8)))
    q["exact_dedup"], _ = _timed(lambda: _noop(dedup.exact_dedup(docs)))
    q["text_quality"], _ = _timed(lambda: _noop(
        entry.q_quality_score(spark, SF_DIR)))
    q["lang_id"], _ = _timed(lambda: _noop(entry.q_lang_id(spark, SF_DIR)))
    q["cosine_topk"], _ = _timed(lambda: _noop(
        similarity.brute_force_topk(emb, list(range(10)), k=5)))
    q["ann_lsh"], _ = _timed(lambda: _noop(
        similarity.ann_lsh_topk(emb, list(range(10)), k=5, n_planes=6)))
    q["ranking_metrics"], _ = _timed(lambda: _noop(
        entry.q_ranking_metrics(spark, SF_DIR)))

    spark.stop()
    return {"queries": {k: round(v, 3) for k, v in q.items()}, "extras": extras}


def main() -> None:
    if "--scaling" in sys.argv:
        res = {}
        for cores, sp in (("8", 32), ("32", 32)):
            r = run_suite(f"local[{cores}]", shuffle_partitions=sp)
            res[cores] = r
        t8 = res["8"]["queries"]["index_build"]
        t32 = res["32"]["queries"]["index_build"]
        q8 = res["8"]["queries"]["wand_batch"]
        q32 = res["32"]["queries"]["wand_batch"]
        out = {
            "build_sec_8": t8, "build_sec_32": t32,
            "build_scaling_efficiency": round((t8 / t32) / 4.0, 3),
            "query_sec_8": q8, "query_sec_32": q32,
            "query_scaling_efficiency": round((q8 / q32) / 4.0, 3),
            "detail": res,
        }
        print(json.dumps(out))
        return
    r = run_suite(f"local[{CPUS}]")
    total = round(sum(r["queries"].values()), 3)
    print(json.dumps({
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": r["queries"],
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **r["extras"],
    }))


if __name__ == "__main__":
    main()
