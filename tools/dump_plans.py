"""Dump .explain('formatted') for the round-7-touched queries/operators.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX [REPO_ROOT]

Writes OUT_DIR/<name>_<SUFFIX>.txt for each touched query. REPO_ROOT
(default: this file's parent's parent) is prepended to sys.path so the
same script can dump plans from a round-start worktree (before) and the
current tree (after). Uses sf0.01 inputs and a throwaway index.
"""

from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile

OUT = sys.argv[1]
SUFFIX = sys.argv[2]
ROOT = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
SF = "/root/testdata/sf0.01"


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    from light_splade_spark.session import get_spark

    spark = get_spark(app_name=f"plans-{SUFFIX}", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry
    from light_splade_spark.fixtures import DOCUMENTS_QUERY_SET
    from light_splade_spark.index.build import build_index, per_doc_expansion
    from light_splade_spark.index.phrase import conjunctive_topk
    from light_splade_spark.operators import dedup, similarity
    from light_splade_spark.operators.snippets import snippets
    from light_splade_spark.plans import bm25_sql

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    idx = tempfile.mkdtemp(prefix="lss_plans_idx_")
    build_index(spark, docs, idx, n_shards=None, n_buckets=16, n_salts=8,
                n_shard_groups=1, run_size=4096)

    builders = {
        "bm25_topk": lambda: bm25_sql.bm25_topk_docs(
            docs, DOCUMENTS_QUERY_SET, top_k=10),
        "conjunctive_topk": lambda: conjunctive_topk(
            spark, idx, DOCUMENTS_QUERY_SET, top_k=10),
        "minhash_band_pairs": lambda: dedup.minhash_lsh_pairs(
            docs, k=16, band_size=4, shingle_n=3),
        "simhash": lambda: dedup.simhash(docs),
        "quality_score": lambda: entry.q_quality_score(spark, SF),
        "lang_id": lambda: entry.q_lang_id(spark, SF),
        "cosine_topk": lambda: similarity.brute_force_topk(
            emb, list(range(10)), k=5),
        "ann_lsh_topk": lambda: entry.q_ann_lsh_topk(spark, SF),
        "ranking_metrics": lambda: entry.q_ranking_metrics(spark, SF),
        "snippets": lambda: snippets(
            bm25_sql.bm25_topk_docs(docs, DOCUMENTS_QUERY_SET, top_k=10),
            docs, DOCUMENTS_QUERY_SET),
        "per_doc_expansion": lambda: per_doc_expansion(docs),
    }
    for name, fn in builders.items():
        try:
            txt = explain_str(fn())
        except Exception as e:  # noqa: BLE001 - record instead of abort
            txt = f"ERROR building plan: {type(e).__name__}: {e}\n"
        with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{SUFFIX}.txt", flush=True)
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
