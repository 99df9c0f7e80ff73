"""Scale-path similarity operators: bucketed near-dup + real IVF quantizer."""

from __future__ import annotations

import duckdb
import pytest

from light_splade_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    cosine_neardup_pairs_lsh,
    ivf_topk,
    kmeans_centroids,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_quadratic_neardup_requires_opt_in(emb):
    with pytest.raises(ValueError, match="exact=True"):
        cosine_neardup_pairs(emb, threshold=0.9)


def test_lsh_neardup_no_nested_loop_join(emb):
    out = cosine_neardup_pairs_lsh(emb, threshold=0.4, n_planes=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_neardup_subset_of_exact_and_multiprobe_recall(emb):
    exact = {(r.vec_a, r.vec_b): r.cos
             for r in cosine_neardup_pairs(emb, threshold=0.4,
                                           exact=True).collect()}
    single = {(r.vec_a, r.vec_b): r.cos
              for r in cosine_neardup_pairs_lsh(emb, threshold=0.4,
                                                multiprobe=False).collect()}
    multi = {(r.vec_a, r.vec_b): r.cos
             for r in cosine_neardup_pairs_lsh(emb, threshold=0.4,
                                               multiprobe=True).collect()}
    assert set(single) <= set(multi) <= set(exact)
    for p, c in multi.items():
        assert exact[p] == c  # identical scores, bucket-restricted join
    assert len(exact) > 0 and len(multi) >= len(single)


def test_ivf_head_matches_duckdb_at_64_lists(spark, sf_dir, emb):
    got = [(r.qid, r.rank, r.nid, r.cos)
           for r in ivf_topk(emb, query_ids=list(range(10)), k=5,
                             n_centroids=64, n_probe=2, centroids="head")
           .orderBy("qid", "rank").collect()]
    import __spark_entry__ as entrymod
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS "
            f"SELECT * FROM '{sf_dir}/embeddings.parquet'")
    exp = [tuple(r) for r in con.sql(entrymod.oracle_sql()["ivf_topk"])
           .fetchall()]
    exp = sorted(exp)
    assert sorted(got) == exp and len(got) == 50


def test_kmeans_quantizer_deterministic_and_useful(spark, emb):
    C1 = kmeans_centroids(emb, n_centroids=16, iters=4)
    C2 = kmeans_centroids(emb, n_centroids=16, iters=4)
    assert (C1 == C2).all(), "k-means must be bit-deterministic"

    qids = list(range(10))
    truth = {(r.qid, r.nid)
             for r in brute_force_topk(emb, query_ids=qids, k=5).collect()}
    km = ivf_topk(emb, query_ids=qids, k=5, n_centroids=16, n_probe=4,
                  centroids="kmeans", kmeans_iters=4)
    got = {(r.qid, r.nid) for r in km.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"kmeans IVF recall too low: {recall}"
    # and the runs are reproducible end-to-end
    got2 = {(r.qid, r.nid)
            for r in ivf_topk(emb, query_ids=qids, k=5, n_centroids=16,
                              n_probe=4, centroids="kmeans",
                              kmeans_iters=4).collect()}
    assert got == got2
