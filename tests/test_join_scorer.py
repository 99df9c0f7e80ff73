"""Index-backed join scorer: rank-identity vs WAND over the same index.

The >10^5-query route (index/join_scorer.py) must produce exactly the same
(qid, rank, doc_id, score) rows as the WAND kernel on the same built index —
same float32 impacts, same rounding, same tie-break — for both weight_bits
layouts. Also checks decode_postings round-trips the compressed blobs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from light_splade_spark.fixtures import DOCUMENTS_QUERY_SET
from light_splade_spark.index.build import build_index
from light_splade_spark.index.join_scorer import (
    decode_postings,
    score_index_join,
)
from light_splade_spark.index.wand import wand_topk


@pytest.fixture(scope="module", params=[32, 8], ids=["w32", "w8"])
def idx(request, spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp(f"join_idx_w{request.param}"))
    build_index(spark, docs, d, n_shards=4, n_buckets=4, n_salts=2,
                n_shard_groups=2, weight_bits=request.param)
    return d


def _rows(df):
    return sorted((r.qid, r.rank, r.doc_id, r.score) for r in df.collect())


def test_join_scorer_rank_identical_to_wand(spark, idx):
    qdf = spark.createDataFrame(DOCUMENTS_QUERY_SET, "qid BIGINT, text STRING")
    joined = _rows(score_index_join(spark, idx, qdf, top_k=10))
    wand = _rows(wand_topk(spark, idx, DOCUMENTS_QUERY_SET, top_k=10))
    assert joined == wand


def test_join_scorer_threshold_and_topk_zero(spark, idx):
    qdf = spark.createDataFrame(DOCUMENTS_QUERY_SET[:3],
                                "qid BIGINT, text STRING")
    joined = _rows(score_index_join(spark, idx, qdf, top_k=0, threshold=0.3))
    wand = _rows(wand_topk(spark, idx, DOCUMENTS_QUERY_SET[:3], top_k=0,
                           threshold=0.3))
    assert joined == wand
    assert all(s >= 0.3 for *_, s in joined)


def test_decode_postings_roundtrip(spark, docs, idx):
    """Decoded (term_id, doc_id) multiset == the tokenize expansion's
    distinct (term, doc) pairs; weights positive."""
    from light_splade_spark.functions.analyzers import doc_terms
    from light_splade_spark.index.build import read_terms

    decoded = decode_postings(spark, idx)
    n_decoded = decoded.count()
    expected = (doc_terms(docs).select("doc_id", "term").distinct().count())
    assert n_decoded == expected
    assert decoded.where(F.col("w") <= 0).count() == 0
    # per-term posting count matches the terms dim's df
    got_df = decoded.groupBy("term_id").agg(F.count(F.lit(1)).alias("n"))
    dim = read_terms(spark, idx).select("term_id", "df")
    bad = got_df.join(dim, "term_id").where(F.col("n") != F.col("df")).count()
    assert bad == 0


def test_decode_postings_term_subset_pruning(spark, idx):
    """A small literal term_id list keeps the decode restricted (and the
    result equal to filtering the full decode)."""
    from light_splade_spark.index.build import read_terms

    tids = [int(r.term_id) for r in
            read_terms(spark, idx).orderBy(F.desc("df")).limit(5).collect()]
    sub = decode_postings(spark, idx, term_ids=tids)
    assert set(r.term_id for r in
               sub.select("term_id").distinct().collect()) == set(tids)
    full = decode_postings(spark, idx).where(F.col("term_id").isin(tids))
    assert sub.count() == full.count()


def test_join_scorer_at_design_scale_10k_queries(spark, docs, tmp_path):
    """The route's design claim is 10^5+-query workloads; drive it at 10k
    synthetic queries (VERDICT r3 item 4): (a) completes with every query
    answered, (b) sampled rank-identity vs WAND, (c) the contrib join is a
    SHUFFLE join with the full query set (the query side must NOT broadcast
    — broadcasting 10^6+ queries would OOM every executor), while the terms
    dim / semi-join broadcasts are expected."""
    import random

    from light_splade_spark.functions.analyzers import doc_terms

    d = str(tmp_path / "scale_idx")
    build_index(spark, docs, d, n_shards=4, n_buckets=4, n_salts=2,
                n_shard_groups=1, weight_bits=8)
    terms = [r.term for r in
             doc_terms(docs).select("term").distinct().limit(400).collect()]
    rng = random.Random(42)
    qs = [(i, " ".join(rng.sample(terms, 3))) for i in range(10_000)]
    qdf = spark.createDataFrame(qs, "qid BIGINT, text STRING")

    # At 500-doc test scale AQE would (correctly) broadcast the tiny
    # decoded side; disable size-based auto-broadcast so the plan we
    # assert is the at-scale shape. The EXPLICIT broadcast() hints in the
    # operator (terms dim, pruning semi-join) ignore the threshold — so
    # this also proves the query side is never broadcast-HINTED.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    prev_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        res = score_index_join(spark, d, qdf, top_k=5)
        rows = res.collect()  # bounded: <= 10k * top_k rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    # (c) plan shape, read AFTER execution so AQE's final plan is visible:
    # the qt-side join with decoded postings is a shuffle join.
    # BroadcastHashJoins exist (terms dim, pruning semi-join) but the
    # decoded-postings contrib join must be SortMerge/ShuffledHash — the
    # query side must never broadcast.
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan

    # (a) completion: every query with >=1 matching term gets rows; counts
    # bounded by top_k
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r.qid] = per_q.get(r.qid, 0) + 1
    assert len(per_q) > 9000, len(per_q)
    assert max(per_q.values()) <= 5

    # (b) sampled rank-identity vs the WAND kernel on the same index
    sample_ids = set(range(0, 10_000, 500))
    sample = [q for q in qs if q[0] in sample_ids]
    wand = _rows(wand_topk(spark, d, sample, top_k=5))
    joined = sorted((r.qid, r.rank, r.doc_id, r.score)
                    for r in rows if r.qid in sample_ids)
    assert joined == wand and len(joined) > 0
