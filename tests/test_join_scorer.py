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
