"""Edge cases: empty/degenerate inputs, mega-bucket guard."""

import pytest
from pyspark.sql import functions as F

from light_splade_spark.engine import Engine
from light_splade_spark.index.build import build_index
from light_splade_spark.operators.dedup import minhash_lsh_pairs


def test_empty_corpus_rejected(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="empty corpus"):
        build_index(spark, empty, str(tmp_path / "idx"))


def test_docs_with_empty_text_survive_build_and_query(spark, tmp_path):
    rows = [(1, "alpha beta gamma"), (2, ""), (3, "...!!!"), (4, "alpha")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    d = str(tmp_path / "idx")
    eng = Engine.build(spark, docs, d, n_shards=2, n_buckets=2, n_salts=2,
                       n_shard_groups=1)
    got = eng.retrieve([(0, "alpha")], top_k=10).collect()
    assert {r["doc_id"] for r in got} == {1, 4}
    # doc 4 (shorter) saturates higher
    assert got[0]["doc_id"] == 4
    # empty/symbol-only docs exist in doc_stats with dl=0
    dls = {r["doc_id"]: r["dl"] for r in eng.doc_stats().collect()}
    assert dls[2] == 0 and dls[3] == 0


def test_empty_query_batch_and_blank_query(spark, docs, tmp_path):
    d = str(tmp_path / "idx")
    eng = Engine.build(spark, docs.limit(50), d, n_shards=2, n_buckets=2,
                       n_salts=2, n_shard_groups=1)
    assert eng.retrieve([(0, "")], top_k=5).count() == 0
    assert eng.retrieve([(0, "   !!! ")], top_k=5).count() == 0


def test_lsh_mega_bucket_guard(spark):
    # 30 identical docs + 2 distinct near-dups: uncapped -> quadratic pairs
    rows = [(i, "same words every time here") for i in range(30)]
    rows += [(100, "unique text one variant alpha"),
             (101, "alpha variant one text unique")]  # same token set as 100
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    uncapped = minhash_lsh_pairs(docs, k=8, band_size=4, shingle_n=1,
                                 max_bucket_size=None).count()
    assert uncapped >= 30 * 29 / 2
    capped = minhash_lsh_pairs(docs, k=8, band_size=4, shingle_n=1,
                               max_bucket_size=10)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # mega-cluster excluded, small buckets kept
    assert all(a >= 100 for a, _ in pairs) or len(pairs) < uncapped
    assert (100, 101) in pairs
