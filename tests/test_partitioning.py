"""Focused tests for the round-7 optimization internals:

* partitioning.spread_input — the guide-§2.5 input-skew guard must widen
  an under-partitioned scan, leave well-partitioned inputs untouched, and
  never change operator results.
* index.phrase.conjunctive_topk — the literal-map attach (small batches)
  and the broadcast-DataFrame attach (large batches) must produce
  identical rows for the same queries.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from light_splade_spark.partitioning import spread_input


def test_spread_widens_single_partition_scan(spark, docs):
    # the sf0.001 documents fixture is a single-row-group parquet file
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = spread_input(docs)
    assert (out.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)
    # same rows, just redistributed
    assert out.count() == docs.count()
    a = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert a == b


def test_spread_identity_when_well_partitioned(spark):
    wide = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism)
    # identity: no extra exchange is stacked on an already-wide input
    assert spread_input(wide) is wide
    wider = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism + 3)
    assert spread_input(wider) is wider


def test_spread_results_identical_through_an_operator(spark, docs):
    from light_splade_spark.operators import dedup

    # simhash consumes the spread input internally; recompute the same
    # operator over a manually pre-widened copy — bit-identical output
    base = {(r["doc_id"], r["simhash"])
            for r in dedup.simhash(docs).collect()}
    wide = {(r["doc_id"], r["simhash"])
            for r in dedup.simhash(docs.repartition(7)).collect()}
    assert base == wide


@pytest.fixture(scope="module")
def tiny_index(spark):
    from light_splade_spark.index.build import build_index

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta"), (2, "beta gamma"),
         (3, "alpha gamma delta"), (4, "delta beta alpha"),
         (5, "epsilon zeta")],
        "doc_id BIGINT, text STRING")
    idx = tempfile.mkdtemp(prefix="lss_conj_routes_")
    build_index(spark, docs, idx, n_shards=None, n_buckets=4, n_salts=2,
                n_shard_groups=1, run_size=64)
    yield idx
    shutil.rmtree(idx, ignore_errors=True)


def test_conjunctive_literal_and_dataframe_routes_agree(
        spark, tiny_index, monkeypatch):
    import light_splade_spark.index.phrase as phrase

    queries = [(1, "alpha beta"), (2, "beta gamma"), (3, "alpha missing"),
               (4, "delta")]
    lit = sorted(tuple(r) for r in phrase.conjunctive_topk(
        spark, tiny_index, queries, top_k=10).collect())
    assert lit, "literal route returned nothing"
    # force every batch onto the broadcast-DataFrame route
    monkeypatch.setattr(phrase, "LITERAL_PLAN_MAX", 0)
    dfr = sorted(tuple(r) for r in phrase.conjunctive_topk(
        spark, tiny_index, queries, top_k=10).collect())
    assert lit == dfr
    # the all-terms-must-match semantics: qid 3 has an absent term
    assert not any(r[0] == 3 for r in lit)
