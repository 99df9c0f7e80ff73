"""SPLADE-expansion semantics, sampled index stats, J1 triplet lookup join."""

import pytest
from pyspark.sql import functions as F

from light_splade_spark.functions.analyzers import doc_terms, splade_expansion
from light_splade_spark.plans.stats import index_stats, term_stats, with_dense_id


def test_splade_expansion_max_agg_and_nonzero(spark):
    """Repeated term keeps the MAX positional weight (models/splade.py:136-145
    agg='max'); zero weights are dropped (nonzero gather :168)."""
    df = spark.createDataFrame([(1, "alpha beta alpha")],
                               "doc_id BIGINT, text STRING")
    rows = {r["term"]: r["weight"] for r in splade_expansion(df).collect()}
    # weights deterministic; alpha appears at pos 0 and 2 -> max of the two
    single = {
        r["term"]: r["weight"] for r in splade_expansion(
            spark.createDataFrame([(1, "alpha")], "doc_id BIGINT, text STRING")
        ).collect()
    }
    if "alpha" in rows and "alpha" in single:
        assert rows["alpha"] >= single["alpha"]
    assert all(w > 0 for w in rows.values())


def test_splade_expansion_deterministic(spark, docs):
    a = sorted(map(tuple, splade_expansion(docs.limit(20)).collect()))
    b = sorted(map(tuple, splade_expansion(docs.limit(20)).collect()))
    assert a == b


def test_index_stats_sampled(spark, docs):
    dt = doc_terms(docs)
    s = index_stats(dt, sample_docs=100, top_n=5)
    assert 0 < s["n_docs_sampled"] <= docs.count()
    assert s["avg_nonzero_count"] > 0
    assert len(s["top_terms"]) == 5
    assert all(0 < r <= 1.0 for _, r in s["top_terms"])


def test_term_stats_dense_ids(spark, docs):
    ts = term_stats(doc_terms(docs.limit(50)))
    rows = ts.orderBy("term_id").collect()
    assert [r["term_id"] for r in rows] == list(range(len(rows)))
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)  # ids ordered by df desc


def test_with_dense_id_unique_and_total(spark):
    df = spark.createDataFrame([(x,) for x in range(1000)], "v BIGINT")
    out = with_dense_id(df, [F.desc("v")], "rid").collect()
    ids = sorted(r["rid"] for r in out)
    assert ids == list(range(1000))
    byv = {r["v"]: r["rid"] for r in out}
    assert byv[999] == 0 and byv[0] == 999


def test_triplet_lookup_join(spark):
    """J1 (triplet_dataset.py:141-145): ids -> texts via three joins with
    broadcast dims."""
    queries = spark.createDataFrame(
        [(1, "q one"), (2, "q two")], "qid BIGINT, text STRING")
    docs = spark.createDataFrame(
        [(10, "pos one"), (11, "neg one"), (20, "pos two"), (21, "neg two")],
        "doc_id BIGINT, text STRING")
    trip = spark.createDataFrame(
        [(1, 10, 11), (2, 20, 21)],
        "qid BIGINT, pos_doc_id BIGINT, neg_doc_id BIGINT")
    out = (
        trip.join(F.broadcast(queries), "qid")
        .join(F.broadcast(docs.withColumnRenamed("text", "pos_text")),
              trip.pos_doc_id == docs.doc_id).drop("doc_id")
        .join(F.broadcast(docs.withColumnRenamed("text", "neg_text")),
              trip.neg_doc_id == docs.doc_id)
        .select("qid", "text", "pos_text", "neg_text")
        .orderBy("qid").collect()
    )
    assert [(r["text"], r["pos_text"], r["neg_text"]) for r in out] == [
        ("q one", "pos one", "neg one"), ("q two", "pos two", "neg two")]
