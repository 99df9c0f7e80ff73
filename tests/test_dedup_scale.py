"""Scale-safety guards for the near-dup operators (safe-by-default).

Web-scale failure mode: one boilerplate shingle (or LSH band) shared by
~every page makes a self-join quadratic. These tests build that skew shape
explicitly and assert the default configuration neutralizes it while still
finding the real duplicates.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from light_splade_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingled,
)


def _skew_docs(spark, n=400):
    # every doc contains the boilerplate token "common"; docs 0/1 are real
    # near-dups of each other (same informative token set)
    rows = [(i, f"common filler{i} extra{i} words{i} here{i}") for i in range(2, n)]
    rows += [(0, "common alpha beta gamma delta"),
             (1, "common delta gamma beta alpha")]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_jaccard_shingle_df_cap_neutralizes_hot_shingle(spark):
    docs = _skew_docs(spark)
    # with the default cap, the universal shingle is dropped BEFORE the
    # self-join: the join input contains no row for it
    sh = shingled(docs, n=1)
    hot_df = sh.where(F.col("sh") == "common").count()
    assert hot_df == 400  # the skew is real
    pairs = ngram_jaccard_pairs(docs, n=1, threshold=0.9, max_shingle_df=100)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs.collect()}
    # the real dup pair survives (its informative shingles are low-df);
    # jaccard is over informative shingles only (boilerplate excluded)
    assert got == {(0, 1): 1.0}


def test_jaccard_candidates_filter_applied_before_join(spark):
    docs = _skew_docs(spark, n=100)
    cand = spark.createDataFrame([(0, 1)], "doc_a BIGINT, doc_b BIGINT")
    out = ngram_jaccard_pairs(docs, n=1, threshold=0.5, candidates=cand,
                              max_shingle_df=None)
    # only candidate docs' shingles enter the join: the optimized plan's
    # shingle self-join sides are semi-joined on the candidate doc set
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftSemi" in plan
    rows = out.collect()
    assert [(r.doc_a, r.doc_b) for r in rows] == [(0, 1)]
    # with all shingles kept, "common" is shared: jaccard = 5/5 over the
    # candidate pair's union of 5 tokens each
    assert rows[0].jaccard == 1.0


def test_star_cc_matches_label_cc_and_converges_fast(spark):
    from light_splade_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    # worst case for label propagation: one long chain (diameter 59) plus a
    # separate clique-ish component
    chain = [(i, i + 1) for i in range(60)]
    extra = [(100, 101), (101, 102), (100, 102)]
    pairs = spark.createDataFrame(chain + extra, "doc_a BIGINT, doc_b BIGINT")

    star_labels, rounds = connected_components_star(pairs)
    star = {r.node: r.component for r in star_labels.collect()}
    # label propagation needs diameter(59) rounds on the chain — with the
    # default max_iter=25 it returns UNCONVERGED labels (star doesn't)
    label = {r.node: r.component
             for r in connected_components(pairs, max_iter=80,
                                           algorithm="label").collect()}
    assert star == label
    assert all(star[n] == 0 for n in range(61))
    assert all(star[n] == 100 for n in (100, 101, 102))
    # label propagation needs ~diameter (59) rounds; star needs O(log^2)
    assert rounds <= 8, f"star CC took {rounds} rounds on a 60-chain"


def test_lsh_default_cap_excludes_mega_bucket(spark):
    # 1200 byte-identical docs exceed the default 1000 bucket cap -> the
    # mega-cluster is routed away from the pair join; distinct near-dups
    # under the cap still pair up
    rows = [(i, "boilerplate page body identical") for i in range(1200)]
    rows += [(5000, "rare doc with unusual tokens"),
             (5001, "unusual tokens with rare doc")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    pairs = {(r.doc_a, r.doc_b)
             for r in minhash_lsh_pairs(docs, k=8, band_size=4,
                                        shingle_n=1).collect()}
    assert (5000, 5001) in pairs
    assert all(a >= 5000 for a, _ in pairs), "mega-bucket must be excluded"
