import pytest
from pyspark.sql import functions as F

from light_splade_spark.operators.dedup import (
    connected_components,
    dup_clusters,
    minhash_lsh_pairs,
)
from light_splade_spark.pipeline import clean_corpus


def test_connected_components_chains(spark):
    # two clusters: {1,2,3,4} via chain, {10,11}; singleton edges none
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a BIGINT, doc_b BIGINT")
    got = {r["node"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dup_clusters(spark):
    pairs = spark.createDataFrame(
        [(5, 7), (7, 9), (20, 21)], "doc_a BIGINT, doc_b BIGINT")
    rows = {r["keeper"]: (r["size"], r["doc_ids"])
            for r in dup_clusters(None, pairs).collect()}
    assert rows == {5: (3, "5,7,9"), 20: (2, "20,21")}


@pytest.fixture(scope="module")
def messy(spark):
    good = "the quick brown fox jumps over a lazy dog near the river bank"
    rows = [
        (1, good),
        (2, good),                                   # exact dup of 1
        (3, good.replace("river", "ocean")),         # near dup of 1
        (4, "completely different spark engine text with many distinct tokens here"),
        (5, "xx"),                                   # fails quality (too short)
        (6, "der hund und die katze ist nicht da heute morgen wieder einmal"),  # de
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_clean_corpus_end_to_end(spark, messy):
    out, report = clean_corpus(messy, allowed_langs=["en"],
                               jaccard_threshold=0.5, shingle_n=2)
    ids = sorted(r["doc_id"] for r in out.collect())
    # 5 fails quality; 6 fails lang; 2 exact-dup loses to 1; 3 near-dup loses to 1
    assert ids == [1, 4]
    assert report["input"] == 6
    assert report["after_quality"] == 5
    assert report["after_lang"] == 4
    assert report["after_exact_dedup"] == 3
    assert report["after_near_dedup"] == 2
    assert "fp" in out.columns


def test_lsh_pairs_respect_candidates_param(spark, messy):
    from light_splade_spark.operators.dedup import ngram_jaccard_pairs
    cand = minhash_lsh_pairs(messy, shingle_n=1)
    verified = ngram_jaccard_pairs(messy, n=1, threshold=0.9, candidates=cand)
    got = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    assert (1, 2) in got
