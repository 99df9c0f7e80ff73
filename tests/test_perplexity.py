"""Bigram-LM pseudo-perplexity (operators/perplexity.py) — hand-computed
goldens against the pinned formula, the <2-token rule, the filter
composition, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from light_splade_spark.operators.perplexity import (
    bigram_lm_scores, perplexity_filter)


@pytest.fixture(scope="module")
def spark():
    from light_splade_spark.session import get_spark
    return get_spark(app_name="test-ppl", master="local[4]",
                     extra_conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c"), (4, "")],
        "doc_id BIGINT, text STRING")


def test_bigram_lm_golden(spark, corpus):
    """U: a=3, b=3, c=1; V=3; B: (a,b)=3, (b,a)=1; alpha=0.5.
    P(b|a) = 3.5/4.5, P(a|b) = 1.5/4.5."""
    nll_ab = -math.log(3.5 / 4.5)
    nll_ba = -math.log(1.5 / 4.5)
    rows = {r["doc_id"]: r for r in bigram_lm_scores(corpus).collect()}
    assert len(rows) == 4

    a1 = (2 * nll_ab + nll_ba) / 3
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["avg_nll"] == round(a1, 4)
    assert rows[1]["ppl"] == round(math.exp(a1), 4)

    assert rows[2]["n_bigrams"] == 1
    assert rows[2]["avg_nll"] == round(nll_ab, 4)
    assert rows[2]["ppl"] == round(math.exp(nll_ab), 4)

    # <2-token docs keep a row with the pinned defaults
    for d in (3, 4):
        assert (rows[d]["n_bigrams"], rows[d]["avg_nll"],
                rows[d]["ppl"]) == (0, 0.0, 1.0)


def test_perplexity_filter(spark, corpus):
    """doc 2 is exactly the corpus's dominant bigram -> lowest ppl among
    bigram-bearing docs; doc 1 mixes in the rare (b, a) bigram and scores
    higher. A threshold between the two keeps doc 2 plus the ppl-1.0
    short docs and drops doc 1."""
    rows = {r["doc_id"]: r for r in bigram_lm_scores(corpus).collect()}
    assert rows[2]["ppl"] < rows[1]["ppl"]
    cut = (rows[1]["ppl"] + rows[2]["ppl"]) / 2
    kept = sorted(r["doc_id"]
                  for r in perplexity_filter(corpus, cut).collect())
    assert kept == [2, 3, 4]


def test_plan_shape(spark, corpus):
    """No Python in the plan; the pair expansion references only the
    materialized token attribute (guarded the same way as text_quality:
    one array-producing projection, lambdas over attributes)."""
    df = bigram_lm_scores(corpus)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
