import pandas as pd
from pyspark.sql import functions as F

from light_splade_spark.fixtures import make_queries, make_web_pages
from light_splade_spark.functions.analyzers import (
    doc_terms,
    doc_tokens,
    extract_text_udf,
    py_tokenize,
    tokens_col,
)


def test_tokens_col_matches_py(spark):
    rows = [
        ("Hello, World! 42",),
        ("  multiple   spaces\tand-dashes ",),
        ("UPPER lower 123abc",),
        ("",),
        ("...",),
    ]
    df = spark.createDataFrame(rows, "text STRING")
    got = df.select(tokens_col("text").alias("t")).collect()
    for (text,), r in zip(rows, got):
        assert r["t"] == py_tokenize(text), text


def test_doc_terms_tf(spark):
    df = spark.createDataFrame([(1, "a b a c a b")], "doc_id BIGINT, text STRING")
    rows = {r["term"]: (r["tf"], r["dl"]) for r in doc_terms(df).collect()}
    assert rows == {"a": (3, 6), "b": (2, 6), "c": (1, 6)}


def test_truncation(spark):
    df = spark.createDataFrame([(1, "aaa bbb ccc")], "doc_id BIGINT, text STRING")
    toks = doc_tokens(df, max_chars=5).collect()[0]["tokens"]
    assert toks == ["aaa", "b"]


def test_extract_text_byte_identical(spark):
    """input_hint invariant: extract(html) == text byte-for-byte per url."""
    pages = make_web_pages(spark, n_docs=200, vocab_size=500)
    bad = (
        pages.withColumn("ext", extract_text_udf("html"))
        .where(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0
    # deterministic across runs
    a = pages.select("url", F.md5(extract_text_udf("html")).alias("h")).collect()
    b = pages.select("url", F.md5(extract_text_udf("html")).alias("h")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_fixture_query_edge_cases(spark):
    qs = make_queries(spark, n_queries=20)
    texts = dict(qs)
    assert len(py_tokenize(texts[0])) == 1          # single term
    assert "zzzabsent" in texts[3]                  # absent terms
    toks4 = py_tokenize(texts[4])
    assert len(toks4) != len(set(toks4))            # duplicate term


def test_zipf_skew_is_real(spark):
    pages = make_web_pages(spark, n_docs=500, vocab_size=2000)
    dt = doc_terms(pages.withColumnRenamed("url", "doc_key"), id_col="doc_key")
    df = dt.groupBy("term").count().orderBy(F.desc("count")).limit(1).collect()
    top_df = df[0]["count"]
    assert top_df > 400  # head term hits ~every doc -> skew handling matters
