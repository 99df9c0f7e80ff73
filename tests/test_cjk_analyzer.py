"""CJK analyzer (v2): cross-engine tokenization identity + Japanese e2e.

The reference is a Japanese-first system (HF subword tokenizer,
``models/splade.py:237-245``, ``data/base.py:67-76``; Japanese toy corpus
``data/toy_triplet/``). v1's ASCII analyzer produces near-zero tokens on
Japanese text, silently emptying every downstream operator — v2 fixes that
with Lucene-CJKAnalyzer-style character bigrams over non-ASCII runs, kept
deterministic and expressible in Spark SQL, DuckDB SQL and Python so every
correctness oracle survives.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from light_splade_spark.functions.analyzers import (
    ANALYZER_V1,
    ANALYZER_V2_CJK,
    get_analyzer,
)

# Own tiny Japanese corpus in the style of the reference's toy data
# (short QA-ish sentences) — written fresh, not copied.
JA_DOCS = [
    (0, "富士山は日本で一番高い山です"),
    (1, "東京は日本の首都で人口が多い"),
    (2, "寿司は日本の伝統的な料理です"),
    (3, "新幹線は東京と大阪を結ぶ高速鉄道"),
    (4, "桜の花は春に咲きます"),
    (5, "日本語の文章を検索するエンジン"),
    (6, "高い山に登ると景色がきれいです"),
    (7, "大阪の料理はおいしいと有名です"),
    (8, "Spark で日本語テキストを処理する"),
    (9, "検索エンジンの性能を評価します"),
]
JA_QUERIES = [
    (100, "日本で一番高い山"),
    (101, "東京の人口"),
    (102, "日本語 検索 エンジン"),
    (103, "大阪 料理"),
]


def test_v1_starves_on_japanese_v2_does_not():
    txt = JA_DOCS[0][1]
    assert ANALYZER_V1.py_tokenize(txt) == []  # the round-1 failure mode
    toks = ANALYZER_V2_CJK.py_tokenize(txt)
    assert len(toks) >= 10 and "日本" in toks


@settings(max_examples=60, deadline=None)
@given(st.text(
    alphabet=st.sampled_from(list("abz09 ・。、!日本語東京高い山スパーク一?#")),
    max_size=40,
))
def test_v2_python_matches_duckdb(text):
    con = duckdb.connect()
    sql_toks = con.execute(
        f"SELECT {ANALYZER_V2_CJK.duckdb_tokens('t')} FROM (SELECT ? AS t)",
        [text]).fetchone()[0]
    assert sorted(sql_toks) == sorted(ANALYZER_V2_CJK.py_tokenize(text))


def test_v2_spark_matches_python(spark):
    texts = [t for _, t in JA_DOCS] + [
        "mixed 日本語 and ASCII 123", "一", "", "!@#", "カナkanaカナ",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "id BIGINT, t STRING")
    rows = (df.select("id", ANALYZER_V2_CJK.spark_tokens("t").alias("toks"))
            .orderBy("id").collect())
    for r, t in zip(rows, texts):
        assert sorted(r.toks) == sorted(ANALYZER_V2_CJK.py_tokenize(t)), t


def test_japanese_build_and_wand_parity(spark, tmp_path):
    """Japanese corpus flows through build -> WAND, rank-identical to the
    exact SQL path and hash-identical to the float32 DuckDB oracle."""
    from light_splade_spark.index.build import build_index
    from light_splade_spark.index.manifest import IndexManifest
    from light_splade_spark.index.wand import wand_topk
    from light_splade_spark.plans.bm25_sql import bm25_oracle_sql, bm25_topk_docs

    docs = spark.createDataFrame(JA_DOCS, "doc_id BIGINT, text STRING")
    idx = str(tmp_path / "ja_idx")
    build_index(spark, docs, idx, n_shards=2, n_buckets=4, n_salts=2,
                n_shard_groups=1, analyzer=ANALYZER_V2_CJK)
    assert IndexManifest.load(idx).analyzer_version == "ls-spark-2"

    wand = (wand_topk(spark, idx, JA_QUERIES, top_k=5)
            .orderBy("qid", "rank").collect())
    assert wand, "Japanese queries must return results under v2"
    sql = (bm25_topk_docs(docs, JA_QUERIES, top_k=5,
                          analyzer=ANALYZER_V2_CJK)
           .orderBy("qid", "rank").collect())
    assert [(r.qid, r.rank, r.doc_id) for r in wand] == \
           [(r.qid, r.rank, r.doc_id) for r in sql]

    # DuckDB oracle on the same corpus (float32 impacts = the index path)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", JA_DOCS)
    exp = con.sql(bm25_oracle_sql(
        JA_QUERIES, top_k=5, float32_impacts=True,
        analyzer=ANALYZER_V2_CJK)).fetchall()
    got = [(r.qid, r.rank, r.doc_id, r.score) for r in wand]
    assert got == [tuple(r) for r in exp]


def test_subword_stats_count_cjk_bigrams(spark, tmp_path):
    """Engine.stats counts tokenizer-internal subword units — the analog of
    the reference's ##-wordpiece count (sparse_indexer.py:192): CJK bigrams
    on a v2 index, zero on a pure-ASCII v1 index."""
    from light_splade_spark.engine import Engine

    ja = spark.createDataFrame(JA_DOCS[:4], "doc_id BIGINT, text STRING")
    eng = Engine.build(spark, ja, str(tmp_path / "s2"), n_shards=1,
                       n_buckets=2, n_salts=1, n_shard_groups=1,
                       analyzer=ANALYZER_V2_CJK)
    s = eng.stats()
    assert s["num_subword_tokens"] > 0
    assert s["num_subword_tokens"] <= s["vocab_size"]

    en = spark.createDataFrame([(0, "plain ascii words only")],
                               "doc_id BIGINT, text STRING")
    eng1 = Engine.build(spark, en, str(tmp_path / "s1"), n_shards=1,
                        n_buckets=2, n_salts=1, n_shard_groups=1)
    assert eng1.stats()["num_subword_tokens"] == 0


def test_unknown_analyzer_version_refused(spark, tmp_path):
    from light_splade_spark.index.build import build_index
    from light_splade_spark.index.manifest import IndexManifest
    from light_splade_spark.index.wand import wand_topk

    docs = spark.createDataFrame([(0, "hello world")],
                                 "doc_id BIGINT, text STRING")
    idx = str(tmp_path / "v_idx")
    build_index(spark, docs, idx, n_shards=1, n_buckets=2, n_salts=1,
                n_shard_groups=1)
    man = IndexManifest.load(idx)
    man.analyzer_version = "ls-spark-99"
    man.save(idx)
    with pytest.raises(ValueError, match="unknown analyzer"):
        wand_topk(spark, idx, [(1, "hello")], top_k=3)
    with pytest.raises(ValueError, match="unknown analyzer"):
        get_analyzer("nope")


def test_streaming_append_uses_pinned_analyzer(spark, tmp_path):
    """Appending Japanese docs to a v2 index tokenizes them with v2 (the
    manifest-pinned analyzer), so they are retrievable immediately."""
    from light_splade_spark.index.build import build_index
    from light_splade_spark.index.wand import wand_topk
    from light_splade_spark.streaming.incremental import append_batch

    docs = spark.createDataFrame(JA_DOCS[:8], "doc_id BIGINT, text STRING")
    idx = str(tmp_path / "ja_app")
    build_index(spark, docs, idx, n_shards=2, n_buckets=4, n_salts=2,
                n_shard_groups=1, analyzer=ANALYZER_V2_CJK)
    extra = spark.createDataFrame(JA_DOCS[8:], "doc_id BIGINT, text STRING")
    append_batch(spark, idx, extra, "b1")
    hits = wand_topk(spark, idx, [(1, "検索エンジンの評価")], top_k=5).collect()
    assert 9 in {r.doc_id for r in hits}
