"""build_index_job CLI: html extraction, docID assignment, docid_map sink."""

from __future__ import annotations

import os
import sys

import pytest

from light_splade_spark.fixtures import make_web_pages


@pytest.mark.parametrize("method", ["range-url", "site-bucket"])
def test_html_build_with_id_assignment(spark, tmp_path, monkeypatch, method):
    pages = make_web_pages(spark, n_docs=60, vocab_size=500, n_sites=5,
                           site_topic_frac=0.5, n_partitions=4)
    inp = str(tmp_path / "pages.parquet")
    pages.write.parquet(inp)
    idx = str(tmp_path / "idx")

    from jobs.build_index_job import main as bmain
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    monkeypatch.setattr(sys, "argv", [
        "x", "--input", inp, "--index-dir", idx, "--extract-html",
        "--assign-ids", method, "--n-buckets", "4", "--n-salts", "2",
        "--n-shard-groups", "1"])
    bmain()

    # the id<->url map is persisted and dense
    mp = spark.read.parquet(os.path.join(idx, "docid_map"))
    rows = mp.collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(60))
    assert len({r["url"] for r in rows}) == 60
    # the index answers queries over the extracted text, and results
    # resolve back to urls through the persisted map
    from light_splade_spark.engine import Engine
    eng = Engine.open(spark, idx)
    assert eng.fsck(sample_terms=8)["ok"]
    res = eng.retrieve([(0, "t00001 t00002")], top_k=5)
    resolved = eng.resolve_urls(res).collect()
    assert resolved
    assert all(r["url"] and r["url"].startswith("https://") for r in resolved)


def test_resolve_urls_loud_without_map(spark, tmp_path):
    from light_splade_spark.engine import Engine
    docs = spark.createDataFrame([(0, "a b c")], "doc_id BIGINT, text STRING")
    eng = Engine.build(spark, docs, str(tmp_path / "i"), n_buckets=2,
                       n_salts=2, n_shard_groups=1, block_size=32)
    with pytest.raises(FileNotFoundError, match="docid_map"):
        eng.resolve_urls(eng.retrieve([(0, "a")], top_k=1))
