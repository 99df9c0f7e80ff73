"""The maintain_index_job CLI surface (append / delete / compact / gc),
driven in-process: getOrCreate() inside main() reuses the test session.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import functions as F

from light_splade_spark.engine import Engine
from light_splade_spark.index.manifest import IndexManifest


def _run(monkeypatch, capsys, argv):
    import jobs.maintain_index_job as job

    monkeypatch.setattr(sys, "argv", ["maintain_index_job.py", *argv])
    # main() calls spark.stop(); neuter it so the shared test session
    # survives for the following subcommands/tests
    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    job.main()
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_maintain_job_lifecycle(spark, tmp_path, monkeypatch, capsys):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .where(F.col("doc_id") < 150)
    idx = str(tmp_path / "jidx")
    Engine.build(spark, docs, idx, n_shards=2, n_buckets=4, n_salts=2,
                 n_shard_groups=1)
    app = tmp_path / "app.parquet"
    spark.createDataFrame([(800001, "maintained appended doc")],
                          "doc_id BIGINT, text STRING") \
        .write.parquet(str(app))

    out = _run(monkeypatch, capsys,
               ["--index-dir", idx, "append", "--input", str(app),
                "--batch-id", "j1"])
    assert out == {"op": "append", "batch_id": "j1", "n_docs": 1}

    out = _run(monkeypatch, capsys,
               ["--index-dir", idx, "delete", "--doc-ids", "1,2"])
    assert out == {"op": "delete", "n_tombstoned": 2}

    out = _run(monkeypatch, capsys,
               ["--index-dir", idx, "compact", "--no-gc"])
    assert out["op"] == "compact" and out["live_groups"] == ["compact-1"]

    # default gc leaves the fresh folded group (grace window protects
    # in-flight appends); an explicit --grace-sec 0 sweeps it now
    out = _run(monkeypatch, capsys, ["--index-dir", idx, "gc"])
    assert out["removed_groups"] == []
    out = _run(monkeypatch, capsys,
               ["--index-dir", idx, "gc", "--grace-sec", "0"])
    assert "append-j1" in out["removed_groups"]

    man = IndexManifest.load(idx)
    assert man.live_groups == ["compact-1"]
    hits = Engine.open(spark, idx).retrieve(
        [(0, "maintained appended doc")], top_k=3).collect()
    assert 800001 in {r.doc_id for r in hits}
    assert not {1, 2} & {r.doc_id for r in
                         Engine.open(spark, idx).retrieve(
                             [(0, "the")], top_k=0).collect()}
