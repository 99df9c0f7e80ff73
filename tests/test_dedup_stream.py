"""Stateful streaming dedup (streaming/dedup_stream.py): first occurrence
wins within a batch AND across micro-batches/restarts via checkpointed
state."""

from __future__ import annotations

import json


def test_stream_dedup_across_batches(spark, tmp_path):
    from light_splade_spark.streaming.dedup_stream import stream_dedup

    src = tmp_path / "in"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    rows1 = [{"doc_id": 3, "text": "alpha"}, {"doc_id": 1, "text": "alpha"},
             {"doc_id": 2, "text": "beta"}]
    (src / "b1.ndjson").write_text(
        "\n".join(json.dumps(r) for r in rows1))

    def start():
        stream = (spark.readStream.schema("doc_id BIGINT, text STRING")
                  .option("maxFilesPerTrigger", "1").json(str(src)))
        return stream_dedup(stream, out, ckpt)

    q = start()
    q.awaitTermination(120)
    got = {r.text: r.doc_id for r in spark.read.parquet(out).collect()}
    # within-batch: smallest doc_id wins the duplicate hash
    assert got == {"alpha": 1, "beta": 2}

    # batch 2: resends alpha/beta (suppressed by checkpointed state) and
    # adds gamma (emitted)
    rows2 = [{"doc_id": 9, "text": "alpha"}, {"doc_id": 8, "text": "beta"},
             {"doc_id": 7, "text": "gamma"}]
    (src / "b2.ndjson").write_text(
        "\n".join(json.dumps(r) for r in rows2))
    q2 = start()
    q2.awaitTermination(120)
    got2 = {r.text: r.doc_id for r in spark.read.parquet(out).collect()}
    assert got2 == {"alpha": 1, "beta": 2, "gamma": 7}
