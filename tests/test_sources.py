"""NDJSON loaders: strict schemas, gzip, integrity validation (reference
data/ semantics), multimodal plumbing."""

import gzip
import json

import pytest
from pyspark.sql import functions as F

from light_splade_spark.operators.multimodal import extract_features, frame_sample
from light_splade_spark.sources import ndjson


@pytest.fixture(scope="module")
def toy_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ndjson")
    docs = [{"doc_id": i, "text": f"doc text {i}"} for i in range(5)]
    (d / "docs.ndjson").write_text("\n".join(json.dumps(x) for x in docs))
    queries = [{"qid": 1, "text": "q one"}, {"qid": 2, "text": "q two"}]
    with gzip.open(d / "queries.ndjson.gz", "wt") as f:
        f.write("\n".join(json.dumps(x) for x in queries))
    pos = [{"qid": 1, "positive_doc_ids": [0, 1]},
           {"qid": 2, "positive_doc_ids": [3]}]
    (d / "pos.ndjson").write_text("\n".join(json.dumps(x) for x in pos))
    scores = [{"qid": 1, "scores": {"0": 1.5, "1": 0.25}}]
    (d / "scores.ndjson").write_text("\n".join(json.dumps(x) for x in scores))
    return d


def test_doc_master_and_gzip_query_master(spark, toy_dir):
    docs = ndjson.read_doc_master(spark, str(toy_dir / "docs.ndjson"))
    assert docs.count() == 5
    assert docs.schema.simpleString() == "struct<doc_id:bigint,text:string>"
    qs = ndjson.read_query_master(spark, str(toy_dir / "queries.ndjson.gz"))
    assert {r["qid"] for r in qs.collect()} == {1, 2}


def test_pair_scores_key_coercion(spark, toy_dir):
    """str doc-id keys -> BIGINT (reference pair_score.py:56)."""
    ps = ndjson.read_pair_scores(spark, str(toy_dir / "scores.ndjson"))
    m = ps.collect()[0]["scores"]
    assert m == {0: 1.5, 1: 0.25}
    filtered = ndjson.read_pair_scores(
        spark, str(toy_dir / "scores.ndjson"), target_qids=[99])
    assert filtered.count() == 0


def test_validate_dataset_passes_and_fails(spark, toy_dir):
    docs = ndjson.read_doc_master(spark, str(toy_dir / "docs.ndjson"))
    qs = ndjson.read_query_master(spark, str(toy_dir / "queries.ndjson.gz"))
    pos = ndjson.read_positive_list(spark, str(toy_dir / "pos.ndjson"))
    ndjson.validate_dataset(docs, qs, pos)  # should not raise
    bad_pos = pos.withColumn(
        "positive_doc_ids", F.array(F.lit(999).cast("bigint")))
    with pytest.raises(ndjson.IntegrityError, match="doc_id missing"):
        ndjson.validate_dataset(docs, qs, bad_pos)
    with pytest.raises(ndjson.IntegrityError, match="no positives"):
        ndjson.validate_dataset(docs, qs, pos.where("qid = 1"))


def test_ndjson_roundtrip(spark, toy_dir, tmp_path):
    docs = ndjson.read_doc_master(spark, str(toy_dir / "docs.ndjson"))
    out = str(tmp_path / "out")
    ndjson.write_ndjson(docs, out)
    back = ndjson.read_doc_master(spark, out)
    assert sorted(r["doc_id"] for r in back.collect()) == [0, 1, 2, 3, 4]


# --- multimodal plumbing -----------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNGfakebytes1"), (64, 48, None, "image/png")),
        (2, "image", bytearray(b"\x89PNGfakebytes2"), (32, 32, None, "image/png")),
        (3, "video", bytearray(b"RIFFfakevid"), (640, 480, 3500, "video/mp4")),
    ]
    return spark.createDataFrame(
        rows,
        "media_id BIGINT, kind STRING, payload BINARY, "
        "meta STRUCT<width: INT, height: INT, duration_ms: INT, mime: STRING>",
    )


def test_fake_decode_deterministic(spark, media):
    a = extract_features(media).orderBy("media_id").collect()
    b = extract_features(media).orderBy("media_id").collect()
    assert [r["features"] for r in a] == [r["features"] for r in b]
    assert all(len(r["features"]) == 16 for r in a)
    assert a[0]["features"] != a[1]["features"]  # payload-dependent
    assert a[0]["n_bytes"] == 14


def test_real_decoder_is_explicit_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        extract_features(media, decoder="real").collect()


def test_frame_sample(spark, media):
    rows = frame_sample(media, every_ms=1000).collect()
    got = sorted((r["media_id"], r["ts_ms"]) for r in rows)
    assert got == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]


def test_resize_images_plumbing(spark, media):
    from light_splade_spark.operators.multimodal import resize_images
    out = resize_images(media, 64, 64).orderBy("media_id").collect()
    imgs = [r for r in out if r["kind"] == "image"]
    assert all(r["meta"]["width"] == 64 and r["meta"]["height"] == 64
               for r in imgs)
    assert all(r["payload"] is not None for r in imgs)
    vid = [r for r in out if r["kind"] == "video"][0]
    assert vid["payload"] is None  # non-images pass through untouched
    # deterministic across runs
    again = resize_images(media, 64, 64).orderBy("media_id").collect()
    assert [bytes(r["payload"]) if r["payload"] else None for r in out] == \
           [bytes(r["payload"]) if r["payload"] else None for r in again]
