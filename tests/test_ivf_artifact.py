"""Persisted IVF artifact: parity with the per-call route, partition
pruning, and no corpus-wide compute at query time."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from light_splade_spark.operators.ivf import (
    build_ivf,
    ivf_search,
    probe_lists,
    read_ivf_centroids,
)
from light_splade_spark.operators.similarity import ivf_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def ivf_dir(spark, emb, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf") / "artifact")
    man = build_ivf(emb, d, n_centroids=16, centroids="head")
    assert man["n_vectors"] == emb.count()
    return d


def _q(emb, ids):
    rows = emb.where(F.col("vec_id").isin(ids)).collect()
    return [(int(r.vec_id), list(r.embedding)) for r in rows]


def test_ivf_search_matches_per_call_route(spark, emb, ivf_dir):
    ids = list(range(8))
    got = sorted((r.qid, r.rank, r.nid, r.cos) for r in
                 ivf_search(spark, ivf_dir, _q(emb, ids), k=5,
                            n_probe=2).collect())
    want = sorted((r.qid, r.rank, r.nid, r.cos) for r in
                  ivf_topk(emb, ids, k=5, n_centroids=16, n_probe=2,
                           centroids="head").collect())
    assert got == want and len(got) > 0


def test_query_plan_prunes_partitions_and_runs_no_udf(spark, emb, ivf_dir):
    """The query-side plan must (a) push the probed list_ids into the
    partition filter of the lists scan — file-level pruning — and (b)
    contain NO Python/Arrow eval over the corpus: assignment happened once
    at build time."""
    q = _q(emb, [0, 1])
    res = ivf_search(spark, ivf_dir, q, k=3, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "PartitionFilters" in plan
    # the partition filter actually restricts list_id
    C, cids = read_ivf_centroids(spark, ivf_dir)
    import numpy as np
    probed = {p for ps in probe_lists(
        C, cids, np.asarray([v for _, v in q], dtype=np.float64), 2)
        for p in ps}
    seg = plan[plan.index("PartitionFilters"):]
    seg = seg[:seg.index("]") + 1]
    assert "list_id" in seg, seg
    # the filter carries exactly the probed ids (isin renders as IN/INSET);
    # note inputFiles() reports pre-pruning files, so the plan is the proof
    for p in probed:
        assert str(p) in seg, (seg, probed)
    import re as _re
    m = _re.search(r"IN \(([^)]*)\)", seg)
    assert m, seg
    filter_ids = {int(x) for x in _re.findall(r"-?\d+", m.group(1))}
    assert filter_ids == probed, (filter_ids, probed)


def test_centroids_roundtrip_and_manifest(spark, emb, ivf_dir):
    C, cids = read_ivf_centroids(spark, ivf_dir)
    assert C.shape == (16, len(emb.first().embedding))
    assert list(cids) == sorted(cids)
    with open(os.path.join(ivf_dir, "manifest.json")) as f:
        man = json.load(f)
    assert man["n_centroids"] == 16 and man["centroids_mode"] == "head"


def test_kmeans_artifact_deterministic(spark, emb, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_ivf(emb, d1, n_centroids=8, centroids="kmeans", kmeans_iters=3)
    build_ivf(emb, d2, n_centroids=8, centroids="kmeans", kmeans_iters=3)
    c1, _ = read_ivf_centroids(spark, d1)
    c2, _ = read_ivf_centroids(spark, d2)
    assert (c1 == c2).all()
    a1 = spark.read.parquet(f"{d1}/lists").select("nid", "list_id")
    a2 = spark.read.parquet(f"{d2}/lists").select("nid", "list_id")
    assert a1.exceptAll(a2).count() == 0 and a2.exceptAll(a1).count() == 0
