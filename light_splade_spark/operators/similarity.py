"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (all-JVM: zip_with +
aggregate, stays in codegen); the scale path is LSH bucketing via random
hyperplane signs (deterministic md5-derived hyperplanes so results are
reproducible and oracle-able) — candidates only join within a bucket.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCORE_DECIMALS = 4


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors: (qid, rank, nid, cos).

    The query side (a bounded id list) is broadcast; the corpus side streams —
    a broadcast-nested-loop whose cost is |queries| * N vector ops, all inside
    whole-stage codegen. Tie-break (cos DESC, nid ASC); self-match excluded.
    """
    from pyspark.sql import Window

    q = emb.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    if query_ids is not None:
        q = q.where(F.col("qid").isin(query_ids))
    c = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cosine_col(F.col("qv"), F.col("nv")),
                                      SCORE_DECIMALS).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos")
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup filter.

    Exact quadratic form for correctness checking; at 100 TB wrap it with
    ``lsh_buckets`` candidates (same scores, bucket-restricted join)."""
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                F.round(cosine_col(F.col("va"), F.col("vb")),
                        SCORE_DECIMALS).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-less hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id: bit i = (v . plane_i) >= 0 — JVM-side arithmetic."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec_col, arr) >= 0, F.lit(2 ** i).cast("bigint")).otherwise(0)
        bucket = bucket + bit
    return bucket


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: coarse quantizer = the first ``n_centroids`` corpus
    vectors (deterministic, oracle-able stand-in for k-means centroids);
    every vector is assigned to its nearest centroid (inverted list), a
    query probes its ``n_probe`` nearest lists and re-ranks exactly within
    them. At 100 TB: corpus shuffles once on centroid id; queries touch
    n_probe/n_centroids of the data."""
    from pyspark.sql import Window

    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in emb.select(id_col, vec_col).orderBy(id_col)
        .limit(n_centroids).collect()
    ]

    def _best_lists(vec, n):
        scored = F.array(*[
            F.struct(F.round(cosine_col(vec, F.array(*[F.lit(x) for x in cv])),
                             6).alias("c"),
                     F.lit(-ci).alias("nr"), F.lit(ci).alias("ci"))
            for ci, cv in cents
        ])
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return F.transform(top, lambda s: s["ci"])

    base = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    assigned = base.withColumn("list_id", _best_lists(F.col("nv"), 1)[0])
    q = (base.where(F.col("nid").isin(query_ids))
         .select(F.col("nid").alias("qid"), F.col("nv").alias("qv"),
                 F.explode(_best_lists(F.col("nv"), n_probe)).alias("list_id")))
    scored = (
        assigned.join(F.broadcast(q), "list_id")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cosine_col(F.col("qv"), F.col("nv")),
                                      SCORE_DECIMALS).alias("cos"))
        .distinct()
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k).select("qid", "rank", "nid", "cos"))


def ann_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN: candidates share the sign-LSH bucket, then exact cosine
    re-rank within bucket. Recall < 1 by design; the 100 TB path (corpus
    shuffles once on bucket; each query probes one bucket)."""
    from pyspark.sql import Window

    planes = random_hyperplanes(dim, n_planes, seed)
    withb = emb.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    q = withb.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("qid"), F.col("nv").alias("qv"), "bucket")
    scored = (
        withb.join(F.broadcast(q), "bucket")
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(cosine_col(F.col("qv"), F.col("nv")),
                                      SCORE_DECIMALS).alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos")
    )
