"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (all-JVM: zip_with +
aggregate, stays in codegen); the scale path is LSH bucketing via random
hyperplane signs (deterministic md5-derived hyperplanes so results are
reproducible and oracle-able) — candidates only join within a bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from light_splade_spark.partitioning import spread_input

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
    # the streamed side does |queries| * N vector ops before any exchange;
    # an under-partitioned scan would run them on one task (guide §2.5)
    c = spread_input(emb).select(F.col(id_col).alias("nid"),
                                 F.col(vec_col).alias("nv"))
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
    exact: bool = False,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding near-dup filter.

    This is the EXACT quadratic form (a BroadcastNestedLoopJoin): O(n²)
    vector ops by construction, only sane on bounded corpora. It therefore
    requires an explicit ``exact=True``; the default refuses and points at
    ``cosine_neardup_pairs_lsh``, the bucketed scale path."""
    if not exact:
        raise ValueError(
            "cosine_neardup_pairs is O(n²) by construction; pass exact=True "
            "for a bounded corpus, or use cosine_neardup_pairs_lsh (sign-LSH "
            "bucketed, multi-probe) at scale")
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b",
                F.round(cosine_col(F.col("va"), F.col("vb")),
                        SCORE_DECIMALS).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def cosine_neardup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Near-dup pairs via sign-LSH bucketing — the 100 TB path.

    Each vector gets a ``n_planes``-bit sign bucket; candidate pairs share a
    bucket (an equi-join — the plan contains NO nested-loop join), and exact
    cosine + threshold re-verifies candidates. ``multiprobe=True`` also
    probes every 1-bit-flipped bucket from the left side, so any pair whose
    sign codes differ in <=1 plane is still found — high-cosine pairs rarely
    differ in more. Deterministic (seeded hyperplanes), hence oracle-able.
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    if multiprobe:
        probe_arr = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(2 ** i)) for i in range(n_planes)],
        )
        left = base.select("vec_id", "v", F.explode(probe_arr).alias("probe"))
    else:
        left = base.select("vec_id", "v", F.col("bucket").alias("probe"))
    a, b = left.alias("a"), base.alias("b")
    return (
        a.join(b, (F.col("a.probe") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.round(cosine_col(F.col("a.v"), F.col("b.v")),
                        SCORE_DECIMALS).alias("cos"))
        .where(F.col("cos") >= threshold)
        .distinct()  # a pair can match via several probes
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


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int = 64,
    iters: int = 5,
    sample_size: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic spherical k-means coarse quantizer (float64).

    Sample = the ``sample_size`` vectors with the smallest
    ``xxhash64(id, seed)`` — a TakeOrdered on a seeded hash, so the sample
    is (a) deterministic and bounded in driver memory at any corpus size,
    and (b) UNBIASED w.r.t. id order (crawl ids correlate with time/source;
    the round-2 lowest-id sample saw one corner of the distribution).
    Init = the first ``n_centroids`` of the hash-ordered sample; a FIXED
    number of Lloyd iterations on L2-normalized vectors (cosine k-means).
    No randomness anywhere, so two builds produce bit-identical centroids.

    Raises when the corpus has fewer than ``n_centroids`` vectors — fewer
    centroids than requested would silently change probe semantics
    downstream. Duplicate vectors in the init slice can still yield
    duplicate centroids (empty lists simply attract no members)."""
    rows = (emb.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
            .limit(sample_size).collect())
    if len(rows) < n_centroids:
        raise ValueError(
            f"kmeans_centroids: corpus/sample has {len(rows)} vectors but "
            f"n_centroids={n_centroids}; reduce n_centroids (silently "
            "returning fewer centroids would change probe semantics)")
    X = np.asarray([r[1] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[:n_centroids].copy()
    for _ in range(iters):
        sim = Xn @ C.T                       # (n, k) cosine since normalized
        assign = np.argmax(sim, axis=1)      # first max -> lowest index wins
        for j in range(C.shape[0]):
            members = Xn[assign == j]
            if members.size:
                m = members.sum(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    C[j] = m / nrm           # spherical mean
    return C


def _probe_lists_udf(C: np.ndarray, cids: np.ndarray, n_probe: int):
    """Pandas UDF: nearest ``n_probe`` centroid ids per vector.

    The centroid matrix ships once per executor in the UDF closure (a
    broadcast, not a per-row literal expression — the shape that holds at a
    realistic nlist of thousands). Cosine in float64, rounded to 6 decimals,
    tie-break on centroid id ASC — mirroring the DuckDB oracle exactly."""
    from pyspark.sql.functions import pandas_udf

    Cnorm = np.linalg.norm(C, axis=1)

    @pandas_udf("array<bigint>")
    def probes(vs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        if X.size == 0:
            return pd.Series([], dtype=object)
        cos = (X @ C.T) / (np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                                      1e-12) * Cnorm)
        r = np.round(cos, 6)
        # top n_probe by (cos desc, cid asc): lexsort over (cid, -cos)
        order = np.lexsort((np.broadcast_to(cids, r.shape), -r), axis=1)
        top = cids[order[:, :n_probe]]
        return pd.Series([row.tolist() for row in top])

    return probes


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "head",
    kmeans_iters: int = 5,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into ``n_centroids`` inverted
    lists, probe each query's ``n_probe`` nearest lists, re-rank exactly
    within them. At 100 TB: the corpus shuffles once on list_id; each query
    touches ~n_probe/n_centroids of the data; assignment is one Arrow-batched
    GEMM against a closure-broadcast centroid matrix (never an
    O(n_centroids)-wide literal expression).

    ``centroids='head'``: the first ``n_centroids`` corpus vectors — a
    deterministic stand-in that DuckDB can mirror row-for-row (the
    correctness-gate configuration; NOTE its oracle assumes dense 0-based
    ids, i.e. ``vec_id < n_centroids`` selects exactly the orderBy-limit
    head). ``centroids='kmeans'``: sampled deterministic Lloyd
    (kmeans_centroids) — the quality path; verified by pytest
    recall/determinism tests instead of SQL. Raises if the corpus has fewer
    than ``n_centroids`` vectors (head mode too — silently fewer lists
    would change probe semantics)."""
    import pandas as _pd  # noqa: F401  (pandas_udf needs pandas importable)
    from pyspark.sql import Window

    if centroids == "head":
        rows = (emb.select(id_col, vec_col).orderBy(id_col)
                .limit(n_centroids).collect())
        if len(rows) < n_centroids:
            raise ValueError(
                f"ivf_topk: corpus has {len(rows)} vectors but "
                f"n_centroids={n_centroids}")
        C = np.asarray([r[1] for r in rows], dtype=np.float64)
        cids = np.asarray([int(r[0]) for r in rows], dtype=np.int64)
    elif centroids == "kmeans":
        C = kmeans_centroids(emb, n_centroids, iters=kmeans_iters,
                             id_col=id_col, vec_col=vec_col)
        cids = np.arange(C.shape[0], dtype=np.int64)
    else:
        raise ValueError(f"unknown centroids mode {centroids!r}")

    assign1 = _probe_lists_udf(C, cids, 1)
    probe_n = _probe_lists_udf(C, cids, n_probe)
    base = emb.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    assigned = base.withColumn("list_id", assign1("nv")[0])
    q = (base.where(F.col("nid").isin(query_ids))
         .select(F.col("nid").alias("qid"), F.col("nv").alias("qv"),
                 F.explode(probe_n("nv")).alias("list_id")))
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
    hamming_probes: int = 2,
) -> DataFrame:
    """Approximate NN: candidates share the sign-LSH bucket, then exact cosine
    re-rank within bucket. Recall < 1 by design; the 100 TB path (corpus
    shuffles once on bucket; each query probes one bucket at
    ``hamming_probes=0``).

    Default ``hamming_probes=2``: single-bucket probing measures recall@5
    of only 0.04 at the bench configuration (n_planes=6, 2k vectors) vs
    0.70 with two-bit probing, at no measurable latency cost there — the
    probe explosion is query-side only (sum of C(n_planes, i) buckets per
    query). Callers wanting the raw single-bucket behavior pass
    ``hamming_probes=0`` explicitly.

    ``hamming_probes`` > 0 turns on multi-probe LSH (the public
    Lv et al. 2007 recipe): each query ALSO probes every bucket within
    that Hamming distance of its own — sign-LSH's near-miss neighbors
    differ in exactly the planes whose margin was small, so flipping a
    few bits recovers most of the lost recall at a known candidate-cost
    multiplier (sum of C(n_planes, i) for i <= h buckets probed instead
    of 1). Still a pure equi-join: only the tiny QUERY side explodes
    (probe buckets are distinct and each corpus vector lives in exactly
    one bucket, so no duplicate candidate pairs arise); the corpus
    still shuffles once on its single bucket."""
    from itertools import combinations

    from pyspark.sql import Window

    planes = random_hyperplanes(dim, n_planes, seed)
    # n_planes dot products per vector before the bucket join — spread an
    # under-partitioned scan so they don't run on one task (guide §2.5)
    withb = spread_input(emb).select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"),
        lsh_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    q = withb.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("qid"), F.col("nv").alias("qv"), "bucket")
    if hamming_probes > 0:
        masks = [0]
        for h in range(1, hamming_probes + 1):
            for bits in combinations(range(n_planes), h):
                masks.append(sum(1 << b for b in bits))
        q = q.select(
            "qid", "qv",
            F.explode(F.array(*[
                F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks
            ])).alias("bucket"))
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
