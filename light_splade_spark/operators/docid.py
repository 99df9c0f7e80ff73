"""Cluster-preserving doc-ID assignment for web corpora.

Public technique: assigning document IDs in URL order places pages from
the same site (which share vocabulary — templates, navigation, topic)
at ADJACENT ids, so the d-gaps inside every posting list shrink and the
delta+VByte encoding (index/build.py) compresses markedly better. This
is the classic "sorting the document identifiers" result from the web-
search literature (locality-based docID reassignment); the reference
has no notion of docID assignment at all — its CSR matrix keys rows by
arrival order (sparse_indexer.py:105-153).

Scale shape (the whole point — a global ``row_number() OVER (ORDER BY
url)`` is a single-partition sort and dies at 10^12 docs):

1. bucket key = first ``bucket_hex`` hex chars of md5(site) — uniform
   over sites, so buckets are balanced unless one site dominates the
   corpus (documented tradeoff: a mega-site lives in one bucket; raise
   ``bucket_hex`` and/or pre-split such sites by path prefix upstream).
2. per-bucket counts -> exact cumulative offsets on the driver. This
   collect is bounded by 16^bucket_hex rows (65,536 at the default),
   NOT by corpus size.
3. one shuffle: ``row_number() OVER (PARTITION BY bucket ORDER BY
   site, *order_cols)``; final id = bucket offset + local rank - 1.

The resulting ids are globally DENSE (0..N-1) and equal, by
construction, to the rank in the total order ``(bucket_key, site,
*order_cols)`` — which is exactly expressible as one ANSI-SQL window,
giving the DuckDB oracle. Dense ids are also what the index kernel
wants: doc-range salting (index/build.py) splits on ``max_doc`` and
degrades if the id space is sparse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from light_splade_spark.functions.urls import registrable_domain

DEFAULT_BUCKET_HEX = 4  # 16^4 = 65,536 buckets


def assign_doc_ids(
    docs: DataFrame,
    order_cols: tuple[str, ...] = ("url",),
    site_col: str | None = None,
    bucket_hex: int = DEFAULT_BUCKET_HEX,
    out_col: str = "ordered_id",
) -> DataFrame:
    """All input columns + ``out_col``: dense 0..N-1 ids in the total
    order ``(substr(md5(site),1,bucket_hex), site, *order_cols)``.

    ``site_col`` names the clustering key (pages sharing it become
    id-adjacent); when None it is derived as ``registrable_domain``
    of the first order column. ``order_cols`` must be a total order
    within a site for the assignment to be deterministic — include a
    unique tiebreaker (raw url, original id) as the last element, and
    keep order columns NON-NULL (Spark sorts NULLS FIRST ascending,
    ANSI mirrors may default to NULLS LAST — the oracle contract here
    only covers non-null keys). A NULL site keys bucket '' via
    ``coalesce``.

    One wide shuffle (the per-bucket window sort); the offsets join is
    a broadcast of at most 16^bucket_hex rows. No corpus-sized collect.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    site = (F.col(site_col) if site_col
            else registrable_domain(order_cols[0]))
    staged = docs.withColumn("__site", F.coalesce(site, F.lit(""))) \
                 .withColumn("__bk", F.substring(F.md5("__site"), 1,
                                                 bucket_hex))
    counts = staged.groupBy("__bk").agg(F.count(F.lit(1)).alias("__n")) \
                   .collect()  # bounded by 16^bucket_hex, never by corpus
    offset = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["__bk"]):
        offsets.append((r["__bk"], offset))
        offset += r["__n"]
    spark = docs.sparkSession
    odf = F.broadcast(spark.createDataFrame(offsets, "__bk STRING, __off LONG"))
    w = Window.partitionBy("__bk").orderBy(
        F.col("__site").asc(), *[F.col(c).asc() for c in order_cols])
    return (staged.join(odf, "__bk")
            .withColumn(out_col,
                        F.col("__off") + F.row_number().over(w) - 1)
            .drop("__bk", "__site", "__off"))


def docid_map(remapped: DataFrame, id_col: str,
              out_col: str = "ordered_id") -> DataFrame:
    """(ordered_id, <id_col>) lookup table — persist next to the index so
    query results (which carry the dense ids) can be joined back to the
    corpus' external ids/urls."""
    return remapped.select(F.col(out_col), F.col(id_col))
