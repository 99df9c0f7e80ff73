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
   over SITES, so buckets are balanced when sites are many. A mega-site
   necessarily lives in ONE bucket at any ``bucket_hex`` (every row
   shares the site hash); the remedy for a site that dominates the
   corpus is an upstream pre-split of its pages by path prefix into
   synthetic sub-sites, not a bigger bucket space.
2. per-bucket counts -> exact cumulative offsets via a prefix-sum
   window over the COUNT AGGREGATE (at most 16^bucket_hex rows — a
   single-partition window over 65,536 rows at the default, never the
   corpus), broadcast back.
3. one corpus-wide shuffle: ``row_number() OVER (PARTITION BY bucket
   ORDER BY site, *order_cols)``; final id = bucket offset + local
   rank - 1.

The whole plan is LAZY (no job runs until the caller acts) and equals,
by construction, the rank in the total order ``(bucket_key, site,
*order_cols)`` — exactly expressible as one ANSI-SQL window, giving the
DuckDB oracle. Dense 0..N-1 ids are also what the index kernel wants:
doc-range salting (index/build.py) splits on ``max_doc`` and degrades
if the id space is sparse.

Like every exact two-pass dense-rank scheme, the input is evaluated
twice (the count pass and the assign pass — persist upstream if it is
expensive) and must be DETERMINISTIC between the passes; a
non-deterministic source could make offsets disagree with the window
counts. Known bound: in-bucket ranks come from ``row_number()``
(IntegerType), so one SITE exceeding 2^31 pages overflows — far beyond
any real site; the path-prefix pre-split above is also the remedy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from light_splade_spark.functions.urls import registrable_domain

DEFAULT_BUCKET_HEX = 4  # 16^4 = 65,536 buckets

_HELPERS = ("__site", "__bk", "__off")


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

    One corpus-wide shuffle (the per-bucket window sort) plus one
    map-side-combined count aggregate whose prefix-sum window and
    broadcast are bounded by 16^bucket_hex rows, never by corpus size.
    Fully lazy — building the DataFrame runs no job.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    clash = [c for c in docs.columns if c in _HELPERS]
    if clash:
        raise ValueError(
            f"assign_doc_ids reserves helper column names {_HELPERS}; "
            f"input already has {clash} — rename them first")
    site = (F.col(site_col) if site_col
            else registrable_domain(order_cols[0]))
    staged = docs.withColumn("__site", F.coalesce(site, F.lit(""))) \
                 .withColumn("__bk", F.substring(F.md5("__site"), 1,
                                                 bucket_hex))
    # exact offsets = exclusive prefix sum over the per-bucket counts,
    # computed lazily inside the same plan (the single-partition window
    # runs over the aggregate — bounded by the bucket space)
    counts = staged.groupBy("__bk").agg(F.count(F.lit(1)).alias("__n"))
    wcum = Window.orderBy("__bk").rowsBetween(
        Window.unboundedPreceding, -1)
    odf = counts.select(
        "__bk",
        F.coalesce(F.sum("__n").over(wcum), F.lit(0)).alias("__off"))
    w = Window.partitionBy("__bk").orderBy(
        F.col("__site").asc(), *[F.col(c).asc() for c in order_cols])
    return (staged.join(F.broadcast(odf), "__bk")
            .withColumn(out_col,
                        F.col("__off") + F.row_number().over(w) - 1)
            .drop("__bk", "__site", "__off"))


def docid_map(remapped: DataFrame, id_col: str,
              out_col: str = "ordered_id") -> DataFrame:
    """(ordered_id, <id_col>) lookup table — persist next to the index so
    query results (which carry the dense ids) can be joined back to the
    corpus' external ids/urls."""
    return remapped.select(F.col(out_col), F.col(id_col))
