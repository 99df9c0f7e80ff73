"""Ranking metrics in pure Spark SQL — MRR / NDCG / MAP / recall / precision @k.

Re-expresses the reference's BEIR/pytrec_eval delegation
(``evaluator/metrics_evaluator.py:41-108``) as distributed aggregations:
per-query window ranks -> per-query metric -> mean over queries. Binary
relevance (qrels are positive lists, reference ``metrics_evaluator.py:71-77``
maps every judged doc to relevance 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,  # (qid, rank, doc_id) — rank 1-based, unique per qid
    qrels: DataFrame,    # (qid, doc_id) positive pairs
    k_values: list[int] = (10,),
) -> DataFrame:
    """-> one row per k: (k, mrr, ndcg, map, recall, precision), averaged over
    all queries that have >=1 positive (reference behavior: every evaluated
    query appears in qrels)."""
    hits = (
        results.join(qrels.withColumn("rel", F.lit(1)), ["qid", "doc_id"], "left")
        .select("qid", "rank", F.coalesce("rel", F.lit(0)).alias("rel"))
    )
    n_pos = qrels.groupBy("qid").agg(F.count(F.lit(1)).alias("n_pos"))
    out = None
    wcum = (
        Window.partitionBy("qid").orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hits = hits.withColumn("cumrel", F.sum("rel").over(wcum))
    for k in k_values:
        hk = hits.where(F.col("rank") <= k)
        per_q = (
            hk.groupBy("qid")
            .agg(
                F.max(F.when(F.col("rel") == 1, 1.0 / F.col("rank")).otherwise(0.0))
                .alias("rr"),
                F.sum(F.when(F.col("rel") == 1,
                             1.0 / F.log2(F.col("rank") + 1)).otherwise(0.0))
                .alias("dcg"),
                F.sum("rel").alias("n_hit"),
                # AP numerator: Σ over hit positions of precision@position
                F.sum(F.when(F.col("rel") == 1,
                             F.col("cumrel") / F.col("rank")).otherwise(0.0))
                .alias("ap_num"),
            )
        )
        per_q = per_q.join(n_pos, "qid", "right").fillna(
            {"rr": 0.0, "dcg": 0.0, "n_hit": 0, "ap_num": 0.0})
        # ideal DCG for n_pos positives truncated at k
        idcg = F.expr(
            f"aggregate(sequence(1, least(n_pos, {k})), cast(0.0 as double),"
            " (acc, i) -> acc + 1.0 / log2(i + 1))"
        )
        row = per_q.select(
            F.lit(k).alias("k"),
            F.col("rr"),
            (F.col("dcg") / idcg).alias("ndcg_q"),
            (F.col("ap_num") / F.col("n_pos")).alias("ap_q"),
            (F.col("n_hit") / F.col("n_pos")).alias("recall_q"),
            (F.col("n_hit") / F.lit(k)).alias("prec_q"),
        ).groupBy("k").agg(
            F.round(F.avg("rr"), 5).alias("mrr"),
            F.round(F.avg("ndcg_q"), 5).alias("ndcg"),
            F.round(F.avg("ap_q"), 5).alias("ap"),
            F.round(F.avg("recall_q"), 5).alias("recall"),
            F.round(F.avg("prec_q"), 5).alias("prec"),
        )
        out = row if out is None else out.unionByName(row)
    return out
