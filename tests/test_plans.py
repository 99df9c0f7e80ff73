"""Physical-plan assertions: the plans we ship are the plans we want.

Checks that Catalyst actually gives us predicate pushdown, partition pruning,
broadcast joins, and whole-stage codegen where the design relies on them —
the properties that keep the 100 TB story honest.
"""

import pytest
from pyspark.sql import functions as F

from light_splade_spark.fixtures import DOCUMENTS_QUERY_SET
from light_splade_spark.index.build import build_index, read_postings
from light_splade_spark.plans.bm25_sql import bm25_topk_docs


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def idx(spark, docs, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    build_index(spark, docs, d, n_shards=4, n_buckets=8, n_salts=2,
                n_shard_groups=1)
    return d


def test_postings_scan_prunes_buckets_and_pushes_terms(spark, idx):
    """Query-side scan must hit only query-term buckets (partition pruning)
    and push the term_id IN (...) filter to parquet."""
    scan = (read_postings(spark, idx)
            .where(F.col("bucket").isin([1, 3]) & F.col("term_id").isin([7, 11]))
            .select("shard", "term_id", "postings"))
    plan = _plan(scan)
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]
    assert "PushedFilters" in plan
    assert "term_id" in plan.split("PushedFilters")[1][:300]


def test_column_pruning_reaches_parquet(spark, sf_dir):
    """ReadSchema must contain only the projected columns (fresh scan: the
    shared docs fixture is cached, which hides the FileScan)."""
    fresh = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = fresh.select("o_orderkey").where(F.col("o_orderkey") < 10)
    plan = _plan(df)
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in rs and "o_totalprice" not in rs
    assert "PushedFilters" in plan and "LessThan(o_orderkey,10)" in plan


def test_bm25_query_side_broadcast(spark, docs):
    """The query batch joins postings via broadcast — no shuffle of the
    corpus-side rows onto query keys."""
    plan = _plan(bm25_topk_docs(docs, DOCUMENTS_QUERY_SET, top_k=10))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_bm25_uses_hash_aggregate_topk_pushdown_and_codegen(spark, docs):
    df = bm25_topk_docs(docs, DOCUMENTS_QUERY_SET, top_k=10)
    plan = _plan(df)
    assert "HashAggregate" in plan          # partial+final agg, not sort-agg
    assert "WindowGroupLimit" in plan       # rank<=k pushed below the window
    df.collect()                            # finalize AQE to see codegen spans
    final = _plan(df)
    # "*(n)" node prefix marks WholeStageCodegen spans in plan toString
    assert "*(" in final


def test_tokenizer_is_jvm_side(spark, docs):
    """The analyzer chain must not appear as a Python UDF node — it is
    split/lower/filter built-ins inside codegen."""
    from light_splade_spark.functions.analyzers import doc_terms
    plan = _plan(doc_terms(docs))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_dedup_is_semi_join_on_digest(spark, docs):
    from light_splade_spark.operators.dedup import exact_dedup
    plan = _optimized(exact_dedup(docs))
    assert "LeftSemi" in plan
