"""Bucketed co-located joins: pre-bucketing both sides of a recurring join
key eliminates the exchange entirely (SURVEY.md §4 / the 100 TB pattern for
repeated term-keyed joins, e.g. repeated index rebuilds or cross-corpus
term statistics)."""

import pytest
from pyspark.sql import functions as F

from light_splade_spark.functions.analyzers import doc_terms


@pytest.fixture(scope="module")
def warehouse(spark, docs):
    dt = doc_terms(docs.limit(200))
    (dt.write.mode("overwrite").format("parquet")
     .bucketBy(8, "term").sortBy("term")
     .saveAsTable("dt_bucketed"))
    tstats = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    (tstats.write.mode("overwrite").format("parquet")
     .bucketBy(8, "term").sortBy("term")
     .saveAsTable("terms_bucketed"))
    yield
    spark.sql("DROP TABLE IF EXISTS dt_bucketed")
    spark.sql("DROP TABLE IF EXISTS terms_bucketed")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    a = spark.table("dt_bucketed")
    b = spark.table("terms_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "term")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: SortMergeJoin directly over the bucketed scans —
        # no Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(term" not in plan
        # and it computes the right thing
        n = joined.count()
        assert n == a.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_same_join_needs_exchange(spark, docs):
    dt = doc_terms(docs.limit(200))
    tstats = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = dt.join(tstats, "term")._jdf.queryExecution() \
                 .executedPlan().toString()
        assert "Exchange" in plan  # the shuffle bucketing removes
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
