"""Deterministic stratified sampling (operators/sampling.py): rate
accuracy per stratum, determinism/stability, growth-independence, and
plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from light_splade_spark.operators.sampling import (
    DEFAULT_SALT, sample_unit, stratified_sample)


@pytest.fixture(scope="module")
def spark():
    from light_splade_spark.session import get_spark
    return get_spark(app_name="test-sampling", master="local[4]",
                     extra_conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id BIGINT, lang STRING")


def _py_unit(doc_id: int, salt: str = DEFAULT_SALT) -> float:
    h = hashlib.md5(f"{salt}#{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) / float(1 << 60)


def test_matches_python_reference(spark, docs):
    """The JVM expression equals the documented md5 rule bit-for-bit."""
    got = {r["doc_id"]: r["u"] for r in
           docs.limit(50).select("doc_id",
                                 sample_unit("doc_id").alias("u")).collect()}
    for d, u in got.items():
        assert u == _py_unit(d)


def test_rates_and_strata(spark, docs):
    out = stratified_sample(docs, {"en": 0.5, "de": 0.2},
                            default_fraction=0.0)
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    assert "fr" not in by_lang                    # default 0.0 drops
    assert abs(by_lang["en"] / 1000 - 0.5) < 0.06  # 1000 docs per stratum
    assert abs(by_lang["de"] / 1000 - 0.2) < 0.06
    # exact expected counts from the Python reference rule
    want_en = sum(1 for i in range(0, 3000, 3) if _py_unit(i) < 0.5)
    assert by_lang["en"] == want_en


def test_deterministic_and_growth_stable(spark, docs):
    """Same rows every run; adding new docs never flips an old doc."""
    ids1 = {r["doc_id"] for r in
            stratified_sample(docs, {"en": 0.3}).select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in
            stratified_sample(docs, {"en": 0.3}).select("doc_id").collect()}
    assert ids1 == ids2
    grown = docs.union(spark.createDataFrame(
        [(99_000 + i, "en") for i in range(100)], "doc_id BIGINT, lang STRING"))
    ids3 = {r["doc_id"] for r in
            stratified_sample(grown, {"en": 0.3}).select("doc_id").collect()}
    assert ids1 == {i for i in ids3 if i < 99_000}


def test_default_fraction_and_null_stratum(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, None)], "doc_id BIGINT, lang STRING")
    # default 1.0: unknown and NULL strata both keep everything
    kept = {r["doc_id"] for r in
            stratified_sample(df, {"en": 1.0}, default_fraction=1.0)
            .select("doc_id").collect()}
    assert kept == {1, 2, 3}
    # default 0.0: only the configured stratum survives
    kept0 = {r["doc_id"] for r in
             stratified_sample(df, {"en": 1.0}).select("doc_id").collect()}
    assert kept0 == {1}


def test_many_strata_stays_flat(spark, docs):
    """A per-domain-sized fractions dict must stay a single map-literal
    lookup (never a 10k-deep CASE chain that breaks codegen)."""
    big = {f"s{i}": 0.5 for i in range(5000)}
    big["en"] = 1.0
    out = stratified_sample(docs, big, default_fraction=0.0)
    assert out.where("lang = 'en'").count() == 1000
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_map_only_plan(spark, docs):
    plan = stratified_sample(docs, {"en": 0.5}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
