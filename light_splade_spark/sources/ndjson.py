"""NDJSON sources/sinks with strict schemas + referential-integrity checks.

Re-expresses the reference loaders (``data/ndjson_loader.py``, ``master.py``,
``positive_list.py``, ``triplet_list.py``, ``pair_score.py``) Spark-first:
``spark.read.schema(...).json`` handles files, directories, and ``.gz``
transparently (the reference hand-rolls globbing and gzip,
``ndjson_loader.py:44-57,87-88``); FAILFAST mode replaces the eager dataclass
validation raise (``master.py:80-88``); the cross-file integrity rules of
``triplet_dataset.py:84-121`` become left-anti-join assertions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Schemas per reference `schemas/data/__init__.py:20-65`
DOC_MASTER_SCHEMA = "doc_id BIGINT, text STRING"
QUERY_MASTER_SCHEMA = "qid BIGINT, text STRING"
POSITIVE_LIST_SCHEMA = "qid BIGINT, positive_doc_ids ARRAY<BIGINT>"
TRIPLET_SCHEMA = "qid BIGINT, pos_doc_id BIGINT, neg_doc_id BIGINT"
PAIR_SCORE_SCHEMA = "qid BIGINT, scores MAP<STRING, DOUBLE>"


def _read(spark: SparkSession, path: str, schema: str, strict: bool) -> DataFrame:
    mode = "FAILFAST" if strict else "PERMISSIVE"
    return spark.read.schema(schema).option("mode", mode).json(path)


def read_doc_master(spark, path, strict=True) -> DataFrame:
    return _read(spark, path, DOC_MASTER_SCHEMA, strict)


def read_query_master(spark, path, strict=True) -> DataFrame:
    return _read(spark, path, QUERY_MASTER_SCHEMA, strict)


def read_positive_list(spark, path, strict=True) -> DataFrame:
    return _read(spark, path, POSITIVE_LIST_SCHEMA, strict)


def read_triplets(spark, path, strict=True) -> DataFrame:
    return _read(spark, path, TRIPLET_SCHEMA, strict)


def read_pair_scores(spark, path, strict=True, target_qids=None) -> DataFrame:
    """Doc-id keys arrive as JSON strings and are coerced to BIGINT
    (reference ``pair_score.py:56``); optional qid pre-filter
    (``pair_score.py:52-53``) is a pushed-down `isin`."""
    df = _read(spark, path, PAIR_SCORE_SCHEMA, strict)
    if target_qids is not None:
        df = df.where(F.col("qid").isin(list(target_qids)))
    return df.select(
        "qid",
        F.map_from_arrays(
            F.transform(F.map_keys("scores"), lambda k: k.cast("bigint")),
            F.map_values("scores"),
        ).alias("scores"),
    )


class IntegrityError(ValueError):
    pass


def _assert_empty(df: DataFrame, rule: str) -> None:
    n = df.limit(1).count()
    if n:
        sample = [r.asDict() for r in df.limit(5).collect()]
        raise IntegrityError(f"{rule}; examples: {sample}")


def validate_dataset(
    doc_master: DataFrame,
    query_master: DataFrame,
    positives: DataFrame,
) -> None:
    """The reference's referential-integrity rules
    (``triplet_dataset.py:94-121``) as left-anti-join assertions:
    qids in positives ⊆ query master; positive doc ids ⊆ doc master;
    every query has >=1 positive; ids unique in both masters."""
    _assert_empty(
        positives.join(query_master, "qid", "left_anti"),
        "positive-list qid missing from query master",
    )
    pos_pairs = positives.select("qid", F.explode("positive_doc_ids").alias("doc_id"))
    _assert_empty(
        pos_pairs.join(doc_master, "doc_id", "left_anti"),
        "positive doc_id missing from doc master",
    )
    _assert_empty(
        query_master.join(positives, "qid", "left_anti"),
        "query has no positives",
    )
    for df, col, name in ((doc_master, "doc_id", "doc"), (query_master, "qid", "query")):
        _assert_empty(
            df.groupBy(col).count().where(F.col("count") > 1),
            f"duplicate {name} ids",
        )


def write_ndjson(df: DataFrame, path: str, compress: bool = False) -> None:
    """NDJSON sink (reference ``run_convert_mmarco_ja_triplet.py:51-106``)."""
    w = df.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
