"""Per-stage scaling profile: where does the 2->8-core build lose its 4x?

Runs each pipeline stage in isolation on the deterministic scaling corpus at
the given core count (fresh process per invocation) and prints one JSON line
of stage wall times. Usage: python tools/profile_scaling.py <cores> [n_docs]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from light_splade_spark.fixtures import make_corpus_df  # noqa: E402
from light_splade_spark.functions.analyzers import doc_terms, doc_tokens  # noqa: E402
from light_splade_spark.index.build import (  # noqa: E402
    POSTING_SCHEMA,
    RUN_SCHEMA,
    _encode_groups,
    _merge_groups,
    build_dims,
)
from light_splade_spark.plans.bm25_sql import B, K1  # noqa: E402
from light_splade_spark.session import get_spark  # noqa: E402


def t(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 2)


def main():
    cores = sys.argv[1]
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
    wbits = int(os.environ.get("SPARK_GRAFT_WBITS", "8"))
    spark = get_spark(app_name=f"prof-{cores}", master=f"local[{cores}]",
                      extra_conf={"spark.sql.shuffle.partitions": "64"})
    corpus_path = f"/tmp/lss_scaling_corpus_{n_docs}"
    if not os.path.exists(corpus_path):
        make_corpus_df(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    out = {"cores": int(cores), "n_docs": n_docs}

    out["scan_count"] = t(lambda: docs.count())
    out["tokenize_dl"] = t(lambda: doc_tokens(docs).agg(F.sum("dl")).collect())
    dt = doc_terms(docs)
    out["doc_terms_agg"] = t(lambda: dt.write.format("noop").mode("overwrite").save())

    work = tempfile.mkdtemp(prefix=f"prof_{cores}_")
    try:
        t0 = time.time()
        dt2, terms, scalars = build_dims(
            docs, doc_stats_path=os.path.join(work, "doc_stats"))
        terms.write.mode("overwrite").parquet(os.path.join(work, "terms"))
        out["dims_total"] = round(time.time() - t0, 2)

        terms_b = F.broadcast(
            spark.read.parquet(os.path.join(work, "terms"))
            .select("term", "term_id", "idf", "df"))
        n_shards = max(4, min(scalars["n_docs"] // 25000, 4096))
        n_salts_t = F.least(F.lit(8), F.ceil(F.col("df") / 4096.0).cast("int"))
        posts = dt2.join(terms_b, "term").select(
            F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
            F.pmod(F.col("term_id"), F.lit(16)).cast("int").alias("bucket"),
            "term_id", "doc_id",
            (F.col("idf") * (F.col("tf") * (K1 + 1.0))
             / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl")
                                    / F.lit(scalars["avgdl"])))
             ).cast("float").alias("w"),
            F.floor(F.col("doc_id") * n_salts_t
                    / F.lit(scalars["max_doc"] + 1)).cast("int").alias("salt"),
        )
        out["posts_noop"] = t(
            lambda: posts.write.format("noop").mode("overwrite").save())
        phase1 = functools.partial(_encode_groups, block_size=128,
                                   weight_bits=wbits)
        runs = posts.groupBy("shard", "bucket", "salt").applyInPandas(
            phase1, RUN_SCHEMA)
        out["phase1_noop"] = t(
            lambda: runs.write.format("noop").mode("overwrite").save())
        final = runs.groupBy("shard", "bucket").applyInPandas(
            _merge_groups, POSTING_SCHEMA)
        out["phase2_noop"] = t(
            lambda: final.write.format("noop").mode("overwrite").save())
        out["full_write"] = t(lambda: (
            final.repartition(16, "bucket").write.mode("overwrite")
            .partitionBy("bucket").parquet(os.path.join(work, "postings"))))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
