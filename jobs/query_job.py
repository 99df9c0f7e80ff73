"""spark-submit entry: batch top-k BM25 queries against a built index.

    spark-submit --py-files light_splade_spark.zip jobs/query_job.py \
        --index-dir /path/to/index \
        --queries /path/to/queries.ndjson   # {"qid": 1, "text": "..."} lines
        --output /path/to/results.parquet \
        [--top-k 10 --threshold 0.0 --mode bmw]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--threshold", type=float, default=0.0)
    p.add_argument("--mode", default="bmw", choices=["bmw", "taat"])
    args = p.parse_args()

    spark = SparkSession.builder.appName("lss-query").getOrCreate()
    from light_splade_spark.index.wand import wand_topk
    from light_splade_spark.sources.ndjson import read_query_master

    qs = [(int(r["qid"]), r["text"])
          for r in read_query_master(spark, args.queries).collect()]
    out = wand_topk(spark, args.index_dir, qs, top_k=args.top_k,
                    threshold=args.threshold, mode=args.mode)
    out.write.mode("overwrite").parquet(args.output)
    print(f"wrote {out.count()} result rows for {len(qs)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
