"""spark-submit entry: index lifecycle maintenance — append, delete, compact.

    spark-submit --py-files light_splade_spark.zip jobs/maintain_index_job.py \
        --index-dir /path/to/index append --input docs.parquet --batch-id b1
    spark-submit ... jobs/maintain_index_job.py \
        --index-dir /path/to/index delete --doc-ids 12,34,56
    spark-submit ... jobs/maintain_index_job.py \
        --index-dir /path/to/index delete --doc-ids-parquet deletes.parquet
    spark-submit ... jobs/maintain_index_job.py \
        --index-dir /path/to/index compact [--no-gc]
    spark-submit ... jobs/maintain_index_job.py \
        --index-dir /path/to/index gc [--grace-sec 3600]
    spark-submit ... jobs/maintain_index_job.py \
        --index-dir /path/to/index verify [--sample-terms 64]

The LSM lifecycle (index/compact.py, index/tombstones.py): appends add
immutable shard groups, deletes add tombstone markers, compact folds both
back to one posting row per (shard, bucket, term) with an atomic liveness
commit, gc removes non-live group directories (safe any time). verify is
the read-only integrity fsck (index/fsck.py) — prints the findings JSON
and exits 1 when any error-severity finding exists.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--index-dir", required=True)
    sub = p.add_subparsers(dest="op", required=True)

    ap = sub.add_parser("append")
    ap.add_argument("--input", required=True)
    ap.add_argument("--batch-id", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")

    dp = sub.add_parser("delete")
    g = dp.add_mutually_exclusive_group(required=True)
    g.add_argument("--doc-ids", help="comma-separated doc ids")
    g.add_argument("--doc-ids-parquet",
                   help="parquet path with a doc_id column")

    cp = sub.add_parser("compact")
    cp.add_argument("--no-gc", action="store_true",
                    help="skip deleting non-live group dirs (run `gc` later)")

    gp = sub.add_parser("gc")
    gp.add_argument("--grace-sec", type=float, default=3600.0,
                    help="age (s) a non-live dir must reach before removal "
                         "(protects in-flight appends; 0 = sweep now)")

    vp = sub.add_parser("verify",
                        help="read-only integrity fsck; exit code 1 on "
                             "error-severity findings")
    vp.add_argument("--sample-terms", type=int, default=64)

    args = p.parse_args()
    spark = SparkSession.builder.appName(
        f"lss-maintain-{args.op}").getOrCreate()

    if args.op == "append":
        from light_splade_spark.streaming.incremental import append_batch
        docs = spark.read.parquet(args.input)
        append_batch(spark, args.index_dir, docs, args.batch_id,
                     id_col=args.id_col, text_col=args.text_col)
        out = {"op": "append", "batch_id": args.batch_id,
               "n_docs": docs.count()}
    elif args.op == "delete":
        from light_splade_spark.index.tombstones import delete_docs
        if args.doc_ids_parquet:
            ids = spark.read.parquet(args.doc_ids_parquet)
        else:
            ids = [int(x) for x in args.doc_ids.split(",") if x]
        n = delete_docs(spark, args.index_dir, ids)
        out = {"op": "delete", "n_tombstoned": n}
    elif args.op == "compact":
        from light_splade_spark.index.compact import compact_index
        man = compact_index(spark, args.index_dir, gc=not args.no_gc)
        out = {"op": "compact", "epoch": man.compact_epoch,
               "live_groups": man.live_groups}
    elif args.op == "gc":
        from light_splade_spark.index.compact import gc_postings
        removed = gc_postings(args.index_dir, grace_sec=args.grace_sec)
        out = {"op": "gc", "removed_groups": removed}
    else:  # verify
        from light_splade_spark.index.fsck import fsck_index
        rep = fsck_index(spark, args.index_dir,
                         sample_terms=args.sample_terms)
        out = {"op": "verify", **rep}

    print(json.dumps(out))
    spark.stop()
    if args.op == "verify" and not out["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
