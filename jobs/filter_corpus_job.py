"""spark-submit entry: Gopher-style quality filtering of a web-text corpus.

    spark-submit --py-files light_splade_spark.zip jobs/filter_corpus_job.py \
        --input /path/to/documents.parquet \
        --output /path/to/filtered \
        [--id-col doc_id --text-col text] \
        [--emit-rejected] [--metrics-out /path/metrics.parquet] \
        [--sample en=0.5,zh=0.25 --sample-strata-col lang \
         --sample-default 0.0]

The training-data-pipeline front door: computes the full per-doc quality
report (quality_score + repetition_metrics + gopher_metrics, all map-only
JVM expressions — functions/text_quality.py) once, then splits the corpus
on the composite Gopher keep flag. Writes:

With --sample, the kept split is further reduced by the deterministic
per-stratum hash sample (operators/sampling.py — the temperature
curation stage); the summary line reports the post-sample count.

- <output>/kept/       — surviving docs (original columns)
- <output>/rejected/   — everything NOT in kept/ (only with
                         --emit-rejected; with --sample this includes the
                         sampled-out docs, so kept + rejected always
                         reconstructs the input)
- --metrics-out        — the full per-doc metric report (optional; this
                         is the audit trail a 100 TB filtering run needs)

and prints one JSON summary line (counts + keep rate + per-rule failure
counts, each computed distributed — the driver only collects scalars).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from light_splade_spark.functions import text_quality as tq

# each rule as (name, SQL boolean over the metric row) — mirrors
# gopher_keep_col; kept in one place so the failure accounting below can
# report WHICH rule dropped each doc without recomputing any metric
GOPHER_RULES: list[tuple[str, str]] = [
    ("n_tokens_low", "n_tokens >= 50"),
    ("n_tokens_high", "n_tokens <= 100000"),
    ("mean_tok_len_low", "mean_tok_len >= 3"),
    ("mean_tok_len_high", "mean_tok_len <= 10"),
    ("symbol_word_ratio", "symbol_word_ratio <= 0.1"),
    ("bullet_lines", "bullet_line_frac <= 0.9"),
    ("ellipsis_lines", "ellipsis_line_frac <= 0.3"),
    ("alpha_words", "alpha_word_frac >= 0.8"),
    ("stop_words", "stop_hits >= 2"),
    ("dup_lines", "dup_line_frac <= 0.3"),
    ("dup_line_chars", "dup_line_char_frac <= 0.2"),
    ("top_3gram_chars", "top_3gram_char_frac <= 0.18"),
    ("dup_5gram_chars", "dup_5gram_char_frac <= 0.15"),
]


def metric_report(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc metric row (tq.all_quality_metrics — map-only metric
    projection over staged materialized token/line/n-gram columns, no
    doc_id joins), plus one boolean column per Gopher rule; its AND-fold
    equals the composite gopher_keep the projection already computed."""
    rep = tq.all_quality_metrics(docs, id_col, text_col)
    for name, pred in GOPHER_RULES:
        rep = rep.withColumn(f"pass_{name}", F.expr(pred))
    return rep


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--emit-rejected", action="store_true")
    p.add_argument("--metrics-out", default=None)
    p.add_argument("--sample", default=None,
                   help="per-stratum keep fractions, e.g. en=0.5,zh=0.25")
    p.add_argument("--sample-strata-col", default="lang")
    p.add_argument("--sample-default", type=float, default=0.0)
    args = p.parse_args()

    spark = SparkSession.builder.appName("lss-filter-corpus").getOrCreate()
    docs = spark.read.parquet(args.input)
    rep = metric_report(docs, args.id_col, args.text_col)
    if args.metrics_out:
        rep.write.mode("overwrite").parquet(args.metrics_out)
        rep = spark.read.parquet(args.metrics_out)  # reuse, don't recompute
    else:
        # the report feeds up to three actions (kept write, rejected
        # write, summary agg) — without the parquet spill above, cache it
        # so the corpus is metric-scanned once, not three times
        rep = rep.persist()

    keep_ids = rep.where("gopher_keep").select("doc_id")
    kept = docs.join(keep_ids.withColumnRenamed("doc_id", args.id_col),
                     args.id_col, "left_semi")
    n_sampled = None
    if args.sample:
        from light_splade_spark.operators.sampling import stratified_sample
        fractions = {k.strip(): float(v) for k, v in
                     (kv.split("=", 1) for kv in args.sample.split(","))}
        kept = stratified_sample(kept, fractions,
                                 strata_col=args.sample_strata_col,
                                 id_col=args.id_col,
                                 default_fraction=args.sample_default)
        kept = kept.persist()
        n_sampled = kept.count()
    kept.write.mode("overwrite").parquet(f"{args.output}/kept")
    if args.emit_rejected:
        # rejected = input minus the FINAL kept split, so kept+rejected
        # always reconstructs the input: with --sample, sampled-out docs
        # land in rejected/ rather than vanishing from both outputs
        final_ids = spark.read.parquet(f"{args.output}/kept") \
            .select(args.id_col)
        docs.join(final_ids, args.id_col, "left_anti") \
            .write.mode("overwrite").parquet(f"{args.output}/rejected")

    # one distributed aggregation pass for the whole summary
    # coalesce(sum, 0): F.sum over zero rows is NULL — an empty input
    # corpus must report zeros, not crash the summary arithmetic
    aggs = [F.count(F.lit(1)).alias("total"),
            F.coalesce(F.sum(F.col("gopher_keep").cast("long")), F.lit(0))
            .alias("kept")]
    aggs += [F.coalesce(F.sum((~F.col(f"pass_{n}")).cast("long")), F.lit(0))
             .alias(f"fail_{n}") for n, _ in GOPHER_RULES]
    row = rep.agg(*aggs).collect()[0].asDict()
    row["keep_rate"] = round(row["kept"] / max(row["total"], 1), 4)
    if n_sampled is not None:
        row["sampled"] = n_sampled
    print(json.dumps(row))


if __name__ == "__main__":
    main()
