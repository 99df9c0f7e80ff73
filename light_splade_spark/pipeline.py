"""Composed training-data pipeline: the end-to-end cleaning flow a 100 TB
web corpus goes through before indexing/training.

Stages (all shuffle-aware, all oracle-tested individually):
  0. line dedup       (optional, operators.dedup.line_dedup: corpus-level
                       boilerplate-line removal, C4/CCNet-style)
  1. quality filter   (functions.text_quality.quality_score -> keep)
  2. language filter  (functions.text_quality.lang_id, optional allowlist)
  3. exact dedup      (md5 digest groupBy, min doc_id wins)
  4. near dedup       (MinHash-LSH candidates -> verified Jaccard ->
                       connected components -> keep cluster keeper)
  5. fingerprint      (winnowing-style min-shingle-hash column attached)
  6. stratified sample (optional, operators.sampling.stratified_sample:
                       deterministic per-stratum hash sampling — the
                       per-language/domain "temperature" curation stage)

Returns the cleaned DataFrame plus a per-stage count report (the lineage a
data pipeline needs to audit its attrition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from light_splade_spark.functions.text_quality import fingerprint, lang_id, quality_score
from light_splade_spark.operators.dedup import (
    dup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    allowed_langs: list[str] | None = None,
    jaccard_threshold: float = 0.8,
    shingle_n: int = 3,
    dedup_lines: bool = False,
    sample_fractions: dict[str, float] | None = None,
    sample_strata_col: str = "lang",
    sample_default_fraction: float = 0.0,
) -> tuple[DataFrame, dict]:
    report: dict[str, int] = {"input": docs.count()}

    if dedup_lines:
        from light_splade_spark.operators.dedup import line_dedup
        docs = line_dedup(docs, id_col, text_col) \
            .drop("n_lines_in", "n_lines_kept")
        report["after_line_dedup_nonempty"] = \
            docs.where(F.length(text_col) > 0).count()

    q = quality_score(docs, id_col, text_col).where("keep").select("doc_id")
    docs1 = docs.join(q, docs[id_col] == q["doc_id"], "left_semi")
    report["after_quality"] = docs1.count()

    if allowed_langs:
        lid = (lang_id(docs1, id_col, text_col)
               .where(F.col("pred_lang").isin(allowed_langs)).select("doc_id"))
        docs1 = docs1.join(lid, docs1[id_col] == lid["doc_id"], "left_semi")
    report["after_lang"] = docs1.count()

    docs2 = exact_dedup(docs1, id_col, text_col)
    report["after_exact_dedup"] = docs2.count()

    cand = minhash_lsh_pairs(docs2, id_col, text_col, shingle_n=shingle_n)
    verified = ngram_jaccard_pairs(docs2, id_col, text_col, n=shingle_n,
                                   threshold=jaccard_threshold,
                                   candidates=cand)
    clusters = dup_clusters(docs2, verified)
    losers = (
        clusters.select(F.explode(F.split("doc_ids", ",")).alias("d"),
                        "keeper")
        .select(F.col("d").cast("bigint").alias("doc_id"), "keeper")
        .where(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
    )
    docs3 = docs2.join(losers, docs2[id_col] == losers["doc_id"], "left_anti")
    report["after_near_dedup"] = docs3.count()

    out = docs3.join(fingerprint(docs3, id_col, text_col)
                     .withColumnRenamed("doc_id", "__fp_id"),
                     docs3[id_col] == F.col("__fp_id")).drop("__fp_id")

    if sample_fractions is not None:
        from light_splade_spark.operators.sampling import stratified_sample
        out = stratified_sample(out, sample_fractions,
                                strata_col=sample_strata_col, id_col=id_col,
                                default_fraction=sample_default_fraction)
        report["after_sample"] = out.count()
    return out, report
