"""CCNet-style statistical language-model quality scoring: an
additively-smoothed corpus bigram LM scores each document's
pseudo-perplexity, the classic web-corpus quality signal (Wenzek et al.
2020 use a KenLM 5-gram; the 2-gram model here is the same signal with an
exactly SQL-mirrorable closed form so the DuckDB oracle can verify it).

Model, pinned so engine and oracle agree bit-for-bit on the formula:

    U(w)        = corpus occurrence count of token w (all positions)
    B(w1, w2)   = corpus occurrence count of the bigram (w1, w2)
    V           = number of distinct tokens in the corpus
    P(w2 | w1)  = (B(w1,w2) + alpha) / (U(w1) + alpha * V)
    avg_nll(d)  = mean over d's bigram occurrences of -ln P
    ppl(d)      = exp(avg_nll)

Tokens are the v1 analyzer's [a-z0-9]+ rule (the same `tokens_sql`
mirror every other oracle uses). Documents with fewer than two tokens
have no bigrams: avg_nll = 0.0, ppl = 1.0 by definition (they keep a
row; the downstream filter stage decides their fate, as in pipeline.py).

Plan shape at 100 TB: one projection materializes the token array, one
explode + groupBy builds each count table (unigram, bigram — partial
aggregation map-side), then two equi-joins score the exploded bigram
stream and one groupBy(doc_id) folds it back. The count tables are
vocabulary-sized (far too big to broadcast at web scale — they stay
distributed sort-merge joins); head-token skew on the w1 join (stopwords
dominate) is the standard AQE skew-join case and the join key is still
millions-deep, never a single value. V is a lazy broadcast 1-row
aggregate (the oracle's CROSS JOIN form) — constructing the DataFrame
triggers no Spark job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from light_splade_spark.functions.analyzers import tokens_col

DEFAULT_ALPHA = 0.5


def bigram_lm_scores(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll, ppl) for every input document (see
    module docstring for the pinned model and the <2-token rule)."""
    toked = docs.select(F.col(id_col).alias("doc_id"),
                        tokens_col(text_col).alias("__toks"))
    toks = F.col("__toks")
    # bigram stream: (doc_id, w1, w2), one row per occurrence. The pair
    # array is built from the materialized token ATTRIBUTE (the in-lambda
    # rule — see functions/text_quality.py module note).
    pairs = toked.select("doc_id", F.explode(F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, i + 1).alias("w2"))))
        .otherwise(F.array().cast(
            "array<struct<w1:string,w2:string>>"))).alias("bg")) \
        .select("doc_id", "bg.w1", "bg.w2")

    unis = toked.select(F.explode(toks).alias("w"))
    uni_counts = unis.groupBy("w").agg(F.count(F.lit(1)).alias("u_cnt"))
    # V as a LAZY broadcast 1-row aggregate (the oracle's CROSS JOIN vv):
    # V derives from uni_counts' own groups, so Spark computes it from the
    # same aggregation lineage — no eager collect, no extra corpus scan at
    # construction time
    vv = uni_counts.agg(F.count(F.lit(1)).alias("__v"))
    bi_counts = pairs.groupBy("w1", "w2") \
        .agg(F.count(F.lit(1)).alias("b_cnt"))

    scored = (pairs
              .join(bi_counts, ["w1", "w2"])
              .join(uni_counts.withColumnRenamed("w", "w1"), "w1")
              .crossJoin(F.broadcast(vv))
              .select("doc_id", (
                  -F.log((F.col("b_cnt") + F.lit(alpha))
                         / (F.col("u_cnt") + F.lit(alpha) * F.col("__v"))))
                  .alias("nll")))
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (F.sum("nll") / F.count(F.lit(1))).alias("__avg"))
    return (docs.select(F.col(id_col).alias("doc_id"))
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                F.round(F.coalesce("__avg", F.lit(0.0)), 4).alias("avg_nll"),
                F.round(F.exp(F.coalesce("__avg", F.lit(0.0))), 4)
                .alias("ppl")))


def perplexity_filter(docs: DataFrame, max_ppl: float,
                      id_col: str = "doc_id", text_col: str = "text",
                      alpha: float = DEFAULT_ALPHA) -> DataFrame:
    """CCNet-style corpus filter: keep documents whose bigram-LM
    pseudo-perplexity is <= ``max_ppl`` (low perplexity = looks like the
    corpus's own language model = keep). Documents with <2 tokens score
    ppl 1.0 and therefore pass; length gates are the Gopher stage's job
    (pipeline.py composes both)."""
    scores = bigram_lm_scores(docs, id_col, text_col, alpha)
    keep = (scores.where(F.col("ppl") <= max_ppl)
            .select(F.col("doc_id").alias("__ppl_id")))
    return docs.join(keep, docs[id_col] == F.col("__ppl_id"), "left_semi")
