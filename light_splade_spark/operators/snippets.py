"""Result-snippet generation — the presentation stage of a fulltext engine.

Given retrieval results (qid, doc_id[, ...]) and the corpus, attach a
character-window snippet centred on the EARLIEST occurrence of any of
the query's terms in the document text, plus which term matched. All
pure JVM expressions (instr / substring / conditional concat — no
Python, no extra shuffle beyond the one results-to-corpus join every
snippet implementation must pay); semantics are mirrorable 1:1 in ANSI
SQL (strpos/substr), which the unit test exercises against DuckDB.

Match semantics are deliberately simple and documented: case-insensitive
SUBSTRING match of each query term against the text ("art" matches
"start") — snippets are presentation, not scoring; the scoring routes
(wand/join/SQL) already decided relevance with the pinned analyzer. A
result row whose terms never occur as substrings (e.g. matched via
analyzer-level transforms) keeps its row with a NULL snippet so callers
never lose hits.

The reference has no serving/snippet layer (it returns id lists,
sparse_retriever.py:43-98); this is fulltext_index-tier serving
completeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from light_splade_spark.partitioning import spread_input


def snippets(
    results: DataFrame,
    docs: DataFrame,
    queries: list[tuple[int, str]],
    window: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """results columns + (matched_term, snippet).

    ``results`` must carry (qid, doc_id); ``queries`` are the same
    literal (qid, text) pairs given to retrieval — terms are split on
    whitespace and lowercased. ``window`` = characters kept on each side
    of the match; a clipped side gets an ellipsis. One corpus join keyed
    by doc_id (broadcast-able when the result set is interactive-sized —
    AQE decides), one broadcast of the query-term table, one groupBy of
    per-(qid,doc,term) match positions back to one row per result row.

    The final left join references ``results`` twice (hit derivation +
    row preservation), so an EXPENSIVE results subplan evaluates twice —
    ``results.persist()`` first when it is a full retrieval pipeline
    rather than a materialized top-k.
    """
    spark = results.sparkSession
    term_rows = sorted({(qid, t.lower())
                        for qid, text in queries
                        for t in text.split() if t})
    if not term_rows:
        return (results.withColumn("matched_term",
                                   F.lit(None).cast("string"))
                .withColumn("snippet", F.lit(None).cast("string")))
    terms = F.broadcast(
        spark.createDataFrame(term_rows, "qid BIGINT, term STRING"))

    # positions are found on the LOWERED text; the window is then cut
    # from the original text only when lowering preserved length (the
    # overwhelmingly common case). For characters whose case folding
    # changes string length (e.g. 'İ' U+0130 lowers to two chars),
    # positions in the lowered string do not map back to the original —
    # falling back to extracting from the lowered text keeps the window
    # aligned with the match, at the cost of displaying folded case for
    # those rare documents.
    # the case-fold + length check touch every corpus byte before the join
    # prunes to result docs; guard an under-partitioned scan (guide §2.5)
    body = spread_input(docs).select(
        F.col(id_col).alias("doc_id"),
        F.when(F.length(F.lower(F.col(text_col)))
               == F.length(F.col(text_col)), F.col(text_col))
        .otherwise(F.lower(F.col(text_col))).alias("__text"))
    hit = (results.select("qid", "doc_id").join(body, "doc_id")
           .join(terms, "qid")
           .withColumn("__pos", F.expr("instr(lower(__text), term)"))
           .where(F.col("__pos") > 0))
    # earliest occurrence wins; ties broken by the lexicographically
    # smaller term (min over the (pos, term) struct is deterministic)
    best = (hit.groupBy("qid", "doc_id")
            .agg(F.min(F.struct(F.col("__pos"), F.col("term"),
                                F.col("__text"))).alias("b"))
            .select("qid", "doc_id",
                    F.col("b.term").alias("matched_term"),
                    F.col("b.__pos").alias("__pos"),
                    F.col("b.__text").alias("__text")))
    start = F.greatest(F.lit(1), F.col("__pos") - window)
    width = F.length("matched_term") + 2 * window
    raw = F.substring(F.col("__text"), start, width)
    snip = F.concat(
        F.when(start > 1, F.lit("…")).otherwise(F.lit("")),
        raw,
        F.when(start + width <= F.length("__text"), F.lit("…"))
        .otherwise(F.lit("")))
    best = best.select("qid", "doc_id", "matched_term",
                       snip.alias("snippet"))
    return results.join(best, ["qid", "doc_id"], "left")
