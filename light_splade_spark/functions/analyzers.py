"""Text analysis chain: extraction, tokenization, term expansion.

Reference semantics being re-expressed (see SURVEY.md §2.2/§2.4/§2.8):

* ``SpladeEncoder.encode`` (reference ``models/splade.py:196-269``) turns text
  into a sparse term->weight map via tokenize + per-term aggregation
  (``models/splade.py:136-145``). Our analog is a *deterministic analyzer*:
  lowercase, split on non-alphanumeric runs, drop empties — expressed with
  built-in JVM functions so the hot path never leaves whole-stage codegen.
* ``to_sparse`` (``models/splade.py:147-180``) — one row in, many (term,
  weight) rows out — is ``explode``.
* Char-budget truncation before tokenize (``models/splade.py:229-231``) is
  ``substring``.
* HTML -> text extraction is OUR addition per the Common-Crawl input shape:
  a vectorized Arrow UDF that must be byte-identical per url across runs.

The analyzer version is pinned (ANALYZER_VERSION) and recorded in the index
manifest so an index and a query engine can refuse to mix versions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Pinned analyzer contract. Bump on ANY change to tokenization/extraction —
# the index manifest stores it and query-time resolution maps the stored
# version back to the matching analyzer (unknown versions are refused).
ANALYZER_VERSION = "ls-spark-1"

# Token = maximal run of [a-z0-9] after lowercasing. Chosen because it is
# expressible identically in Spark SQL, DuckDB SQL (the correctness oracle),
# and plain Python (the numpy parity oracle).
TOKEN_SPLIT_RE = "[^a-z0-9]+"
_PY_TOKEN_RE = re.compile(r"[a-z0-9]+")

# Deterministic synthetic-HTML template (see fixtures.py). Extraction must
# invert it byte-identically: everything between <body> and </body>.
_BODY_RE = re.compile(rb"<body>(.*?)</body>", re.DOTALL)


def py_tokenize(text: str) -> list[str]:
    """Driver/oracle-side tokenizer — MUST match tokens_col semantics."""
    return _PY_TOKEN_RE.findall(text.lower())


def tokens_col(text: Column | str, max_chars: int | None = None) -> Column:
    """Array-of-tokens column, fully JVM-side (codegen'd, no Python).

    ``max_chars`` mirrors the reference's pre-tokenize char-budget truncation
    (``models/splade.py:229-231``).
    """
    c = F.col(text) if isinstance(text, str) else text
    if max_chars is not None:
        c = F.substring(c, 1, max_chars)
    arr = F.split(F.lower(c), TOKEN_SPLIT_RE)
    return F.filter(arr, lambda x: x != F.lit(""))


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Byte-identical text extraction from raw page bytes (Arrow-vectorized).

    Contract (BASELINE input_hint): for a given url, extract(html) == text
    byte-for-byte, deterministically, on every run and every executor. The
    synthetic corpus wraps text in a fixed template; real-world deployments
    swap the body of this UDF (and bump ANALYZER_VERSION).
    """

    def _extract(b) -> str:
        if b is None:
            return ""
        m = _BODY_RE.search(bytes(b))
        return m.group(1).decode("utf-8") if m else ""

    return html.map(_extract)


def doc_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
               max_chars: int | None = None) -> DataFrame:
    """(doc_id, tokens ARRAY<STRING>, dl INT) — one row per doc."""
    toks = tokens_col(text_col, max_chars)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def doc_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              max_chars: int | None = None) -> DataFrame:
    """Term-frequency expansion: (doc_id, term, tf, dl).

    The BM25 analog of the reference's token-position aggregation
    (``models/splade.py:136-145``): explode(tokens) -> groupBy(doc, term) with
    count() as TF (the reference aggregates max/sum of neural weights; TF is
    the term-weight source for BM25). Partial (map-side) aggregation is
    automatic via Catalyst hash aggregate.
    """
    dt = doc_tokens(docs, id_col, text_col, max_chars)
    return (
        dt.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def splade_expansion(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """SPLADE-style term-weight expansion with a deterministic stand-in
    encoder (reference ``models/splade.py:136-180``): per token position a
    pseudo-logit is derived from a cross-engine hash of (term, position),
    weighted by log1p(relu(logit)), then MAX-aggregated over positions per
    (doc, term) — exactly the reference's ``agg="max"`` path — and rounded to
    4 decimals like ``to_sparse`` (``models/splade.py:174``). Zero weights
    are dropped (the reference's nonzero gather, ``models/splade.py:168``).

    A real deployment swaps the pseudo-logit for an Arrow pandas-UDF model
    forward pass; every downstream operator (explode, max-agg, round,
    nonzero filter) is unchanged.
    """
    toks = tokens_col(text_col)
    pos = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "term"),
    )
    # 60-bit md5 hash -> pseudo-logit in [-2, 2)
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("term"), F.lit("#"),
                                   F.col("pos").cast("string"))), 1, 15),
        16, 10).cast("bigint")
    logit = (h % 1000) / 250.0 - 2.0
    w = F.log1p(F.greatest(logit, F.lit(0.0)))
    return (
        pos.select("doc_id", "term", w.alias("wp"))
        .groupBy("doc_id", "term")
        .agg(F.round(F.max("wp"), 4).alias("weight"))
        .where(F.col("weight") > 0)
    )


def query_terms(queries: DataFrame, id_col: str = "qid",
                text_col: str = "text") -> DataFrame:
    """(qid, term, qtf) — duplicate query terms keep their multiplicity,
    matching the reference's dot-product semantics where a repeated term
    doubles its contribution (query CSR keeps the summed weight)."""
    return (
        queries.select(F.col(id_col).alias("qid"),
                       F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("qid", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
