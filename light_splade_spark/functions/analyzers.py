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


# ---------------------------------------------------------------------------
# Pluggable analyzers. The reference is a Japanese-first system (HF subword
# tokenizer, ``models/splade.py:237-245``, ``data/base.py:67-76``; Japanese
# toy data ``data/toy_triplet/``). A deterministic cross-engine analyzer
# cannot ship a learned subword vocab, so v2 uses the classic CJK strategy
# (Lucene CJKAnalyzer-style character bigrams) for non-ASCII runs while
# keeping [a-z0-9]+ words for ASCII — expressible identically in Spark SQL,
# DuckDB SQL, and Python, so every oracle survives.
#
# Contract: the three representations of one Analyzer MUST tokenize any text
# to the same multiset (asserted in tests/test_cjk_analyzer.py). Never edit
# an existing version — add a new one and bump the version string; the index
# manifest pins the version and query-time resolution refuses unknowns.
# ---------------------------------------------------------------------------

# Hiragana, katakana, CJK ext-A, CJK unified — the ranges the reference's
# Japanese corpora exercise. Expressed with explicit code points so Java
# regex, Python re, and DuckDB (RE2) all see the same class.
CJK_RANGE = "぀-ヿ㐀-䶿一-鿿"
_PY_CJK_RUN_RE = re.compile(f"[{CJK_RANGE}]+")


def py_tokenize_v2(text: str) -> list[str]:
    """Python mirror of the v2 analyzer: ASCII [a-z0-9]+ words, then
    character bigrams per contiguous CJK run (single-char runs kept whole)."""
    low = text.lower()
    toks = _PY_TOKEN_RE.findall(low)
    for run in _PY_CJK_RUN_RE.findall(low):
        if len(run) < 2:
            toks.append(run)
        else:
            toks.extend(run[i:i + 2] for i in range(len(run) - 1))
    return toks


def tokens_col_v2(text: Column | str, max_chars: int | None = None) -> Column:
    """v2 token array, fully JVM-side: regexp_extract_all for both classes,
    CJK runs expanded to bigrams with transform/sequence/substring — all
    inside whole-stage codegen, no Python."""
    c = F.col(text) if isinstance(text, str) else text
    if max_chars is not None:
        c = F.substring(c, 1, max_chars)
    low = F.lower(c)
    ascii_toks = F.regexp_extract_all(low, F.lit("[a-z0-9]+"), F.lit(0))
    runs = F.regexp_extract_all(low, F.lit(f"[{CJK_RANGE}]+"), F.lit(0))
    grams = F.flatten(F.transform(
        runs,
        lambda r: F.when(F.length(r) < 2, F.array(r)).otherwise(
            F.transform(F.sequence(F.lit(1), F.length(r) - 1),
                        lambda i: F.substring(r, i, F.lit(2)))),
    ))
    return F.concat(ascii_toks, grams)


def tokens_sql_v1(col: str) -> str:
    """DuckDB expression equal to tokens_col (v1)."""
    return (f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), "
            f"x -> x <> '')")


def tokens_sql_v2(col: str) -> str:
    """DuckDB expression equal to tokens_col_v2."""
    return (
        f"list_concat("
        f"regexp_extract_all(lower({col}), '[a-z0-9]+'), "
        f"flatten(list_transform("
        f"regexp_extract_all(lower({col}), '[{CJK_RANGE}]+'), "
        f"r -> CASE WHEN length(r) < 2 THEN [r] "
        f"ELSE list_transform(range(1, length(r)), i -> substr(r, i, 2)) "
        f"END)))"
    )


@dataclass(frozen=True)
class Analyzer:
    """One deterministic tokenizer in its three required representations.

    ``spark_tokens(col, max_chars)`` -> ARRAY<STRING> Column (JVM-side);
    ``py_tokenize(text)`` -> list[str] (driver/query/oracle side);
    ``duckdb_tokens(col_sql)`` -> DuckDB list expression (correctness oracle).
    """
    version: str
    spark_tokens: Callable[..., Column] = field(repr=False, default=None)
    py_tokenize: Callable[[str], list[str]] = field(repr=False, default=None)
    duckdb_tokens: Callable[[str], str] = field(repr=False, default=None)
    # vocab-driven analyzers (functions/wordpiece.py) carry their vocab so
    # build_index can persist it inside the index dir (self-contained index)
    vocab: tuple[str, ...] | None = field(repr=False, default=None)


ANALYZER_V1 = Analyzer("ls-spark-1", tokens_col, py_tokenize, tokens_sql_v1)
ANALYZER_V2_CJK = Analyzer("ls-spark-2", tokens_col_v2, py_tokenize_v2,
                           tokens_sql_v2)

ANALYZERS: dict[str, Analyzer] = {
    a.version: a for a in (ANALYZER_V1, ANALYZER_V2_CJK)
}


def get_analyzer(version: str) -> Analyzer:
    """Resolve a manifest-pinned analyzer version; refuse unknowns so an
    index and a query engine can never silently mix tokenizations."""
    try:
        return ANALYZERS[version]
    except KeyError:
        raise ValueError(
            f"index pinned to unknown analyzer version {version!r}; this "
            f"engine knows {sorted(ANALYZERS)} — upgrade the engine or "
            "rebuild the index (tokenization must be identical on both "
            "sides)") from None


def resolve_analyzer(version: str, index_dir: str | None = None) -> Analyzer:
    """get_analyzer, plus the vocab-analyzer fallback: a wordpiece version
    (``ls-spark-wp4-*``) not yet registered in this process is reconstructed
    from the vocab file persisted inside ``index_dir`` — so any process can
    query any index with nothing but the index directory."""
    if version not in ANALYZERS and index_dir is not None:
        from light_splade_spark.functions.wordpiece import load_vocab_analyzer
        ana = load_vocab_analyzer(index_dir, version)
        if ana is not None:
            return ana
    return get_analyzer(version)


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
               max_chars: int | None = None,
               analyzer: Analyzer = ANALYZER_V1) -> DataFrame:
    """(doc_id, tokens ARRAY<STRING>, dl INT) — one row per doc."""
    toks = analyzer.spark_tokens(text_col, max_chars)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("tokens"),
    ).withColumn("dl", F.size("tokens"))


def doc_terms(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              max_chars: int | None = None,
              analyzer: Analyzer = ANALYZER_V1) -> DataFrame:
    """Term-frequency expansion: (doc_id, term, tf, dl).

    The BM25 analog of the reference's token-position aggregation
    (``models/splade.py:136-145``): explode(tokens) -> groupBy(doc, term) with
    count() as TF (the reference aggregates max/sum of neural weights; TF is
    the term-weight source for BM25). Partial (map-side) aggregation is
    automatic via Catalyst hash aggregate.
    """
    dt = doc_tokens(docs, id_col, text_col, max_chars, analyzer)
    return (
        dt.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def splade_expansion(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     encoder: Callable[[pd.Series], pd.Series] | None = None,
                     ) -> DataFrame:
    """SPLADE-style term-weight expansion -> (doc_id, term, weight).

    ``encoder`` is the pluggable model seam (reference
    ``SpladeEncoder.encode``, ``models/splade.py:196-269``): a callable
    ``pd.Series[str] -> pd.Series[dict[str, float]]`` run as an
    Arrow-batched pandas UDF — one Arrow batch in, one term->weight map per
    text out. A real SPLADE model drops in by wrapping its tokenizer+forward
    pass (+ ``to_sparse``, ``models/splade.py:147-180``) in that signature;
    one encoder instance per executor via a lazy module global is the
    recommended pattern. Downstream semantics are shared with the default
    path: explode to rows, round(·, 4) like ``to_sparse``
    (``models/splade.py:174``), drop zero/negative weights (the nonzero
    gather, ``models/splade.py:168``).

    With ``encoder=None`` a deterministic stand-in runs instead, fully
    JVM-side (the correctness-oracle configuration): per token position a
    pseudo-logit from a cross-engine hash of (term, position), weighted
    log1p(relu(logit)), MAX over positions per (doc, term) — exactly the
    reference's ``agg="max"`` path (``models/splade.py:136-145``).
    """
    if encoder is not None:
        from pyspark.sql.types import FloatType, MapType

        @pandas_udf(MapType(StringType(), FloatType()))
        def encode_udf(texts: pd.Series) -> pd.Series:
            return encoder(texts)

        # length-sorted batching (reference ``data/base.py`` sorts examples
        # by length before batching, SURVEY T3): a transformer encoder pads
        # each batch to its longest text, so Arrow batches of similar-length
        # texts waste the least padded compute. sortWithinPartitions — a
        # per-partition sort below the Python node, NO shuffle — is exactly
        # that batching order; results are row-order-independent downstream
        # (explode + per-doc rows).
        return (
            docs.select(F.col(id_col).alias("doc_id"),
                        F.col(text_col).alias("_t"))
            .sortWithinPartitions(F.length("_t"))
            .select("doc_id", encode_udf(F.col("_t")).alias("m"))
            .select("doc_id", F.explode("m").alias("term", "w"))
            .select("doc_id", "term", F.round("w", 4).alias("weight"))
            .where(F.col("weight") > 0)
        )
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
