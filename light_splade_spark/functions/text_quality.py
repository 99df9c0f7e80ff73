"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting. All JVM-side expressions with exact
DuckDB oracles; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from light_splade_spark.functions.analyzers import tokens_col
from light_splade_spark.operators.dedup import shingles_col
from light_splade_spark.partitioning import spread_input

# n-gram-heuristic language ID: per-language marker sets (stopword-style
# n-gram cues; deterministic, vocabulary-pinned so the oracle can mirror it).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "et", "est", "des"],
    "ja": ["no", "wa", "ga", "desu", "shita", "suru"],
}
STOPWORDS = LANG_MARKERS["en"]


# --- shared expression helpers (one definition; engine and every caller
# diverging from the DuckDB oracle mirrors is the risk these remove) -------

def _frac(num, den):
    """round(num/den, 4) with zero denominators -> 0.0 (every ratio metric
    in this module uses this rule; the oracles mirror it)."""
    return F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)), 4)


def _nonempty_lines(t):
    """Trimmed non-empty lines of a text column (the line unit every
    line-level Gopher metric and line_dedup agree on)."""
    return F.filter(F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
                    lambda x: x != F.lit(""))


def _dup_occurrence_idx(arr, n):
    """1-based indices of occurrences duplicated in SORTED array ``arr`` of
    size ``n`` — the sorted-neighbor trick: an occurrence is a duplicate
    iff it equals the previous or next element. Tie-free (any total order
    groups equal elements adjacently)."""
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)) \
           .otherwise(F.array().cast("array<int>"))
    return F.filter(idx, lambda i: (
        ((i > 1) & (F.element_at(arr, i - 1) == F.element_at(arr, i)))
        | ((i < n) & (F.element_at(arr, i + 1) == F.element_at(arr, i)))))


# Materialized-intermediate column names. Every heavy array (tokens, sorted
# lines, sorted n-gram arrays) is computed ONCE as a real column in a staged
# projection, so metric expressions — and crucially HOF *lambda bodies* like
# ``element_at(g5s, i)`` inside F.aggregate — only ever reference an
# attribute. Referencing the computed tree directly inside a lambda
# re-evaluates the whole tokenize+sort subtree per array element (O(n^2+)
# per doc); that is the failure mode this layout removes. Catalyst's
# CollapseProject keeps the stages separate because the producers are
# non-cheap and multiply-consumed.
_TEXT, _TOKS, _LS, _BS, _G3, _G5 = (
    "__text", "__toks", "__ls", "__bs", "__g3s", "__g5s")


def _word_grams(toks, n: int):
    """Space-joined word n-grams of an ALREADY-MATERIALIZED token array
    column (attribute reference only — see module note above)."""
    nt = F.size(toks)
    return F.when(nt >= n, F.transform(
        F.sequence(F.lit(1), nt - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]))) \
            .otherwise(F.array().cast("array<string>"))


def _stage(docs: DataFrame, id_col: str, text_col: str, *,
           lines: bool = False, bigrams: bool = False,
           grams35: bool = False) -> DataFrame:
    """Stage 1: doc_id, raw text, token array (+ sorted line array).
    Stage 2 (optional): sorted word 2-/3-/5-gram arrays built from the
    stage-1 token ATTRIBUTE. Line filters (bullet/ellipsis) only count
    matches, so one sorted line array serves all line metrics."""
    s1 = [F.col(id_col).alias("doc_id"), F.col(text_col).alias(_TEXT),
          tokens_col(text_col).alias(_TOKS)]
    if lines:
        s1.append(F.array_sort(_nonempty_lines(F.col(text_col))).alias(_LS))
    # per-doc metric arrays are the expensive span; an under-partitioned
    # scan (single row group) would compute them on one task (guide §2.5)
    df = spread_input(docs).select(*s1)
    if bigrams or grams35:
        toks = F.col(_TOKS)
        s2 = [F.col(c) for c in df.columns]
        if bigrams:
            s2.append(F.array_sort(_word_grams(toks, 2)).alias(_BS))
        if grams35:
            s2.append(F.array_sort(_word_grams(toks, 3)).alias(_G3))
            s2.append(F.array_sort(_word_grams(toks, 5)).alias(_G5))
        df = df.select(*s2)
    return df


def _token_count_exprs() -> dict:
    toks = F.col(_TOKS)
    return {
        "n_tokens": F.size(toks),
        "n_distinct": F.size(F.array_distinct(toks)),
        "n_chars_text": F.length(F.col(_TEXT)),
    }


def _quality_exprs() -> dict:
    toks, text = F.col(_TOKS), F.col(_TEXT)
    n = F.size(toks)
    alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    sw = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    ttr = F.round(F.size(F.array_distinct(toks)) / n, 4)
    mtl = F.round(
        F.aggregate(toks, F.lit(0).cast("bigint"),
                    lambda acc, t: acc + F.length(t)) / n, 4)
    return {
        "n_tokens": n,
        "ttr": ttr,
        "mean_tok_len": mtl,
        "stopword_ratio": F.round(sw / n, 4),
        "alnum_ratio": F.round(
            alnum / F.greatest(F.length(text), F.lit(1)), 4),
        "keep": (n >= 10) & (ttr >= 0.1) & (mtl >= 2) & (mtl <= 12),
    }


def _select(docs: DataFrame, exprs: dict) -> DataFrame:
    return docs.select("doc_id", *[v.alias(k) for k, v in exprs.items()])


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_chars_text) — whitespace+regex token
    counting (the BPE-ish regex is the analyzer's [a-z0-9]+ rule)."""
    return _select(_stage(docs, id_col, text_col), _token_count_exprs())


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Heuristic doc-quality features + composite flag:
    type-token ratio, mean token length, stopword ratio, alnum char ratio.
    Thresholds follow common web-corpus filters (Gopher-style rules)."""
    return _select(_stage(docs, id_col, text_col), _quality_exprs())


def repetition_metrics(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021, §A1.1 —
    public web-corpus filtering rules), per document:

    - ``n_lines``: non-empty trimmed lines
    - ``dup_line_frac``: fraction of lines that are duplicates of another
      line (1 - distinct/total)
    - ``dup_line_char_frac``: fraction of line characters inside lines
      occurring >= 2 times
    - ``dup_2gram_frac``: fraction of word-bigram occurrences belonging to
      a bigram occurring >= 2 times (tokens = the v1 analyzer's
      [a-z0-9]+ rule, so the DuckDB oracle can mirror exactly)
    - ``ellipsis_line_frac``: fraction of lines ending in '...' or '…'

    All ratios round(·,4); zero denominators yield 0.0. Entirely JVM-side
    array expressions over each row — no shuffle, no Python, so the
    operator runs map-only at any corpus size. Duplicate detection uses
    the sorted-neighbor trick (an occurrence is duplicated iff it equals
    a neighbor after array_sort), which is tie-free: any total order
    groups equal elements adjacently.
    """
    return _select(_stage(docs, id_col, text_col, lines=True, bigrams=True),
                   _repetition_exprs())


def _repetition_exprs() -> dict:
    ls, bs = F.col(_LS), F.col(_BS)
    nl = F.size(ls)
    dup_idx = _dup_occurrence_idx(ls, nl)
    line_chars = F.aggregate(ls, F.lit(0).cast("bigint"),
                             lambda a, x: a + F.length(x))
    dup_chars = F.aggregate(dup_idx, F.lit(0).cast("bigint"),
                            lambda a, i: a + F.length(F.element_at(ls, i)))
    nb = F.size(bs)
    dup_bg = F.size(_dup_occurrence_idx(bs, nb))
    ell = F.size(F.filter(ls, lambda x: x.endswith("...")
                          | x.endswith("…")))
    return {
        "n_lines": nl,
        "dup_line_frac": _frac(nl - F.size(F.array_distinct(ls)), nl),
        "dup_line_char_frac": _frac(dup_chars, line_chars),
        "dup_2gram_frac": _frac(dup_bg, nb),
        "ellipsis_line_frac": _frac(ell, nl),
    }


# Gopher A1.1 stop-word presence rule: a kept page must contain >= 2 of
# these 8 words (Rae et al. 2021 — a public web-corpus filtering rule).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_metrics(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """The rest of the Gopher quality-filter suite (Rae et al. 2021 §A1.1),
    complementing ``repetition_metrics``/``quality_score``, per document:

    - ``alpha_word_frac``: fraction of tokens containing an alphabetic char
    - ``bullet_line_frac``: fraction of non-empty lines starting with a
      bullet marker ('-', '*', '•', '·')
    - ``symbol_word_ratio``: ('#' chars + '...' runs + '…' chars) / tokens
    - ``stop_hits``: how many of the 8 Gopher stop words appear
    - ``top_3gram_char_frac``: chars covered by ALL occurrences of the most
      frequent word-3-gram / total token chars (count x token-chars of the
      3-gram; ties broken to the lexicographically smallest 3-gram)
    - ``dup_5gram_char_frac``: chars of every 5-gram occurrence whose
      5-gram occurs >= 2 times / total token chars (occurrence-weighted:
      overlapping occurrences each count their own chars — documented
      divergence from the paper's span-union accounting, which is not
      expressible without positional dedup; the filter direction and
      monotonicity are preserved)

    Ratios round(·,4), zero denominators -> 0.0. Pure JVM array
    expressions (higher-order functions) — map-only at any corpus size.
    The 3-gram mode uses a single fold over the sorted 3-gram array
    (run-length scan; strict > keeps the FIRST maximal run, i.e. the
    lexicographically smallest mode — the oracle mirrors with ORDER BY
    count DESC, gram ASC LIMIT 1). The composite keep flag lives in
    ``gopher_keep_col`` so it can be applied to the JOINED metric row
    (it also needs repetition_metrics/quality_score columns).
    """
    return _select(_stage(docs, id_col, text_col, lines=True, grams35=True),
                   _gopher_exprs())


def _gopher_exprs() -> dict:
    t, toks = F.col(_TEXT), F.col(_TOKS)
    nt = F.size(toks)
    token_chars = F.aggregate(toks, F.lit(0).cast("bigint"),
                              lambda a, x: a + F.length(x))

    g3s = F.col(_G3)
    mode3 = F.aggregate(
        g3s,
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best_run"), F.lit("").alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
             .alias("run"),
            F.when(F.when(x == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1)) > acc["best_run"],
                   F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)))
             .otherwise(acc["best_run"]).alias("best_run"),
            F.when(F.when(x == acc["prev"], acc["run"] + 1)
                    .otherwise(F.lit(1)) > acc["best_run"], x)
             .otherwise(acc["best"]).alias("best")),
        # 3-gram token chars = length minus the two joining spaces
        lambda acc: acc["best_run"]
        * F.greatest(F.length(acc["best"]) - 2, F.lit(0)))

    g5s = F.col(_G5)
    n5 = F.size(g5s)
    dup5_chars = F.aggregate(
        _dup_occurrence_idx(g5s, n5),
        F.lit(0).cast("bigint"),
        lambda a, i: a + F.length(F.element_at(g5s, i)) - 4)

    lines = F.col(_LS)
    nl = F.size(lines)
    bullets = F.size(F.filter(lines, lambda x: (
        x.startswith("-") | x.startswith("*")
        | x.startswith("•") | x.startswith("·"))))
    symbols = (
        F.length(t) - F.length(F.regexp_replace(t, "#", ""))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.length(t) - F.length(F.regexp_replace(t, "…", "")))
    stop_hits = F.size(F.filter(F.array_distinct(toks),
                                lambda x: x.isin(GOPHER_STOPWORDS)))
    return {
        "alpha_word_frac": _frac(
            F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))), nt),
        "bullet_line_frac": _frac(bullets, nl),
        "symbol_word_ratio": _frac(symbols, nt),
        "stop_hits": stop_hits,
        "top_3gram_char_frac": _frac(mode3, token_chars),
        "dup_5gram_char_frac": _frac(dup5_chars, token_chars),
    }


def all_quality_metrics(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """The full per-doc metric row — quality_score + token_count +
    repetition_metrics + gopher_metrics + the composite ``gopher_keep``
    flag — as ONE map-only metric projection over staged materialized
    intermediates (no joins, no shuffle; the token/line/n-gram arrays are
    computed once per row as real columns — see the module note on why
    in-lambda references to computed trees are forbidden).
    Column-for-column identical to joining the four operators on doc_id;
    this is the form a 100 TB filtering pass should run."""
    exprs = {**_quality_exprs()}
    for d in (_token_count_exprs(), _repetition_exprs(), _gopher_exprs()):
        for k, v in d.items():
            exprs.setdefault(k, v)
    staged = _stage(docs, id_col, text_col,
                    lines=True, bigrams=True, grams35=True)
    return _select(staged, exprs).withColumn("gopher_keep", gopher_keep_col())


def gopher_keep_col():
    """Composite Gopher keep flag (Rae et al. 2021 §A1.1 thresholds) as a
    Column over the JOINED per-doc metric row (quality_score +
    repetition_metrics + gopher_metrics all share the doc_id key):
    50 <= words <= 100k, 3 <= mean word length <= 10, symbol-to-word
    <= 0.1, <= 90% bullet lines, <= 30% ellipsis lines, >= 80% alphabetic
    words, >= 2 stop words, dup-line <= 0.30, dup-line-chars <= 0.20,
    top-3-gram chars <= 0.18, dup-5-gram chars <= 0.15. Pure column
    arithmetic, so the DuckDB oracle states the identical predicate."""
    c = F.col
    return (
        (c("n_tokens") >= 50) & (c("n_tokens") <= 100_000)
        & (c("mean_tok_len") >= 3) & (c("mean_tok_len") <= 10)
        & (c("symbol_word_ratio") <= 0.1)
        & (c("bullet_line_frac") <= 0.9)
        & (c("ellipsis_line_frac") <= 0.3)
        & (c("alpha_word_frac") >= 0.8)
        & (c("stop_hits") >= 2)
        & (c("dup_line_frac") <= 0.3)
        & (c("dup_line_char_frac") <= 0.2)
        & (c("top_3gram_char_frac") <= 0.18)
        & (c("dup_5gram_char_frac") <= 0.15)
    ).alias("gopher_keep")


def lang_id(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, pred_hits) — argmax over marker-token hit counts,
    deterministic tie-break by language code ASC, 'und' when zero hits."""
    toks = tokens_col(text_col)
    hit_cols = [
        F.size(F.filter(toks, lambda t: t.isin(m))).alias(f"hits_{lang}")
        for lang, m in sorted(LANG_MARKERS.items())
    ]
    scored = spread_input(docs).select(F.col(id_col).alias("doc_id"),
                                       *hit_cols)
    # argmax with lang-code tie-break via greatest over (hits, -rank) structs
    langs = sorted(LANG_MARKERS)
    pairs = F.array(*[
        F.struct(F.col(f"hits_{lang}").alias("h"), F.lit(-i).alias("nr"),
                 F.lit(lang).alias("lang"))
        for i, lang in enumerate(langs)
    ])
    best = F.array_max(pairs)
    return scored.select(
        "doc_id",
        F.when(best["h"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["h"].alias("pred_hits"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                n: int = 5) -> DataFrame:
    """(doc_id, fp) — winnowing-style document fingerprint: the minimum md5
    over word 5-gram shingles (rolling-hash analog, order-invariant to
    boilerplate position; docs shorter than n fall back to md5(text)).
    Tokens are staged as a real column before the shingle lambda touches
    them (the in-lambda rule — see the module note)."""
    staged = _stage(docs, id_col, text_col)
    sh = shingles_col(F.col(_TOKS), n)
    min_sh = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return staged.select(
        "doc_id",
        F.coalesce(min_sh, F.md5(F.col(_TEXT))).alias("fp"),
    )
