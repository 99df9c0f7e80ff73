"""MeCab-segmented Japanese WordPiece analyzer (``ls-spark-mecab-<hash>``).

The reference tokenizes Japanese with HF's BertJapaneseTokenizer
(``/root/reference/src/light_splade/data/base.py:67-76``; mMARCO-ja is its
flagship corpus): MeCab morphological *word* segmentation BEFORE WordPiece.
The wp4 analyzer reproduces the plain BERT BasicTokenizer exactly, but
BasicTokenizer spaces ideographs char-by-char — so on Japanese text its
token stream cannot match the reference's even with the same vocab. This
module closes that gap with the public algorithm chain of HF's
``MecabTokenizer`` + ``WordpieceTokenizer``:

1. NFKC-normalize the text (``MecabTokenizer.normalize_text``);
2. segment into words with MeCab (surface forms, in order) via the public
   ``fugashi`` binding + ``unidic-lite`` dictionary — optional imports,
   the same seam pattern as PIL and the Iceberg jar: absent -> a named
   NotImplementedError at analyzer construction, never a silent fallback
   to a different segmentation;
3. greedy longest-match WordPiece per word (``wordpiece_word``, shared
   with wp4 — ``##`` continuations, whole word -> ``[UNK]`` on failure).

``do_lower_case`` is False, matching the cl-tohoku Japanese BERT configs
the reference loads (their vocab is cased; lowering would break parity).

The version string pins md5(vocab) under a distinct ``ls-spark-mecab-``
prefix, so an index built with MeCab segmentation refuses queries
tokenized any other way, and ``resolve_analyzer`` reconstructs the right
family from the index's persisted vocab file alone.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from light_splade_spark.functions.analyzers import ANALYZERS, Analyzer
from light_splade_spark.functions.wordpiece import (
    MAX_WORD_CHARS,
    wordpiece_word,
)

MECAB_VERSION_PREFIX = "ls-spark-mecab-"


def mecab_available() -> bool:
    try:
        import fugashi  # noqa: F401
        return True
    except ImportError:
        return False


_WORKER_TAGGERS: dict = {}  # per-process cache (Tagger is not picklable)


def _mecab_words(text: str) -> list[str]:
    """NFKC-normalize then MeCab-segment into surface forms — the literal
    HF MecabTokenizer algorithm. Built lazily per worker process."""
    tagger = _WORKER_TAGGERS.get("tagger")
    if tagger is None:
        try:
            import fugashi
        except ImportError:
            raise NotImplementedError(
                "Japanese word segmentation requires the public `fugashi` "
                "MeCab binding (+ `unidic-lite` dictionary); not installed "
                "— install both, or tokenize with the wp4 analyzer "
                "(character-level ideograph handling)") from None
        tagger = fugashi.Tagger()
        _WORKER_TAGGERS["tagger"] = tagger
    t = unicodedata.normalize("NFKC", text or "").strip()
    return [w.surface for w in tagger(t) if w.surface]


def _make_py_tokenize(vset: frozenset[str]):
    def py_tokenize(text: str) -> list[str]:
        out: list[str] = []
        for w in _mecab_words(text):
            out.extend(wordpiece_word(w, vset, MAX_WORD_CHARS))
        return out
    return py_tokenize


def _make_spark_tokens(vset: frozenset[str]):
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    py_tok = _make_py_tokenize(vset)
    holder: dict = {}  # UDF built lazily — pandas_udf needs a live session

    def spark_tokens(text, max_chars: int | None = None) -> Column:
        if "udf" not in holder:
            @pandas_udf("array<string>")
            def mecab_udf(texts: pd.Series) -> pd.Series:
                return texts.map(lambda t: py_tok(t or ""))
            holder["udf"] = mecab_udf
        c = F.col(text) if isinstance(text, str) else text
        if max_chars is not None:
            c = F.substring(c, 1, max_chars)
        return holder["udf"](c)

    return spark_tokens


def mecab_vocab_version(vocab) -> str:
    import hashlib
    h = hashlib.md5("\n".join(vocab).encode("utf-8")).hexdigest()[:12]
    return MECAB_VERSION_PREFIX + h


def make_mecab_wordpiece_analyzer(vocab, register: bool = True) -> Analyzer:
    """Build (and by default register) the MeCab+WordPiece analyzer for
    ``vocab``. Probes the segmenter at CONSTRUCTION time so a missing
    dependency fails on the driver with a named error, not inside an
    executor task."""
    if not mecab_available():
        raise NotImplementedError(
            "make_mecab_wordpiece_analyzer requires the public `fugashi` "
            "MeCab binding (+ `unidic-lite` dictionary); not installed in "
            "this environment")
    try:
        # construct a Tagger NOW: fugashi importing fine but the unidic
        # dictionary missing would otherwise surface as a raw RuntimeError
        # inside executor tasks, not here on the driver
        _mecab_words("")
    except RuntimeError as e:
        raise NotImplementedError(
            f"fugashi imported but its MeCab dictionary failed to load "
            f"({e}); install `unidic-lite` (or configure unidic)") from e
    vset = frozenset(vocab)
    ana = Analyzer(
        version=mecab_vocab_version(vocab),
        spark_tokens=_make_spark_tokens(vset),
        py_tokenize=_make_py_tokenize(vset),
        duckdb_tokens=None,  # MeCab has no SQL closed form
        vocab=tuple(vocab),
    )
    if register:
        ANALYZERS[ana.version] = ana
    return ana
