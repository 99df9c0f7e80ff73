"""WordPiece analyzer v3 (``ls-spark-wp3-<vocab-hash>``) — vocab-driven
greedy longest-match subword tokenization.

The reference tokenizes with a learned HF subword vocab
(``models/splade.py:237-245``, ``data/base.py:67-76``; the indexer counts
``##``-prefixed pieces at ``sparse_indexer.py:192``). A deterministic
engine can't ship a learned vocab, but the WordPiece *algorithm* is public
(greedy longest-match against a vocab, ``##`` continuation prefix, whole
word -> ``[UNK]`` when any position fails): given the same vocab file, this
analyzer reproduces the reference's exact token stream.

Three representations:
* ``py_tokenize`` — the driver/query/oracle-side mirror (pure Python);
* ``spark_tokens`` — an Arrow pandas UDF sharing the SAME Python kernel
  (tokenization with a learned vocab is the one place the reference itself
  runs a heavy UDF, SURVEY §2.8); length-agnostic, vocab ships once per
  executor in the closure;
* no generic DuckDB expression — greedy longest-match isn't an inline SQL
  expression. The driver oracle instead uses SINGLE_CHAR_VOCAB, for which
  the WordPiece expansion has an exact closed form (first char, then
  ``##``+char per following char) that SQL mirrors independently; the
  general greedy path is pytest/hypothesis-verified against the Python
  mirror (tests/test_wordpiece.py).

The analyzer version embeds md5(vocab), and ``build_index`` persists the
vocab as ``<index_dir>/analyzer_vocab.json`` so ``resolve_analyzer`` can
reconstruct the tokenizer from the index alone — an index is self-contained
the way the reference's checkpoint directory carries its tokenizer files.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import pandas as pd

from light_splade_spark.functions.analyzers import (
    ANALYZERS,
    CJK_RANGE,
    Analyzer,
)

UNK = "[UNK]"
VERSION_PREFIX = "ls-spark-wp3-"
MAX_WORD_CHARS = 64  # HF default 100; longer words -> [UNK] outright

# basic pre-tokenization, document order: ascii alnum words + single CJK
# chars (BERT's basic tokenizer splits around CJK codepoints)
_BASIC_RE = re.compile(f"[a-z0-9]+|[{CJK_RANGE}]")

# the SQL-mirrorable fixture vocab: every [a-z0-9] char + its ##-continuation.
# Greedy longest-match over it has a closed form (char, then ##char...), so
# a DuckDB oracle can mirror the expansion without reimplementing greedy.
SINGLE_CHAR_VOCAB: tuple[str, ...] = tuple(
    c for ch in "abcdefghijklmnopqrstuvwxyz0123456789"
    for c in (ch, "##" + ch)
)


def basic_tokens(text: str) -> list[str]:
    return _BASIC_RE.findall((text or "").lower())


def wordpiece_word(word: str, vocab: frozenset[str],
                   max_chars: int = MAX_WORD_CHARS) -> list[str]:
    """Greedy longest-match WordPiece of ONE basic token (public algorithm:
    at each position take the longest vocab entry matching the remaining
    suffix, continuations carry the ## prefix; any failure -> [UNK] for the
    whole word)."""
    if len(word) > max_chars:
        return [UNK]
    pieces: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while start < end:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


def _make_py_tokenize(vocab: frozenset[str]):
    def py_tokenize(text: str) -> list[str]:
        out: list[str] = []
        for w in basic_tokens(text):
            out.extend(wordpiece_word(w, vocab))
        return out
    return py_tokenize


def _make_spark_tokens(vocab: frozenset[str]):
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    py_tok = _make_py_tokenize(vocab)
    holder: dict = {}  # UDF built lazily — pandas_udf needs a live session

    def spark_tokens(text, max_chars: int | None = None) -> Column:
        if "udf" not in holder:
            @pandas_udf("array<string>")
            def wp_udf(texts: pd.Series) -> pd.Series:
                return texts.map(lambda t: py_tok(t or ""))
            holder["udf"] = wp_udf
        c = F.col(text) if isinstance(text, str) else text
        if max_chars is not None:
            # the reference's pre-tokenize char budget (models/splade.py:229)
            c = F.substring(c, 1, max_chars)
        return holder["udf"](c)

    return spark_tokens


def vocab_version(vocab: list[str] | tuple[str, ...]) -> str:
    h = hashlib.md5("\n".join(vocab).encode("utf-8")).hexdigest()[:12]
    return VERSION_PREFIX + h


def make_wordpiece_analyzer(vocab: list[str] | tuple[str, ...],
                            register: bool = True) -> Analyzer:
    """Build (and by default register) the v3 analyzer for ``vocab``.

    The version string pins md5(vocab): two processes holding the same
    vocab list resolve to the same version, and an index built with one
    refuses queries tokenized with any other (analyzers.get_analyzer)."""
    vset = frozenset(vocab)
    ana = Analyzer(
        version=vocab_version(vocab),
        spark_tokens=_make_spark_tokens(vset),
        py_tokenize=_make_py_tokenize(vset),
        duckdb_tokens=None,  # not inline-SQL-expressible; see module doc
        vocab=tuple(vocab),
    )
    if register:
        ANALYZERS[ana.version] = ana
    return ana


# -- index self-containment ---------------------------------------------------

VOCAB_FILENAME = "analyzer_vocab.json"


def save_vocab(index_dir: str, ana: Analyzer) -> None:
    if not getattr(ana, "vocab", None):
        return
    path = os.path.join(index_dir, VOCAB_FILENAME)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": ana.version, "vocab": list(ana.vocab)}, f)
    os.replace(tmp, path)


def load_vocab_analyzer(index_dir: str, version: str) -> Analyzer | None:
    """Reconstruct (and register) the wordpiece analyzer pinned by an index
    from its persisted vocab file; None when the index carries no vocab or
    the vocab hashes to a different version (tampered/mismatched file)."""
    path = os.path.join(index_dir, VOCAB_FILENAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        payload = json.load(f)
    ana = make_wordpiece_analyzer(payload["vocab"])
    if ana.version != version:
        raise ValueError(
            f"index at {index_dir} pins analyzer {version!r} but its "
            f"{VOCAB_FILENAME} hashes to {ana.version!r}; the vocab file "
            "does not match the index")
    return ana
