"""WordPiece analyzer v4 (``ls-spark-wp4-<vocab-hash>``) — the public BERT
BasicTokenizer pre-tokenization + vocab-driven greedy longest-match subword
tokenization.

The reference tokenizes with a learned HF subword vocab
(``models/splade.py:237-245``, ``data/base.py:67-76``; the indexer counts
``##``-prefixed pieces at ``sparse_indexer.py:192``). A deterministic
engine can't ship a learned vocab, but both halves of the HF chain are
public algorithms this module reproduces exactly:

1. **BasicTokenizer** (``basic_tokens``): clean (drop control/format chars
   and U+FFFD; whitespace -> space), space out CJK *ideographs* (BERT's
   ``_is_chinese_char`` ranges — kana stays inside letter runs; the
   reference's MeCab word segmentation is a learned component out of
   deterministic scope), lowercase, NFD-normalize and strip combining
   marks (category Mn, WITHOUT recomposing — HF leaves NFD), split every
   punctuation char (Unicode ``P*`` plus BERT's four ASCII symbol ranges)
   into its own token, keep all other non-space runs whole. This covers
   every script: ``mañana`` -> ``manana``, ``Привет`` -> ``привет``,
   ``día!`` -> ``dia`` ``!``.
2. **WordPiece** (``wordpiece_word``): greedy longest-match against the
   vocab, ``##`` continuation prefix, whole word -> ``[UNK]`` when any
   position fails. Given the same vocab file, the reference's exact token
   stream reproduces.

Three representations:
* ``py_tokenize`` — the driver/query/oracle-side mirror (pure Python,
  faithful to HF including NFD non-recomposition);
* ``spark_tokens`` — an Arrow pandas UDF; length-agnostic, vocab ships
  once per executor in the closure (tokenization with a learned vocab is
  the one place the reference itself runs a heavy UDF, SURVEY §2.8). The
  backend is resolved ONCE on the driver (``resolve_backend_name``:
  ``LSS_WORDPIECE_BACKEND=py|hf|auto``, default auto = Rust HF pipeline
  when the public ``tokenizers`` package is installed, else the Python
  kernel) and shipped in the closure — executors obey the driver's choice
  or fail loudly, never silently fall back, so a cluster with partial
  ``tokenizers`` installs cannot mix token streams. When hf is chosen the
  driver asserts hf/py parity on a multi-script probe set first, and
  ``build_index`` records the resolved backend in the manifest. The
  closure also carries the precompiled Unicode-class pattern spec, so
  workers skip the ~0.7 s unicodedata scan;
* ``wordpiece_basic_tokens_sql`` — the DuckDB mirror of ``basic_tokens``
  (``strip_accents(lower(..))`` + one RE2 extract). Verified equal to the
  Python kernel on Latin/accents/Cyrillic/Greek/Japanese/Thai/Hebrew/
  Arabic/punctuation (tests/test_wordpiece.py); KNOWN divergences, kept
  out of oracle corpora: word-final Greek sigma (DuckDB lower lacks the
  contextual rule), Hangul (DuckDB recomposes where HF leaves NFD Jamo),
  Devanagari-class spacing marks (DuckDB strips Mc, HF strips only Mn),
  and control chars mid-word (HF removes them joining the halves, the
  regex treats them as delimiters). Greedy longest-match itself isn't an
  inline SQL expression — the driver oracle uses SINGLE_CHAR_VOCAB, whose
  expansion has an exact closed form (first char, then ``##``+char), or a
  precomputed token table for general vocabs.

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
import sys
import unicodedata

import pandas as pd

from light_splade_spark.functions.analyzers import (
    ANALYZERS,
    Analyzer,
)

UNK = "[UNK]"
VERSION_PREFIX = "ls-spark-wp4-"
MAX_WORD_CHARS = 64  # HF default 100; longer words -> [UNK] outright

# BERT BasicTokenizer's punctuation includes four ASCII ranges beyond
# Unicode P* (they pull in $ + < = > ^ ` | ~, category S):
# 33-47, 58-64, 91-96, 123-126.
_ASCII_PUNCT_RANGES = ((33, 47), (58, 64), (91, 96), (123, 126))

# BERT ``_is_chinese_char``: CJK ideograph blocks ONLY — kana is not spaced
# out (it tokenizes as ordinary letter runs, as in HF).
CJK_IDEO_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)

# the SQL-mirrorable fixture vocab: every [a-z0-9] char + its ##-continuation.
# Greedy longest-match over it has a closed form (char, then ##char...), so
# a DuckDB oracle can mirror the expansion without reimplementing greedy.
SINGLE_CHAR_VOCAB: tuple[str, ...] = tuple(
    c for ch in "abcdefghijklmnopqrstuvwxyz0123456789"
    for c in (ch, "##" + ch)
)


def _class_body(ranges) -> str:
    """Regex character-class body from codepoint ranges (\\u escapes, so no
    class-metacharacter issues)."""
    parts = []
    for a, b in ranges:
        ea = f"\\U{a:08x}" if a > 0xFFFF else f"\\u{a:04x}"
        eb = f"\\U{b:08x}" if b > 0xFFFF else f"\\u{b:04x}"
        parts.append(ea if a == b else f"{ea}-{eb}")
    return "".join(parts)


def _cp_ranges(cps: list[int]):
    out = []
    s = p = cps[0]
    for c in cps[1:]:
        if c == p + 1:
            p = c
        else:
            out.append((s, p))
            s = p = c
    out.append((s, p))
    return out


_SPEC_CACHE: dict[str, str] = {}
_RE_CACHE: dict[str, re.Pattern] = {}


def _pattern_spec() -> dict[str, str]:
    """The three pattern STRINGS (clean / mn / token) built from exact
    Unicode category classes — stdlib ``re`` lacks ``\\p{..}``. The
    unicodedata scan costs ~0.7 s per process; the compiled-from-spec path
    (``_compiled(spec)``) is free, so the driver builds this once and ships
    it in the tokenizer UDF closure — executors never pay the scan."""
    if _SPEC_CACHE:
        return _SPEC_CACHE
    punct, mn, ctrl, zs = [], [], [], []
    for cp in range(sys.maxunicode + 1):
        cat = unicodedata.category(chr(cp))
        if cat.startswith("P"):
            punct.append(cp)
        elif cat == "Mn":
            mn.append(cp)
        elif cat.startswith("C") and cp not in (9, 10, 13):
            # HF _is_control: every category C* except \t \n \r
            ctrl.append(cp)
        elif cat in ("Zs", "Zl", "Zp"):
            # Zs: HF _is_whitespace; Zl/Zp (U+2028/29): survive HF's clean
            # pass but split anyway via str.split() in whitespace_tokenize
            zs.append(cp)
    punct = sorted(set(punct) | {cp for a, b in _ASCII_PUNCT_RANGES
                                 for cp in range(a, b + 1)})
    ctrl = sorted(set(ctrl) | {0xFFFD})  # HF also drops U+FFFD
    p_cls = _class_body(_cp_ranges(punct))
    ideo_cls = _class_body(CJK_IDEO_RANGES)
    # space \t \n \r + the Z* categories collected above
    ws_cls = "\\u0009\\u000a\\u000d\\u0020" + _class_body(_cp_ranges(zs))
    _SPEC_CACHE["clean"] = f"[{_class_body(_cp_ranges(ctrl))}]"
    # ASCII-restricted clean class: searching the full ~10k-char class
    # costs ~0.7 us/char, the 4-range ASCII one ~nothing — and an ASCII
    # text can only contain ASCII control chars (Cc 0-8, 11, 12, 14-31,
    # 127; 9/10/13 are kept as whitespace)
    _SPEC_CACHE["clean_ascii"] = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
    _SPEC_CACHE["mn"] = f"[{_class_body(_cp_ranges(mn))}]"
    _SPEC_CACHE["token"] = f"[{p_cls}]|[{ideo_cls}]|[^{ws_cls}{p_cls}{ideo_cls}]+"
    return _SPEC_CACHE


def _compiled(spec: dict[str, str] | None = None) -> dict[str, re.Pattern]:
    """Compiled pattern tables, once per process. When ``spec`` (a driver-
    built ``_pattern_spec()``) is provided — as the Spark UDF closure does —
    the unicodedata scan is skipped entirely."""
    if _RE_CACHE:
        return _RE_CACHE
    for k, p in (spec or _pattern_spec()).items():
        _RE_CACHE[k] = re.compile(p)
    return _RE_CACHE


def basic_tokens(text: str) -> list[str]:
    """The public BERT BasicTokenizer (do_lower_case=True) token stream, in
    document order. Equivalent single-pass form of HF's clean -> space-CJK
    -> whitespace-split -> per-token (lower, NFD strip-Mn) -> punct-split:
    lower/NFD never create whitespace/punctuation/ideographs, so one global
    lower+NFD+strip followed by one extraction regex yields the identical
    stream.

    ASCII fast path (bulk webtext is ASCII): after the clean pass an ASCII
    text needs no NFD, its whitespace set is exactly ``str.split``'s
    surviving chars (space/\\t/\\n/\\r — \\v/\\f are control chars the clean
    pass removed), and an ``isalnum()`` word contains no punctuation/symbol
    char, so it IS its own single token — only words carrying punctuation
    fall back to the extraction regex. Identical output to the general
    path (hypothesis-verified against the literal HF algorithm in
    tests/test_wordpiece.py), ~40x faster on pure-ASCII corpora."""
    tables = _compiled()
    t = text or ""
    if t.isascii():
        clean = tables["clean_ascii"]
        if clean.search(t):  # control chars are rare
            t = clean.sub("", t)
        t = t.lower()
        findall = tables["token"].findall
        out: list[str] = []
        for w in t.split():
            if w.isalnum():
                out.append(w)
            else:
                out.extend(findall(w))
        return out
    if tables["clean"].search(t):  # control/format/U+FFFD chars are rare
        t = tables["clean"].sub("", t)
    t = t.lower()
    if not t.isascii():
        t = unicodedata.normalize("NFD", t)
        if tables["mn"].search(t):
            t = tables["mn"].sub("", t)
        return tables["token"].findall(t)
    # the clean pass stripped every non-ASCII char: take the fast path
    return basic_tokens(t)


def wordpiece_basic_tokens_sql(col: str) -> str:
    """DuckDB expression mirroring ``basic_tokens`` (see module docstring
    for the verified scripts and the four documented divergences).

    ``strip_accents(lower(x))`` reproduces lower+NFD+strip-Mn (verified
    char-for-char in tests), and one RE2 extraction reproduces the token
    stream: punctuation chars and CJK ideographs as single tokens, maximal
    runs of everything else (control chars excluded — they never match)."""
    ap = "".join(f"\\x{{{a:02x}}}-\\x{{{b:02x}}}"
                 for a, b in _ASCII_PUNCT_RANGES)
    ideo = "".join(
        (f"\\x{{{a:x}}}" if a == b else f"\\x{{{a:x}}}-\\x{{{b:x}}}")
        for a, b in CJK_IDEO_RANGES)
    pat = (f"[{ap}]|\\p{{P}}|[{ideo}]"
           f"|[^\\s\\p{{Z}}\\p{{C}}\\x{{fffd}}{ap}\\p{{P}}{ideo}]+")
    return f"regexp_extract_all(strip_accents(lower({col})), '{pat}')"


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
    # Zipf makes word-level memoization the dominant win: across a corpus
    # batch most basic tokens repeat, so the greedy WordPiece loop runs once
    # per DISTINCT word per process, not once per occurrence. Bounded so a
    # pathological all-distinct corpus can't grow driver/worker memory.
    cache: dict[str, list[str]] = {}

    def py_tokenize(text: str) -> list[str]:
        out: list[str] = []
        get = cache.get
        for w in basic_tokens(text):
            p = get(w)
            if p is None:
                if len(cache) >= 1_000_000:
                    cache.clear()
                p = cache[w] = wordpiece_word(w, vocab)
            out.extend(p)
        return out
    return py_tokenize


# -- optional Rust fast path (public HF `tokenizers` package) -----------------
#
# The reference's own tokenization runs this exact Rust code (HF fast
# tokenizers, models/splade.py:237-245); the pure-Python kernel above is a
# measured ~7x tax on the build hot path (BENCH_r04). When the public
# `tokenizers` package is installed, `spark_tokens` routes batches through
# a Rust BertNormalizer+BertPreTokenizer+WordPiece pipeline configured to
# the SAME algorithm (clean/CJK-space/lower/NFD-strip-Mn/punct-split +
# greedy longest-match, MAX_WORD_CHARS cap); the Python kernel stays the
# canonical mirror and the driver-oracle surface, and skip-paired tests
# assert token-stream equality whenever the package is present.
# LSS_WORDPIECE_BACKEND = auto (default) | py | hf selects explicitly;
# "hf" without the package installed fails loudly, PIL-style.

def hf_backend_available() -> bool:
    try:
        import tokenizers  # noqa: F401
        return True
    except ImportError:
        return False


def make_hf_encode_batch(vocab: tuple[str, ...]):
    """-> callable(list[str]) -> list[list[str]] backed by the Rust HF
    pipeline, or raises NotImplementedError when `tokenizers` is absent.
    Built lazily PER WORKER PROCESS (the Rust Tokenizer is not picklable;
    only the vocab tuple ships in the UDF closure)."""
    try:
        from tokenizers import Tokenizer
        from tokenizers.models import WordPiece as HFWordPiece
        from tokenizers.normalizers import BertNormalizer
        from tokenizers.pre_tokenizers import BertPreTokenizer
    except ImportError:
        raise NotImplementedError(
            "LSS_WORDPIECE_BACKEND=hf requires the public `tokenizers` "
            "package (Rust HF tokenizers); not installed — use the default "
            "python backend") from None
    ids = {UNK: 0}
    for p in vocab:
        ids.setdefault(p, len(ids))
    tok = Tokenizer(HFWordPiece(
        ids, unk_token=UNK, max_input_chars_per_word=MAX_WORD_CHARS,
        continuing_subword_prefix="##"))
    tok.normalizer = BertNormalizer(
        clean_text=True, handle_chinese_chars=True, strip_accents=True,
        lowercase=True)
    tok.pre_tokenizer = BertPreTokenizer()

    def encode_batch(texts: list[str]) -> list[list[str]]:
        return [e.tokens for e in tok.encode_batch(texts)]

    return encode_batch


_WORKER_ENCODERS: dict[tuple, object] = {}  # per-process cache, keyed by vocab


def resolve_backend_name() -> str:
    """DRIVER-side backend resolution: ``LSS_WORDPIECE_BACKEND`` env (py |
    hf | auto, default auto) + package presence -> the concrete backend
    name ("py" or "hf") that every executor will be TOLD to use. Resolving
    once on the driver and shipping the decision in the UDF closure (not
    re-resolving per worker) closes the ADVICE-r5 divergence class: a
    cluster with `tokenizers` on some executors but not others fails
    loudly instead of silently mixing Rust and Python token streams."""
    backend = os.environ.get("LSS_WORDPIECE_BACKEND", "auto")
    if backend == "auto":
        return "hf" if hf_backend_available() else "py"
    if backend in ("py", "hf"):
        return backend
    raise ValueError(f"unknown LSS_WORDPIECE_BACKEND={backend!r} "
                     "(use auto, py, or hf)")


def _get_encoder(vocab_tuple: tuple[str, ...], vset: frozenset[str],
                 version: str, backend: str,
                 spec: dict[str, str] | None = None):
    """Worker-side encoder for the DRIVER-resolved ``backend`` ("py"/"hf" —
    never "auto": workers obey or fail loudly). Cached per (process,
    vocab-version, backend); the version string is stable across task
    deserializations, so one encoder is built per worker process."""
    key = (version, backend)
    enc = _WORKER_ENCODERS.get(key)
    if enc is None:
        if backend == "hf":
            enc = make_hf_encode_batch(vocab_tuple)
        else:
            _compiled(spec)  # seed pattern tables from the shipped spec
            py_tok = _make_py_tokenize(vset)
            enc = lambda texts: [py_tok(t) for t in texts]  # noqa: E731
        _WORKER_ENCODERS[key] = enc
    return enc


_PARITY_PROBE = (
    "Hello, World! 42", "mañana — el día", "Привет мир", "Γειά σου",
    "日本語テキストと漢字", "mixed_CASE token-stream; ~tilde~",
)


def _assert_hf_parity(vocab_tuple, vset, version) -> None:
    """One-shot driver-side check that the Rust HF pipeline and the Python
    kernel (the canonical mirror every oracle uses) agree on a probe set
    spanning scripts — a unicode-version skew between the two would
    otherwise silently build an index whose token stream disagrees with
    query-side tokenization."""
    hf = make_hf_encode_batch(vocab_tuple)(list(_PARITY_PROBE))
    py_tok = _make_py_tokenize(vset)
    py = [py_tok(t) for t in _PARITY_PROBE]
    if hf != py:
        bad = next(i for i in range(len(py)) if hf[i] != py[i])
        raise RuntimeError(
            f"wordpiece backend parity failure for analyzer {version}: HF "
            f"Rust pipeline and Python kernel disagree on probe "
            f"{_PARITY_PROBE[bad]!r} ({hf[bad]!r} != {py[bad]!r}); "
            "set LSS_WORDPIECE_BACKEND=py or align the tokenizers install")


def _make_spark_tokens(vocab: frozenset[str], vocab_tuple: tuple[str, ...],
                       version: str):
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    holder: dict = {}  # UDF built lazily — pandas_udf needs a live session

    def spark_tokens(text, max_chars: int | None = None) -> Column:
        if "udf" not in holder:
            backend = resolve_backend_name()
            if backend == "hf":
                _assert_hf_parity(vocab_tuple, vocab, version)
            spec = dict(_pattern_spec())  # ships in the closure (~20 KB)

            @pandas_udf("array<string>")
            def wp_udf(texts: pd.Series) -> pd.Series:
                enc = _get_encoder(vocab_tuple, vocab, version, backend,
                                   spec)
                return pd.Series(
                    enc([t or "" for t in texts]), index=texts.index)
            holder["udf"] = wp_udf
            holder["backend"] = backend
        c = F.col(text) if isinstance(text, str) else text
        if max_chars is not None:
            # the reference's pre-tokenize char budget (models/splade.py:229)
            c = F.substring(c, 1, max_chars)
        return holder["udf"](c)

    spark_tokens.backend_holder = holder
    return spark_tokens


def vocab_version(vocab: list[str] | tuple[str, ...]) -> str:
    h = hashlib.md5("\n".join(vocab).encode("utf-8")).hexdigest()[:12]
    return VERSION_PREFIX + h


def make_wordpiece_analyzer(vocab: list[str] | tuple[str, ...],
                            register: bool = True) -> Analyzer:
    """Build (and by default register) the v4 analyzer for ``vocab``.

    The version string pins md5(vocab): two processes holding the same
    vocab list resolve to the same version, and an index built with one
    refuses queries tokenized with any other (analyzers.get_analyzer)."""
    vset = frozenset(vocab)
    version = vocab_version(vocab)
    ana = Analyzer(
        version=version,
        spark_tokens=_make_spark_tokens(vset, tuple(vocab), version),
        py_tokenize=_make_py_tokenize(vset),  # canonical mirror, always py
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
    """Reconstruct (and register) the vocab-driven analyzer pinned by an
    index from its persisted vocab file; None when the index carries no
    vocab or the vocab hashes to a different version (tampered/mismatched
    file). The version prefix selects the analyzer family: ``ls-spark-wp4-``
    -> plain BERT BasicTokenizer+WordPiece, ``ls-spark-mecab-`` -> MeCab
    word segmentation + WordPiece (functions/mecab_ja.py; raises a named
    NotImplementedError when fugashi is absent — an index built with MeCab
    must never be silently queried with a different segmentation)."""
    path = os.path.join(index_dir, VOCAB_FILENAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        payload = json.load(f)
    if version.startswith("ls-spark-mecab-"):
        from light_splade_spark.functions.mecab_ja import (
            make_mecab_wordpiece_analyzer,
        )
        ana = make_mecab_wordpiece_analyzer(payload["vocab"])
    else:
        ana = make_wordpiece_analyzer(payload["vocab"])
    if ana.version != version:
        raise ValueError(
            f"index at {index_dir} pins analyzer {version!r} but its "
            f"{VOCAB_FILENAME} hashes to {ana.version!r}; the vocab file "
            "does not match the index")
    return ana
