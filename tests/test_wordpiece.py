"""WordPiece analyzer v4: BERT BasicTokenizer pre-tokenization, greedy
longest-match parity, build->WAND flow, index self-containment, ##-token
stats.

Reference behaviors being matched: HF subword tokenization feeding the
sparse encoder (``models/splade.py:237-245``, ``data/base.py:67-76``) and
the indexer's ``##``-piece count (``sparse_indexer.py:192``).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from light_splade_spark.functions.analyzers import ANALYZERS
from light_splade_spark.functions.wordpiece import (
    SINGLE_CHAR_VOCAB,
    hf_backend_available,
    UNK,
    make_wordpiece_analyzer,
    vocab_version,
    wordpiece_word,
)

# a ##-continuation vocab fixture: full single-char closure (no UNK on
# alnum text) + multi-char pieces that exercise greedy LONGEST match
FIXTURE_VOCAB = tuple(SINGLE_CHAR_VOCAB) + (
    "spark", "shuffle", "join", "##ing", "##er", "##s", "un", "##affable",
    "the", "##the", "data", "##data", "ハ", "##ハ", "ナ", "##ナ",
)


@pytest.fixture(scope="module")
def wp():
    return make_wordpiece_analyzer(FIXTURE_VOCAB)


def test_greedy_longest_match_cases(wp):
    v = frozenset(FIXTURE_VOCAB)
    # classic HF doc example shape: un + ##affable
    assert wordpiece_word("unaffable", v) == ["un", "##affable"]
    # longest match wins over char-by-char
    assert wp.py_tokenize("sparks") == ["spark", "##s"]
    assert wp.py_tokenize("joining") == ["join", "##ing"]
    # falls back to chars where no long piece exists
    assert wp.py_tokenize("ab") == ["a", "##b"]
    # whole word -> [UNK] when a position can't match (no vocab for 'ハ'
    # missing case: use a char outside the vocab)
    assert wordpiece_word("abc", frozenset({"a", "##b"})) == [UNK]
    # overlong word -> [UNK] outright
    assert wordpiece_word("x" * 100, v) == [UNK]
    # kana is NOT spaced out (BERT _is_chinese_char covers ideographs
    # only): "ハナ" is one basic token, wordpiece'd greedily
    assert wp.py_tokenize("ハナ") == ["ハ", "##ナ"]
    # document order of basic tokens is preserved; punctuation chars become
    # their own tokens -> [UNK] under this vocab
    assert wp.py_tokenize("the spark!! data") == [
        "the", "spark", UNK, UNK, "data"]


def test_version_pins_vocab(wp):
    assert wp.version == vocab_version(FIXTURE_VOCAB)
    other = make_wordpiece_analyzer(FIXTURE_VOCAB[:-1], register=False)
    assert other.version != wp.version
    assert wp.version in ANALYZERS


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefg01 ハナかタ-_.", max_size=40))
def test_py_vs_wordpiece_word_reconstruction(text):
    """Every non-UNK tokenization concatenates back to the basic tokens."""
    from light_splade_spark.functions.wordpiece import basic_tokens

    wp = make_wordpiece_analyzer(FIXTURE_VOCAB, register=False)
    toks = wp.py_tokenize(text)
    # reconstruct: strip ## and re-split at non-continuation boundaries
    words = []
    for t in toks:
        if t == UNK:
            words.append(None)
        elif t.startswith("##"):
            assert words, "continuation piece cannot start a word"
            if words[-1] is not None:
                words[-1] += t[2:]
        else:
            words.append(t)
    basics = basic_tokens(text)
    assert len(words) == len(basics)
    for got, want in zip(words, basics):
        assert got is None or got == want


def test_spark_udf_matches_python_mirror(spark, wp):
    texts = [
        "sparks joining the data shuffle",
        "unaffable persons persevere",
        "ハナ ハ xyz 123",
        "", "!!!", "the the the",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id BIGINT, text STRING")
    got = {r.doc_id: list(r.toks) for r in
           df.select("doc_id",
                     wp.spark_tokens("text").alias("toks")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == wp.py_tokenize(t), t
    # max_chars mirrors the reference's pre-tokenize char budget
    got8 = df.select("doc_id", wp.spark_tokens("text", 8).alias("toks")) \
        .collect()
    for r in got8:
        assert list(r.toks) == wp.py_tokenize(texts[r.doc_id][:8])


def test_wordpiece_build_to_wand_rank_identity(spark, tmp_path, wp):
    """The ##-vocab flows build -> WAND rank-identically to the exact SQL
    path using the same analyzer (the v3 'Done' criterion)."""
    from light_splade_spark.index.build import build_index
    from light_splade_spark.index.wand import wand_topk
    from light_splade_spark.plans.bm25_sql import bm25_topk_docs

    docs = spark.createDataFrame([
        (0, "sparks joining the data"),
        (1, "spark shuffle shuffler"),
        (2, "unaffable data keeper"),
        (3, "the thespian sparked"),
        (4, "joined sparks everywhere"),
    ], "doc_id BIGINT, text STRING")
    idx = str(tmp_path / "wp_idx")
    man = build_index(spark, docs, idx, n_shards=2, n_buckets=4, n_salts=2,
                      n_shard_groups=1, analyzer=wp)
    assert man.analyzer_version == wp.version
    queries = [(0, "spark data"), (1, "joining sparks"), (2, "unaffable")]
    wand = sorted((r.qid, r.rank, r.doc_id, r.score) for r in
                  wand_topk(spark, idx, queries, top_k=5).collect())
    sql = sorted((r.qid, r.rank, r.doc_id, r.score) for r in
                 bm25_topk_docs(docs, queries, top_k=5,
                                analyzer=wp).collect())
    assert wand == sql and len(wand) > 0

    # Engine.stats counts real ##-continuation pieces (sparse_indexer.py:192)
    from light_splade_spark.engine import Engine
    stats = Engine.open(spark, idx).stats()
    assert stats["num_subword_tokens"] > 0

    # the manifest records the DRIVER-resolved tokenizer backend (ADVICE
    # r5): "py" here unless the `tokenizers` package is installed
    assert man.wordpiece_backend == (
        "hf" if hf_backend_available() else "py")


def test_index_self_containment(spark, tmp_path, wp):
    """A process that never constructed the analyzer resolves it from the
    vocab file persisted inside the index dir (simulated by unregistering)."""
    import os

    from light_splade_spark.index.build import build_index
    from light_splade_spark.index.wand import wand_topk

    docs = spark.createDataFrame(
        [(0, "spark data"), (1, "data shuffle")], "doc_id BIGINT, text STRING")
    idx = str(tmp_path / "sc_idx")
    build_index(spark, docs, idx, n_shards=1, n_buckets=2, n_salts=1,
                n_shard_groups=1, analyzer=wp)
    assert os.path.exists(os.path.join(idx, "analyzer_vocab.json"))
    ANALYZERS.pop(wp.version, None)
    try:
        res = wand_topk(spark, idx, [(0, "spark")], top_k=3).collect()
        assert len(res) == 1 and res[0].doc_id == 0
        # resolution re-registered it
        assert wp.version in ANALYZERS
    finally:
        ANALYZERS[wp.version] = wp

    # a tampered vocab file is refused, not silently accepted
    import json
    with open(os.path.join(idx, "analyzer_vocab.json")) as f:
        payload = json.load(f)
    payload["vocab"] = payload["vocab"][:-1]
    with open(os.path.join(idx, "analyzer_vocab.json"), "w") as f:
        json.dump(payload, f)
    ANALYZERS.pop(wp.version, None)
    try:
        with pytest.raises(ValueError, match="does not match the index"):
            wand_topk(spark, idx, [(0, "spark")], top_k=3)
    finally:
        ANALYZERS[wp.version] = wp


# ---------------------------------------------------------------------------
# v4 BasicTokenizer: HF-literal equivalence, DuckDB mirror, mixed-script flow
# ---------------------------------------------------------------------------

def _hf_basic_tokenize(text: str) -> list[str]:
    """The literal public HF BasicTokenizer(do_lower_case=True) algorithm,
    transcribed step-by-step (clean -> space-CJK -> whitespace split ->
    per-token lower + NFD strip-Mn -> punctuation split). The production
    ``basic_tokens`` is a single-pass refactoring of this; hypothesis
    asserts the two are extensionally equal."""
    import unicodedata

    from light_splade_spark.functions.wordpiece import CJK_IDEO_RANGES

    def is_ws(ch):
        return ch in " \t\n\r" or unicodedata.category(ch) == "Zs"

    def is_ctrl(ch):
        if ch in "\t\n\r":
            return False
        return unicodedata.category(ch).startswith("C")

    def is_punct(ch):
        cp = ord(ch)
        if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) \
                or (123 <= cp <= 126):
            return True
        return unicodedata.category(ch).startswith("P")

    def is_cjk(cp):
        return any(a <= cp <= b for a, b in CJK_IDEO_RANGES)

    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or is_ctrl(ch):
            continue
        out.append(" " if is_ws(ch) else ch)
    cleaned = "".join(out)
    out = []
    for ch in cleaned:
        if is_cjk(ord(ch)):
            out.extend((" ", ch, " "))
        else:
            out.append(ch)
    final: list[str] = []
    for tok in "".join(out).split():
        tok = unicodedata.normalize("NFD", tok.lower())
        tok = "".join(c for c in tok if unicodedata.category(c) != "Mn")
        cur: list[str] = []
        for ch in tok:
            if is_punct(ch):
                if cur:
                    final.append("".join(cur))
                    cur = []
                final.append(ch)
            else:
                cur.append(ch)
        if cur:
            final.append("".join(cur))
    return final


_MIXED_ALPHABET = (
    "aZé ü,ñ!—…«»\t\n㐀一鿿豈ハかカ3.14_x-y(z)П р ивйетσς ­\x07�\x00"
    "עִبرٍ£$%^&*　 "
)


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_MIXED_ALPHABET, max_size=60))
def test_basic_tokens_matches_literal_hf_algorithm(text):
    from light_splade_spark.functions.wordpiece import basic_tokens

    assert basic_tokens(text) == _hf_basic_tokenize(text)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=60))
def test_basic_tokens_matches_literal_hf_algorithm_any_unicode(text):
    from light_splade_spark.functions.wordpiece import basic_tokens

    assert basic_tokens(text) == _hf_basic_tokenize(text)


def test_basic_tokens_duckdb_mirror_agrees():
    """The oracle-side SQL mirror tokenizes identically on every script the
    driver oracle exercises (module docstring lists the four documented
    divergence classes, which this corpus deliberately avoids)."""
    import duckdb

    from light_splade_spark.functions.wordpiece import (
        basic_tokens,
        wordpiece_basic_tokens_sql,
    )

    texts = [
        "Hello, World! It's a test.",
        "mañana — Café au lait; naïve façade…",
        "Привет мир, это тест №5 (да/нет)?",
        "日本語のテキスト、東京都です。カタカナとひらがな混じり",
        "ελληνικα κειμενο",
        "ไทย น้ำ عربي محمد עברית",
        "MiXeD CaSe 123 foo_bar foo-bar a.b.c",
        "", "   ", "!!!", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",
        "étude already-decomposed",
        "tab\tsep\nnewline «quoted» [bracketed] {braced}",
    ]
    con = duckdb.connect()
    sql = wordpiece_basic_tokens_sql("t")
    for t in texts:
        duck = con.execute(f"select {sql} from (select ? as t)",
                           [t]).fetchone()[0]
        assert duck == basic_tokens(t), t


def test_mixed_script_build_to_wand_rank_identity(spark, tmp_path):
    """The v4 'Done' criterion: accented/Cyrillic/punctuated/Japanese text
    flows build -> WAND rank-identically between the index kernel and the
    exact SQL path, under a vocab covering the mixed-script pieces."""
    from light_splade_spark.index.build import build_index
    from light_splade_spark.index.wand import wand_topk
    from light_splade_spark.plans.bm25_sql import bm25_topk_docs

    vocab = tuple(SINGLE_CHAR_VOCAB) + (
        "cafe", "##s", "manana", "privet", "mir", "тест", "привет",
        "дом", "##а", "東", "京", "語", "テスト", "ハナ", "ハ", "##ナ",
        "naive", "facade", "etude",
    )
    wp = make_wordpiece_analyzer(vocab)
    docs = spark.createDataFrame([
        (0, "Café, cafés!! (naïve façade)"),
        (1, "Привет мир — тест дома..."),
        (2, "東京の日本語テスト、ハナ"),
        (3, "étude mañana; PRIVET?"),
        (4, "cafe manana privet 東 語"),
    ], "doc_id BIGINT, text STRING")
    idx = str(tmp_path / "wp4_idx")
    man = build_index(spark, docs, idx, n_shards=2, n_buckets=4, n_salts=2,
                      n_shard_groups=1, analyzer=wp)
    assert man.analyzer_version == wp.version
    queries = [(0, "café manana"), (1, "привет тест"), (2, "東京語 ハナ"),
               (3, "naïve étude...")]
    wand = sorted((r.qid, r.rank, r.doc_id, r.score) for r in
                  wand_topk(spark, idx, queries, top_k=5).collect())
    sql = sorted((r.qid, r.rank, r.doc_id, r.score) for r in
                 bm25_topk_docs(docs, queries, top_k=5,
                                analyzer=wp).collect())
    assert wand == sql and len(wand) > 0
    # the accent/punct handling actually fired: café and cafés both hit doc 0
    hits = {(r.qid, r.doc_id) for r in
            wand_topk(spark, idx, [(9, "cafe")], top_k=5).collect()}
    assert (9, 0) in hits and (9, 4) in hits


# -- optional Rust backend (public HF `tokenizers`), skip-paired --------------
# exactly one of the two tests below runs in any environment: the equality
# test when the package is installed, the loud-absence test when not.

_ALL_SCRIPTS_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.characters(min_codepoint=0xC0, max_codepoint=0x17F),   # accents
        st.characters(min_codepoint=0x390, max_codepoint=0x3C9),  # Greek
        st.characters(min_codepoint=0x410, max_codepoint=0x44F),  # Cyrillic
        st.characters(min_codepoint=0x3041, max_codepoint=0x30FF),  # kana
        st.characters(min_codepoint=0x4E00, max_codepoint=0x4E50),  # ideo
    ),
    max_size=60,
)


@pytest.mark.skipif(
    not hf_backend_available(),
    reason="public `tokenizers` package not installed (skip-paired: the "
           "loud-absence test runs instead)")
@settings(max_examples=150, deadline=None)
@given(_ALL_SCRIPTS_TEXT)
def test_hf_backend_token_stream_equality(text):
    """When the Rust HF backend is installed, its token stream must equal
    the canonical Python kernel's on arbitrary multi-script input — the
    equality that lets `spark_tokens` route through Rust while the driver
    oracle keeps checking against the Python mirror."""
    from light_splade_spark.functions.wordpiece import make_hf_encode_batch

    ana = make_wordpiece_analyzer(FIXTURE_VOCAB, register=False)
    enc = make_hf_encode_batch(tuple(FIXTURE_VOCAB))
    assert enc([text])[0] == ana.py_tokenize(text)


@pytest.mark.skipif(
    hf_backend_available(),
    reason="`tokenizers` installed — the equality test runs instead")
def test_hf_backend_absent_is_loud(monkeypatch, spark):
    """Without the package: auto falls back to the Python kernel (same
    streams), demanding hf fails with a named error, and an unknown
    backend value is rejected — never a silent wrong tokenizer."""
    from light_splade_spark.functions import wordpiece as W

    ana = make_wordpiece_analyzer(FIXTURE_VOCAB, register=False)
    df = spark.createDataFrame([(0, "unaffable spark data")],
                               "doc_id BIGINT, text STRING")

    monkeypatch.setenv("LSS_WORDPIECE_BACKEND", "auto")
    W._WORKER_ENCODERS.clear()
    got = df.select(ana.spark_tokens("text").alias("t")).collect()[0].t
    assert list(got) == ana.py_tokenize("unaffable spark data")

    with pytest.raises(NotImplementedError, match="tokenizers"):
        W.make_hf_encode_batch(tuple(FIXTURE_VOCAB))
    monkeypatch.setenv("LSS_WORDPIECE_BACKEND", "bogus")
    with pytest.raises(ValueError, match="LSS_WORDPIECE_BACKEND"):
        W.resolve_backend_name()
