"""MeCab-segmented Japanese analyzer (functions/mecab_ja.py), skip-paired.

Reference parity target: HF BertJapaneseTokenizer — MeCab word
segmentation BEFORE WordPiece (reference data/base.py:67-76). The
``fugashi``+``unidic-lite`` deps are optional (absent in this sandbox four
rounds running); exactly one of the two test groups below runs in any
environment, and absence is recorded as SKIP, never a silent pass.
"""

from __future__ import annotations

import pytest

from light_splade_spark.functions.mecab_ja import (
    MECAB_VERSION_PREFIX,
    make_mecab_wordpiece_analyzer,
    mecab_available,
    mecab_vocab_version,
)

# vocab with both whole-word and subword Japanese pieces (NFKC-normalized
# forms) plus ASCII, so greedy merges are exercised when MeCab is present
JA_VOCAB = (
    "東京", "都", "に", "住む", "住", "##む", "猫", "が", "好き", "です",
    "。", "、", "spark", "index", "##ing", "デ", "##ー", "##タ", "データ",
)


@pytest.mark.skipif(mecab_available(), reason="fugashi installed — the "
                    "parity tests run instead")
def test_mecab_absent_is_loud():
    """Without fugashi: construction raises a NAMED NotImplementedError —
    an engine must never silently tokenize a MeCab-pinned index another
    way — while the version helper (pure arithmetic) still works, so
    manifests referencing mecab versions stay readable."""
    with pytest.raises(NotImplementedError, match="fugashi"):
        make_mecab_wordpiece_analyzer(JA_VOCAB)
    v = mecab_vocab_version(JA_VOCAB)
    assert v.startswith(MECAB_VERSION_PREFIX) and len(v) > len(
        MECAB_VERSION_PREFIX)


@pytest.mark.skipif(mecab_available(), reason="fugashi installed")
def test_mecab_pinned_index_refuses_other_segmentation(tmp_path):
    """A vocab file whose version pins ls-spark-mecab-* must NOT resolve
    through the wp4 constructor when fugashi is absent: resolve raises the
    named error instead of quietly mis-tokenizing queries."""
    import json
    import os

    from light_splade_spark.functions.wordpiece import (
        VOCAB_FILENAME,
        load_vocab_analyzer,
    )

    v = mecab_vocab_version(JA_VOCAB)
    with open(os.path.join(tmp_path, VOCAB_FILENAME), "w") as f:
        json.dump({"version": v, "vocab": list(JA_VOCAB)}, f)
    with pytest.raises(NotImplementedError, match="fugashi"):
        load_vocab_analyzer(str(tmp_path), v)


@pytest.mark.skipif(not mecab_available(), reason="public fugashi/"
                    "unidic-lite not installed (skip-paired: the "
                    "loud-absence tests run instead)")
class TestMecabParity:
    def test_token_parity_vs_literal_hf_algorithm(self):
        """Token stream equals the literal HF MecabTokenizer+Wordpiece
        chain (NFKC -> tagger surfaces -> greedy longest-match), computed
        independently inline."""
        import unicodedata

        import fugashi

        from light_splade_spark.functions.wordpiece import wordpiece_word

        ana = make_mecab_wordpiece_analyzer(JA_VOCAB, register=False)
        tagger = fugashi.Tagger()
        texts = [
            "東京都に住む猫が好きです。",
            "ｽﾊﾟｰｸ indexing データ、東京！",  # halfwidth kana -> NFKC
            "",
        ]
        vset = frozenset(JA_VOCAB)
        for t in texts:
            norm = unicodedata.normalize("NFKC", t).strip()
            want = []
            for w in (m.surface for m in tagger(norm) if m.surface):
                want.extend(wordpiece_word(w, vset))
            assert ana.py_tokenize(t) == want, t

    def test_spark_udf_matches_python_mirror(self, spark):
        ana = make_mecab_wordpiece_analyzer(JA_VOCAB, register=False)
        texts = ["東京都に住む猫が好きです。", "データ spark indexing", ""]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id BIGINT, text STRING")
        got = {r.doc_id: list(r.t) for r in df.select(
            "doc_id", ana.spark_tokens("text").alias("t")).collect()}
        for i, t in enumerate(texts):
            assert got[i] == ana.py_tokenize(t), t

    def test_build_to_wand_rank_identity(self, spark, tmp_path):
        """Index built with the MeCab analyzer retrieves identically to a
        direct SQL scoring of the same MeCab token streams, and
        resolve_analyzer reconstructs the analyzer from the index dir
        alone (self-containment across the mecab family)."""
        from light_splade_spark.functions.analyzers import resolve_analyzer
        from light_splade_spark.index.build import build_index
        from light_splade_spark.index.wand import wand_topk

        ana = make_mecab_wordpiece_analyzer(JA_VOCAB)
        docs = spark.createDataFrame(
            [(0, "東京都に住む猫"), (1, "猫が好きです。"),
             (2, "spark indexing データ"), (3, "東京、東京")],
            "doc_id BIGINT, text STRING")
        idx = str(tmp_path / "ja_idx")
        build_index(spark, docs, idx, analyzer=ana)
        got = resolve_analyzer(ana.version, idx)
        assert got.version == ana.version
        hits = wand_topk(spark, idx, [(0, "東京の猫")], top_k=4).collect()
        assert len(hits) > 0
