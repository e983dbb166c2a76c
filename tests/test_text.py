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
