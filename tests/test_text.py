"""L0 text layer tests: tokenizer invertibility, subword round-trip,
vocab determinism (SURVEY.md §4 test pyramid: unit + property)."""

import random
import string

import pytest

from sse_tpu.text import tokenizer
from sse_tpu.text.subword import (
    EOS_ID,
    PAD_ID,
    SubwordVocab,
    TokenVocab,
    token_counts_from_lines,
)

SAMPLES = [
    "",
    "hello world",
    "Hello, World!",
    "  leading and trailing  ",
    "tabs\tand\nnewlines",
    "unicode: caffè, naïve, 北京 2024!",
    "e-commerce query: iphone 12 pro max 256gb unlocked",
    "underscore_token and back\\slash",
    "semicolons; and \\123; fake escapes",
    "ümlaut ÅÄÖ ß … emoji 🙂 mixed",
    "a b",
    " ",
    "_",
    "\\",
    "123 456.789",
]


class TestTokenizer:
    @pytest.mark.parametrize("text", SAMPLES)
    def test_round_trip(self, text):
        assert tokenizer.detokenize(tokenizer.tokenize(text)) == text

    def test_space_dropped_between_words(self):
        assert tokenizer.tokenize("hello world") == ["hello", "world"]

    def test_punctuation_run(self):
        assert tokenizer.tokenize("a, b") == ["a", ", ", "b"]

    def test_random_round_trip(self):
        rng = random.Random(0)
        chars = string.printable + "éß北🙂_\\;"
        for _ in range(200):
            s = "".join(rng.choice(chars) for _ in range(rng.randrange(40)))
            assert tokenizer.detokenize(tokenizer.tokenize(s)) == s


def _demo_lines():
    return [
        "iphone 12 pro max case",
        "samsung galaxy s21 ultra screen protector",
        "nike air jordan retro high og",
        "pokemon card charizard holo rare",
        "lego star wars millennium falcon 75192",
        "vintage levis 501 jeans 34x32",
        "apple watch series 7 45mm gps",
        "canon eos r5 mirrorless camera body",
    ] * 3


class TestSubwordVocab:
    def setup_method(self):
        self.counts = token_counts_from_lines(_demo_lines())
        self.vocab = SubwordVocab.build_to_target_size(200, self.counts)

    def test_reserved_ids(self):
        assert self.vocab.id_to_subtoken(PAD_ID) == "<pad>"
        assert self.vocab.id_to_subtoken(EOS_ID) == "<EOS>"

    @pytest.mark.parametrize("text", SAMPLES)
    def test_round_trip_any_unicode(self, text):
        # Even strings full of out-of-alphabet chars must round-trip
        # (escaping guarantees it).
        assert self.vocab.decode(self.vocab.encode(text)) == text

    def test_in_domain_round_trip(self):
        for line in _demo_lines():
            assert self.vocab.decode(self.vocab.encode(line)) == line

    def test_determinism(self):
        v2 = SubwordVocab.build_to_target_size(200, dict(self.counts))
        assert [v2.id_to_subtoken(i) for i in range(v2.vocab_size)] == [
            self.vocab.id_to_subtoken(i) for i in range(self.vocab.vocab_size)
        ]

    def test_target_size_approached(self):
        assert 50 <= self.vocab.vocab_size <= 400

    def test_save_load(self, tmp_path):
        p = str(tmp_path / "vocab.txt")
        self.vocab.save(p)
        v2 = SubwordVocab.load(p)
        assert v2.vocab_size == self.vocab.vocab_size
        for text in SAMPLES:
            assert v2.encode(text) == self.vocab.encode(text)

    def test_multi_word_common_subwords(self):
        # frequent whole words should become single subtokens
        ids = self.vocab.encode("iphone")
        assert len(ids) <= 3


class TestTokenVocab:
    def test_round_trip_and_oov(self):
        v = TokenVocab(["hello", "world"])
        assert v.decode(v.encode("hello world")) == "hello world"
        ids = v.encode("hello mars")
        assert v._ids[TokenVocab.OOV] in ids


class TestGoldenFiles:
    """Checked-in golden vocab + encodings (SURVEY.md §4: 'golden files
    generated from demo data') pin cross-version determinism of the
    subword algorithm — any change to tokenization, escaping, candidate
    counting, or tie-breaking fails here."""

    def test_vocab_build_matches_golden(self):
        import os

        golden = SubwordVocab.load(
            os.path.join(os.path.dirname(__file__), "golden", "demo_vocab.txt")
        )
        rebuilt = SubwordVocab.build_to_target_size(
            200, token_counts_from_lines(_demo_lines())
        )
        assert [rebuilt.id_to_subtoken(i) for i in range(rebuilt.vocab_size)] == [
            golden.id_to_subtoken(i) for i in range(golden.vocab_size)
        ]

    def test_encodings_match_golden(self):
        import json
        import os

        base = os.path.join(os.path.dirname(__file__), "golden")
        vocab = SubwordVocab.load(os.path.join(base, "demo_vocab.txt"))
        with open(os.path.join(base, "demo_encodings.json")) as f:
            samples = json.load(f)
        for text, ids in samples.items():
            assert vocab.encode(text) == ids, text
