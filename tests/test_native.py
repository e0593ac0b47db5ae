"""Native (C++) subword encoder: bit-parity with the Python encoder on
every sample, batch padding convention, and a speedup sanity check."""

import time

import numpy as np
import pytest

from sse_tpu.native import NativeSubwordEncoder, native_available
from sse_tpu.text.subword import EOS_ID, SubwordVocab, token_counts_from_lines
from tests.test_text import SAMPLES, _demo_lines

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


@pytest.fixture(scope="module")
def pair():
    vocab = SubwordVocab.build_to_target_size(
        300, token_counts_from_lines(_demo_lines())
    )
    return vocab, NativeSubwordEncoder(vocab)


def test_parity_on_samples(pair):
    vocab, native = pair
    for text in SAMPLES + _demo_lines():
        assert native.encode(text) == vocab.encode(text), repr(text)


def test_parity_random_unicode(pair):
    import random, string

    vocab, native = pair
    rng = random.Random(0)
    chars = string.printable + "éß北🙂_\\;caffènaïve"
    for _ in range(300):
        s = "".join(rng.choice(chars) for _ in range(rng.randrange(60)))
        assert native.encode(s) == vocab.encode(s), repr(s)


def test_parity_worst_case_escape_blowup(pair):
    """Escaping can emit ~6 ids per input BYTE (1-byte codepoints 100-127
    outside the alphabet → "\\NNN;" + trailing "_"); the buffer-size/retry
    logic must never truncate (ADVICE.md r1: it used to, silently)."""
    vocab, native = pair
    for s in ("{" * 200, "~{}" * 100, "e{" * 150, "{"):
        assert native.encode(s) == vocab.encode(s), repr(s[:20])


def test_batch_convention_matches_corpus(pair):
    vocab, native = pair
    texts = _demo_lines()[:8] + ["", "x" * 100]
    L = 12
    tokens, lengths = native.encode_batch(texts, L, EOS_ID)
    for i, t in enumerate(texts):
        ids = vocab.encode(t)[: L - 1] + [EOS_ID]
        assert lengths[i] == len(ids)
        np.testing.assert_array_equal(tokens[i, : len(ids)], ids)
        assert (tokens[i, len(ids) :] == 0).all()


def test_speedup(pair):
    vocab, native = pair
    texts = (_demo_lines() * 50)[:1000]
    t0 = time.perf_counter()
    for t in texts:
        vocab.encode(t)
    py_dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    native.encode_batch(texts, 32)
    nat_dt = time.perf_counter() - t0
    # conservative: CI boxes vary; locally this is 30-100x
    assert nat_dt < py_dt, (py_dt, nat_dt)


def test_native_vocab_builder_parity():
    """C++ build_from_token_counts must be BIT-identical to the Python
    reference builder: same subtokens, same order, at several min_counts,
    with and without max_subtoken_length, including escapes/unicode."""
    counts = token_counts_from_lines(
        _demo_lines()
        + SAMPLES
        + ["under_score te\\xt 北京 déjà-vu 42 foo_bar_baz"] * 3
    )
    # msl=0 must mean UNBOUNDED in BOTH builders (the native C ABI uses 0
    # for "no limit"; the Python fallback treated it as "no candidates"
    # until r2.5 — machine-dependent vocabs)
    for mc in (1, 2, 5, 20):
        for msl in (None, 0, 4):
            py = SubwordVocab.build_from_token_counts(
                counts, mc, max_subtoken_length=msl, use_native=False
            )
            nat = SubwordVocab.build_from_token_counts(
                counts, mc, max_subtoken_length=msl, use_native=True
            )
            assert [
                nat.id_to_subtoken(i) for i in range(nat.vocab_size)
            ] == [
                py.id_to_subtoken(i) for i in range(py.vocab_size)
            ], f"min_count={mc} max_subtoken_length={msl}"


def test_native_vocab_build_to_target_size_parity():
    """The binary search through the native builder lands on the exact
    vocab the pure-Python search produces (and the golden files pin)."""
    from sse_tpu.native import native_build_subtokens

    counts = token_counts_from_lines(_demo_lines())
    direct = native_build_subtokens(counts, 2)
    assert direct is not None
    py_direct = SubwordVocab.build_from_token_counts(
        counts, 2, use_native=False
    )
    assert direct == [
        py_direct.id_to_subtoken(i)
        for i in range(2, py_direct.vocab_size)
    ]


def test_native_token_counts_parity():
    from sse_tpu.native import native_token_counts
    from tests.test_text import SAMPLES

    lines = _demo_lines() + [s for s in SAMPLES if s]
    got = native_token_counts(lines)
    want = token_counts_from_lines(lines)
    assert got == want
