"""Native C++ WordPiece: build + exact parity with the Python tokenizer
over the real legal corpus and adversarial unicode inputs."""

import numpy as np
import pytest

from legal_rag_tpu.models.wordpiece import (
    WordPieceTokenizer, build_wordpiece_vocab,
)
from legal_rag_tpu import native_ext


@pytest.fixture(scope="module")
def pair(reference_chunks):
    if not native_ext.build_native():
        pytest.skip("no native toolchain")
    texts = [c["text"] for c in reference_chunks[:400]]
    vocab = build_wordpiece_vocab(texts, size=8000, min_freq=1)
    return WordPieceTokenizer(vocab), native_ext.NativeWordPiece(vocab), texts


def test_native_builds():
    assert native_ext.build_native()
    assert native_ext.native_available()


def test_corpus_parity(pair):
    py, cc, texts = pair
    for t in texts:
        assert cc.encode(t, max_len=256) == py.encode(t, max_len=256), t[:80]


ADVERSARIAL = [
    "",
    "   ",
    "Hello, World!",
    "Café résumé naïve Łódź",
    "§183 — the 'said' provision… (a) [b] {c}",
    "word­with​format‌chars",
    "CJK 中文 mixed 漢字 text",
    "x" * 250,                      # oversize word -> UNK
    "UPPER lower MiXeD 123 45.67",
    "tabs\tand\nnewlines\r\nand  spaces",
    "em—dash–hyphen-minus",
]


def test_adversarial_parity(pair):
    py, cc, _ = pair
    for t in ADVERSARIAL:
        assert cc.encode(t, max_len=64) == py.encode(t, max_len=64), repr(t)


def test_truncation_and_no_special(pair):
    py, cc, texts = pair
    long_text = " ".join(texts[:5])
    assert cc.encode(long_text, max_len=32) == py.encode(long_text, max_len=32)
    assert cc.encode(long_text, max_len=32, add_special=False) == py.encode(
        long_text, max_len=32, add_special=False
    )


def test_encode_batch_parity(pair):
    py, cc, texts = pair
    ids_p, mask_p = py.encode_batch(texts[:16], max_len=128)
    ids_c, mask_c = cc.encode_batch(texts[:16], max_len=128)
    np.testing.assert_array_equal(ids_p, ids_c)
    np.testing.assert_array_equal(mask_p, mask_c)


def test_native_speedup(pair):
    """The point of native code: it must actually be faster."""
    import time

    py, cc, texts = pair
    batch = texts * 3
    t0 = time.perf_counter()
    for t in batch:
        py.encode(t)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for t in batch:
        cc.encode(t)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_py, f"native ({t_cc:.3f}s) not faster than python ({t_py:.3f}s)"
