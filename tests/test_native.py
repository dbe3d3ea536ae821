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
    # full-Unicode coverage (ADVICE r1: these diverged under the old
    # Latin-only native tables)
    "धारा १७३ के अनुसार। दंड प्रक्रिया।",        # Devanagari + danda U+0964
    "İstanbul'da İĞNE ve ışık",                  # Turkish İ (1->2 cps), ı
    "ΝΟΜΟΣ ΠΟΙΝΙΚΟΣ: Ο Σ ΣΤΟ ΤΕΛΟΣ",            # Greek incl. Final_Sigma
    "ΟΔΥΣΣΕΥΣ ΟΔΥΣΣΕΥΣΑ 'ΣΟΦΟΣ' (ΣΟΦΟΣ)",       # sigma + punct contexts
    "УГОЛОВНЫЙ КОДЕКС статья",                   # Cyrillic case
    "ʼn ǅungla ǲur ﬁne ﬂow",                     # special lower/compat chars
    "áé combining, ﬀ ligature",      # standalone Mn marks
    "豈 更 車 compatibility ideographs",          # F900 block NFD-maps
    "１２３ ＡＢＣ ｆｕｌｌｗｉｄｔｈ！？",         # fullwidth forms
]


def test_unicode_fuzz_parity(pair):
    """Randomized full-Unicode parity sweep: any divergence between the
    generated-table C++ path and the unicodedata-backed Python path is
    a bug in the tables."""
    import random

    py, cc, _ = pair
    rng = random.Random(7)
    import unicodedata

    pool = []
    while len(pool) < 600:
        cp = rng.randrange(0x20, 0x2FA20)
        ch = chr(cp)
        if unicodedata.category(ch).startswith("C"):
            continue
        pool.append(ch)
    for _ in range(300):
        n = rng.randrange(1, 30)
        t = "".join(rng.choice(pool) for _ in range(n))
        if rng.random() < 0.3:
            t = t.replace(t[rng.randrange(len(t))], "Σ")
        assert cc.encode(t, max_len=64) == py.encode(t, max_len=64), repr(t)


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
