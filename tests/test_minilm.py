"""Encoder parity: the pure-JAX MiniLM must reproduce torch BertModel
outputs (random weights, converted) and the WordPiece tokenizer must
match HF tokenizers on the same vocab."""

import dataclasses

import numpy as np
import pytest

from legal_rag_tpu.config import EncoderConfig
from legal_rag_tpu.models.wordpiece import (
    WordPieceTokenizer,
    build_wordpiece_vocab,
    basic_tokenize,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


TINY = EncoderConfig(
    vocab_size=120, hidden=32, layers=2, heads=4, intermediate=64, max_len=64
)
MINILM_SHAPE = EncoderConfig()  # real MiniLM dims


def _torch_bert(cfg: EncoderConfig, seed: int = 0):
    from transformers import BertConfig, BertModel

    torch.manual_seed(seed)
    model = BertModel(
        BertConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden,
            num_hidden_layers=cfg.layers,
            num_attention_heads=cfg.heads,
            intermediate_size=cfg.intermediate,
            max_position_embeddings=512,
            type_vocab_size=cfg.type_vocab_size,
            layer_norm_eps=cfg.layer_norm_eps,
            hidden_act="gelu",
        )
    )
    model.eval()
    return model


def _parity_case(cfg, batch, seq, seed=0):
    import jax.numpy as jnp

    from legal_rag_tpu.models.convert import convert_hf_bert
    from legal_rag_tpu.models.minilm import minilm_hidden_states, minilm_encode

    model = _torch_bert(cfg, seed)
    params = convert_hf_bert(model.state_dict(), cfg)

    rng = np.random.default_rng(seed)
    ids = rng.integers(0, cfg.vocab_size, (batch, seq)).astype(np.int32)
    lengths = rng.integers(2, seq + 1, batch)
    mask = (np.arange(seq)[None, :] < lengths[:, None]).astype(np.int32)

    with torch.no_grad():
        torch_out = model(
            torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()

    ours = np.asarray(
        minilm_hidden_states(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    # padding positions diverge (torch computes them, mask makes them
    # irrelevant) — compare only real token positions
    m = mask.astype(bool)
    return torch_out[m], ours[m], params, ids, mask


def test_tiny_bert_hidden_state_parity():
    torch_h, ours_h, *_ = _parity_case(TINY, batch=3, seq=16)
    np.testing.assert_allclose(ours_h, torch_h, rtol=1e-4, atol=1e-5)


def test_minilm_shape_hidden_state_parity():
    torch_h, ours_h, *_ = _parity_case(MINILM_SHAPE, batch=2, seq=48, seed=1)
    cos = np.sum(torch_h * ours_h, axis=-1) / (
        np.linalg.norm(torch_h, axis=-1) * np.linalg.norm(ours_h, axis=-1)
    )
    assert cos.min() >= 0.9999, cos.min()
    np.testing.assert_allclose(ours_h, torch_h, rtol=1e-3, atol=1e-4)


def test_sentence_embedding_matches_torch_mean_pool():
    import jax.numpy as jnp

    from legal_rag_tpu.models.convert import convert_hf_bert
    from legal_rag_tpu.models.minilm import minilm_encode

    cfg = TINY
    model = _torch_bert(cfg)
    params = convert_hf_bert(model.state_dict(), cfg)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, (4, 20)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[:, 15:] = 0

    with torch.no_grad():
        hidden = model(
            torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    pooled = (hidden * mask[:, :, None]).sum(1) / mask.sum(1, keepdims=True)
    golden = pooled / np.linalg.norm(pooled, axis=-1, keepdims=True)

    ours = np.asarray(
        minilm_encode(params, jnp.asarray(ids), jnp.asarray(mask), cfg)
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(ours, axis=-1), 1.0, rtol=1e-5
    )


def test_npz_roundtrip(tmp_path):
    from legal_rag_tpu.models.convert import (
        convert_hf_bert, save_params_npz, load_params_npz,
    )

    model = _torch_bert(TINY)
    params = convert_hf_bert(model.state_dict(), TINY)
    save_params_npz(params, tmp_path / "p.npz")
    loaded = load_params_npz(tmp_path / "p.npz")
    np.testing.assert_array_equal(
        loaded["layers"][1]["intermediate"]["kernel"],
        np.asarray(params["layers"][1]["intermediate"]["kernel"]),
    )
    assert len(loaded["layers"]) == TINY.layers


# --- WordPiece ---------------------------------------------------------


def test_basic_tokenize():
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    assert basic_tokenize("Café §183") == ["cafe", "§", "183"]
    assert basic_tokenize("  a\tb\nc ") == ["a", "b", "c"]


def test_wordpiece_matches_hf_tokenizers():
    """Same vocab, same text -> identical pieces as the Rust tokenizer."""
    hf_tokenizers = pytest.importorskip("tokenizers")

    corpus = [
        "the punishment for robbery under section 309",
        "police officer shall record the statement",
        "zero fir can be filed in any police station",
        "compensation scheme for women victims",
    ]
    vocab = build_wordpiece_vocab(corpus, size=2000, min_freq=1)
    ours = WordPieceTokenizer(vocab)

    from tokenizers import BertWordPieceTokenizer
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        inv = {i: t for t, i in vocab.items()}
        for i in range(len(vocab)):
            f.write(inv[i] + "\n")
        name = f.name
    try:
        theirs = BertWordPieceTokenizer(name, lowercase=True)
        for text in corpus + [
            "Punishment, for ROBBERY!", "unknownwordxyz stations", "§183 BNSS",
        ]:
            enc = theirs.encode(text)
            hf_pieces = enc.tokens[1:-1]  # strip [CLS]/[SEP]
            assert ours.tokenize(text) == hf_pieces, text
    finally:
        os.unlink(name)


def test_encode_batch_shapes_and_padding():
    vocab = build_wordpiece_vocab(["a b c d e"], size=100, min_freq=1)
    tok = WordPieceTokenizer(vocab)
    ids, mask = tok.encode_batch(["a b c", "a"], max_len=16)
    assert ids.shape == mask.shape
    assert ids.shape[1] % 8 == 0
    assert mask[0].sum() == 5  # CLS a b c SEP
    assert mask[1].sum() == 3  # CLS a SEP
    assert ids[1, 3] == tok.pad_id


def test_sentence_encoder_end_to_end():
    from legal_rag_tpu.models.encoder import SentenceEncoder

    texts = ["robbery is punishable", "file a zero fir", "the the the"]
    enc = SentenceEncoder(
        cfg=dataclasses.replace(TINY, vocab_size=500),
        vocab_corpus=texts,
    )
    emb = enc.encode(texts, batch_size=2)
    assert emb.shape == (3, TINY.hidden)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)
    # deterministic
    emb2 = enc.encode(texts, batch_size=3)
    np.testing.assert_allclose(emb, emb2, atol=2e-6)


def test_sentence_encoder_length_sorted_batching_preserves_order():
    """encode() batches in length-sorted order for throughput (short docs
    no longer pad to a long straggler's length); embeddings must come
    back in INPUT order and match per-text encoding bit-for-nearly-bit
    (attention masking + masked mean-pool make results padding-invariant
    up to float accumulation order)."""
    from legal_rag_tpu.models.encoder import SentenceEncoder

    texts = [
        "a " * 60 + "long statute about robbery and punishment",  # long
        "short clause",                                           # short
        "b " * 40 + "medium procedure for filing a report",       # medium
        "fir",                                                    # tiny
        "c " * 90 + "longest provision with many repeated terms", # longest
    ]
    enc = SentenceEncoder(
        cfg=dataclasses.replace(TINY, vocab_size=500),
        vocab_corpus=texts,
    )
    batched = enc.encode(texts, batch_size=2)  # forces mixed-length batches
    singles = np.concatenate([enc.encode([t]) for t in texts], axis=0)
    np.testing.assert_allclose(batched, singles, atol=5e-5)
    assert enc.encode([]).shape == (0, TINY.hidden)
