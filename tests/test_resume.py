"""Resumable index builds: matching corpus+config reuses artifacts,
changed corpus rebuilds."""

import numpy as np

from legal_rag_tpu.config import RetrievalConfig, EncoderConfig
from legal_rag_tpu.index.builder import build_index

CFG = RetrievalConfig(
    encoder=EncoderConfig(
        vocab_size=500, hidden=32, layers=1, heads=4,
        intermediate=64, max_len=32, encode_batch=64,
    )
)


def _chunks(texts):
    return [
        {"text": t, "metadata": {"law": "T"}, "canonical_header": f"H{i}"}
        for i, t in enumerate(texts)
    ]


def test_rebuild_skipped_when_corpus_unchanged(tmp_path):
    texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    s1 = build_index(_chunks(texts), config=CFG, store_dir=tmp_path)
    assert s1.corpus_hash
    mtime = (tmp_path / "embeddings.npy").stat().st_mtime_ns

    s2 = build_index(_chunks(texts), config=CFG, store_dir=tmp_path)
    assert s2.corpus_hash == s1.corpus_hash
    # artifacts untouched — the build was skipped
    assert (tmp_path / "embeddings.npy").stat().st_mtime_ns == mtime
    np.testing.assert_array_equal(s1.embeddings, s2.embeddings)


def test_rebuild_triggered_on_corpus_change(tmp_path):
    s1 = build_index(_chunks(["alpha beta"]), config=CFG, store_dir=tmp_path)
    s2 = build_index(
        _chunks(["alpha beta", "new document"]), config=CFG,
        store_dir=tmp_path,
    )
    assert s2.corpus_hash != s1.corpus_hash
    assert s2.n_docs == 2


def test_rebuild_triggered_on_config_change(tmp_path):
    import dataclasses

    s1 = build_index(_chunks(["alpha beta"]), config=CFG, store_dir=tmp_path)
    cfg2 = dataclasses.replace(
        CFG, encoder=dataclasses.replace(CFG.encoder, hidden=64)
    )
    s2 = build_index(_chunks(["alpha beta"]), config=cfg2, store_dir=tmp_path)
    assert s2.corpus_hash != s1.corpus_hash
    assert s2.dim == 64


def test_reloaded_store_encodes_queries_identically(tmp_path):
    """The store must carry the encoder WEIGHTS: a reloaded engine has
    to embed queries with exactly the model that embedded the docs
    (fine-tuned/converted weights are not derivable from seed+config)."""
    import numpy as np

    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.models.encoder import SentenceEncoder
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta"]
    enc = SentenceEncoder(cfg=CFG.encoder, vocab_corpus=texts, seed=7)
    # perturb weights to simulate fine-tuning (seed no longer explains them)
    import jax.numpy as jnp

    enc.params["embeddings"]["word"] = (
        enc.params["embeddings"]["word"] + 0.1
    )
    store = build_index(_chunks(texts), encoder=enc, config=CFG,
                        store_dir=tmp_path)
    loaded = VectorStore.load(tmp_path)
    assert loaded.encoder_params is not None
    engine = RetrievalEngine(loaded, config=CFG, use_pallas=False)
    q = "alpha beta"
    np.testing.assert_allclose(
        engine.encoder.encode([q]), enc.encode([q]), atol=1e-6,
    )

def test_manifest_records_tokenizer_impl(tmp_path):
    """The store pins which WordPiece implementation (python vs
    native-cpp) embedded the docs, and the engine reproduces it at
    query time (ADVICE r1: the two can diverge on non-Latin input)."""
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    store = build_index(
        _chunks(["alpha beta", "gamma delta"]), config=CFG,
        store_dir=tmp_path,
    )
    impl = store.manifest["encoder"]["tokenizer_impl"]
    assert impl in ("python", "native-cpp")

    reloaded = VectorStore.load(tmp_path)
    engine = RetrievalEngine(reloaded, config=CFG)
    assert engine.encoder.tokenizer_impl == impl
