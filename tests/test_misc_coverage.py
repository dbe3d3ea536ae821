"""Coverage for smaller branches: store format guard, vocab file IO,
CLI build/search round-trip, config plumbing, confidence edge."""

import json

import numpy as np
import pytest

from legal_rag_tpu.config import RetrievalConfig, EncoderConfig, DenseConfig


TINY = RetrievalConfig(
    encoder=EncoderConfig(
        vocab_size=800, hidden=32, layers=1, heads=4,
        intermediate=64, max_len=32, encode_batch=64,
    )
)


def _chunks(texts):
    return [
        {"text": t, "metadata": {"law": "T"}, "canonical_header": f"H{i}"}
        for i, t in enumerate(texts)
    ]


def test_store_rejects_newer_format(tmp_path):
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.index.store import VectorStore

    build_index(_chunks(["a b", "c d"]), config=TINY, store_dir=tmp_path)
    manifest = json.loads((tmp_path / "manifest.json").read_text())
    manifest["format_version"] = 999
    (tmp_path / "manifest.json").write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="newer than"):
        VectorStore.load(tmp_path, verify=False)


def test_wordpiece_vocab_file_roundtrip(tmp_path):
    from legal_rag_tpu.models.wordpiece import (
        WordPieceTokenizer, build_wordpiece_vocab,
    )

    vocab = build_wordpiece_vocab(["hello world of testing"], size=200,
                                  min_freq=1)
    inv = {i: t for t, i in vocab.items()}
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(inv[i] for i in range(len(inv))) + "\n",
                    encoding="utf-8")
    tok = WordPieceTokenizer.from_vocab_file(path)
    ref = WordPieceTokenizer(vocab)
    assert tok.encode("hello world") == ref.encode("hello world")


def test_wordpiece_missing_special_raises():
    from legal_rag_tpu.models.wordpiece import WordPieceTokenizer

    with pytest.raises(ValueError, match="special token"):
        WordPieceTokenizer({"a": 0, "b": 1})


def test_cli_build_and_search(tmp_path, capsys):
    from legal_rag_tpu.cli import main

    chunks_path = tmp_path / "chunks.json"
    chunks_path.write_text(json.dumps(_chunks([
        "the punishment for robbery is imprisonment",
        "zero fir can be filed anywhere",
        "compensation for victims of acid attack",
    ])))
    store_dir = tmp_path / "store"
    assert main(["build", "--source", str(chunks_path),
                 "--store", str(store_dir)]) == 0
    assert (store_dir / "manifest.json").exists()
    capsys.readouterr()
    assert main(["search", "--store", str(store_dir),
                 "--query", "punishment for robbery", "--k", "2"]) == 0
    out = capsys.readouterr().out
    assert "score=" in out and "[1]" in out


def test_use_pallas_config_disable(tmp_path):
    """DenseConfig.use_pallas=False must stick even on TPU platforms."""
    import dataclasses

    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    cfg = dataclasses.replace(TINY, dense=DenseConfig(use_pallas=False))
    store = build_index(_chunks(["a b c", "d e f"]), config=cfg)
    engine = RetrievalEngine(store, config=cfg)
    assert engine.use_pallas is False


def test_confidence_unresolved_anchors_without_notice_is_medium():
    from legal_rag_tpu.server.adapter import calculate_confidence
    from legal_rag_tpu.server.schemas import ConfidenceLevel, TierType

    out = calculate_confidence(
        tier=TierType.TIER3, case_type="robbery",
        detected_stages=[], has_citations=True, has_answer=True,
        anchors_resolved=False, has_system_notice=False,
        clarification_needed=False, timeline_count=2,
    )
    assert out == ConfidenceLevel.MEDIUM


def test_empty_encode_returns_zero_rows():
    from legal_rag_tpu.models.encoder import SentenceEncoder

    enc = SentenceEncoder(cfg=TINY.encoder, vocab_corpus=["a b"])
    out = enc.encode([])
    assert out.shape == (0, TINY.encoder.hidden)


def test_search_result_reference_dict_shape():
    from legal_rag_tpu.retrieval.engine import SearchResult

    r = SearchResult(chunk={"canonical_header": "H"}, score=1.0,
                     semantic=0.5, keyword=0.5, doc_id=3)
    d = r.to_dict()
    assert set(d) == {"chunk", "score", "semantic", "keyword"}


def test_enable_compile_cache(tmp_path, monkeypatch):
    """The persistent-cache helper: env-driven opt-in, populates the
    directory after a jit compile (CPU backend caches too)."""
    import jax
    import jax.numpy as jnp

    from legal_rag_tpu.utils.cache import enable_compile_cache

    monkeypatch.delenv("LEGAL_RAG_COMPILE_CACHE_DIR", raising=False)
    assert enable_compile_cache() is None   # no-op without opt-in

    d = tmp_path / "jaxcache"
    assert enable_compile_cache(str(d)) == str(d)
    f = jax.jit(lambda x: (x * 2.5).sum() + 7.0)
    assert float(f(jnp.arange(8.0))) == 77.0
    # restore defaults so later tests aren't affected
    jax.config.update("jax_compilation_cache_dir", None)
    assert d.exists()
