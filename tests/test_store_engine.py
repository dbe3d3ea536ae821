"""VectorStore artifact round-trip + RetrievalEngine parity against a
straight-line reimplementation of the reference search loop."""

import numpy as np
import pytest

from legal_rag_tpu.config import (
    RetrievalConfig, EncoderConfig, DenseConfig, BM25Config, FusionConfig,
    ShardingConfig,
)
from legal_rag_tpu.index.builder import build_index
from legal_rag_tpu.index.store import VectorStore
from legal_rag_tpu.retrieval.engine import RetrievalEngine

import dataclasses

TINY_CFG = RetrievalConfig(
    encoder=EncoderConfig(
        vocab_size=4000, hidden=32, layers=2, heads=4,
        intermediate=64, max_len=64, encode_batch=16,
    ),
    sharding=ShardingConfig(num_shards=4),
)


@pytest.fixture(scope="module")
def mini_chunks(corpus_texts):
    return [
        {
            "text": t,
            "metadata": {"law": "TEST", "section": str(i), "unit_type": "section"},
            "canonical_header": f"TEST Section {i}",
            "section_id": f"TEST_{i}",
        }
        for i, t in enumerate(corpus_texts)
    ]


@pytest.fixture(scope="module")
def store(mini_chunks):
    return build_index(mini_chunks, config=TINY_CFG)


def test_store_roundtrip(store, tmp_path_factory):
    d = tmp_path_factory.mktemp("store")
    manifest = store.save(d)
    assert manifest["n_docs"] == store.n_docs
    loaded = VectorStore.load(d)
    np.testing.assert_array_equal(loaded.embeddings, store.embeddings)
    np.testing.assert_array_equal(loaded.bm25.doc_ids, store.bm25.doc_ids)
    np.testing.assert_allclose(loaded.bm25.weights, store.bm25.weights)
    assert loaded.bm25.vocab == store.bm25.vocab
    assert loaded.chunks == store.chunks
    assert loaded.wp_vocab == store.wp_vocab
    assert loaded.manifest["bm25_params"]["avgdl"] == pytest.approx(store.bm25.avgdl)


def test_store_detects_corruption(store, tmp_path_factory):
    d = tmp_path_factory.mktemp("store_bad")
    store.save(d)
    with open(d / "vocab.txt", "a", encoding="utf-8") as f:
        f.write("tampered\n")
    with pytest.raises(ValueError, match="hash mismatch"):
        VectorStore.load(d)
    VectorStore.load(d, verify=False)  # escape hatch still works


def golden_reference_search(store, q_emb, bm25_scores, k, w):
    """The reference search loop (retrieval_engine.py:59-96), verbatim
    semantics: top-2k dense, fuse with max-normalized bm25, stable sort."""
    dense = q_emb.astype(np.float64) @ store.embeddings.T.astype(np.float64)
    cand = np.argsort(-dense, kind="stable")[: 2 * k]
    mx = bm25_scores.max()
    mx = mx if mx > 0 else 1.0
    rows = []
    for idx in cand:
        sem = float(dense[idx])
        bm = float(bm25_scores[idx]) / mx
        rows.append((sem * (1 - w) + bm * w, int(idx), sem, bm))
    rows.sort(key=lambda r: r[0], reverse=True)
    return rows[:k]


@pytest.mark.parametrize("query,w", [
    ("the police fir", 0.5),
    ("w1 w2 w3 w4", 0.6),
    ("zzz unknown terms", 0.5),
])
def test_engine_matches_reference_semantics(store, query, w):
    engine = RetrievalEngine(store, config=TINY_CFG, use_pallas=False)
    results = engine.search(query, k=5, hybrid_weight=w)

    q_emb = engine.encoder.encode([query])[0]
    budget = store.bm25.postings_budget([query])
    pid, pw_ = store.bm25.gather_postings([query], budget)
    bm = np.zeros(store.n_docs, dtype=np.float32)
    np.add.at(bm, pid[0][pid[0] < store.n_docs], pw_[0][pid[0] < store.n_docs])

    golden = golden_reference_search(store, q_emb, bm, 5, w)
    assert len(results) == len(golden)
    for r, (gf, gid, gsem, gbm) in zip(results, golden):
        assert r["chunk"] == store.chunks[gid]
        assert r["score"] == pytest.approx(gf, rel=1e-4, abs=1e-5)
        assert r["semantic"] == pytest.approx(gsem, rel=1e-4, abs=1e-5)
        assert r["keyword"] == pytest.approx(gbm, rel=1e-4, abs=1e-5)


def test_engine_batched_equals_sequential(store):
    engine = RetrievalEngine(store, config=TINY_CFG, use_pallas=False)
    queries = ["the police fir", "w1 w2", "w100 the"]
    batched = engine.search_batch(queries, k=4)
    for q, batch_row in zip(queries, batched):
        single = engine.search_batch([q], k=4)[0]
        assert [r.doc_id for r in batch_row] == [r.doc_id for r in single]
        for a, b in zip(batch_row, single):
            assert a.score == pytest.approx(b.score, rel=1e-5)


def test_engine_rrf_mode_runs(store):
    engine = RetrievalEngine(store, config=TINY_CFG, use_pallas=False)
    rows = engine.search_batch(["the police fir"], k=5, mode="rrf")[0]
    assert len(rows) == 5
    assert all(0 <= r.doc_id < store.n_docs for r in rows)


def test_stage_timing_collected(store):
    engine = RetrievalEngine(store, config=TINY_CFG, use_pallas=False)
    engine.search("the police fir")
    snap = engine.timer.snapshot()
    assert {"encode", "postings", "device_search"} <= set(snap)
    assert snap["device_search"]["count"] == 1


def test_store_save_into_own_mmap_dir(store, tmp_path_factory):
    """Saving a store back into the directory it was mmap-loaded from
    must not clobber the file its own embeddings memory-map is reading
    (regression: np.save truncated embeddings.npy mid-read -> OSError;
    save now writes a temp file and atomically renames)."""
    d = tmp_path_factory.mktemp("store_self")
    store.save(d)
    loaded = VectorStore.load(d)          # embeddings arrive mmap'd
    assert isinstance(loaded.embeddings, np.memmap)
    before = np.array(loaded.embeddings)  # materialized golden copy
    loaded.save(d)                        # overwrite own backing files
    reloaded = VectorStore.load(d)
    np.testing.assert_array_equal(np.array(reloaded.embeddings), before)
