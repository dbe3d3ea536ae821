"""int8 exactness recovery: a quantized index finds an oversampled
candidate set; fp32 rescoring of just those candidates restores exact
top-k (VERDICT r1 item 7)."""

import numpy as np
import jax.numpy as jnp
import pytest

from legal_rag_tpu.ops.dense import exact_rescore
from legal_rag_tpu.parallel.mesh import make_mesh
from legal_rag_tpu.parallel.sharded import ShardedIndex, sharded_hybrid_search


@pytest.fixture(scope="module")
def tight_corpus():
    """Clusters of near-duplicate docs whose ordering int8 quantization
    scrambles (separations ~1e-3 are below int8's ~1/127 resolution)."""
    rng = np.random.default_rng(12)
    n_base, dups, d = 64, 8, 64
    base = rng.standard_normal((n_base, d)).astype(np.float32)
    docs = []
    for b in base:
        for j in range(dups):
            v = b + 1e-3 * rng.standard_normal(d).astype(np.float32)
            docs.append(v)
    docs = np.stack(docs)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((8, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return docs, q


def _golden_topk(q, docs, k):
    scores = q.astype(np.float64) @ docs.T.astype(np.float64)
    return np.argsort(-scores, axis=1, kind="stable")[:, :k]


def _recall(ids, golden):
    hit = 0
    for row, g in zip(ids, golden):
        hit += len(set(map(int, row)) & set(map(int, g)))
    return hit / golden.size


def test_int8_rescore_restores_exact_topk(tight_corpus):
    docs, q = tight_corpus
    n, k, oversample = docs.shape[0], 10, 4
    mesh = make_mesh(2)
    index8 = ShardedIndex.from_embeddings(docs, mesh, dtype="int8")
    post_ids = np.full((q.shape[0], 8), n, dtype=np.int32)
    post_w = np.zeros((q.shape[0], 8), dtype=np.float32)
    weights = np.zeros(q.shape[0], dtype=np.float32)  # dense-only fusion

    k_dev = k * oversample
    _, ids8, _, key8 = sharded_hybrid_search(
        index8.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
        jnp.asarray(q), jnp.asarray(weights), index8.doc_scales,
        mesh=mesh, k=k_dev, c=2 * k_dev, n_docs=n, mode="weighted",
    )
    ids8 = np.asarray(ids8)
    golden = _golden_topk(q, docs, k)

    raw_recall = _recall(ids8[:, :k], golden)
    assert raw_recall < 1.0, (
        "corpus not tight enough — int8 alone was already exact, the "
        "rescore test would be vacuous"
    )

    fused, ids, sem, _ = exact_rescore(
        q, ids8, docs, keyword=np.asarray(key8), weights=weights, k=k,
    )
    assert _recall(ids, golden) == 1.0
    np.testing.assert_array_equal(ids, golden)  # exact order, ties incl.
    exact = q.astype(np.float32) @ docs.T
    np.testing.assert_allclose(
        sem, np.take_along_axis(exact, ids, axis=1), rtol=1e-5
    )


def test_exact_rescore_weighted_fusion_and_invalid_ids():
    """Fusion math matches the reference formula and pad ids (-1) sort
    behind every real candidate."""
    rng = np.random.default_rng(5)
    docs = rng.standard_normal((20, 16)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    cand = np.array([[3, 7, -1, 11], [0, 1, 2, 25]], dtype=np.int32)
    key = rng.random((2, 4)).astype(np.float32)
    w = np.array([0.5, 0.3], dtype=np.float32)
    fused, ids, sem, kw = exact_rescore(q, cand, docs, keyword=key,
                                        weights=w, k=4)
    for qi in range(2):
        valid = [(i, c) for i, c in enumerate(cand[qi]) if 0 <= c < 20]
        golden = sorted(
            (
                (-(float(q[qi] @ docs[c]) * (1 - w[qi])
                   + key[qi, i] * w[qi]), c)
                for i, c in valid
            ),
        )
        assert list(ids[qi][: len(valid)]) == [c for _, c in golden]
        # invalid slots trail with -inf fused score
        assert all(not np.isfinite(s) for s in fused[qi][len(valid):])


def test_engine_int8_rescore_matches_fp32(tmp_path):
    """Engine-level: an int8 store with rescore returns the SAME ids
    and exact scores as the fp32 engine."""
    import dataclasses

    from legal_rag_tpu.config import (
        RetrievalConfig, EncoderConfig, DenseConfig,
    )
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    enc = EncoderConfig(
        vocab_size=500, hidden=32, layers=1, heads=4,
        intermediate=64, max_len=32,
    )
    chunks = [
        {"text": f"H\n\nword{i} law{i % 7} clause{i % 5} " * 3,
         "canonical_header": "H", "metadata": {"law": "T"}}
        for i in range(50)
    ]
    cfg32 = RetrievalConfig(encoder=enc)
    store = build_index(chunks, config=cfg32)
    # random-init 32-d embeddings of similar texts are near-ties across
    # the WHOLE corpus, so int8 candidate recall (not just ordering)
    # needs the oversampled set to cover it; real MiniLM embeddings at
    # scale separate far better (see tight_corpus test for ordering)
    cfg8 = dataclasses.replace(
        cfg32, dense=DenseConfig(dtype="int8", int8_oversample=10)
    )
    e32 = RetrievalEngine(store, config=cfg32)
    e8 = RetrievalEngine(store, config=cfg8)
    queries = ["word3 law2", "clause4 word11", "law5 word20 clause0"]
    # rescore is a weighted-mode feature (RRF is rank-based over both
    # lists); pin the mode — the engine default is rrf by measurement
    r32 = e32.search_batch(queries, k=5, mode="weighted")
    r8 = e8.search_batch(queries, k=5, mode="weighted")
    for a, b in zip(r32, r8):
        assert [x.doc_id for x in a] == [x.doc_id for x in b]
        assert [x.semantic for x in a] == pytest.approx(
            [x.semantic for x in b], rel=1e-4
        )
    assert "int8_rescore" in e8.timer.snapshot()


def test_sharded_int8_twophase_dispatch_matches_xla(monkeypatch):
    """Forcing the large-N dispatch point down: the int8 two-phase
    kernel path must return exactly what the XLA int8 path returns
    (same quantization metric, same tie order) through
    sharded_hybrid_search."""
    import legal_rag_tpu.parallel.sharded as sh
    from legal_rag_tpu.parallel.mesh import make_mesh
    from legal_rag_tpu.parallel.sharded import (
        ShardedIndex, sharded_hybrid_search,
    )

    rng = np.random.default_rng(41)
    n, d, q_n = 4096, 64, 8
    docs = rng.standard_normal((n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((q_n, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    mesh = make_mesh(2)
    idx = ShardedIndex.from_embeddings(docs, mesh, dtype="int8")
    post_ids = np.full((q_n, 4), -1, np.int32)
    post_w = np.zeros((q_n, 4), np.float32)
    weights = jnp.zeros((q_n,), jnp.float32)

    def run():
        _, ids, sem, _ = sharded_hybrid_search(
            idx.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
            jnp.asarray(q), weights, idx.doc_scales,
            mesh=mesh, k=10, c=20, n_docs=n, mode="weighted",
        )
        return np.asarray(ids), np.asarray(sem)

    ids_xla, sem_xla = run()
    # force the two-phase dispatch (n_local=2048): drop the threshold
    # and block size; the kernel requires block_n % (seg_rows*128) == 0.
    # The dispatch constants are read at TRACE time, so the jit cache
    # must be cleared around the patched run (and again after, so no
    # other test sees executables traced under patched constants).
    monkeypatch.setattr(sh, "TWOPHASE_MIN_DOCS", 1024)
    monkeypatch.setattr(sh, "TWOPHASE_BLOCK_N", 1024)
    import legal_rag_tpu.ops.dense as dm
    monkeypatch.setattr(dm, "_KERNEL_T_OK", {})
    sh.sharded_hybrid_search.clear_cache()
    try:
        ids_tp, sem_tp = run()
    finally:
        sh.sharded_hybrid_search.clear_cache()
    np.testing.assert_array_equal(ids_tp, ids_xla)
    np.testing.assert_allclose(sem_tp, sem_xla, rtol=1e-5, atol=1e-6)
