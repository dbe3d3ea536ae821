"""Device-side BM25 postings gather parity + bf16 fast dense mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legal_rag_tpu.ops.sparse import (
    build_bm25, bm25_gather_postings_device, bm25_score_batch,
)
from legal_rag_tpu.parallel.mesh import make_mesh
from legal_rag_tpu.parallel.sharded import ShardedIndex, sharded_hybrid_search


QUERIES = ["the police fir", "w1 w2 w3 w5 w5", "w100", "zzz unknown"]


@pytest.fixture(scope="module")
def bm25(corpus_texts):
    return build_bm25(corpus_texts)


def test_device_gather_matches_host_gather(bm25):
    budget = bm25.postings_budget(QUERIES)
    h_ids, h_w = bm25.gather_postings(QUERIES, budget)
    starts, lens, counts = bm25.query_term_meta(QUERIES)
    d_ids, d_w = bm25_gather_postings_device(
        jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(counts),
        jnp.asarray(bm25.doc_ids), jnp.asarray(bm25.weights),
        budget,
    )
    # the RESULTING SCORES must be identical (slot order may differ)
    s_host = np.asarray(bm25_score_batch(
        jnp.asarray(h_ids), jnp.asarray(h_w), bm25.n_docs
    ))
    s_dev = np.asarray(bm25_score_batch(d_ids, d_w, bm25.n_docs))
    np.testing.assert_allclose(s_dev, s_host, rtol=1e-5, atol=1e-6)


def test_device_gather_pad_slots_inert(bm25):
    starts, lens, counts = bm25.query_term_meta(["w1"])
    d_ids, d_w = bm25_gather_postings_device(
        jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(counts),
        jnp.asarray(bm25.doc_ids), jnp.asarray(bm25.weights),
        4096,
    )
    d_ids, d_w = np.asarray(d_ids), np.asarray(d_w)
    total = int(lens.sum())
    assert (d_ids[0, total:] == -1).all()
    assert (d_w[0, total:] == 0).all()


def test_negative_pad_ids_dropped_by_scoring(bm25):
    ids = jnp.asarray([[-1, -1, 0]], dtype=jnp.int32)
    w = jnp.asarray([[5.0, 5.0, 1.0]], dtype=jnp.float32)
    scores = np.asarray(bm25_score_batch(ids, w, bm25.n_docs))
    assert scores[0, 0] == 1.0
    assert scores.sum() == 1.0  # the -1 writes vanished


def test_bf16_mode_runs_and_approximates(corpus_texts, bm25):
    rng = np.random.default_rng(5)
    n = len(corpus_texts)
    docs = rng.standard_normal((n, 64)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    budget = bm25.postings_budget(QUERIES)
    pi, pw = bm25.gather_postings(QUERIES, budget)
    mesh = make_mesh(2)
    w = np.full(4, 0.5, np.float32)

    args = (jnp.asarray(pi), jnp.asarray(pw), jnp.asarray(q), jnp.asarray(w))
    kw = dict(mesh=mesh, k=10, c=20, n_docs=n, mode="weighted")
    i32 = ShardedIndex.from_embeddings(docs, mesh)
    f32_out = sharded_hybrid_search(i32.docs, *args, **kw)
    i16 = ShardedIndex.from_embeddings(docs, mesh, dtype="bfloat16")
    assert i16.docs.dtype == jnp.bfloat16
    bf_out = sharded_hybrid_search(i16.docs, *args, **kw)

    ids32 = np.asarray(f32_out[1])
    ids16 = np.asarray(bf_out[1])
    # top-10 sets overlap strongly on well-separated random vectors
    overlap = np.mean([
        len(set(ids32[i]) & set(ids16[i])) / 10 for i in range(4)
    ])
    assert overlap >= 0.8, overlap
    np.testing.assert_allclose(
        np.asarray(bf_out[0]), np.asarray(f32_out[0]), atol=0.03
    )


def test_int8_mode_high_recall(corpus_texts, bm25):
    """int8 per-doc quantization: 4x memory, recall >= 0.9 @ top-10 on
    well-separated vectors, exact score within quantization error."""
    rng = np.random.default_rng(11)
    n = len(corpus_texts)
    docs = rng.standard_normal((n, 64)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    budget = bm25.postings_budget(QUERIES)
    pi, pw = bm25.gather_postings(QUERIES, budget)
    mesh = make_mesh(2)
    w = np.zeros(4, np.float32)  # dense-only fusion for a clean check

    i8 = ShardedIndex.from_embeddings(docs, mesh, dtype="int8")
    assert i8.docs.dtype == jnp.int8
    assert i8.doc_scales is not None
    f8, ids8, sem8, _ = sharded_hybrid_search(
        i8.docs, jnp.asarray(pi), jnp.asarray(pw), jnp.asarray(q),
        jnp.asarray(w), i8.doc_scales,
        mesh=mesh, k=10, c=20, n_docs=n, mode="weighted",
    )
    gold = np.argsort(-(q @ docs.T), axis=1)[:, :10]
    ids8 = np.asarray(ids8)
    overlap = np.mean([
        len(set(ids8[i]) & set(gold[i])) / 10 for i in range(4)
    ])
    assert overlap >= 0.9, overlap
    # dequantized scores close to true scores
    true = (q @ docs.T)[np.arange(4)[:, None], ids8]
    np.testing.assert_allclose(np.asarray(sem8), true, atol=0.02)
