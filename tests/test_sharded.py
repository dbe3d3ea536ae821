"""Multi-chip sharded search on the 8-device virtual CPU mesh: results
must be identical to the single-device reference-semantics golden, for
every mesh size that divides the corpus or not."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legal_rag_tpu.ops.sparse import build_bm25
from legal_rag_tpu.parallel.mesh import make_mesh
from legal_rag_tpu.parallel.sharded import ShardedIndex, sharded_hybrid_search


def golden_hybrid(q_emb, docs, bm25_scores, w, k, c):
    """Host reimplementation of the reference hybrid ranking."""
    out_ids, out_f = [], []
    dense = q_emb.astype(np.float64) @ docs.T.astype(np.float64)
    for qi in range(q_emb.shape[0]):
        cand = np.argsort(-dense[qi], kind="stable")[:c]
        mx = bm25_scores[qi].max()
        mx = mx if mx > 0 else 1.0
        fused = dense[qi, cand] * (1 - w[qi]) + bm25_scores[qi, cand] / mx * w[qi]
        order = np.argsort(-fused, kind="stable")[:k]
        out_ids.append(cand[order])
        out_f.append(fused[order])
    return np.array(out_ids), np.array(out_f)


@pytest.fixture(scope="module")
def setup(corpus_texts):
    rng = np.random.default_rng(21)
    n = len(corpus_texts)
    docs = rng.standard_normal((n, 64)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q_emb = rng.standard_normal((4, 64)).astype(np.float32)
    q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)
    bm25 = build_bm25(corpus_texts)
    queries = ["the police fir", "w1 w2 w3", "w5 police", "w100 w101 the"]
    budget = bm25.postings_budget(queries)
    post_ids, post_w = bm25.gather_postings(queries, budget)
    bm_scores = np.zeros((4, n), dtype=np.float32)
    for qi in range(4):
        np.add.at(bm_scores[qi], post_ids[qi][post_ids[qi] < n],
                  post_w[qi][post_ids[qi] < n])
    return docs, q_emb, bm25, post_ids, post_w, bm_scores


@pytest.mark.parametrize("n_shards", [1, 2, 8])
def test_sharded_matches_golden(setup, n_shards):
    docs, q_emb, bm25, post_ids, post_w, bm_scores = setup
    w = np.array([0.5, 0.6, 0.5, 0.0], dtype=np.float32)
    k, cmult = 5, 2
    mesh = make_mesh(n_shards)
    index = ShardedIndex.from_embeddings(docs, mesh)
    f, ids, sem, key = sharded_hybrid_search(
        index.docs,
        jnp.asarray(post_ids), jnp.asarray(post_w),
        jnp.asarray(q_emb), jnp.asarray(w),
        mesh=mesh, k=k, c=cmult * k, n_docs=docs.shape[0],
        mode="weighted",
    )
    g_ids, g_f = golden_hybrid(q_emb, docs, bm_scores, w, k, cmult * k)
    np.testing.assert_array_equal(np.asarray(ids), g_ids)
    np.testing.assert_allclose(np.asarray(f), g_f, rtol=1e-4, atol=1e-5)


def test_sharded_identical_across_mesh_sizes(setup):
    """Determinism across mesh shapes (SURVEY hard part (d))."""
    docs, q_emb, bm25, post_ids, post_w, _ = setup
    w = np.full(4, 0.5, dtype=np.float32)
    results = []
    for n_shards in (1, 2, 4, 8):
        mesh = make_mesh(n_shards)
        index = ShardedIndex.from_embeddings(docs, mesh)
        f, ids, _, _ = sharded_hybrid_search(
            index.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
            jnp.asarray(q_emb), jnp.asarray(w),
            mesh=mesh, k=5, c=10, n_docs=docs.shape[0], mode="weighted",
        )
        results.append((np.asarray(f), np.asarray(ids)))
    for f, ids in results[1:]:
        np.testing.assert_array_equal(ids, results[0][1])
        np.testing.assert_allclose(f, results[0][0], rtol=1e-5)


def test_sharded_rrf_mode(setup):
    docs, q_emb, bm25, post_ids, post_w, bm_scores = setup
    w = np.full(4, 0.5, dtype=np.float32)
    mesh = make_mesh(4)
    index = ShardedIndex.from_embeddings(docs, mesh)
    f, ids, _, _ = sharded_hybrid_search(
        index.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
        jnp.asarray(q_emb), jnp.asarray(w),
        mesh=mesh, k=5, c=10, n_docs=docs.shape[0], mode="rrf",
    )
    ids = np.asarray(ids)
    # RRF must be able to surface the BM25 #1 hit even if dense missed it
    for qi in range(4):
        if bm_scores[qi].max() > 0:
            assert bm_scores[qi].argmax() in ids[qi]
    # all returned ids valid
    assert (ids >= 0).all() and (ids < docs.shape[0]).all()


def test_twophase_fallback_inside_shard_map(setup):
    """When the [Q, N_local] score matrix would exceed the HBM budget,
    the dense top-C dispatches to the two-phase segment-max kernel
    (interpret mode on CPU) — results must be identical to the XLA
    path."""
    docs, q_emb, bm25, post_ids, post_w, _ = setup
    w = np.full(4, 0.5, dtype=np.float32)
    mesh = make_mesh(2)
    index = ShardedIndex.from_embeddings(docs, mesh)
    import legal_rag_tpu.parallel.sharded as sh
    import functools

    orig_budget = sh._SCORE_MATRIX_BUDGET_BYTES
    orig_tp = sh.dense_topk_twophase_rm
    try:
        sh._SCORE_MATRIX_BUDGET_BYTES = 1   # force the fallback
        sh.dense_topk_twophase_rm = functools.partial(orig_tp, interpret=True)
        # the budget is read at TRACE time — bypass the jit cache so
        # the patched value actually takes effect
        f_p, ids_p, _, _ = sharded_hybrid_search.__wrapped__(
            index.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
            jnp.asarray(q_emb), jnp.asarray(w),
            mesh=mesh, k=5, c=10, n_docs=docs.shape[0],
            mode="weighted",
        )
    finally:
        sh._SCORE_MATRIX_BUDGET_BYTES = orig_budget
        sh.dense_topk_twophase_rm = orig_tp
    f_x, ids_x, _, _ = sharded_hybrid_search(
        index.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
        jnp.asarray(q_emb), jnp.asarray(w),
        mesh=mesh, k=5, c=10, n_docs=docs.shape[0],
        mode="weighted",
    )
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_x))
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_x), rtol=1e-5)


@pytest.mark.parametrize("mode", ["weighted", "rrf"])
def test_segsum_sparse_path_matches_scatter(setup, mode):
    """The scalable sorted-postings segment-sum BM25 path must produce
    identical results to the dense scatter accumulator."""
    docs, q_emb, bm25, post_ids, post_w, _ = setup
    w = np.full(4, 0.5, dtype=np.float32)
    mesh = make_mesh(4)
    index = ShardedIndex.from_embeddings(docs, mesh)
    args = (jnp.asarray(post_ids), jnp.asarray(post_w),
            jnp.asarray(q_emb), jnp.asarray(w))
    kw = dict(mesh=mesh, k=5, c=10, n_docs=docs.shape[0], mode=mode)
    f_sc, i_sc, s_sc, k_sc = sharded_hybrid_search(
        index.docs, *args, sparse_mode="scatter", **kw)
    f_sg, i_sg, s_sg, k_sg = sharded_hybrid_search(
        index.docs, *args, sparse_mode="segsum", **kw)
    np.testing.assert_array_equal(np.asarray(i_sc), np.asarray(i_sg))
    np.testing.assert_allclose(np.asarray(f_sc), np.asarray(f_sg), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k_sc), np.asarray(k_sg),
                               rtol=1e-5, atol=1e-6)

@pytest.mark.parametrize("mode", ["weighted", "rrf"])
def test_segsum_correct_with_negative_weights(setup, mode):
    """BM25Okapi's ε-floored IDF can go NEGATIVE on degenerate corpora
    (mean raw IDF < 0); the segment-sum path must still agree with the
    scatter accumulator (regression: the old value-cummax trick assumed
    non-negative weights)."""
    docs, q_emb, bm25, post_ids, post_w, _ = setup
    rng = np.random.default_rng(7)
    neg_w = post_w.copy()
    flip = rng.random(neg_w.shape) < 0.4
    neg_w[flip] *= -1.0
    w = np.full(4, 0.5, dtype=np.float32)
    mesh = make_mesh(4)
    index = ShardedIndex.from_embeddings(docs, mesh)
    args = (jnp.asarray(post_ids), jnp.asarray(neg_w),
            jnp.asarray(q_emb), jnp.asarray(w))
    kw = dict(mesh=mesh, k=5, c=10, n_docs=docs.shape[0], mode=mode)
    f_sc, i_sc, _, k_sc = sharded_hybrid_search(
        index.docs, *args, sparse_mode="scatter", **kw)
    f_sg, i_sg, _, k_sg = sharded_hybrid_search(
        index.docs, *args, sparse_mode="segsum", **kw)
    np.testing.assert_array_equal(np.asarray(i_sc), np.asarray(i_sg))
    np.testing.assert_allclose(np.asarray(f_sc), np.asarray(f_sg),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(k_sc), np.asarray(k_sg),
                               rtol=1e-5, atol=1e-6)


def test_twophase_pad_docs_cannot_evict_negative_cosine(setup):
    """Global zero-padding docs on the last shard score 0.0; the
    two-phase fallback must exclude them from its in-kernel segment
    maxima (via n_valid) so all-negative-cosine corpora still return
    real docs (regression: post-hoc masking)."""
    rng = np.random.default_rng(3)
    n, d = 21, 64  # 21 docs over 2 shards -> last shard has pad columns
    docs = -np.abs(rng.standard_normal((n, d))).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q_emb = np.abs(rng.standard_normal((4, d))).astype(np.float32)
    q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)
    # all true cosines are negative -> pad zeros would win unmasked
    post_ids = np.full((4, 8), n, dtype=np.int32)
    post_w = np.zeros((4, 8), dtype=np.float32)
    w = np.zeros(4, dtype=np.float32)  # dense-only fusion
    mesh = make_mesh(2)
    index = ShardedIndex.from_embeddings(docs, mesh)

    import legal_rag_tpu.parallel.sharded as sh
    import functools

    orig_budget = sh._SCORE_MATRIX_BUDGET_BYTES
    orig_tp = sh.dense_topk_twophase_rm
    try:
        sh._SCORE_MATRIX_BUDGET_BYTES = 1
        sh.dense_topk_twophase_rm = functools.partial(orig_tp, interpret=True)
        f, ids, sem, _ = sharded_hybrid_search.__wrapped__(
            index.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
            jnp.asarray(q_emb), jnp.asarray(w),
            mesh=mesh, k=5, c=8, n_docs=n, mode="weighted",
        )
    finally:
        sh._SCORE_MATRIX_BUDGET_BYTES = orig_budget
        sh.dense_topk_twophase_rm = orig_tp
    ids = np.asarray(ids)
    assert (ids >= 0).all() and (ids < n).all()
    # exact golden: all docs valid, c=8 per shard covers global top-5
    dense = q_emb.astype(np.float64) @ docs.T.astype(np.float64)
    golden = np.argsort(-dense, axis=1, kind="stable")[:, :5]
    np.testing.assert_array_equal(ids, golden)

@pytest.mark.parametrize("mode", ["weighted", "rrf"])
def test_2d_mesh_data_parallel_matches_1d(setup, mode):
    """A (data=2, shard=4) 2-D mesh — query batch sharded over rows,
    docs over columns — returns exactly the 1-D doc-sharded results."""
    from legal_rag_tpu.parallel.mesh import make_mesh_2d

    docs, q_emb, bm25, post_ids, post_w, _ = setup
    w = np.full(4, 0.5, dtype=np.float32)
    kw = dict(k=5, c=10, n_docs=docs.shape[0], mode=mode)

    mesh1 = make_mesh(4)
    idx1 = ShardedIndex.from_embeddings(docs, mesh1)
    f1, i1, s1, k1 = sharded_hybrid_search(
        idx1.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
        jnp.asarray(q_emb), jnp.asarray(w), mesh=mesh1, **kw)

    mesh2 = make_mesh_2d(2, 4)
    idx2 = ShardedIndex.from_embeddings(docs, mesh2)
    f2, i2, s2, k2 = sharded_hybrid_search(
        idx2.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
        jnp.asarray(q_emb), jnp.asarray(w), mesh=mesh2,
        data_axis="data", **kw)

    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), rtol=1e-6)


def test_2d_mesh_rejects_indivisible_batch(setup):
    from legal_rag_tpu.parallel.mesh import make_mesh_2d

    docs, q_emb, bm25, post_ids, post_w, _ = setup
    mesh2 = make_mesh_2d(2, 4)
    idx2 = ShardedIndex.from_embeddings(docs, mesh2)
    with pytest.raises(ValueError, match="divide data axis"):
        sharded_hybrid_search(
            idx2.docs, jnp.asarray(post_ids[:3]), jnp.asarray(post_w[:3]),
            jnp.asarray(q_emb[:3]), jnp.asarray(np.full(3, .5, np.float32)),
            mesh=mesh2, data_axis="data", k=5, c=10,
            n_docs=docs.shape[0],
        )
