"""Fusion parity: weighted mode must reproduce the reference's hybrid
ranking (retrieval_engine.py:71-96) bit-for-bit in rank order; RRF mode
must match a straight-line host implementation."""

import numpy as np
import jax.numpy as jnp

from legal_rag_tpu.ops.fusion import weighted_fusion, rrf_fusion


def golden_weighted(dense_scores, dense_ids, bm25_scores, w, k):
    """Reimplements the reference loop: per dense candidate, fuse with
    max-normalized BM25, stable-sort descending."""
    out = []
    for qi in range(dense_scores.shape[0]):
        max_b = bm25_scores[qi].max()
        max_b = max_b if max_b > 0 else 1.0
        rows = []
        for c in range(dense_ids.shape[1]):
            idx = dense_ids[qi, c]
            sem = float(dense_scores[qi, c])
            bm = float(bm25_scores[qi, idx]) / max_b
            rows.append((sem * (1 - w) + bm * w, idx, sem, bm))
        rows.sort(key=lambda r: r[0], reverse=True)  # stable
        out.append(rows[:k])
    return out


def test_weighted_matches_reference_semantics():
    rng = np.random.default_rng(5)
    q, c, n, k = 4, 10, 200, 5
    dense_scores = np.sort(rng.random((q, c)).astype(np.float32))[:, ::-1].copy()
    dense_ids = np.stack([rng.choice(n, c, replace=False) for _ in range(q)]).astype(np.int32)
    bm25 = (rng.random((q, n)) * 3).astype(np.float32)
    w = 0.5

    golden = golden_weighted(dense_scores, dense_ids, bm25, w, k)
    f, ids, sem, bmn = weighted_fusion(
        jnp.asarray(dense_scores), jnp.asarray(dense_ids), jnp.asarray(bm25),
        w, k,
    )
    for qi in range(q):
        g_ids = [r[1] for r in golden[qi]]
        np.testing.assert_array_equal(np.asarray(ids)[qi], g_ids)
        np.testing.assert_allclose(
            np.asarray(f)[qi], [r[0] for r in golden[qi]], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sem)[qi], [r[2] for r in golden[qi]], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(bmn)[qi], [r[3] for r in golden[qi]], rtol=1e-5
        )


def test_weighted_all_zero_bm25_uses_unit_norm():
    """Reference :74 — max(bm25) == 0 falls back to divisor 1.0."""
    dense_scores = jnp.asarray([[0.9, 0.8]], dtype=jnp.float32)
    dense_ids = jnp.asarray([[3, 7]], dtype=jnp.int32)
    bm25 = jnp.zeros((1, 10), dtype=jnp.float32)
    f, ids, sem, bmn = weighted_fusion(dense_scores, dense_ids, bm25, 0.5, 2)
    np.testing.assert_allclose(np.asarray(f)[0], [0.45, 0.4], rtol=1e-6)
    assert (np.asarray(bmn) == 0).all()


def test_weighted_per_query_weights():
    """Batched concept expansion mixes procedural (0.6) and plain (0.5)
    weights in one launch — per-query weight vector."""
    dense_scores = jnp.asarray([[1.0, 0.5], [1.0, 0.5]], dtype=jnp.float32)
    dense_ids = jnp.asarray([[0, 1], [0, 1]], dtype=jnp.int32)
    bm25 = jnp.asarray([[0.0, 2.0], [0.0, 2.0]], dtype=jnp.float32)
    w = jnp.asarray([0.5, 0.6])
    f, ids, _, _ = weighted_fusion(dense_scores, dense_ids, bm25, w, 2)
    # q0: cand0 = 0.5, cand1 = 0.25+0.5=0.75 -> id 1 first
    np.testing.assert_array_equal(np.asarray(ids)[0], [1, 0])
    np.testing.assert_allclose(np.asarray(f)[0], [0.75, 0.5], rtol=1e-6)
    # q1: cand0 = 0.4, cand1 = 0.2+0.6=0.8
    np.testing.assert_allclose(np.asarray(f)[1], [0.8, 0.4], rtol=1e-6)


def golden_rrf(dense_ids, sparse_ids, k, rrf_k):
    out_ids, out_scores = [], []
    for qi in range(dense_ids.shape[0]):
        acc = {}
        for lst in (dense_ids[qi], sparse_ids[qi]):
            for rank, idx in enumerate(lst, start=1):
                acc[int(idx)] = acc.get(int(idx), 0.0) + 1.0 / (rrf_k + rank)
        ranked = sorted(acc.items(), key=lambda t: (-t[1], t[0]))[:k]
        out_ids.append([r[0] for r in ranked])
        out_scores.append([r[1] for r in ranked])
    return np.array(out_ids), np.array(out_scores)


def test_rrf_matches_golden():
    rng = np.random.default_rng(9)
    q, c, n, k = 3, 8, 50, 5
    dense_ids = np.stack([rng.choice(n, c, replace=False) for _ in range(q)]).astype(np.int32)
    sparse_ids = np.stack([rng.choice(n, c, replace=False) for _ in range(q)]).astype(np.int32)
    g_ids, g_scores = golden_rrf(dense_ids, sparse_ids, k, 60)
    s, ids = rrf_fusion(jnp.asarray(dense_ids), jnp.asarray(sparse_ids), k, 60)
    np.testing.assert_array_equal(np.asarray(ids), g_ids)
    np.testing.assert_allclose(np.asarray(s), g_scores, rtol=1e-6)


def test_rrf_surfaces_sparse_only_hits():
    """A doc ranked #1 by BM25 but absent from dense candidates must
    appear — the capability the reference's fusion lacks."""
    dense_ids = jnp.asarray([[10, 11, 12]], dtype=jnp.int32)
    sparse_ids = jnp.asarray([[99, 10, 11]], dtype=jnp.int32)
    s, ids = rrf_fusion(dense_ids, sparse_ids, 4, 60)
    assert 99 in np.asarray(ids)[0]

def test_rrf_pad_slots_earn_no_mass():
    """Candidate lists shorter than C are padded with out-of-range ids;
    with n_valid set they must contribute zero RRF mass and never
    displace a real tail doc (regression: ADVICE r1)."""
    # corpus n=4; dense list has 2 real + 2 pad, sparse likewise.
    # doc 3 appears only at rank 4 in sparse; without masking, pads at
    # ranks 3-4 of dense would outrank it.
    n = 4
    dense_ids = jnp.asarray([[0, 1, 100, 101]], dtype=jnp.int32)
    sparse_ids = jnp.asarray([[1, 2, 102, 3]], dtype=jnp.int32)
    s, ids = rrf_fusion(dense_ids, sparse_ids, 4, 60, n_valid=n)
    ids = np.asarray(ids)[0]
    s = np.asarray(s)[0]
    # all four REAL docs surface, every pad excluded
    assert set(ids.tolist()) == {0, 1, 2, 3}
    assert np.all(np.isfinite(s))


def test_rrf_n_valid_preserves_real_ranking():
    """n_valid must not change scores of real docs."""
    rng = np.random.default_rng(11)
    q, c, n, k = 3, 8, 50, 5
    dense_ids = np.stack(
        [rng.choice(n, c, replace=False) for _ in range(q)]
    ).astype(np.int32)
    sparse_ids = np.stack(
        [rng.choice(n, c, replace=False) for _ in range(q)]
    ).astype(np.int32)
    s0, i0 = rrf_fusion(jnp.asarray(dense_ids), jnp.asarray(sparse_ids), k, 60)
    s1, i1 = rrf_fusion(
        jnp.asarray(dense_ids), jnp.asarray(sparse_ids), k, 60, n_valid=n
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
