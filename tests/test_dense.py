"""Dense top-k parity: both backends must match a numpy brute-force
golden — the identical math FAISS IndexFlatIP performs (exact inner
product + partial sort), so equality here is FAISS-flat parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from legal_rag_tpu.ops.dense import (
    l2_normalize,
    dense_topk_xla,
    dense_topk_pallas,
)


def golden_topk(queries, docs, k):
    """Brute-force exact top-k: descending score, ties by ascending id."""
    scores = (queries.astype(np.float64) @ docs.T.astype(np.float64)).astype(
        np.float32
    )
    ids = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    top = np.take_along_axis(scores, ids, axis=1)
    return top, ids


def assert_topk_equiv(queries, docs, k, got_s, got_i, tol=1e-5):
    """Assert (scores, ids) are an exact top-k up to float-accumulation
    ties. Different gemms (numpy BLAS vs XLA vs MXU) legitimately order
    near-equal scores differently — exactly as FAISS on different BLAS
    backends would — so parity means: score *values* match the golden,
    every unambiguous golden hit is present, and nothing outside the
    tolerance band sneaks in."""
    scores64 = queries.astype(np.float64) @ docs.T.astype(np.float64)
    got_s = np.asarray(got_s)
    got_i = np.asarray(got_i)
    for qi in range(queries.shape[0]):
        srt = np.sort(scores64[qi])[::-1]
        kth = srt[k - 1]
        # 1. selected score values equal the golden top-k values
        np.testing.assert_allclose(got_s[qi], srt[:k], rtol=tol, atol=tol)
        # 2. returned scores are monotone non-increasing
        assert (np.diff(got_s[qi]) <= tol).all()
        got_true = scores64[qi, got_i[qi]]
        # 3. device scores agree with f64 recompute at the returned ids
        np.testing.assert_allclose(got_s[qi], got_true, rtol=tol, atol=tol)
        # 4. every must-have id (above the tie band) is present
        must = np.where(scores64[qi] > kth + tol)[0]
        assert set(must) <= set(got_i[qi])
        # 5. nothing below the tie band is present
        assert (got_true >= kth - tol).all()


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    docs = rng.standard_normal((1000, 384)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    queries = rng.standard_normal((13, 384)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return queries, docs


def test_l2_normalize_matches_numpy(data):
    _, docs = data
    out = np.asarray(l2_normalize(jnp.asarray(docs * 3.7)))
    np.testing.assert_allclose(
        out, docs * 3.7 / np.linalg.norm(docs * 3.7, axis=1, keepdims=True),
        rtol=1e-6,
    )


def test_l2_normalize_zero_row_safe():
    x = jnp.zeros((2, 4))
    assert np.isfinite(np.asarray(l2_normalize(x))).all()


def test_xla_backend_matches_golden(data):
    queries, docs = data
    s, i = dense_topk_xla(jnp.asarray(queries), jnp.asarray(docs), 10)
    assert_topk_equiv(queries, docs, 10, s, i)


def test_pallas_backend_matches_golden(data):
    queries, docs = data
    s, i = dense_topk_pallas(
        jnp.asarray(queries), jnp.asarray(docs.T), 10,
        block_n=256, interpret=True,
    )
    assert_topk_equiv(queries, docs, 10, s, i)


def test_pallas_ragged_shapes():
    """N and Q not multiples of the block sizes (padding correctness)."""
    rng = np.random.default_rng(3)
    docs = rng.standard_normal((333, 64)).astype(np.float32)
    queries = rng.standard_normal((5, 64)).astype(np.float32)
    s, i = dense_topk_pallas(
        jnp.asarray(queries), jnp.asarray(docs.T), 7,
        block_n=128, interpret=True,
    )
    assert_topk_equiv(queries, docs, 7, s, i)


def test_tie_breaking_lowest_id_wins():
    """Duplicate documents: the lower doc id must be returned first,
    in both backends (FAISS flat heap semantics + stable sort)."""
    doc = np.ones((1, 8), dtype=np.float32)
    docs = np.concatenate([doc] * 6 + [np.zeros((2, 8), dtype=np.float32)])
    queries = np.ones((1, 8), dtype=np.float32)
    _, i_x = dense_topk_xla(jnp.asarray(queries), jnp.asarray(docs), 4)
    _, i_p = dense_topk_pallas(
        jnp.asarray(queries), jnp.asarray(docs.T), 4,
        block_n=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i_x)[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(i_p)[0], [0, 1, 2, 3])


def test_tie_breaking_across_blocks():
    """Ties straddling Pallas block boundaries keep ascending-id order."""
    docs = np.zeros((300, 8), dtype=np.float32)
    docs[10] = docs[150] = docs[290] = 1.0  # equal scores, 3 blocks
    queries = np.ones((1, 8), dtype=np.float32)
    queries /= np.linalg.norm(queries)
    _, i_p = dense_topk_pallas(
        jnp.asarray(queries), jnp.asarray(docs.T), 3,
        block_n=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i_p)[0], [10, 150, 290])


def test_k_larger_than_block_tail():
    """k close to N still returns every real document before padding."""
    rng = np.random.default_rng(11)
    docs = rng.standard_normal((20, 16)).astype(np.float32)
    queries = rng.standard_normal((2, 16)).astype(np.float32)
    _, gi = golden_topk(queries, docs, 20)
    s, i = dense_topk_pallas(
        jnp.asarray(queries), jnp.asarray(docs.T), 20,
        block_n=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i), gi)


def test_twophase_matches_golden(data):
    from legal_rag_tpu.ops.dense import dense_topk_twophase

    queries, docs = data
    s, i = dense_topk_twophase(
        jnp.asarray(queries), jnp.asarray(docs.T), 10, interpret=True,
    )
    assert_topk_equiv(queries, docs, 10, s, i)


def test_twophase_duplicate_tie_break():
    from legal_rag_tpu.ops.dense import dense_topk_twophase

    rng = np.random.default_rng(13)
    docs = rng.standard_normal((2000, 32)).astype(np.float32)
    docs[50] = docs[700] = docs[1500]          # 3 identical docs
    queries = docs[50:51] * 1.5                # exact tie at the top
    _, i = dense_topk_twophase(
        jnp.asarray(queries), jnp.asarray(docs.T), 5, interpret=True,
    )
    assert list(np.asarray(i)[0][:3]) == [50, 700, 1500]

def test_pallas_dynamic_n_valid():
    """n_valid (a traced scalar) must exclude trailing columns from the
    in-kernel selection: zero pad docs cannot evict negative-score
    candidates."""
    rng = np.random.default_rng(5)
    d, n_real, n_padded = 32, 13, 40
    docs_t = np.zeros((d, n_padded), dtype=np.float32)
    real = -np.abs(rng.standard_normal((d, n_real))).astype(np.float32)
    docs_t[:, :n_real] = real / np.linalg.norm(real, axis=0, keepdims=True)
    q = np.abs(rng.standard_normal((4, d))).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s, ids = dense_topk_pallas(
        jnp.asarray(q), jnp.asarray(docs_t), 5,
        n_valid=jnp.asarray(n_real, jnp.int32),
        block_n=128, interpret=True,
    )
    ids = np.asarray(ids)
    assert (ids < n_real).all()
    golden = np.argsort(
        -(q.astype(np.float64) @ docs_t[:, :n_real].astype(np.float64)),
        axis=1, kind="stable",
    )[:, :5]
    np.testing.assert_array_equal(ids, golden)

@pytest.mark.parametrize("seg_rows,block_q", [(1, 8), (4, 16), (8, 8)])
def test_twophase_seg_rows_variants(data, seg_rows, block_q):
    """Segment width and query blocking are tunable independently of
    the DMA block; every variant returns the exact golden ordering."""
    from legal_rag_tpu.ops.dense import dense_topk_twophase

    queries, docs = data
    g_s, g_i = golden_topk(queries, docs, 7)
    s, i = dense_topk_twophase(
        jnp.asarray(queries), jnp.asarray(docs.T), 7,
        block_n=1024, block_q=block_q, seg_rows=seg_rows, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i), g_i)
    np.testing.assert_allclose(np.asarray(s), g_s, rtol=1e-5, atol=1e-6)


def test_twophase_two_level_select_matches_golden(monkeypatch):
    """The large-N two-level (super-segment) phase-2 select is exact:
    lowering _TWO_LEVEL_MIN_SEGS forces the hierarchical branch on a
    corpus small enough to verify against the f64 golden, including
    duplicate-doc boundary ties. (In production the branch engages at
    >= 16384 segments, i.e. ~131k docs at seg_rows=8 — the roofline
    finding that flat lax.top_k over [Q, N/sr] was 2x phase 1's cost.)
    """
    import legal_rag_tpu.ops.dense as dense_mod

    monkeypatch.setattr(dense_mod, "_TWO_LEVEL_MIN_SEGS", 1)
    rng = np.random.default_rng(11)
    n = 9600                      # seg_rows=1 -> 9600 segs, 75 supers
    docs = rng.standard_normal((n, 32)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    docs[500] = docs[7000] = docs[9100]      # exact ties across supers
    queries = np.concatenate(
        [docs[9100:9101] * 1.2,
         rng.standard_normal((3, 32)).astype(np.float32)]
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    s, i = dense_mod.dense_topk_twophase(
        jnp.asarray(queries), jnp.asarray(docs.T), 10,
        block_n=128, block_q=8, seg_rows=1, interpret=True,
    )
    assert_topk_equiv(queries, docs, 10, s, i)
    # the three duplicates tie exactly at the top: ascending-id order
    assert list(np.asarray(i)[0][:3]) == [500, 7000, 9100]

# ---------------------------------------------------------------------------
# Row-major two-phase backend (the production large-N dispatch, round 3)
# ---------------------------------------------------------------------------


def test_twophase_rm_matches_golden(data):
    from legal_rag_tpu.ops.dense import dense_topk_twophase_rm

    queries, docs = data
    s, i = dense_topk_twophase_rm(
        jnp.asarray(queries), jnp.asarray(docs), 10,
        block_n=1024, interpret=True,
    )
    assert_topk_equiv(queries, docs, 10, s, i)


def test_twophase_rm_duplicate_tie_break():
    from legal_rag_tpu.ops.dense import dense_topk_twophase_rm

    rng = np.random.default_rng(13)
    docs = rng.standard_normal((2000, 32)).astype(np.float32)
    docs[50] = docs[700] = docs[1500]          # 3 identical docs
    queries = docs[50:51] * 1.5                # exact tie at the top
    _, i = dense_topk_twophase_rm(
        jnp.asarray(queries), jnp.asarray(docs), 5,
        block_n=1024, interpret=True,
    )
    assert list(np.asarray(i)[0][:3]) == [50, 700, 1500]


def test_twophase_rm_dynamic_n_valid():
    """Zero pad rows past n_valid must not evict negative-cosine docs
    from the in-kernel segment maxima."""
    from legal_rag_tpu.ops.dense import dense_topk_twophase_rm

    rng = np.random.default_rng(5)
    n_real, n_padded, d = 700, 1024, 32
    docs = np.zeros((n_padded, d), dtype=np.float32)
    real = -np.abs(rng.standard_normal((n_real, d))).astype(np.float32)
    docs[:n_real] = real / np.linalg.norm(real, axis=1, keepdims=True)
    q = np.abs(rng.standard_normal((4, d))).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    s, ids = dense_topk_twophase_rm(
        jnp.asarray(q), jnp.asarray(docs), 5,
        n_valid=jnp.asarray(n_real, jnp.int32),
        block_n=1024, interpret=True,
    )
    ids = np.asarray(ids)
    assert (ids < n_real).all()
    golden = np.argsort(
        -(q.astype(np.float64) @ docs[:n_real].T.astype(np.float64)),
        axis=1, kind="stable",
    )[:, :5]
    np.testing.assert_array_equal(ids, golden)


@pytest.mark.parametrize("seg_rows,block_q", [(1, 8), (4, 16), (8, 64)])
def test_twophase_rm_seg_rows_variants(data, seg_rows, block_q):
    from legal_rag_tpu.ops.dense import dense_topk_twophase_rm

    queries, docs = data
    g_s, g_i = golden_topk(queries, docs, 7)
    s, i = dense_topk_twophase_rm(
        jnp.asarray(queries), jnp.asarray(docs), 7,
        block_n=1024, block_q=block_q, seg_rows=seg_rows, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(i), g_i)
    np.testing.assert_allclose(np.asarray(s), g_s, rtol=1e-5, atol=1e-6)


def test_twophase_rm_two_level_select_matches_golden(monkeypatch):
    """The two-level phase-2 select through the row-major path, with
    duplicate-doc boundary ties across super-segments."""
    import legal_rag_tpu.ops.dense as dense_mod

    monkeypatch.setattr(dense_mod, "_TWO_LEVEL_MIN_SEGS", 1)
    rng = np.random.default_rng(11)
    n = 9600
    docs = rng.standard_normal((n, 32)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    docs[500] = docs[7000] = docs[9100]
    queries = np.concatenate(
        [docs[9100:9101] * 1.2,
         rng.standard_normal((3, 32)).astype(np.float32)]
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    s, i = dense_mod.dense_topk_twophase_rm(
        jnp.asarray(queries), jnp.asarray(docs), 10,
        block_n=128, block_q=8, seg_rows=1, interpret=True,
    )
    assert_topk_equiv(queries, docs, 10, s, i)
    assert list(np.asarray(i)[0][:3]) == [500, 7000, 9100]


@pytest.mark.parametrize("sup,kk", [(64, 74), (128, 74), (64, 33)])
def test_select_segments_two_level_matches_flat(monkeypatch, sup, kk):
    """The two-level select picks the same segment SET as a flat
    top_k over the full [Q, n_segs] scores, across sup/kk shapes.
    Order within the set may differ only across exact ties, which the
    rescore's two-key ordering absorbs — distinct scores here, so the
    sets must match exactly."""
    import legal_rag_tpu.ops.dense as dense_mod

    import jax

    monkeypatch.setattr(dense_mod, "_TWO_LEVEL_MIN_SEGS", 1)
    rng = np.random.default_rng(sup + kk)
    n_segs = 9600
    # distinct scores: a random permutation scaled to floats
    seg_m = rng.permutation(n_segs * 4)[: 4 * n_segs].astype(np.float32)
    seg_m = seg_m.reshape(4, n_segs) / n_segs
    pos = dense_mod._select_segments(
        jnp.asarray(seg_m), kk, n_segs, sup=sup)
    _, flat = jax.lax.top_k(jnp.asarray(seg_m), kk)
    for r in range(4):
        assert set(np.asarray(pos)[r].tolist()) == \
            set(np.asarray(flat)[r].tolist())


def test_select_segments_huge_kk_traces():
    """The PQ capacity tier's oversampled kk can reach 2k+ (k=16 *
    oversample 64 + ties = 2064); the select must trace at such shapes
    (a chunked-member variant once made this a trace-time ValueError —
    reverted as measured-slower, kept as a regression guard).
    eval_shape traces without computing."""
    import jax

    import legal_rag_tpu.ops.dense as dense_mod

    kk, sup = 2064, 128
    n_segs = 266240                       # n_segs // sup = 2080 >= kk
    out = jax.eval_shape(
        lambda m: dense_mod._select_segments(m, kk, n_segs, sup=sup),
        jax.ShapeDtypeStruct((1, n_segs), jnp.float32),
    )
    assert out.shape == (1, kk)


def test_twophase_rm_fuzz_configs():
    """Randomized (n, k, seg_rows, block sizes, n_valid) sweep — the
    production large-N kernel must match the stable float64 golden
    (score desc, id asc) under every tiling/validity combination."""
    from legal_rag_tpu.ops.dense import dense_topk_twophase_rm

    rng = np.random.default_rng(17)
    for trial in range(6):
        n = int(rng.integers(300, 3000))
        d = 32
        q_n = int(rng.integers(1, 9))
        k = int(rng.integers(1, 12))
        seg_rows = int(rng.choice([1, 2, 4, 8]))
        block_n = int(rng.choice([128, 256, 1024]))
        n_valid = int(rng.integers(max(1, k), n + 1))
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        # inject duplicates to exercise tie order
        if n_valid > 10:
            docs[n_valid // 2] = docs[n_valid - 1] = docs[0]
        queries = rng.standard_normal((q_n, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        kk = min(k, n_valid)
        s, i = dense_topk_twophase_rm(
            jnp.asarray(queries), jnp.asarray(docs), kk,
            n_valid=jnp.asarray(n_valid, jnp.int32),
            block_n=block_n, block_q=8, seg_rows=seg_rows,
            interpret=True,
        )
        i = np.asarray(i)
        assert (i < n_valid).all() and (i >= 0).all(), (trial, n, n_valid)
        sc = queries.astype(np.float64) @ docs[:n_valid].T.astype(
            np.float64)
        golden = np.lexsort((np.arange(n_valid)[None, :].repeat(
            q_n, 0), -sc), axis=1)[:, :kk]
        np.testing.assert_array_equal(
            i, golden, err_msg=f"trial {trial}: n={n} k={kk} "
            f"sr={seg_rows} bn={block_n} nv={n_valid}",
        )


# ---------------------------------------------------------------------------
# int8 capacity mode through the two-phase kernel (round 4)
# ---------------------------------------------------------------------------


def _seg_quantize(docs, seg_rows):
    """Per-segment symmetric int8 quantization (the contract
    sharded.ShardedIndex.from_embeddings produces)."""
    n = docs.shape[0]
    assert n % seg_rows == 0
    per_doc = np.abs(docs).max(axis=1) / 127.0
    scales = per_doc.reshape(n // seg_rows, seg_rows).max(axis=1)
    scales[scales == 0] = 1.0
    scales = np.repeat(scales, seg_rows)
    codes = np.clip(
        np.rint(docs / scales[:, None]), -127, 127
    ).astype(np.int8)
    return codes, scales.astype(np.float32)


def _int8_xla_reference(q, codes, scales, k, n_valid=None):
    """The sharded XLA int8 path's metric, replicated in numpy."""
    q_scale = np.abs(q).max(axis=1) / 127.0
    q_scale[q_scale == 0] = 1.0
    q_i8 = np.clip(np.rint(q / q_scale[:, None]), -127, 127)
    acc = q_i8.astype(np.int64) @ codes.T.astype(np.int64)
    scores = acc.astype(np.float64) * q_scale[:, None] * scales[None, :]
    if n_valid is not None:
        scores[:, n_valid:] = -np.inf
    order = np.lexsort(
        (np.arange(codes.shape[0])[None, :].repeat(q.shape[0], 0),
         -scores), axis=1,
    )[:, :k]
    return np.take_along_axis(scores, order, axis=1), order


@pytest.mark.parametrize("kernel_transpose", [True, False])
def test_twophase_rm_int8_matches_xla_metric(kernel_transpose):
    from legal_rag_tpu.ops.dense import dense_topk_twophase_rm

    rng = np.random.default_rng(23)
    n, d, sr = 8192, 64, 8
    docs = rng.standard_normal((n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((6, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    codes, scales = _seg_quantize(docs, sr)
    ref_s, ref_i = _int8_xla_reference(q, codes, scales, 10)
    s, i = dense_topk_twophase_rm(
        jnp.asarray(q), jnp.asarray(codes), 10,
        doc_scales=jnp.asarray(scales),
        block_n=1024, seg_rows=sr, interpret=True,
        kernel_transpose=kernel_transpose,
    )
    np.testing.assert_array_equal(np.asarray(i), ref_i)
    np.testing.assert_allclose(
        np.asarray(s), ref_s.astype(np.float32), rtol=1e-5, atol=1e-6
    )


def test_twophase_rm_int8_n_valid_masks_padding():
    from legal_rag_tpu.ops.dense import dense_topk_twophase_rm

    rng = np.random.default_rng(29)
    n_real, n_pad, d, sr = 700, 1024, 32, 4
    docs = np.zeros((n_pad, d), dtype=np.float32)
    real = -np.abs(rng.standard_normal((n_real, d))).astype(np.float32)
    docs[:n_real] = real / np.linalg.norm(real, axis=1, keepdims=True)
    q = np.abs(rng.standard_normal((3, d))).astype(np.float32)
    codes, scales = _seg_quantize(docs, sr)
    ref_s, ref_i = _int8_xla_reference(q, codes, scales, 5, n_valid=n_real)
    s, i = dense_topk_twophase_rm(
        jnp.asarray(q), jnp.asarray(codes), 5,
        doc_scales=jnp.asarray(scales),
        n_valid=jnp.asarray(n_real, jnp.int32),
        block_n=512, seg_rows=sr, interpret=True,
    )
    assert (np.asarray(i) < n_real).all()
    np.testing.assert_array_equal(np.asarray(i), ref_i)


def test_int8_recall_after_rescore_per_segment_quantization():
    """Per-segment scales + oversampled exact rescore still recover
    recall 1.0 (the tier's contract, now via the two-phase kernel)."""
    from legal_rag_tpu.ops.dense import dense_topk_twophase_rm, exact_rescore

    rng = np.random.default_rng(31)
    n, d, sr = 16384, 64, 8
    docs = rng.standard_normal((n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((8, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    codes, scales = _seg_quantize(docs, sr)
    _, cand = dense_topk_twophase_rm(
        jnp.asarray(q), jnp.asarray(codes), 40,
        doc_scales=jnp.asarray(scales),
        block_n=1024, seg_rows=sr, interpret=True,
    )
    _, ids, _, _ = exact_rescore(q, np.asarray(cand), docs, k=10)
    gold = np.argsort(-(q @ docs.T), axis=1, kind="stable")[:, :10]
    rec = np.mean([
        len(set(ids[r]) & set(gold[r])) / 10 for r in range(8)
    ])
    assert rec == 1.0, rec


def test_kernel_transpose_probe_escapes_ambient_trace():
    """The kernel_transpose=None resolution happens while TRACING the
    production dispatch (sharded._local_dense_topc sits inside
    jit/shard_map). The probe must execute eagerly there — a traced
    probe sees Tracers, raises, and silently caches False, disabling
    the in-kernel transpose everywhere (round-4 regression)."""
    import jax

    import legal_rag_tpu.ops.dense as dm

    seen = {}

    def f(x):
        seen["ok"] = dm._probe_kernel_transpose(jnp.bfloat16)
        return x

    jax.jit(f)(jnp.ones((4,)))
    assert seen["ok"] is True
