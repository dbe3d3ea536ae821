"""Product-quantization capacity tier: training, coding, and the
segment-max candidate kernel (ops/pq.py).

The reference gets PQ from the FAISS C++ library it depends on
(requirements.txt: faiss-cpu ships IndexPQ/IVFPQ); here it is a JAX
k-means trainer plus a Pallas one-hot-matmul scoring kernel, verified
against brute-force goldens in interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from legal_rag_tpu.ops.pq import (
    PQCodebook, decode_pq, encode_pq, pq_search_rescored, pq_topk,
    train_pq, unpack_codes,
)

D, M = 64, 8


@pytest.fixture(scope="module")
def clustered():
    """Synthetic corpus with real cluster structure (PQ's use case)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((50, D)).astype(np.float32)
    assign = rng.integers(0, 50, 2000)
    docs = centers[assign] + 0.15 * rng.standard_normal((2000, D))
    docs = docs.astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = centers[rng.integers(0, 50, 16)] + 0.2 * rng.standard_normal((16, D))
    q = q.astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return docs, q


def _pq_scores_brute(queries, codes, cb):
    """Golden: decode-free LUT scoring in numpy (4-bit nibbles)."""
    q, d = queries.shape
    ns, dsub = cb.n_subspaces, cb.dsub
    nibs = unpack_codes(codes)                    # [N, 2m]
    lut = np.einsum(
        "qmd,mcd->qmc", queries.reshape(q, ns, dsub), cb.codebooks
    )  # [Q, 2m, 16]
    qi = np.arange(q)[:, None]
    out = np.zeros((q, codes.shape[0]), dtype=np.float32)
    for s_ in range(ns):
        out += lut[qi, s_, nibs[None, :, s_]]
    return out


def test_train_encode_shapes_and_quality(clustered):
    docs, _ = clustered
    cb = train_pq(docs, m=M, iters=15, seed=0)
    assert cb.codebooks.shape == (2 * M, 16, D // (2 * M))
    codes = encode_pq(docs, cb)
    assert codes.shape == (2000, M) and codes.dtype == np.uint8
    assert unpack_codes(codes).shape == (2000, 2 * M)

    recon = decode_pq(codes, cb)
    err_trained = np.mean((recon - docs) ** 2)
    # untrained (random-init) codebooks must be clearly worse
    rng = np.random.default_rng(1)
    cb_rand = PQCodebook(
        rng.standard_normal(cb.codebooks.shape).astype(np.float32)
    )
    err_rand = np.mean((decode_pq(encode_pq(docs, cb_rand), cb_rand) - docs) ** 2)
    assert err_trained < 0.25 * err_rand
    # and reconstruction should be decent in absolute terms
    # (4-bit: 16 centroids per subspace; looser than the 8-bit bound)
    assert err_trained < 0.02


def test_opq_rotation_improves_anisotropic_reconstruction():
    """OPQ's learned rotation must (a) be orthogonal, (b) beat plain PQ
    reconstruction on data whose variance is concentrated in a few
    correlated directions — the regime trained text encoders live in."""
    rng = np.random.default_rng(5)
    # low-rank-ish anisotropic corpus: variance concentrated + mixed
    # across subspace boundaries by a random linear map
    z = rng.standard_normal((4000, D)).astype(np.float32)
    scales = np.exp(-np.arange(D) / 8.0).astype(np.float32)
    mix = rng.standard_normal((D, D)).astype(np.float32) / np.sqrt(D)
    docs = (z * scales) @ mix
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)

    cb_plain = train_pq(docs, m=M, iters=12, seed=0)
    cb_opq = train_pq(docs, m=M, iters=12, seed=0, opq_iters=6)
    assert cb_opq.rotation is not None and cb_plain.rotation is None
    r = cb_opq.rotation
    np.testing.assert_allclose(r @ r.T, np.eye(D), atol=1e-4)

    err_plain = np.mean((decode_pq(encode_pq(docs, cb_plain), cb_plain) - docs) ** 2)
    err_opq = np.mean((decode_pq(encode_pq(docs, cb_opq), cb_opq) - docs) ** 2)
    assert err_opq < 0.9 * err_plain, (err_opq, err_plain)


def test_opq_end_to_end_recall(clustered):
    """pq_search_rescored with an OPQ codebook: queries rotate at prep
    time (PQCodebook.rotate), candidates still rescore exactly."""
    docs, q = clustered
    cb = train_pq(docs, m=M, iters=15, seed=0, opq_iters=4)
    codes_d = jnp.asarray(encode_pq(docs, cb))
    scores, ids = pq_search_rescored(
        q, codes_d, cb, docs, k=10, oversample=8, interpret=True,
    )
    exact = q @ docs.T
    hit = 0
    for qi in range(q.shape[0]):
        gold = set(np.argsort(-exact[qi], kind="stable")[:10].tolist())
        hit += len(gold & set(ids[qi].tolist())) / 10
        np.testing.assert_allclose(scores[qi], exact[qi][ids[qi]], rtol=1e-5)
    assert hit / q.shape[0] >= 0.9


def test_pq_topk_exact_under_pq_metric(clustered):
    """pq_topk must return the EXACT top-k by PQ score (score desc,
    id asc): every top-k doc lives in a segment whose max >= s_k, and
    at most k (+ tie pad) segments can have max >= s_k, so the top
    (k+16) segments always cover the true top-k members."""
    docs, q = clustered
    cb = train_pq(docs, m=M, iters=10, seed=0)
    codes = encode_pq(docs, cb)

    s, ids = pq_topk(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(cb.codebooks),
        k=10, block_n=512, seg_rows=8, interpret=True,
    )
    s, ids = np.asarray(s), np.asarray(ids)

    golden = _pq_scores_brute(q, codes, cb)
    for qi in range(q.shape[0]):
        order = np.lexsort((np.arange(2000), -golden[qi]))[:10]
        np.testing.assert_array_equal(ids[qi], order)
        np.testing.assert_allclose(s[qi], golden[qi][order], rtol=2e-4)


def test_pq_topk_padding_and_small_corpus():
    """N not a multiple of block_n: pad docs must never be returned."""
    rng = np.random.default_rng(3)
    docs = rng.standard_normal((777, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = docs[:4] + 0.01 * rng.standard_normal((4, D)).astype(np.float32)
    cb = train_pq(docs, m=M, iters=5, seed=0)
    codes = encode_pq(docs, cb)
    _, ids = pq_topk(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(cb.codebooks),
        k=20, block_n=512, seg_rows=8, interpret=True,
    )
    ids = np.asarray(ids)
    assert (ids >= 0).all() and (ids < 777).all()


def test_pq_topk_n_valid_masks_mesh_padding():
    """Traced n_valid (the sharded path's padding contract): docs at or
    past n_valid must never be returned even when their zero-padding
    codes happen to score high under some codebook."""
    rng = np.random.default_rng(7)
    docs = rng.standard_normal((512, D)).astype(np.float32)
    # make the "pad" region (last 128 rows) near-duplicates of the
    # queries so an unmasked kernel would certainly return them
    q = rng.standard_normal((4, D)).astype(np.float32)
    docs[400:] = q[0] + 0.001 * rng.standard_normal((112, D))
    cb = train_pq(docs, m=M, iters=5, seed=0)
    codes = encode_pq(docs, cb)
    _, ids = pq_topk(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(cb.codebooks),
        k=20, n_valid=jnp.int32(400), block_n=256, seg_rows=8,
        interpret=True,
    )
    assert (np.asarray(ids) < 400).all()


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_pq_matches_single_shard(clustered, corpus_texts, n_shards):
    """PQ-coded sharded hybrid search: per-shard PQ top-C lists merge
    into exactly the global PQ top-C (same superset argument as the
    matmul path), so results are identical across mesh sizes."""
    from legal_rag_tpu.ops.sparse import build_bm25
    from legal_rag_tpu.parallel.mesh import make_mesh
    from legal_rag_tpu.parallel.sharded import (
        ShardedIndex, sharded_hybrid_search,
    )

    docs, q_emb = clustered
    n = min(len(corpus_texts), docs.shape[0])
    docs, q_emb = docs[:n], q_emb[:4]
    bm25 = build_bm25(corpus_texts[:n])
    queries = ["the police fir", "w1 w2 w3", "w5 police", "w100 the"]
    budget = bm25.postings_budget(queries)
    post_ids, post_w = bm25.gather_postings(queries, budget)
    w = np.full(4, 0.5, dtype=np.float32)

    def run(shards):
        mesh = make_mesh(shards)
        idx = ShardedIndex.from_embeddings(
            docs, mesh, dtype="pq", pq_m=M
        )
        assert idx.docs.dtype == jnp.uint8
        return sharded_hybrid_search(
            idx.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
            jnp.asarray(q_emb), jnp.asarray(w), None, idx.pq_codebooks,
            mesh=mesh, k=5, c=10, n_docs=n, mode="weighted",
        )

    f1, i1, s1, k1 = (np.asarray(x) for x in run(1))
    fN, iN, sN, kN = (np.asarray(x) for x in run(n_shards))
    np.testing.assert_array_equal(i1, iN)
    np.testing.assert_allclose(f1, fN, rtol=1e-5, atol=1e-6)
    assert ((i1 >= 0) & (i1 < n)).all()


def _tiny_cfg(dtype="pq", oversample=4):
    from legal_rag_tpu.config import (
        DenseConfig, EncoderConfig, RetrievalConfig, ShardingConfig,
    )

    return RetrievalConfig(
        dense=DenseConfig(dtype=dtype, pq_m=8, int8_oversample=oversample,
                          pq_oversample=oversample),
        encoder=EncoderConfig(
            vocab_size=4000, hidden=32, layers=2, heads=4,
            intermediate=64, max_len=64, encode_batch=16,
        ),
        sharding=ShardingConfig(num_shards=4),
    )


@pytest.fixture(scope="module")
def pq_store(corpus_texts, tmp_path_factory):
    """A store built WITH persisted PQ artifacts (build --pq-m 8)."""
    from legal_rag_tpu.index.builder import build_index

    chunks = [
        {
            "text": t,
            "metadata": {"law": "TEST", "section": str(i),
                         "unit_type": "section"},
            "canonical_header": f"TEST Section {i}",
            "section_id": f"TEST_{i}",
        }
        for i, t in enumerate(corpus_texts)
    ]
    d = tmp_path_factory.mktemp("pq_store")
    return build_index(chunks, config=_tiny_cfg(), store_dir=d, pq_m=8), d


def test_pq_store_roundtrip(pq_store):
    """PQ codes + codebooks persist in the manifest (sha256'd) and load
    back bit-identical, so serving skips boot-time k-means."""
    from legal_rag_tpu.index.store import VectorStore

    store, d = pq_store
    assert store.pq_codes is not None
    assert store.pq_rotation is not None   # OPQ on by default at build
    assert "pq.npz" in store.manifest["artifacts"]
    loaded = VectorStore.load(d)
    np.testing.assert_array_equal(loaded.pq_codes, store.pq_codes)
    np.testing.assert_array_equal(loaded.pq_codebooks, store.pq_codebooks)
    np.testing.assert_array_equal(loaded.pq_rotation, store.pq_rotation)


def test_engine_pq_mode_matches_fp32(pq_store):
    """dtype='pq' engine (PQ candidates + fp32 rescore) vs the exact
    fp32 engine on the same store.

    With the oversampled candidate list covering the whole corpus
    (k * oversample >= n_docs), the fp32 rescore narrows to exactly the
    true dense top-C pool, so results must EQUAL the exact engine's —
    the same exactness-recovery contract the int8 mode tests pin.
    At the default oversample (4), results only need high overlap (the
    PQ metric is approximate)."""
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    store, d = pq_store
    loaded = VectorStore.load(d)
    eng_full = RetrievalEngine(loaded, config=_tiny_cfg("pq", oversample=32))
    assert eng_full.index.docs.dtype == jnp.uint8   # loaded artifacts
    eng_pq = RetrievalEngine(loaded, config=_tiny_cfg("pq"))
    eng_fp = RetrievalEngine(loaded, config=_tiny_cfg("float32"))

    queries = ["the police fir", "w1 w2 w3", "w5 police", "w100 the"]
    # the exactness-recovery contract is a weighted-mode feature (RRF
    # is rank-based); pin the mode — the engine default is rrf
    res_full = eng_full.search_batch(queries, k=5, mode="weighted")
    res_pq = eng_pq.search_batch(queries, k=5, mode="weighted")
    res_fp = eng_fp.search_batch(queries, k=5, mode="weighted")

    agree = 0
    for rfull, rp, rf in zip(res_full, res_pq, res_fp):
        # full-corpus oversample: exact equality with the fp32 engine
        assert [r.doc_id for r in rfull] == [r.doc_id for r in rf]
        np.testing.assert_allclose(
            [r.score for r in rfull], [r.score for r in rf],
            rtol=1e-5, atol=1e-6,
        )
        # default oversample: approximate but strongly overlapping
        ids_p = [r.doc_id for r in rp]
        ids_f = [r.doc_id for r in rf]
        agree += len(set(ids_p) & set(ids_f)) / max(len(ids_f), 1)
        scores = [r.score for r in rp]   # rescored: fp32, descending
        assert all(a >= b - 1e-6 for a, b in zip(scores, scores[1:]))
    assert agree / len(queries) >= 0.7


def test_engine_pq_trains_on_the_fly(corpus_texts):
    """dtype='pq' against a store WITHOUT persisted artifacts trains
    codebooks at init (convenience path) and still serves."""
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    chunks = [
        {
            "text": t,
            "metadata": {"law": "TEST", "section": str(i),
                         "unit_type": "section"},
            "canonical_header": f"TEST Section {i}",
            "section_id": f"TEST_{i}",
        }
        for i, t in enumerate(corpus_texts[:32])
    ]
    store = build_index(chunks, config=_tiny_cfg())
    assert store.pq_codes is None
    eng = RetrievalEngine(store, config=_tiny_cfg("pq"))
    assert eng.index.docs.dtype == jnp.uint8
    out = eng.search_batch(["police fir", "w1 w2"], k=3)
    assert all(len(row) > 0 for row in out)
    assert all(0 <= r.doc_id < 32 for row in out for r in row)


def test_pq_rescored_recall_vs_exact(clustered):
    """Capacity-mode end-to-end: PQ candidates + fp32 exact rescore
    must recover near-exact recall on clustered data, and the returned
    ordering must be the exact fp32 ordering of the returned set."""
    docs, q = clustered
    cb = train_pq(docs, m=M, iters=15, seed=0)
    codes_d = jnp.asarray(encode_pq(docs, cb))

    scores, ids = pq_search_rescored(
        q, codes_d, cb, docs, k=10, oversample=8, interpret=True,
    )
    exact = q @ docs.T
    hit = 0
    for qi in range(q.shape[0]):
        gold = set(np.argsort(-exact[qi], kind="stable")[:10].tolist())
        hit += len(gold & set(ids[qi].tolist())) / 10
        # returned scores must be the exact fp32 inner products,
        # descending
        np.testing.assert_allclose(
            scores[qi], exact[qi][ids[qi]], rtol=1e-5
        )
        assert (np.diff(scores[qi]) <= 1e-7).all()
    assert hit / q.shape[0] >= 0.9


def test_engine_pq_rrf_mode(pq_store):
    """PQ index + RRF fusion: rank-based fusion over the approximate
    PQ dense list and the exact sparse list must serve without rescore
    (RRF is rank-based) and return only valid docs."""
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    store, d = pq_store
    loaded = VectorStore.load(d)
    eng = RetrievalEngine(loaded, config=_tiny_cfg("pq"))
    out = eng.search_batch(
        ["the police fir", "w1 w2 w3"], k=5, mode="rrf"
    )
    assert all(len(row) > 0 for row in out)
    for row in out:
        for r in row:
            assert 0 <= r.doc_id < loaded.n_docs
            assert np.isfinite(r.score)


# ---------------------------------------------------------------------------
# IVF coarse pruning
# ---------------------------------------------------------------------------


def test_build_ivf_layout(clustered):
    from legal_rag_tpu.ops.pq import build_ivf

    docs, _ = clustered
    cb = train_pq(docs, m=M, iters=10, seed=0)
    codes = encode_pq(docs, cb)
    ivf = build_ivf(docs, cb, codes, cell_size=128, iters=8, seed=0)
    n = len(docs)
    assert ivf.n_cells == -(-n // 128)
    assert ivf.codes.shape == (ivf.n_cells * 128, M)
    assert ivf.doc_ids.shape == (ivf.n_cells * 128,)
    # every real doc appears exactly once; padding only at the tail
    real = ivf.doc_ids[ivf.doc_ids >= 0]
    assert sorted(real.tolist()) == list(range(n))
    assert ivf.n_pad == ivf.n_cells * 128 - n
    if ivf.n_pad:
        assert (ivf.doc_ids[-ivf.n_pad:] < 0).all()
    # permuted codes rows match the original rows
    np.testing.assert_array_equal(ivf.codes[: n], codes[real[:n]])
    # cell centroids live in the scoring space and are finite
    assert np.isfinite(ivf.centroids).all()


def test_ivf_candidates_match_flat_on_clustered_corpus(clustered):
    """With clustered data, probing a fraction of cells must recover
    (nearly) the flat scan's PQ candidates — the whole point of IVF."""
    from legal_rag_tpu.ops.pq import build_ivf, pq_ivf_topk

    docs, queries = clustered
    queries = queries[:4]
    cb = train_pq(docs, m=M, iters=15, seed=0)
    codes = encode_pq(docs, cb)
    ivf = build_ivf(docs, cb, codes, cell_size=64, iters=10, seed=0)

    k = 10
    flat_s, flat_i = pq_topk(
        jnp.asarray(queries), jnp.asarray(codes),
        jnp.asarray(cb.codebooks), k, interpret=True,
    )
    # probes = 1/2 of the cells -> 2x read reduction; each query keeps
    # probes//Q = 4 guaranteed own cells
    probes = max(1, ivf.n_cells // 2)
    ivf_s, ivf_i = pq_ivf_topk(
        jnp.asarray(queries), ivf, cb.codebooks, k,
        probes=probes, interpret=True,
    )
    flat_i, ivf_i = np.asarray(flat_i), np.asarray(ivf_i)
    recall = np.mean([
        len(set(ivf_i[r]) & set(flat_i[r])) / k
        for r in range(len(queries))
    ])
    assert recall >= 0.9, recall
    # returned ids are valid and scores finite where id >= 0
    ivf_s = np.asarray(ivf_s)
    ok = ivf_i >= 0
    assert np.isfinite(ivf_s[ok]).all()
    assert (ivf_i[ok] < len(docs)).all()


def test_ivf_single_query_probes_are_its_own(clustered):
    """Q=1: the shared probe union degenerates to the query's exact
    top-`probes` cells — full scan equivalence when probes = n_cells."""
    from legal_rag_tpu.ops.pq import build_ivf, pq_ivf_topk

    docs, queries = clustered
    cb = train_pq(docs, m=M, iters=10, seed=0)
    codes = encode_pq(docs, cb)
    ivf = build_ivf(docs, cb, codes, cell_size=128, iters=8, seed=0)

    k = 10
    flat_s, flat_i = pq_topk(
        jnp.asarray(queries[:1]), jnp.asarray(codes),
        jnp.asarray(cb.codebooks), k, interpret=True,
    )
    ivf_s, ivf_i = pq_ivf_topk(
        jnp.asarray(queries[:1]), ivf, cb.codebooks, k,
        probes=ivf.n_cells, interpret=True,
    )
    # all cells probed == flat scan: identical candidate SET and scores
    assert set(np.asarray(ivf_i)[0].tolist()) == set(
        np.asarray(flat_i)[0].tolist()
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(ivf_s)[0]), np.sort(np.asarray(flat_s)[0]),
        rtol=1e-5,
    )


@pytest.mark.parametrize("n_shards", [1, 2, 4])
def test_sharded_ivf_full_probes_matches_flat_pq(clustered, n_shards):
    """probes = all cells => every shard scans everything it owns, so
    the sharded IVF program must equal the flat PQ program exactly."""
    from legal_rag_tpu.ops.pq import build_ivf
    from legal_rag_tpu.parallel.mesh import make_mesh
    from legal_rag_tpu.parallel.sharded import (
        ShardedIndex, sharded_hybrid_search,
    )

    docs, queries = clustered
    queries = queries[:4]
    cb = train_pq(docs, m=M, iters=10, seed=0)
    codes = encode_pq(docs, cb)
    ivf = build_ivf(docs, cb, codes, cell_size=128, iters=8, seed=0)

    rng = np.random.default_rng(5)
    pid = rng.integers(0, len(docs), (4, 16)).astype(np.int32)
    pw = rng.random((4, 16)).astype(np.float32)
    w = np.full(4, 0.5, np.float32)

    mesh = make_mesh(n_shards)
    flat = ShardedIndex.from_pq(codes, cb.codebooks, mesh)
    fr = sharded_hybrid_search(
        flat.docs, jnp.asarray(pid), jnp.asarray(pw),
        jnp.asarray(queries), jnp.asarray(w),
        pq_codebooks=flat.pq_codebooks,
        mesh=mesh, k=5, c=20, n_docs=len(docs), mode="weighted",
        sparse_mode="segsum",
    )
    ivf_idx = ShardedIndex.from_pq_ivf(ivf, cb.codebooks, mesh)
    assert ivf_idx.n_docs == len(docs)
    ir = sharded_hybrid_search(
        ivf_idx.docs, jnp.asarray(pid), jnp.asarray(pw),
        jnp.asarray(queries), jnp.asarray(w),
        pq_codebooks=ivf_idx.pq_codebooks,
        ivf_centroids=ivf_idx.ivf_centroids,
        ivf_doc_ids=ivf_idx.ivf_doc_ids,
        mesh=mesh, k=5, c=20, n_docs=len(docs), mode="weighted",
        ivf_probes=ivf.n_cells, ivf_cell_size=ivf.cell_size,
    )
    np.testing.assert_array_equal(np.asarray(fr[1]), np.asarray(ir[1]))
    np.testing.assert_allclose(
        np.asarray(fr[0]), np.asarray(ir[0]), rtol=1e-5, atol=1e-6
    )


def test_sharded_ivf_partial_probes_recall(clustered):
    """Partial probing keeps high overlap with the full scan on
    clustered data (the pruning contract), at every mesh width."""
    from legal_rag_tpu.ops.pq import build_ivf
    from legal_rag_tpu.parallel.mesh import make_mesh
    from legal_rag_tpu.parallel.sharded import (
        ShardedIndex, sharded_hybrid_search,
    )

    docs, queries = clustered
    queries = queries[:4]
    cb = train_pq(docs, m=M, iters=10, seed=0)
    codes = encode_pq(docs, cb)
    ivf = build_ivf(docs, cb, codes, cell_size=64, iters=10, seed=0)

    pid = np.zeros((4, 4), np.int32)
    pw = np.zeros((4, 4), np.float32)
    w = np.zeros(4, np.float32)       # dense-only fusion

    outs = {}
    for n_shards in (1, 2):
        mesh = make_mesh(n_shards)
        idx = ShardedIndex.from_pq_ivf(ivf, cb.codebooks, mesh)
        local_cells = -(-ivf.n_cells // n_shards)
        _, ids, _, _ = sharded_hybrid_search(
            idx.docs, jnp.asarray(pid), jnp.asarray(pw),
            jnp.asarray(queries), jnp.asarray(w),
            pq_codebooks=idx.pq_codebooks,
            ivf_centroids=idx.ivf_centroids,
            ivf_doc_ids=idx.ivf_doc_ids,
            mesh=mesh, k=5, c=20, n_docs=len(docs), mode="weighted",
            ivf_probes=max(1, local_cells // 2),
            ivf_cell_size=ivf.cell_size,
        )
        outs[n_shards] = np.asarray(ids)

    flat = ShardedIndex.from_pq(codes, cb.codebooks, make_mesh(1))
    _, gold, _, _ = sharded_hybrid_search(
        flat.docs, jnp.asarray(pid), jnp.asarray(pw),
        jnp.asarray(queries), jnp.asarray(w),
        pq_codebooks=flat.pq_codebooks,
        mesh=make_mesh(1), k=5, c=20, n_docs=len(docs),
        mode="weighted", sparse_mode="segsum",
    )
    gold = np.asarray(gold)
    for n_shards, ids in outs.items():
        recall = np.mean([
            len(set(ids[r]) & set(gold[r])) / 5 for r in range(4)
        ])
        assert recall >= 0.8, (n_shards, recall)


def test_ivf_store_roundtrip_and_engine(corpus_texts, tmp_path_factory):
    """build --pq-m --ivf-cell-size: IVF artifacts persist (centroids +
    permutation; cell codes derive from pq_codes at load), the engine
    auto-uses the IVF index, and with probes covering all cells results
    match the flat-PQ engine exactly."""
    import dataclasses as dc

    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    chunks = [
        {
            "text": t,
            "metadata": {"law": "TEST", "section": str(i),
                         "unit_type": "section"},
            "canonical_header": f"TEST Section {i}",
            "section_id": f"TEST_{i}",
        }
        for i, t in enumerate(corpus_texts)
    ]
    d = tmp_path_factory.mktemp("ivf_store")
    store = build_index(
        chunks, config=_tiny_cfg(), store_dir=d, pq_m=8, ivf_cell_size=8,
    )
    assert store.ivf_centroids is not None
    loaded = VectorStore.load(d)
    assert loaded.ivf_cell_size == 8
    ivf = loaded.ivf_index()
    assert ivf is not None
    np.testing.assert_array_equal(ivf.doc_ids, store.ivf_doc_ids)

    cfg = _tiny_cfg()
    n_cells = ivf.n_cells
    cfg_full = dc.replace(
        cfg, dense=dc.replace(cfg.dense, ivf_probes=n_cells)
    )
    eng_ivf = RetrievalEngine(loaded, config=cfg_full)
    assert eng_ivf.index.ivf_centroids is not None
    cfg_flat = dc.replace(cfg, dense=dc.replace(cfg.dense, use_ivf=False))
    eng_flat = RetrievalEngine(loaded, config=cfg_flat)
    assert eng_flat.index.ivf_centroids is None

    queries = [corpus_texts[3][:40], corpus_texts[11][:40]]
    r_ivf = eng_ivf.search_batch(queries, k=5)
    r_flat = eng_flat.search_batch(queries, k=5)
    for a, b in zip(r_ivf, r_flat):
        assert [x.doc_id for x in a] == [x.doc_id for x in b]
        np.testing.assert_allclose(
            [x.score for x in a], [x.score for x in b], rtol=1e-5,
        )
    # partial probing still returns valid, mostly-overlapping results
    cfg_part = dc.replace(
        cfg, dense=dc.replace(cfg.dense, ivf_probes=max(1, n_cells // 2))
    )
    eng_part = RetrievalEngine(loaded, config=cfg_part)
    r_part = eng_part.search_batch(queries, k=5)
    for a, b in zip(r_part, r_flat):
        ids_a = {x.doc_id for x in a}
        ids_b = {x.doc_id for x in b}
        assert len(ids_a & ids_b) >= 3


def test_ivf_empty_pad_cells_unselectable_for_negative_queries():
    """Empty mesh-pad cells must be unselectable BY IDS, not by a
    sentinel centroid value. Regression: the sharded layout used to
    fill pad centroids with -1e30, whose dot with any query of
    negative coordinate sum is +1e30 — pad cells then TOP-ranked the
    probe list and displaced real cells."""
    from legal_rag_tpu.ops.pq import (
        _pq_ivf_topk_impl, build_ivf, encode_pq, pq_topk, train_pq,
    )

    rng = np.random.default_rng(3)
    docs = rng.standard_normal((96, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    cb = train_pq(docs, m=M, iters=6, seed=0)
    codes = encode_pq(docs, cb)
    cs = 16
    ivf = build_ivf(docs, cb, codes, cell_size=cs, iters=6, seed=0)
    assert ivf.n_cells == 6

    # append two EMPTY pad cells with the adversarial legacy fill
    cents = np.vstack(
        [ivf.centroids, np.full((2, D), -1e30, np.float32)]
    )
    codes_p = np.vstack([ivf.codes, np.zeros((2 * cs, M), np.uint8)])
    ids_p = np.concatenate(
        [ivf.doc_ids, np.full(2 * cs, -1, np.int32)]
    )

    # all-negative queries -> negative coordinate sum -> q . (-1e30
    # * ones) is a huge POSITIVE score for the pad cells
    q = -np.abs(rng.standard_normal((2, D))).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    assert (q.sum(axis=1) < 0).all()

    k = 5
    s, i = _pq_ivf_topk_impl(
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(codes_p),
        jnp.asarray(ids_p), jnp.asarray(cb.codebooks),
        k, 6, cs, True,  # probes=6 == all REAL cells
    )
    i = np.asarray(i)
    assert (i >= 0).all(), "probe slots were wasted on empty pad cells"

    # with every real cell probed, results must equal the flat scan
    fs, fi = pq_topk(
        jnp.asarray(q), jnp.asarray(codes), cb.codebooks, k,
        interpret=True,
    )
    np.testing.assert_array_equal(np.sort(i, 1), np.sort(np.asarray(fi), 1))


def test_ivf_q_valid_excludes_padded_queries_from_probe_vote():
    """Serving pads the query batch to a stable trace shape; the padded
    rows' embeddings must not claim guaranteed cells or steer the
    shared probe set (q_valid masks their vote). Without the mask,
    high-magnitude pad rows displace real queries' cells from a tight
    probe budget — the failure this regression pins."""
    from legal_rag_tpu.ops.pq import _pq_ivf_topk_impl, encode_pq, pq_topk, train_pq

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((6, D)).astype(np.float32) * 4
    docs = np.concatenate([
        c + 0.05 * rng.standard_normal((16, D)).astype(np.float32)
        for c in centers
    ])
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    cb = train_pq(docs, m=M, iters=6, seed=0)
    codes = encode_pq(docs, cb)

    # manual cell layout = the true clusters (cell i holds docs
    # [16i, 16(i+1))) so the probe budget's behavior is deterministic
    cents = np.stack([docs[16 * i:16 * (i + 1)].mean(0) for i in range(6)])
    ids = np.arange(96, dtype=np.int32)

    # 2 real queries aimed at clusters 4/5; 2 "padding" rows aimed at
    # clusters 0/1. With probes=2 < Q=4 every row is guaranteed one own
    # cell but only two fit, and all picked cells tie at the +1e10 bias
    # (fp32 swallows the score), so the LOWEST-indexed picked cells win
    # — the pad rows' cells displace the real queries' whenever the pad
    # rows are allowed to vote
    q = np.stack([
        docs[64], docs[80], 3.0 * docs[0], 3.0 * docs[16],
    ]).astype(np.float32)
    args = (
        jnp.asarray(q), jnp.asarray(cents), jnp.asarray(codes),
        jnp.asarray(ids), jnp.asarray(cb.codebooks),
    )
    k, probes = 3, 2

    fs, fi = pq_topk(
        jnp.asarray(q[:2]), jnp.asarray(codes), cb.codebooks, k,
        interpret=True,
    )
    # sanity: with clean 4-sigma clusters each query's flat top-k stays
    # inside its own cluster, i.e. inside ONE cell
    assert (np.asarray(fi)[0] // 16 == 4).all()
    assert (np.asarray(fi)[1] // 16 == 5).all()

    # masked: the 2-cell budget probes exactly the real queries' cells
    # -> candidates match the flat PQ scan
    s_m, i_m = _pq_ivf_topk_impl(
        *args, k, probes, 16, True,
        q_valid=jnp.asarray([True, True, False, False]),
    )
    np.testing.assert_array_equal(np.asarray(i_m)[:2], np.asarray(fi))

    # unmasked: the pad rows' decoy cells win the budget and the real
    # queries lose their own cells (the bug the mask fixes)
    s_u, i_u = _pq_ivf_topk_impl(*args, k, probes, 16, True)
    assert not np.array_equal(np.asarray(i_u)[:2], np.asarray(fi))


def test_ivf_recovery_contract_defaults_pinned():
    """The measured 1M-clustered recovery contract
    (EVAL_IVF_RECOVERY.json: oversample 64 + probes 512 => post-rescore
    recall@10 >= 0.95) is encoded in defaults + docs: pq_oversample
    defaults to the contract value, and the DenseConfig source steers
    operators to the 512-probe pairing at clustered 1M+ scale."""
    import inspect

    from legal_rag_tpu.config import DenseConfig

    cfg = DenseConfig()
    assert cfg.pq_oversample == 64
    # ivf_probes defaults low for small/well-separated corpora; the
    # contract pairing must be documented at the definition site
    src = inspect.getsource(DenseConfig)
    assert "512" in src and "pq_oversample=64" in src
    assert "0.95" in src
