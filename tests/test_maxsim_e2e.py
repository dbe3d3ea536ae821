"""Late-interaction tier end-to-end (VERDICT r2 item 3): multi-vector
artifacts persist through the store, the sharded MaxSim program is
bit-identical across mesh shapes and matches the unsharded kernel, the
engine serves mode='maxsim', and the eval harness scores it."""

import numpy as np
import jax.numpy as jnp
import pytest

from legal_rag_tpu.config import (
    RetrievalConfig, EncoderConfig, ShardingConfig,
)
from legal_rag_tpu.index.builder import build_index
from legal_rag_tpu.index.store import VectorStore
from legal_rag_tpu.ops.maxsim import maxsim_topk
from legal_rag_tpu.parallel.mesh import make_mesh
from legal_rag_tpu.parallel.sharded import (
    ShardedMultiVectorIndex, sharded_maxsim_topk,
)
from legal_rag_tpu.retrieval.engine import RetrievalEngine

TINY_CFG = RetrievalConfig(
    encoder=EncoderConfig(
        vocab_size=4000, hidden=32, layers=2, heads=4,
        intermediate=64, max_len=64, encode_batch=16,
    ),
    sharding=ShardingConfig(num_shards=4),
)
TD = 12


@pytest.fixture(scope="module")
def mv_chunks(corpus_texts):
    return [
        {
            "text": t,
            "metadata": {
                "law": "TEST", "section": str(i), "unit_type": "section",
            },
            "canonical_header": f"TEST Section {i}",
            "section_id": f"TEST_{i}",
        }
        for i, t in enumerate(corpus_texts)
    ]


@pytest.fixture(scope="module")
def mv_store(mv_chunks):
    return build_index(mv_chunks, config=TINY_CFG, multi_vector=TD)


def test_builder_emits_token_artifacts(mv_store):
    assert mv_store.mv_tokens is not None
    n, td, d = mv_store.mv_tokens.shape
    assert (n, td, d) == (mv_store.n_docs, TD, mv_store.dim)
    assert mv_store.mv_tokens.dtype == np.float16
    assert mv_store.mv_mask.shape == (n, td)
    # real tokens are unit-normalized (f16 rounding tolerance)
    toks = np.asarray(mv_store.mv_tokens, np.float32)
    mask = np.asarray(mv_store.mv_mask) > 0
    norms = np.linalg.norm(toks[mask], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=5e-3)
    assert mask[:, 0].all()       # every chunk has at least one token


def test_store_roundtrip_preserves_mv(mv_store, tmp_path_factory):
    d = tmp_path_factory.mktemp("mv_store")
    manifest = mv_store.save(d)
    assert "mv_tokens.npy" in manifest["artifacts"]
    loaded = VectorStore.load(d)
    np.testing.assert_array_equal(loaded.mv_tokens, mv_store.mv_tokens)
    np.testing.assert_array_equal(loaded.mv_mask, mv_store.mv_mask)


def test_sharded_matches_unsharded_and_mesh_shapes(mv_store):
    """The collective merge is exact: 1-, 4- and 8-shard meshes return
    bit-identical (score desc, id asc) results matching the plain
    kernel."""
    toks = np.asarray(mv_store.mv_tokens, np.float32)
    mask = np.asarray(mv_store.mv_mask, np.int32)
    rng = np.random.default_rng(7)
    q = rng.standard_normal((4, 6, mv_store.dim)).astype(np.float32)
    qm = np.ones((4, 6), np.int32)
    qm[2, 3:] = 0

    ref_s, ref_i = maxsim_topk(
        jnp.asarray(q), jnp.asarray(qm),
        jnp.asarray(toks), jnp.asarray(mask), k=7, block_n=64,
    )
    for n_dev in (1, 4, 8):
        idx = ShardedMultiVectorIndex.from_arrays(
            toks, mask, make_mesh(n_dev), dtype="float32"
        )
        s, i = idx.search(q, qm, k=7, block_n=64)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(ref_s), rtol=1e-5, atol=1e-6
        )


def test_sharded_padding_never_wins():
    """Last-shard zero padding (all-pad-token score 0.0) must not evict
    real negative-scoring docs."""
    rng = np.random.default_rng(11)
    n, td, d = 13, 4, 8          # 13 docs over 8 shards -> 3 pad rows
    toks = rng.standard_normal((n, td, d)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    mask = np.ones((n, td), np.int32)
    # query anti-aligned with every doc -> all real scores negative
    q = -toks[0, :1][None]        # [1, 1, d]
    qm = np.ones((1, 1), np.int32)
    idx = ShardedMultiVectorIndex.from_arrays(
        toks, mask, make_mesh(8), dtype="float32"
    )
    s, i = idx.search(q, qm, k=n, block_n=8)
    ids = np.asarray(i)[0]
    assert set(ids) == set(range(n))            # every real doc, no pads
    assert np.isfinite(np.asarray(s)[0]).all()


def test_engine_maxsim_mode_self_retrieval(mv_store, corpus_texts):
    engine = RetrievalEngine(mv_store, config=TINY_CFG)
    probe = [10, 33, 61]
    rows = engine.search_batch(
        [corpus_texts[i] for i in probe], k=3, mode="maxsim"
    )
    for row, expected in zip(rows, probe):
        assert row, "maxsim mode returned no results"
        assert row[0].doc_id == expected
        assert row[0].keyword == 0.0            # no sparse side


def test_engine_maxsim_without_artifacts_raises(corpus_texts):
    store = build_index(
        [
            {"text": t, "metadata": {}, "canonical_header": str(i),
             "section_id": None}
            for i, t in enumerate(corpus_texts[:16])
        ],
        config=TINY_CFG,
    )
    engine = RetrievalEngine(store, config=TINY_CFG)
    with pytest.raises(ValueError, match="multi-vector"):
        engine.search_batch(["anything"], k=3, mode="maxsim")


def test_evaluate_store_scores_maxsim(mv_store):
    from legal_rag_tpu.evaluation import evaluate_store

    pairs = [(mv_store.chunks[i]["text"], [i]) for i in (2, 19, 40)]
    report = evaluate_store(
        mv_store, pairs, ks=(1, 5), modes=("dense", "maxsim"),
        config=TINY_CFG,
    )
    mx = report["modes"]["maxsim"]
    # exact self-text queries: late interaction must nail recall@1
    assert mx["recall@1"] == 1.0


# ---------------------------------------------------------------------------
# Dense-first rerank tier (round 4: bounded slab reads)
# ---------------------------------------------------------------------------


def test_sharded_rerank_full_c_matches_full_scan(mv_store):
    """With c covering every shard-local doc, dense-first MaxSim must
    equal the full scan exactly, bit-identical across mesh shapes."""
    from legal_rag_tpu.parallel.sharded import ShardedIndex

    toks = np.asarray(mv_store.mv_tokens, np.float32)
    mask = np.asarray(mv_store.mv_mask, np.int32)
    emb = np.asarray(mv_store.embeddings, np.float32)
    n = mv_store.n_docs
    rng = np.random.default_rng(17)
    q_emb = emb[[3, 50, 70, 11]] + 0.01 * rng.standard_normal(
        (4, mv_store.dim)
    ).astype(np.float32)
    q = rng.standard_normal((4, 6, mv_store.dim)).astype(np.float32)
    qm = np.ones((4, 6), np.int32)

    ref_s, ref_i = maxsim_topk(
        jnp.asarray(q), jnp.asarray(qm),
        jnp.asarray(toks), jnp.asarray(mask), k=7, block_n=64,
    )
    for n_dev in (1, 4, 8):
        mesh = make_mesh(n_dev)
        sidx = ShardedIndex.from_embeddings(emb, mesh, dtype="float32")
        midx = ShardedMultiVectorIndex.from_arrays(
            toks, mask, mesh, dtype="float32",
            n_pad=int(sidx.docs.shape[0]),
        )
        s, i = midx.rerank_search(
            sidx, q_emb, q, qm, k=7, c=n,  # full local coverage
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(s), np.asarray(ref_s), rtol=1e-5, atol=1e-6
        )


def test_engine_maxsim_rerank_self_retrieval(mv_store, corpus_texts):
    engine = RetrievalEngine(mv_store, config=TINY_CFG)
    probe = [10, 33, 61]
    rows = engine.search_batch(
        [corpus_texts[i] for i in probe], k=3, mode="maxsim-rerank"
    )
    for row, expected in zip(rows, probe):
        assert row, "maxsim-rerank mode returned no results"
        assert row[0].doc_id == expected
        assert row[0].keyword == 0.0            # no sparse side


def test_maxsim_2d_mesh_matches_1d(mv_store):
    """Both late-interaction programs on a 2-D (data x shard) mesh are
    bit-identical to the 1-D program (same contract as the hybrid)."""
    from legal_rag_tpu.parallel.mesh import make_mesh_2d
    from legal_rag_tpu.parallel.sharded import (
        ShardedIndex, sharded_maxsim_topk, sharded_maxsim_rerank_topk,
    )

    toks = np.asarray(mv_store.mv_tokens, np.float32)
    mask = np.asarray(mv_store.mv_mask, np.int32)
    emb = np.asarray(mv_store.embeddings, np.float32)
    rng = np.random.default_rng(23)
    q = rng.standard_normal((8, 6, mv_store.dim)).astype(np.float32)
    qm = np.ones((8, 6), np.int32)
    q_emb = emb[[1, 9, 17, 25, 33, 41, 49, 57]]

    mesh1 = make_mesh(4)
    idx1 = ShardedMultiVectorIndex.from_arrays(
        toks, mask, mesh1, dtype="float32"
    )
    s1, i1 = idx1.search(q, qm, k=5, block_n=64)

    mesh2 = make_mesh_2d(2, 4)
    idx2 = ShardedMultiVectorIndex.from_arrays(
        toks, mask, mesh2, dtype="float32"
    )
    s2, i2 = sharded_maxsim_topk(
        idx2.doc_tokens, idx2.doc_mask,
        jnp.asarray(q), jnp.asarray(qm),
        mesh=mesh2, k=5, n_docs=mv_store.n_docs, block_n=64,
        data_axis="data",
    )
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(s2), np.asarray(s1), rtol=1e-5, atol=1e-6
    )

    # dense-first rerank, full local coverage: 2-D == 1-D == full scan
    sidx1 = ShardedIndex.from_embeddings(emb, mesh1, dtype="float32")
    midx1 = ShardedMultiVectorIndex.from_arrays(
        toks, mask, mesh1, dtype="float32",
        n_pad=int(sidx1.docs.shape[0]),
    )
    r1s, r1i = midx1.rerank_search(
        sidx1, q_emb, q, qm, k=5, c=mv_store.n_docs,
    )
    sidx2 = ShardedIndex.from_embeddings(emb, mesh2, dtype="float32")
    midx2 = ShardedMultiVectorIndex.from_arrays(
        toks, mask, mesh2, dtype="float32",
        n_pad=int(sidx2.docs.shape[0]),
    )
    r2s, r2i = sharded_maxsim_rerank_topk(
        sidx2.docs, midx2.doc_tokens, midx2.doc_mask,
        jnp.asarray(q_emb), jnp.asarray(q, np.float32), jnp.asarray(qm),
        mesh=mesh2, k=5, c=mv_store.n_docs, n_docs=mv_store.n_docs,
        data_axis="data",
    )
    np.testing.assert_array_equal(np.asarray(r2i), np.asarray(r1i))
    np.testing.assert_allclose(
        np.asarray(r2s), np.asarray(r1s), rtol=1e-5, atol=1e-6
    )


def test_shared_forward_pooled_matches_encode(mv_store):
    """ADVICE r4: maxsim-rerank's dense candidate stage uses the pooled
    view from the Td-truncated shared forward (_encode_query_tokens)
    instead of SentenceEncoder.encode's full-length pass. For queries
    within the Td budget the two must agree to numerical precision;
    for longer queries the truncation drift must stay bounded (the
    pooled view mean-pools fewer tokens, but both are unit vectors
    over the same leading tokens)."""
    engine = RetrievalEngine(mv_store, config=TINY_CFG)

    short = [
        "first words", "theft of property", "a b c", "short query text",
    ]
    _, _, pooled = engine._encode_query_tokens(short)
    full = engine.encoder.encode(short)
    cos_short = np.sum(np.asarray(pooled) * full, axis=1)
    # identical tokens, identical forward, identical pooling -> equal
    np.testing.assert_allclose(cos_short, 1.0, atol=1e-5)

    # a query longer than Td=12 tokens: truncated pooled view drifts,
    # but stays strongly aligned with the full-length embedding (the
    # truncated tokens are the query's own prefix, not noise)
    long_q = [" ".join(f"word{i}" for i in range(30))]
    _, _, pooled_l = engine._encode_query_tokens(long_q)
    full_l = engine.encoder.encode(long_q)
    cos_long = float(np.sum(np.asarray(pooled_l) * full_l))
    assert cos_long > 0.5, cos_long  # bounded drift, not equality
