"""Multi-vector MaxSim retrieval: exact parity with a naive numpy
golden, masking semantics, and the encoder token-embedding path."""

import numpy as np
import jax.numpy as jnp
import pytest

from legal_rag_tpu.ops.maxsim import (
    MultiVectorIndex, maxsim_topk, minilm_token_embeddings,
)


def golden_maxsim(q_tokens, q_mask, doc_tokens, doc_mask):
    """Naive per-pair MaxSim."""
    q, tq, d = q_tokens.shape
    n, td, _ = doc_tokens.shape
    out = np.zeros((q, n))
    for qi in range(q):
        for ni in range(n):
            total = 0.0
            for i in range(tq):
                if not q_mask[qi, i]:
                    continue
                sims = [
                    float(q_tokens[qi, i] @ doc_tokens[ni, j])
                    for j in range(td) if doc_mask[ni, j]
                ]
                total += max(sims) if sims else 0.0
            out[qi, ni] = total
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n, td, tq, d = 300, 8, 5, 16
    doc_tokens = rng.standard_normal((n, td, d)).astype(np.float32)
    doc_mask = (rng.random((n, td)) > 0.3).astype(np.int32)
    doc_mask[:, 0] = 1                      # every doc has >= 1 token
    doc_tokens *= doc_mask[:, :, None]
    q_tokens = rng.standard_normal((3, tq, d)).astype(np.float32)
    q_mask = np.ones((3, tq), dtype=np.int32)
    q_mask[1, 3:] = 0                       # padded query
    return q_tokens, q_mask, doc_tokens, doc_mask


def test_maxsim_matches_golden(data):
    q_tokens, q_mask, doc_tokens, doc_mask = data
    golden = golden_maxsim(q_tokens, q_mask, doc_tokens, doc_mask)
    s, i = maxsim_topk(
        jnp.asarray(q_tokens), jnp.asarray(q_mask),
        jnp.asarray(doc_tokens), jnp.asarray(doc_mask),
        k=10, block_n=128,
    )
    gi = np.argsort(-golden.astype(np.float32), axis=1, kind="stable")[:, :10]
    np.testing.assert_array_equal(np.asarray(i), gi)
    np.testing.assert_allclose(
        np.asarray(s),
        np.take_along_axis(golden, gi, axis=1),
        rtol=1e-4, atol=1e-5,
    )


def test_duplicate_docs_tie_by_ascending_id(data):
    q_tokens, q_mask, doc_tokens, doc_mask = data
    # unit-normalize so a query equal to one of doc 7's tokens has its
    # max possible similarity (1.0) exactly at docs 7 and 200
    doc_tokens = doc_tokens / np.maximum(
        np.linalg.norm(doc_tokens, axis=-1, keepdims=True), 1e-9
    )
    doc_tokens *= doc_mask[:, :, None]
    doc_tokens = doc_tokens.copy()
    doc_tokens[7] = doc_tokens[200]         # duplicate docs
    doc_mask = doc_mask.copy()
    doc_mask[7] = doc_mask[200]
    query = doc_tokens[200, 0][None, None, :]
    s, i = maxsim_topk(
        jnp.asarray(query.astype(np.float32)),
        jnp.ones((1, 1), dtype=jnp.int32),
        jnp.asarray(doc_tokens), jnp.asarray(doc_mask),
        k=3, block_n=128,
    )
    ids = list(np.asarray(i)[0])
    # the duplicate pair tops the list, ordered by ascending id
    assert ids[:2] == [7, 200]
    np.testing.assert_allclose(np.asarray(s)[0][:2], 1.0, rtol=1e-5)


def test_index_packing_and_search():
    rng = np.random.default_rng(5)
    token_embeddings = [
        rng.standard_normal((int(rng.integers(1, 12)), 16)) for _ in range(50)
    ]
    idx = MultiVectorIndex.from_token_embeddings(
        token_embeddings, token_budget=8
    )
    assert idx.doc_tokens.shape == (50, 8, 16)
    # rows are unit-normalized where mask is set
    dt = np.asarray(idx.doc_tokens)
    dm = np.asarray(idx.doc_mask)
    norms = np.linalg.norm(dt[dm > 0], axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)

    q = rng.standard_normal((2, 4, 16)).astype(np.float32)
    s, i = idx.search(q, np.ones((2, 4), np.int32), k=5, block_n=32)
    assert np.asarray(i).shape == (2, 5)
    assert (np.asarray(i) < 50).all()


def test_minilm_token_embeddings_shape():
    from legal_rag_tpu.config import EncoderConfig
    from legal_rag_tpu.models.minilm import init_minilm_params

    cfg = EncoderConfig(
        vocab_size=100, hidden=32, layers=1, heads=4,
        intermediate=64, max_len=16,
    )
    params = init_minilm_params(cfg, seed=0)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 8)),
                      dtype=jnp.int32)
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    tok = minilm_token_embeddings(params, ids, mask, cfg)
    assert tok.shape == (2, 8, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(tok), axis=-1), 1.0, rtol=1e-5
    )


def test_multivector_searcher_end_to_end(corpus_texts):
    """Text in, ranked ids out: a document queried by its own exact
    text must rank itself first (late interaction self-match)."""
    from legal_rag_tpu.config import EncoderConfig
    from legal_rag_tpu.models.encoder import SentenceEncoder
    from legal_rag_tpu.ops.maxsim import MultiVectorSearcher

    texts = corpus_texts[:40]
    enc = SentenceEncoder(
        cfg=EncoderConfig(
            vocab_size=2000, hidden=32, layers=2, heads=4,
            intermediate=64, max_len=64,
        ),
        vocab_corpus=texts,
    )
    searcher = MultiVectorSearcher(texts, enc, token_budget=16, block_n=64)
    probe_ids = [0, 7, 23]
    scores, ids = searcher.search([texts[i] for i in probe_ids], k=3)
    for row, expected in zip(ids, probe_ids):
        assert row[0] == expected, (row, expected)
    assert scores.shape == (3, 3)


# ---------------------------------------------------------------------------
# Candidate-bounded rescore (round 4: the capacity-safe tier)
# ---------------------------------------------------------------------------


def test_maxsim_rescore_full_coverage_matches_topk(data):
    """With candidates covering the whole corpus, the bounded rescore
    must reproduce the full scan exactly (scores, ids, tie order)."""
    from legal_rag_tpu.ops.maxsim import maxsim_rescore

    q_tokens, q_mask, doc_tokens, doc_mask = data
    n = doc_tokens.shape[0]
    ref_s, ref_i = maxsim_topk(
        jnp.asarray(q_tokens), jnp.asarray(q_mask),
        jnp.asarray(doc_tokens), jnp.asarray(doc_mask),
        k=10, block_n=128,
    )
    cand = np.tile(np.arange(n, dtype=np.int32), (q_tokens.shape[0], 1))
    s, i = maxsim_rescore(
        jnp.asarray(q_tokens), jnp.asarray(q_mask),
        jnp.asarray(doc_tokens), jnp.asarray(doc_mask),
        jnp.asarray(cand), k=10,
    )
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(ref_s), rtol=1e-5, atol=1e-6
    )


def test_maxsim_rescore_invalid_candidates_sink(data):
    """Ids < 0, >= n_valid, and padding slots come last as (-inf, -1)."""
    from legal_rag_tpu.ops.maxsim import maxsim_rescore

    q_tokens, q_mask, doc_tokens, doc_mask = data
    golden = golden_maxsim(q_tokens, q_mask, doc_tokens, doc_mask)
    cand = np.array(
        [[5, -1, 17, 250, 299, 3],
         [0, 1, 2, -1, -1, -1],
         [299, 298, 297, 296, 295, 294]], dtype=np.int32,
    )
    s, i = maxsim_rescore(
        jnp.asarray(q_tokens), jnp.asarray(q_mask),
        jnp.asarray(doc_tokens), jnp.asarray(doc_mask),
        jnp.asarray(cand), k=6,
        n_valid=jnp.asarray(298, jnp.int32),   # 298, 299 invalid
    )
    s, i = np.asarray(s), np.asarray(i)
    # row 0: 299 invalid, -1 invalid -> 4 valid candidates
    row_valid = [c for c in cand[0] if 0 <= c < 298]
    expect = sorted(
        row_valid, key=lambda c: (-golden[0, c], c)
    )
    assert list(i[0, :4]) == expect
    assert list(i[0, 4:]) == [-1, -1]
    assert not np.isfinite(s[0, 4:]).any()
    # row 2: only 294-297 valid
    assert set(i[2][i[2] >= 0]) == {294, 295, 296, 297}
