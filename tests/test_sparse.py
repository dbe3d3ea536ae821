"""BM25 parity: the CSR build + device scoring must reproduce the Okapi
BM25 formula exactly as rank_bm25.BM25Okapi computes it (the golden here
is an independent straight-line implementation of that algorithm —
per-token IDF with the epsilon floor, per-doc length normalization)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from legal_rag_tpu.ops.sparse import (
    BM25Index,
    build_bm25,
    bm25_score_batch,
    bm25_topk,
    tokenize,
)


def golden_bm25_scores(corpus, query, k1=1.5, b=0.75, epsilon=0.25):
    """Naive per-doc Okapi BM25, mirroring rank_bm25.BM25Okapi semantics:
    idf = ln(N - df + .5) - ln(df + .5), negatives floored to
    epsilon * mean(raw idf); query tokens scored with multiplicity."""
    docs = [tokenize(t) for t in corpus]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    df = {}
    for d in docs:
        for t in set(d):
            df[t] = df.get(t, 0) + 1
    raw = {t: math.log(n - f + 0.5) - math.log(f + 0.5) for t, f in df.items()}
    avg_idf = sum(raw.values()) / len(raw)
    idf = {t: (v if v >= 0 else epsilon * avg_idf) for t, v in raw.items()}

    scores = np.zeros(n)
    for tok in tokenize(query):
        if tok not in idf:
            continue
        for d_i, d in enumerate(docs):
            tf = d.count(tok)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * len(d) / avgdl)
            scores[d_i] += idf[tok] * tf * (k1 + 1) / denom
    return scores


QUERIES = [
    "the police fir",
    "w1 w2 w3",
    "w5 w5 w5",          # multiplicity
    "unknownterm police",  # OOV token drops
    "w100",
]


@pytest.fixture(scope="module")
def index(corpus_texts):
    return build_bm25(corpus_texts)


def test_build_stats(index, corpus_texts):
    assert index.n_docs == len(corpus_texts)
    total_tokens = sum(len(tokenize(t)) for t in corpus_texts)
    assert int(index.doc_len.sum()) == total_tokens
    assert index.indptr[-1] == len(index.doc_ids)
    # postings sorted by doc id within each term row
    for t in range(index.vocab_size):
        lo, hi = index.indptr[t], index.indptr[t + 1]
        row = index.doc_ids[lo:hi]
        assert (np.diff(row) > 0).all()


@pytest.mark.parametrize("query", QUERIES)
def test_scores_match_golden(index, corpus_texts, query):
    golden = golden_bm25_scores(corpus_texts, query)
    budget = index.postings_budget([query])
    ids, w = index.gather_postings([query], budget)
    scores = np.asarray(bm25_score_batch(jnp.asarray(ids), jnp.asarray(w), index.n_docs))[0]
    np.testing.assert_allclose(scores, golden, rtol=1e-5, atol=1e-6)


def test_batched_scoring_matches_per_query(index, corpus_texts):
    budget = index.postings_budget(QUERIES)
    ids, w = index.gather_postings(QUERIES, budget)
    batch = np.asarray(bm25_score_batch(jnp.asarray(ids), jnp.asarray(w), index.n_docs))
    for qi, query in enumerate(QUERIES):
        np.testing.assert_allclose(
            batch[qi], golden_bm25_scores(corpus_texts, query),
            rtol=1e-5, atol=1e-6,
        )


def test_topk_ranks_match_golden(index, corpus_texts):
    query = "the police fir w1"
    golden = golden_bm25_scores(corpus_texts, query)
    gi = np.argsort(-golden.astype(np.float32), kind="stable")[:10]
    budget = index.postings_budget([query])
    ids, w = index.gather_postings([query], budget)
    s, i = bm25_topk(jnp.asarray(ids), jnp.asarray(w), index.n_docs, 10)
    np.testing.assert_array_equal(np.asarray(i)[0], gi)


def test_empty_query_scores_zero(index):
    ids, w = index.gather_postings(["zzz qqq"], 8)
    scores = np.asarray(bm25_score_batch(jnp.asarray(ids), jnp.asarray(w), index.n_docs))
    assert (scores == 0).all()


def test_reference_corpus_parity(index, reference_chunks):
    """Full-scale check on the real 2,620-chunk legal corpus."""
    corpus = [c["text"] for c in reference_chunks]
    idx = build_bm25(corpus)
    assert idx.n_docs == len(corpus)
    query = "What is the punishment for robbery under BNS?"
    golden = golden_bm25_scores(corpus, query.lower())
    budget = idx.postings_budget([query])
    ids, w = idx.gather_postings([query], budget)
    scores = np.asarray(bm25_score_batch(jnp.asarray(ids), jnp.asarray(w), idx.n_docs))[0]
    np.testing.assert_allclose(scores, golden, rtol=1e-4, atol=1e-5)


def test_budget_cap_rounds_to_pow2(index):
    query = "the police fir w1"
    full = index.postings_budget([query])
    assert index.postings_budget([query], cap=None) == full
    # a cap below the need wins (rounded up to a power of two)
    assert index.postings_budget([query], cap=3) == 4
    # a cap above the need leaves the budget alone
    assert index.postings_budget([query], cap=10 * full) == full


def test_truncated_gather_keeps_highest_impact_postings(index):
    """Over-budget gather must keep the globally highest-weight postings
    (impact-ordered truncation) and still score those docs exactly."""
    query = "the police fir w1"
    full_budget = index.postings_budget([query])
    ids_f, w_f = index.gather_postings([query], full_budget)
    valid_f = ids_f[0] < index.n_docs
    full = sorted(
        zip(w_f[0][valid_f], ids_f[0][valid_f]), reverse=True
    )
    budget = 4
    assert budget < len(full)
    ids_t, w_t = index.gather_postings([query], budget)
    valid_t = ids_t[0] < index.n_docs
    kept = sorted(zip(w_t[0][valid_t], ids_t[0][valid_t]), reverse=True)
    # exactly the top-`budget` postings by weight survive
    np.testing.assert_allclose(
        [w for w, _ in kept], [w for w, _ in full[:budget]], rtol=1e-6
    )


def test_gather_with_term_multiplicity_exact(index, corpus_texts):
    """Repeated query terms scale their postings by multiplicity; the
    vectorized gather must reproduce golden scores exactly."""
    query = "police police the fir"
    golden = golden_bm25_scores(corpus_texts, query)
    budget = index.postings_budget([query])
    ids, w = index.gather_postings([query], budget)
    scores = np.asarray(
        bm25_score_batch(jnp.asarray(ids), jnp.asarray(w), index.n_docs)
    )[0]
    np.testing.assert_allclose(scores, golden, rtol=1e-5, atol=1e-6)
