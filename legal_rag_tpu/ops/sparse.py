"""Sparse (keyword) search: Okapi BM25 over CSR term postings.

TPU-native replacement for ``rank_bm25.BM25Okapi``
(reference create_vector_store.py:60-61, retrieval_engine.py:67-68).

Design
------
Build time (host, numpy): tokenize with the reference's tokenizer
(``text.lower().split()``), build a vocab, per-term document
frequencies, Okapi IDF with the epsilon floor for negative IDF, and —
the key trick — **precompute the full BM25 weight of every (term, doc)
pair**::

    w[t, d] = idf[t] * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avgdl))

Query-time scoring then degenerates to a *linear* operation: the score
of doc ``d`` for query ``q`` is the sum of ``w[t, d]`` over the query's
tokens (with multiplicity). The weights are stored as a CSR matrix
keyed by term (``indptr [V+1]``, ``doc_ids [nnz]``, ``weights [nnz]``).

Query time: the host resolves query tokens to term ids and gathers the
postings slices into one static-shape ``[Q, P]`` (doc_id, weight)
buffer (P = postings budget; pure index arithmetic, the same work a CPU
inverted index does). The device kernel is a batched scatter-add into a
``[Q, N]`` score accumulator followed by top-k — fully jittable, static
shapes, and the scatter rides XLA's native TPU scatter. Multi-chip:
doc_ids are global; each shard drops out-of-range ids (scatter mode
``drop``), scoring only its row range.

Exactness: scores equal rank_bm25's to float tolerance; tests pin this
against an independent straight-line implementation of the published
Okapi formula (tests/test_sparse.py).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def tokenize(text: str) -> List[str]:
    """The reference's BM25 tokenizer (create_vector_store.py:60):
    lowercase whitespace split, no stemming, no stopwords."""
    return text.lower().split()


@dataclasses.dataclass
class BM25Index:
    """CSR term-postings index with precomputed Okapi weights."""

    vocab: Dict[str, int]            # term -> term id
    indptr: np.ndarray               # [V+1] int64, postings row offsets
    doc_ids: np.ndarray              # [nnz] int32
    weights: np.ndarray              # [nnz] float32, precomputed BM25 weight
    idf: np.ndarray                  # [V] float32 (kept for introspection)
    doc_len: np.ndarray              # [N] int32
    n_docs: int
    avgdl: float
    k1: float
    b: float
    epsilon: float

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def query_term_ids(self, query: str) -> List[int]:
        """Token ids of a query, with multiplicity; unknown terms drop
        (they contribute zero in rank_bm25 as well)."""
        return [self.vocab[t] for t in tokenize(query) if t in self.vocab]

    def gather_postings(
        self, queries: Sequence[str], budget: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host-side postings gather for a query batch.

        Returns ``(doc_ids [Q, budget] int32, weights [Q, budget] f32)``
        padded with ``doc_id = n_docs`` (dropped by the device scatter).
        A query token appearing m times contributes its postings with
        weight scaled by m (BM25 query-term multiplicity).
        """
        q = len(queries)
        out_ids = np.full((q, budget), self.n_docs, dtype=np.int32)
        out_w = np.zeros((q, budget), dtype=np.float32)
        for qi, query in enumerate(queries):
            counts: Dict[int, int] = {}
            for t in self.query_term_ids(query):
                counts[t] = counts.get(t, 0) + 1
            if not counts:
                continue
            terms = np.fromiter(counts.keys(), np.int64, len(counts))
            mult = np.fromiter(counts.values(), np.float32, len(counts))
            starts = self.indptr[terms]
            lens = self.indptr[terms + 1] - starts
            total = int(lens.sum())
            if total == 0:
                continue
            # Segmented iota (vectorized — no per-term Python): flat
            # posting index p belongs to term seg[p]; its CSR offset is
            # start[seg] + (p - excl_cumsum[seg]).
            excl = np.cumsum(lens) - lens
            seg = np.repeat(np.arange(len(terms)), lens)
            idx = starts[seg] + np.arange(total, dtype=np.int64) - excl[seg]
            ids = self.doc_ids[idx]
            w = self.weights[idx] * mult[seg]
            if total > budget:
                # Budget overflow: impact-ordered truncation — keep the
                # globally highest-weight postings (low-IDF stopword
                # postings drop first), so a capped budget degrades
                # ranking as little as possible.
                keep = np.argpartition(-w, budget - 1)[:budget]
                ids, w = ids[keep], w[keep]
                total = budget
            out_ids[qi, :total] = ids
            out_w[qi, :total] = w
        return out_ids, out_w

    def query_term_meta(
        self, queries: Sequence[str], max_terms: Optional[int] = None
    ):
        """Host-side metadata for the DEVICE postings gather: per query
        term, its CSR row start, length, and multiplicity —
        ``(starts, lens, counts)`` each ``[Q, max_terms]`` int32. This
        is O(query terms) scalar work; the heavy postings movement then
        happens on-device (:func:`bm25_gather_postings_device`), which
        is the layout that scales when postings live in HBM.

        ``max_terms`` defaults to BM25Config.max_query_terms.
        """
        if max_terms is None:
            from legal_rag_tpu.config import BM25Config

            max_terms = BM25Config.max_query_terms
        q = len(queries)
        starts = np.zeros((q, max_terms), dtype=np.int32)
        lens = np.zeros((q, max_terms), dtype=np.int32)
        counts = np.zeros((q, max_terms), dtype=np.int32)
        for qi, query in enumerate(queries):
            agg: Dict[int, int] = {}
            for t in self.query_term_ids(query):
                agg[t] = agg.get(t, 0) + 1
            for slot, (t, c) in enumerate(agg.items()):
                if slot >= max_terms:
                    break
                starts[qi, slot] = self.indptr[t]
                lens[qi, slot] = self.indptr[t + 1] - self.indptr[t]
                counts[qi, slot] = c
        return starts, lens, counts

    def postings_budget(
        self, queries: Sequence[str], cap: Optional[int] = None
    ) -> int:
        """Smallest power-of-two budget covering the batch (bucketed so
        jit recompiles at most log2 times).

        ``cap`` (config: ``BM25Config.postings_budget_cap``) bounds the
        buffer: a stopword-dense query over a large corpus can demand
        millions of postings, and the cap trades that for the
        impact-ordered truncation in :meth:`gather_postings` — the
        recall effect is measured in scripts/bench_hybrid_scale.py.
        """
        worst = 1
        for query in queries:
            total = 0
            for t in set(self.query_term_ids(query)):
                total += int(self.indptr[t + 1] - self.indptr[t])
            worst = max(worst, total)
        budget = 1 << max(0, (worst - 1).bit_length())
        if cap is not None:
            cap_p2 = 1 << max(0, (int(cap) - 1).bit_length())
            budget = min(budget, cap_p2)
        return budget


def build_bm25(
    corpus: Sequence[str],
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> BM25Index:
    """Build the CSR BM25 index from raw chunk texts.

    IDF follows BM25Okapi: ``ln((N - df + 0.5) / (df + 0.5))`` with
    negative values floored to ``epsilon * mean(idf)`` (the mean taken
    over the raw, pre-floor IDFs of the whole vocab).
    """
    tokenized = [tokenize(t) for t in corpus]
    n_docs = len(tokenized)
    doc_len = np.array([len(t) for t in tokenized], dtype=np.int32)
    avgdl = float(doc_len.sum()) / max(n_docs, 1)

    vocab: Dict[str, int] = {}
    # per-term dict of doc -> tf
    postings_tf: List[Dict[int, int]] = []
    for d, toks in enumerate(tokenized):
        for tok in toks:
            tid = vocab.get(tok)
            if tid is None:
                tid = len(vocab)
                vocab[tok] = tid
                postings_tf.append({})
            tf_map = postings_tf[tid]
            tf_map[d] = tf_map.get(d, 0) + 1

    v = len(vocab)
    df = np.array([len(p) for p in postings_tf], dtype=np.int64)
    raw_idf = np.log(n_docs - df + 0.5) - np.log(df + 0.5)
    avg_idf = float(raw_idf.mean()) if v else 0.0
    idf = np.where(raw_idf < 0, epsilon * avg_idf, raw_idf).astype(np.float32)

    indptr = np.zeros(v + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(df)
    nnz = int(indptr[-1])
    doc_ids = np.empty(nnz, dtype=np.int32)
    weights = np.empty(nnz, dtype=np.float32)
    norm_denom = k1 * (1.0 - b + b * doc_len / max(avgdl, 1e-9))
    for tid, tf_map in enumerate(postings_tf):
        lo = int(indptr[tid])
        # dict preserves insertion order = ascending doc id (docs are
        # scanned in order), so postings are sorted by doc id.
        for off, (d, tf) in enumerate(tf_map.items()):
            doc_ids[lo + off] = d
            weights[lo + off] = idf[tid] * tf * (k1 + 1.0) / (tf + norm_denom[d])

    return BM25Index(
        vocab=vocab,
        indptr=indptr,
        doc_ids=doc_ids,
        weights=weights,
        idf=idf,
        doc_len=doc_len,
        n_docs=n_docs,
        avgdl=avgdl,
        k1=k1,
        b=b,
        epsilon=epsilon,
    )


# ---------------------------------------------------------------------------
# Device-side postings gather
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("budget",))
def bm25_gather_postings_device(
    starts: jax.Array,     # [Q, T] CSR row starts per query term
    lens: jax.Array,       # [Q, T] postings lengths
    counts: jax.Array,     # [Q, T] query-term multiplicities
    doc_ids: jax.Array,    # [nnz] device-resident postings
    weights: jax.Array,    # [nnz]
    budget: int,           # static output width P
):
    """Build the ``[Q, P]`` (doc_id, weight) postings batch ON DEVICE.

    The host only ships the tiny ``[Q, T]`` term metadata; the actual
    postings (potentially hundreds of MB, HBM-resident) are flattened
    with a segmented-iota: output slot ``p`` belongs to the term whose
    cumulative output range covers ``p``; its posting index is
    ``start[term] + (p - out_offset[term])``. Everything is dense VPU
    arithmetic + two big gathers — no host postings traffic, no scatter.

    Slots past a query's total postings get ``doc_id = -1`` / weight 0
    (dropped by the scoring scatter / shard remap).
    """
    q, t = starts.shape
    out_offs = jnp.cumsum(lens, axis=1) - lens            # exclusive [Q, T]
    total = jnp.sum(lens, axis=1)                         # [Q]

    p = jnp.arange(budget, dtype=jnp.int32)[None, :]      # [1, P]
    # term owning slot p: (# terms with out_off <= p) - 1
    term_idx = (
        jnp.sum(out_offs[:, :, None] <= p[:, None, :], axis=1) - 1
    ).astype(jnp.int32)                                   # [Q, P]
    term_idx = jnp.clip(term_idx, 0, t - 1)

    take = lambda m: jnp.take_along_axis(m, term_idx, axis=1)
    within = p - take(out_offs)
    idx = take(starts) + within
    valid = (p < total[:, None]) & (within < take(lens))

    idx = jnp.where(valid, idx, 0)
    post_ids = jnp.where(valid, doc_ids[idx], -1)
    post_w = jnp.where(
        valid, weights[idx] * take(counts).astype(jnp.float32), 0.0
    )
    return post_ids.astype(jnp.int32), post_w


# ---------------------------------------------------------------------------
# Device-side scoring
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_docs",))
def bm25_score_batch(
    post_ids: jax.Array, post_w: jax.Array, n_docs: int
) -> jax.Array:
    """Batched scatter-add scoring: ``[Q, P]`` postings -> ``[Q, N]``
    dense scores (what ``bm25.get_scores`` returns per query,
    reference retrieval_engine.py:68). Padding ids ``>= n_docs`` drop.
    """
    q = post_ids.shape[0]
    # negative indices WRAP under jnp scatter even with mode="drop"
    # (normalization precedes the bounds check) — remap every
    # out-of-range id to n_docs, which genuinely drops
    post_ids = jnp.where(
        (post_ids >= 0) & (post_ids < n_docs), post_ids, n_docs
    )
    scores = jnp.zeros((q, n_docs), dtype=jnp.float32)
    return scores.at[
        jnp.arange(q, dtype=jnp.int32)[:, None], post_ids
    ].add(post_w, mode="drop")


@functools.partial(jax.jit, static_argnames=("n_docs", "k"))
def bm25_topk(
    post_ids: jax.Array, post_w: jax.Array, n_docs: int, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Scatter-add scoring fused with top-k selection."""
    scores = bm25_score_batch(post_ids, post_w, n_docs)
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)
