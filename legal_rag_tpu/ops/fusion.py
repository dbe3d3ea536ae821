"""On-device hybrid fusion of dense and sparse rankings.

Two modes:

- :func:`weighted_fusion` reproduces the reference's semantics exactly
  (retrieval_engine.py:71-96): only the dense candidates are scored;
  BM25 scores are max-normalized over the *whole corpus*; fused score
  is ``sem * (1 - w) + bm25_norm * w``; ties keep dense-candidate
  order (the reference's stable Python sort).
- :func:`rrf_fusion` is the framework-native mode (the reference's
  README advertises RRF but never implements it): both candidate lists
  contribute ``1 / (rrf_k + rank)``, duplicates merge by sum, so
  BM25-only hits can surface — fixing the reference's blind spot where
  keyword-only matches can never enter results.

Both run fully on device with static shapes and are jit/shard-safe.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def weighted_fusion(
    dense_scores: jax.Array,   # [Q, C] candidate inner products
    dense_ids: jax.Array,      # [Q, C] candidate doc ids
    bm25_scores: jax.Array,    # [Q, N] full-corpus BM25 scores
    weight: jax.Array,         # [Q] or scalar hybrid weight
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Reference-parity weighted fusion over dense candidates only.

    Returns ``(fused [Q,k], ids [Q,k], sem [Q,k], bm25n [Q,k])`` — the
    per-result semantic and normalized-keyword components the reference
    surfaces as ``semantic``/``keyword`` (retrieval_engine.py:86-91).
    """
    weight = jnp.broadcast_to(jnp.asarray(weight, jnp.float32), dense_scores.shape[:1])
    max_bm25 = jnp.max(bm25_scores, axis=1, keepdims=True)
    max_bm25 = jnp.where(max_bm25 > 0, max_bm25, 1.0)  # reference :74
    bm25_norm = bm25_scores / max_bm25

    q_idx = jnp.arange(dense_ids.shape[0], dtype=jnp.int32)[:, None]
    cand_bm25 = bm25_norm[q_idx, dense_ids]            # [Q, C]
    w = weight[:, None]
    fused = dense_scores * (1.0 - w) + cand_bm25 * w

    # top_k keeps first occurrence on ties = dense candidate order,
    # matching the reference's stable sort.
    top_f, pos = jax.lax.top_k(fused, k)
    ids = jnp.take_along_axis(dense_ids, pos, axis=1)
    sem = jnp.take_along_axis(dense_scores, pos, axis=1)
    bmn = jnp.take_along_axis(cand_bm25, pos, axis=1)
    return top_f, ids.astype(jnp.int32), sem, bmn


@functools.partial(jax.jit, static_argnames=("k", "rrf_k", "n_valid"))
def rrf_fusion(
    dense_ids: jax.Array,      # [Q, C] dense candidates, rank order
    sparse_ids: jax.Array,     # [Q, C] sparse candidates, rank order
    k: int,
    rrf_k: int = 60,
    n_valid: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Reciprocal Rank Fusion of two ranked id lists, on device.

    score(d) = sum over lists of 1 / (rrf_k + rank_d), 1-based ranks.
    Duplicate ids across lists merge by sorting the concatenated ids
    and segment-summing adjacent equal ids — no host round-trip, no
    dynamic shapes. Returns ``(rrf_scores [Q,k], ids [Q,k])``.

    ``n_valid``: ids outside ``[0, n_valid)`` are padding (short
    candidate lists, corpus smaller than C) — they earn zero RRF mass
    and sort behind every real doc, so a query never loses a real
    tail doc to a pad slot.
    """
    q, c = dense_ids.shape
    ranks = jnp.arange(1, c + 1, dtype=jnp.float32)
    contrib = 1.0 / (rrf_k + ranks)                    # [C]

    all_ids = jnp.concatenate([dense_ids, sparse_ids], axis=1)       # [Q, 2C]
    all_scores = jnp.concatenate(
        [jnp.broadcast_to(contrib, (q, c))] * 2, axis=1
    )
    if n_valid is not None:
        invalid = (all_ids < 0) | (all_ids >= n_valid)
        all_scores = jnp.where(invalid, 0.0, all_scores)

    # Sort by id so duplicates are adjacent.
    order = jnp.argsort(all_ids, axis=1)
    sid = jnp.take_along_axis(all_ids, order, axis=1)
    ssc = jnp.take_along_axis(all_scores, order, axis=1)

    # Right-to-left inclusive suffix tricks are overkill at 2C entries:
    # an id appears at most twice (once per list), so merging is just
    # "add the right neighbour if it has the same id, then keep the
    # leftmost of each equal run".
    same_right = jnp.concatenate(
        [sid[:, :-1] == sid[:, 1:], jnp.zeros((q, 1), dtype=bool)], axis=1
    )
    same_left = jnp.concatenate(
        [jnp.zeros((q, 1), dtype=bool), sid[:, 1:] == sid[:, :-1]], axis=1
    )
    merged = ssc + jnp.where(
        same_right, jnp.roll(ssc, -1, axis=1), 0.0
    )
    merged = jnp.where(same_left, -jnp.inf, merged)    # drop duplicate slot
    if n_valid is not None:
        merged = jnp.where(
            (sid < 0) | (sid >= n_valid), -jnp.inf, merged
        )

    top_s, pos = jax.lax.top_k(merged, k)
    ids = jnp.take_along_axis(sid, pos, axis=1)
    return top_s, ids.astype(jnp.int32)
