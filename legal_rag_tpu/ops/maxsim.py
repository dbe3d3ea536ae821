"""Multi-vector late-interaction retrieval (ColBERT-style MaxSim).

A capability beyond the reference (single-vector only), motivated by
the retrieved IO-aware MaxSim kernel literature (PAPERS.md:
FLASH-MAXSIM, TileMaxSim — patterns only): score a query against a
document as the sum over query tokens of the best-matching document
token similarity::

    MaxSim(q, d) = sum_i  max_j  <q_i, d_j>

Late interaction is a perfect MXU workload: the token-similarity
tensor is one big matmul, and the max/sum reductions fuse behind it.
The implementation blocks over documents (``lax.map``) so the
``[Q, Tq, N, Td]`` similarity tensor never materializes beyond one
block — memory is O(block * Tq * Td) regardless of corpus size.

Index layout: ``doc_tokens [N, Td, D]`` (fixed token budget per doc,
zero-padded) + ``doc_mask [N, Td]``. Padding tokens mask to -inf
inside the max (a zero vector's similarity of 0 could otherwise beat
legitimate negative similarities); docs with no tokens score 0.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("k", "block_n", "precision")
)
def maxsim_topk(
    q_tokens: jax.Array,    # [Q, Tq, D] query token embeddings
    q_mask: jax.Array,      # [Q, Tq] 1 = real token
    doc_tokens: jax.Array,  # [N, Td, D]
    doc_mask: jax.Array,    # [N, Td]
    k: int,
    block_n: int = 512,
    precision: jax.lax.Precision = jax.lax.Precision.DEFAULT,
    n_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact MaxSim top-k. Returns ``(scores [Q,k], ids [Q,k] i32)``
    with descending scores, ties to the lowest doc id.

    ``n_valid``: optional traced count of real docs — rows >= n_valid
    (e.g. a mesh's last-shard zero padding) never compete, even though
    their all-pad-token score of 0.0 could beat real negative scores.
    """
    q, tq, d = q_tokens.shape
    n, td, _ = doc_tokens.shape
    nb = -(-n // block_n)
    n_pad = nb * block_n

    doc_tokens = jnp.pad(doc_tokens, ((0, n_pad - n), (0, 0), (0, 0)))
    doc_mask = jnp.pad(doc_mask, ((0, n_pad - n), (0, 0)))
    blocks_t = doc_tokens.reshape(nb, block_n, td, d)
    blocks_m = doc_mask.reshape(nb, block_n, td)

    qt = q_tokens.reshape(q * tq, d)

    def score_block(args):
        bt, bm = args                                # [B, Td, D], [B, Td]
        # one matmul: [Q*Tq, D] x [D, B*Td]
        sims = jnp.dot(
            qt, bt.reshape(block_n * td, d).T,
            preferred_element_type=jnp.float32, precision=precision,
        ).reshape(q, tq, block_n, td)
        sims = jnp.where(
            bm[None, None, :, :] > 0, sims, -jnp.inf
        )
        best = jnp.max(sims, axis=3)                 # [Q, Tq, B]
        # docs with zero tokens: -inf -> contribute 0
        best = jnp.where(jnp.isfinite(best), best, 0.0)
        best = best * (q_mask[:, :, None] > 0)       # mask query padding
        return jnp.sum(best, axis=1)                 # [Q, B]

    scores = jax.lax.map(score_block, (blocks_t, blocks_m))  # [nb, Q, B]
    scores = scores.transpose(1, 0, 2).reshape(q, n_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    limit = jnp.minimum(
        jnp.int32(n),
        jnp.asarray(n if n_valid is None else n_valid, jnp.int32),
    )
    scores = jnp.where(col < limit, scores, -jnp.inf)
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "precision")
)
def maxsim_rescore(
    q_tokens: jax.Array,    # [Q, Tq, D] query token embeddings
    q_mask: jax.Array,      # [Q, Tq] 1 = real token
    doc_tokens: jax.Array,  # [N, Td, D] token slab
    doc_mask: jax.Array,    # [N, Td]
    cand_ids: jax.Array,    # [Q, C] doc ids (may contain invalid < 0
                            #        or >= n_valid slots)
    k: int,
    precision: jax.lax.Precision = jax.lax.Precision.DEFAULT,
    n_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """MaxSim over a bounded CANDIDATE set — the capacity-safe tier.

    The full-scan :func:`maxsim_topk` reads the whole ``[N, Td, D]``
    slab (Td x the single-vector matrix — 32x HBM at the default
    budget, worse than the problem PQ solves). This instead gathers
    only the ``C`` dense-stage candidates' slabs (one contiguous
    ``Td*D``-itemsize row each via the free ``[N, Td*D]`` reshape —
    24 KB at Td=32/bf16) and late-interacts just those:
    ``O(C * Td * D)`` HBM per query instead of ``O(N * Td * D)``.
    Recall then hinges on the single-vector candidate stage, measured
    on the eval splits (EVAL_RETRIEVAL.json maxsim-rerank rows).

    Returns ``(scores [Q, k], ids [Q, k] i32)`` in (score desc, id
    asc) order; invalid candidates (id < 0, >= ``n_valid``, or
    duplicate padding) come last as ``(-inf, -1)``.
    """
    q, tq, d = q_tokens.shape
    n, td, _ = doc_tokens.shape
    _, c = cand_ids.shape
    limit = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    valid = (cand_ids >= 0) & (cand_ids < limit)
    safe = jnp.clip(cand_ids, 0, n - 1)

    # one contiguous row per candidate doc: [N, Td*D] is a free
    # (bitcast) view of the row-major slab
    flat = doc_tokens.reshape(n, td * d)
    g = jnp.take(flat, safe, axis=0).reshape(q, c, td, d)  # [Q, C, Td, D]
    gm = jnp.take(doc_mask, safe, axis=0)                  # [Q, C, Td]

    if q_tokens.dtype == g.dtype:
        sims = jnp.einsum(
            "qtd,qcsd->qtcs", q_tokens, g,
            precision=precision, preferred_element_type=jnp.float32,
        )
    else:
        sims = jnp.einsum(
            "qtd,qcsd->qtcs", q_tokens.astype(jnp.float32),
            g.astype(jnp.float32), precision=precision,
        )
    sims = jnp.where(gm[:, None, :, :] > 0, sims, -jnp.inf)
    best = jnp.max(sims, axis=3)                           # [Q, Tq, C]
    best = jnp.where(jnp.isfinite(best), best, 0.0)
    best = best * (q_mask[:, :, None] > 0)
    scores = jnp.sum(best, axis=1)                         # [Q, C]
    scores = jnp.where(valid, scores, -jnp.inf)

    # (score desc, id asc); invalid slots sink last with unique keys
    slot = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    sort_ids = jnp.where(valid, safe, n + slot)
    kk = min(k, c)
    neg_s, ids_sorted = jax.lax.sort(
        (-scores, sort_ids), num_keys=2, dimension=1
    )
    out_s = -neg_s[:, :kk]
    out_i = jnp.where(ids_sorted[:, :kk] >= n, -1, ids_sorted[:, :kk])
    if kk < k:
        out_s = jnp.concatenate(
            [out_s, jnp.full((q, k - kk), -jnp.inf, out_s.dtype)], axis=1
        )
        out_i = jnp.concatenate(
            [out_i, jnp.full((q, k - kk), -1, out_i.dtype)], axis=1
        )
    return out_s, out_i.astype(jnp.int32)


@dataclasses.dataclass
class MultiVectorIndex:
    """Token-level index for late-interaction search."""

    doc_tokens: jax.Array   # [N, Td, D], L2-normalized real tokens
    doc_mask: jax.Array     # [N, Td]
    n_docs: int

    @classmethod
    def from_token_embeddings(
        cls,
        token_embeddings,    # list of [t_i, D] arrays (variable length)
        token_budget: int = 32,
        dtype: str = "float32",
    ) -> "MultiVectorIndex":
        """Pack per-doc token embeddings into the fixed [N, Td, D]
        layout (first ``token_budget`` tokens kept, L2-normalized)."""
        n = len(token_embeddings)
        if n == 0:
            raise ValueError("no documents")
        dim = token_embeddings[0].shape[-1]
        toks = np.zeros((n, token_budget, dim), dtype=np.float32)
        mask = np.zeros((n, token_budget), dtype=np.int32)
        for i, te in enumerate(token_embeddings):
            te = np.asarray(te, dtype=np.float32)[:token_budget]
            norms = np.linalg.norm(te, axis=-1, keepdims=True)
            te = te / np.maximum(norms, 1e-12)
            toks[i, : te.shape[0]] = te
            mask[i, : te.shape[0]] = 1
        jdt = jnp.asarray(
            toks, dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        )
        return cls(
            doc_tokens=jdt, doc_mask=jnp.asarray(mask), n_docs=n
        )

    def search(
        self, q_tokens, q_mask, k: int, block_n: int = 512
    ) -> Tuple[jax.Array, jax.Array]:
        q_tokens = jnp.asarray(q_tokens, dtype=self.doc_tokens.dtype)
        return maxsim_topk(
            q_tokens, jnp.asarray(q_mask),
            self.doc_tokens, self.doc_mask,
            k, block_n=block_n,
        )


def minilm_token_embeddings(params, input_ids, attention_mask, cfg):
    """Per-token contextual embeddings from the MiniLM encoder
    (L2-normalized), the encoder-side half of late interaction."""
    from legal_rag_tpu.models.minilm import minilm_hidden_states

    hidden = minilm_hidden_states(params, input_ids, attention_mask, cfg)
    norms = jnp.sqrt(jnp.sum(hidden * hidden, axis=-1, keepdims=True))
    return hidden / jnp.maximum(norms, 1e-12)


def minilm_token_and_pooled(
    params, input_ids, attention_mask, cfg,
    precision=None,
):
    """One transformer forward, two views: the L2-normalized per-token
    states (late-interaction half) AND the L2-normalized masked-mean
    pooled sentence embedding (single-vector half). Serving's
    maxsim-rerank needs both per query batch and must not pay two
    encoder passes (the same shared-forward pattern as the token
    co-training loss, models/train.py _encode_with_tokens).
    ``precision=None`` keeps minilm_hidden_states' HIGHEST default
    (parity with SentenceEncoder.encode's float32 path)."""
    from legal_rag_tpu.models.minilm import minilm_hidden_states

    kw = {} if precision is None else {"precision": precision}
    hidden = minilm_hidden_states(params, input_ids, attention_mask, cfg, **kw)
    m = attention_mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(
        jnp.sum(m, axis=1), 1e-9)
    pn = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True))
    tn = jnp.sqrt(jnp.sum(hidden * hidden, axis=-1, keepdims=True))
    return (
        hidden / jnp.maximum(tn, 1e-12),
        pooled / jnp.maximum(pn, 1e-12),
    )


class MultiVectorSearcher:
    """Text-in, results-out late-interaction search over an encoder.

    Builds the token-level index by running the corpus through the
    MiniLM encoder in device batches; queries encode the same way at
    search time. The single-vector engine stays the serving default —
    this is the higher-fidelity (and costlier) retrieval mode."""

    def __init__(
        self,
        texts,
        encoder,                       # models.encoder.SentenceEncoder
        token_budget: int = 32,
        dtype: str = "float32",
        batch_size: int = 64,
        block_n: int = 512,
    ):
        self.encoder = encoder
        self.token_budget = token_budget
        self.block_n = block_n
        token_embeddings = []
        for lo in range(0, len(texts), batch_size):
            ids, mask = self._tokenize(texts[lo : lo + batch_size])
            tok = np.asarray(
                minilm_token_embeddings(
                    encoder.params, jnp.asarray(ids), jnp.asarray(mask),
                    encoder.cfg,
                )
            )
            for row_tok, row_mask in zip(tok, mask):
                token_embeddings.append(row_tok[row_mask > 0])
        self.index = MultiVectorIndex.from_token_embeddings(
            token_embeddings, token_budget=token_budget, dtype=dtype
        )

    def _tokenize(self, texts):
        tokenizer = getattr(self.encoder, "_fast_tokenizer", None) or (
            self.encoder.tokenizer
        )
        return tokenizer.encode_batch(
            list(texts), max_len=min(self.encoder.cfg.max_len, 128)
        )

    def search(self, queries, k: int = 5):
        """Returns ``(scores [Q,k] np, ids [Q,k] np)``."""
        ids, mask = self._tokenize(queries)
        q_tok = minilm_token_embeddings(
            self.encoder.params, jnp.asarray(ids), jnp.asarray(mask),
            self.encoder.cfg,
        )
        # trim/pad query tokens to the index budget
        tq = min(q_tok.shape[1], self.token_budget)
        s, i = self.index.search(
            q_tok[:, :tq], np.asarray(mask)[:, :tq], k, block_n=self.block_n
        )
        return np.asarray(s), np.asarray(i)
