"""Product quantization: the HBM-capacity tier of the dense index.

The storage ladder for a `[N, 384]` document matrix on one chip:

  fp32 1536 B/doc -> bf16 768 B/doc -> int8 384 B/doc -> PQ m B/doc

PQ splits each vector into ``m`` subspaces of ``D/m`` dims and stores
one uint8 centroid code per subspace (codebooks of 256 centroids each,
k-means-trained). At the default ``m=48`` that is 48 B/doc — 32x
smaller than fp32 — so ~300M documents fit in a v5e's 16 GB HBM where
fp32 flat search caps out at ~10M. The reference's FAISS dependency
ships this as ``IndexPQ``/``IVFPQ`` (faiss C++); here it is a JAX
k-means trainer plus a Pallas scoring kernel, and it composes with
:func:`legal_rag_tpu.ops.dense.exact_rescore` the same way the int8
mode does: PQ generates an oversampled candidate list fast and small,
the host rescores just those docs' fp32 vectors from the mmap'd store,
and final ordering is exact.

Scoring never decompresses the corpus. For queries ``q`` the inner
product against a PQ-coded doc is ``sum_m LUT[q, m, code[n, m]]`` with
``LUT = q_m . C_m^T`` per subspace — a table lookup, which on TPU is
executed as an MXU one-hot matmul per subspace: a ``[256, BN]``
one-hot (sublane iota vs the subspace's code row) contracted with the
``[256, Q]`` LUT slice, accumulated over ``mi``. That trades gathers
(slow on TPU) for dense matmuls (what the MXU is for): the kernel
reads ``m`` bytes per doc from HBM and is compute-bound on MXU passes,
not bandwidth-bound like the bf16 flat sweep. Codes live TRANSPOSED
(``[m, N]``) so each subspace is a sublane row — the layout is chosen
at index build time to make the hot loop relayout-free.

Selection reuses the two-phase shape (ops/dense.py): the kernel emits
per-*segment* maxima (segment = ``seg_rows`` docs, lane-aligned), a
tiny XLA phase-2 picks top segments, gathers only those segments'
codes, rescores them exactly under PQ, and returns an oversampled
candidate list for the fp32 rescore.

Reference parity note: FAISS `IndexFlatIP` (create_vector_store.py:55)
is exact; PQ is the capacity mode the reference's corpus never needed.
Recall guarantees therefore come from the candidate oversample + exact
rescore, tested in tests/test_pq.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_F32 = float(np.finfo(np.float32).min)


class PQCodebook(NamedTuple):
    """Trained product-quantization codebooks.

    codebooks: ``[m, 256, dsub]`` float32 — 256 centroids per subspace.
    rotation:  optional ``[D, D]`` orthogonal OPQ rotation. Vectors are
      quantized in the rotated space (``x @ R``); since
      ``q·x ≈ (q R)·(x̂ R)``, queries rotate at prep time and the
      scoring kernel never changes. OPQ spreads variance evenly across
      subspaces, cutting quantization error on anisotropic embeddings
      (the common case for trained encoders).
    """

    codebooks: np.ndarray
    rotation: Optional[np.ndarray] = None

    @property
    def m(self) -> int:
        return self.codebooks.shape[0]

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.m * self.dsub

    def rotate(self, x: np.ndarray) -> np.ndarray:
        """Project into the quantization space (no-op without OPQ)."""
        if self.rotation is None:
            return x
        return np.asarray(x, np.float32) @ self.rotation


# ---------------------------------------------------------------------------
# Training (jittable k-means, vmapped over subspaces)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("iters",))
def _kmeans_subspace(x, init, iters: int):
    """Lloyd's k-means for one subspace: ``x [S, dsub]``, ``init
    [256, dsub]``. Returns updated centroids. Empty clusters keep their
    previous centroid (deterministic; fine for codebook purposes)."""

    def step(c, _):
        # argmin ||x - c||^2 == argmax (x.c - ||c||^2/2); one matmul
        logits = x @ c.T - 0.5 * jnp.sum(c * c, axis=1)[None, :]
        assign = jnp.argmax(logits, axis=1)
        onehot = jax.nn.one_hot(assign, c.shape[0], dtype=x.dtype)
        counts = jnp.sum(onehot, axis=0)                       # [256]
        sums = onehot.T @ x                                    # [256, dsub]
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None], c
        )
        return new, None

    out, _ = jax.lax.scan(step, init, None, length=iters)
    return out


def _train_pq_sample(
    x: np.ndarray, m: int, iters: int, rng: np.random.Generator,
) -> np.ndarray:
    """k-means codebooks for a pre-sampled ``[S, D]`` matrix."""
    s, d = x.shape
    dsub = d // m
    xs = x.reshape(s, m, dsub).transpose(1, 0, 2)          # [m, S, dsub]
    init_rows = rng.choice(s, size=256, replace=s < 256)
    init = xs[:, init_rows, :]                             # [m, 256, dsub]
    trained = jax.vmap(lambda a, c: _kmeans_subspace(a, c, iters))(
        jnp.asarray(xs), jnp.asarray(init)
    )
    return np.asarray(trained, dtype=np.float32)


def train_pq(
    embeddings: np.ndarray,
    m: int = 48,
    iters: int = 25,
    sample: int = 65536,
    seed: int = 0,
    opq_iters: int = 0,
) -> PQCodebook:
    """Train per-subspace 256-centroid codebooks with k-means.

    ``embeddings [N, D]`` with ``D % m == 0``. Training runs on
    whatever backend JAX has (one jitted scan per call, vmapped over
    subspaces); a ``sample``-row subset keeps it O(sample) at any N.
    Initialization is a deterministic data sample (seeded), so builds
    are reproducible.

    ``opq_iters > 0`` additionally learns an orthogonal OPQ rotation by
    alternating optimization: quantize in the rotated space with a
    cheap inner k-means, then solve the orthogonal Procrustes problem
    ``min_R ||X R - X̂||_F`` (``R = U Vᵀ`` from ``svd(Xᵀ X̂)``) and
    repeat. The final codebooks are trained at full ``iters`` in the
    learned space. Reference parity note: faiss ships this as
    ``OPQMatrix`` (faiss C++); here it is numpy SVD + the JAX k-means.
    """
    n, d = embeddings.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    rng = np.random.default_rng(seed)
    rows = (
        rng.choice(n, size=sample, replace=False) if n > sample
        else np.arange(n)
    )
    x = np.asarray(embeddings[rows], dtype=np.float32)

    rotation = None
    if opq_iters > 0:
        rotation = np.eye(d, dtype=np.float32)
        for _ in range(opq_iters):
            xr = x @ rotation
            cb_t = PQCodebook(_train_pq_sample(xr, m, 6, rng))
            recon = decode_pq(encode_pq(xr, cb_t), cb_t)   # [S, D]
            u, _, vt = np.linalg.svd(x.T @ recon)
            rotation = (u @ vt).astype(np.float32)
        x = x @ rotation

    trained = _train_pq_sample(x, m, iters, rng)
    return PQCodebook(trained, rotation)


def encode_pq(embeddings: np.ndarray, cb: PQCodebook,
              batch: int = 131072) -> np.ndarray:
    """Assign every document to its nearest centroid per subspace
    (in the OPQ-rotated space when the codebook carries a rotation).
    Returns ``codes [N, m]`` uint8. Batched so encode is O(batch)
    device memory at any N."""
    n, d = embeddings.shape
    m, dsub = cb.m, cb.dsub
    if d != cb.dim:
        raise ValueError(f"dim {d} != codebook dim {cb.dim}")
    c = jnp.asarray(cb.codebooks)                          # [m, 256, dsub]
    c_norm = 0.5 * jnp.sum(c * c, axis=2)                  # [m, 256]
    rot = None if cb.rotation is None else jnp.asarray(cb.rotation)

    @jax.jit
    def assign(xb):
        if rot is not None:
            xb = xb @ rot
        xs = xb.reshape(xb.shape[0], m, dsub)
        # [B, m, 256]: batched matmul per subspace
        logits = jnp.einsum("bmd,mcd->bmc", xs, c) - c_norm[None]
        return jnp.argmax(logits, axis=2).astype(jnp.uint8)

    out = np.empty((n, m), dtype=np.uint8)
    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        out[lo:hi] = np.asarray(
            assign(jnp.asarray(embeddings[lo:hi], jnp.float32))
        )
    return out


def decode_pq(codes: np.ndarray, cb: PQCodebook) -> np.ndarray:
    """Reconstruct approximate vectors in the ORIGINAL space
    (debug/eval; search never does this)."""
    m = cb.m
    parts = [cb.codebooks[mi][codes[:, mi]] for mi in range(m)]
    recon = np.concatenate(parts, axis=1)
    if cb.rotation is not None:
        recon = recon @ cb.rotation.T
    return recon


# ---------------------------------------------------------------------------
# Scoring kernel
# ---------------------------------------------------------------------------


def _pq_segmax_kernel(
    codes_ref, lut_ref, m_ref, *, seg_rows, block_n, n_real, m,
):
    """Per (doc-block) grid step: PQ scores for the whole query batch
    against ``block_n`` docs, reduced to per-segment maxima.

    codes_ref: ``[m, BN]`` uint8 (as int8 bits) — the ONLY per-doc HBM
      read, m bytes/doc. TRANSPOSED layout: each subspace is a sublane
      row, so selecting subspace ``mi`` is a static sublane slice and
      the one-hot compare broadcasts the ``[1, BN]`` code row over 256
      sublanes — zero cross-lane relayouts (the naive ``codes[:, mi]``
      lane extraction cost ~10x the whole kernel).
    lut_ref:   ``[m, 256, Q]`` bf16 — per-subspace lookup tables, each
      a ``[256, Q]`` MXU RHS. bf16 keeps the VMEM working set inside
      the 16 MB scoped budget (the MXU consumes bf16 anyway); phase 2
      rescores candidates against the fp32 LUT, so returned scores stay
      exact under the PQ metric.
    m_ref:     ``[Q, BN/seg_rows]`` f32 segment maxima.
    """
    j = pl.program_id(0)
    codes = codes_ref[:].astype(jnp.int32) & 0xFF          # uint8 bits
    bn = codes.shape[1]
    qn = lut_ref.shape[2]

    # sum_m onehot_T [256, BN]^T @ lut[mi] [256, Q] on the MXU, where
    # onehot_T = (sublane_iota == code_row) — contraction over the
    # sublane dim, so the one-hot never changes layout
    subl = jax.lax.broadcasted_iota(jnp.int32, (256, bn), 0)
    acc = jnp.zeros((bn, qn), dtype=jnp.float32)
    for mi in range(m):
        onehot_t = (codes[mi:mi + 1, :] == subl).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            onehot_t, lut_ref[mi],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    base = j * block_n
    row = jax.lax.broadcasted_iota(jnp.int32, (bn, qn), 0) + base
    acc = jnp.where(row < n_real, acc, _NEG_F32)
    # segment reduce along docs: [BN/sr, sr, Q] -> max over sr
    segs = bn // seg_rows
    m_ref[:] = jnp.max(acc.reshape(segs, seg_rows, qn), axis=1).T


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_n", "seg_rows", "interpret"),
)
def pq_topk(
    queries: jax.Array,
    codes_t: jax.Array,
    codebooks: jax.Array,
    k: int,
    *,
    n_valid: Optional[jax.Array] = None,
    block_n: int = 8192,
    seg_rows: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k candidate generation over a PQ-coded corpus.

    Args:
      queries:   ``[Q, D]`` float queries.
      codes_t:   ``[m, N]`` uint8 document codes, TRANSPOSED — the
                 index-build-time layout (ShardedIndex.from_pq) that
                 makes subspace selection a sublane slice in the kernel
                 instead of a cross-lane extraction.
      codebooks: ``[m, 256, dsub]`` float32.
      k:         candidates per query (callers oversample, then
                 :func:`legal_rag_tpu.ops.dense.exact_rescore` restores
                 exact fp32 ordering over just these candidates).
      n_valid:   optional TRACED count of real docs; columns >= n_valid
                 are mesh zero-padding (e.g. the last shard of a padded
                 ShardedIndex) and must never be returned. The kernel's
                 own static mask covers the block-alignment pad; this
                 traced mask is applied at segment granularity (whole
                 pad segments sink to -inf) plus exactly at phase-2
                 member rescore, so one straddling segment at most can
                 waste a slot — covered by the ``k + 16`` slack.

    Returns ``(pq_scores [Q, k] f32, ids [Q, k] i32)`` sorted by
    (PQ score desc, id asc).
    """
    q, d = queries.shape
    m, n = codes_t.shape
    dsub = d // m

    # per-query per-subspace lookup tables: [m, 256, Q]
    lut = jnp.einsum(
        "qmd,mcd->mcq",
        queries.astype(jnp.float32).reshape(q, m, dsub),
        codebooks.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )

    np_ = -(-n // block_n) * block_n
    if np_ != n:
        codes_t = jnp.pad(codes_t, ((0, 0), (0, np_ - n)))
    nb = np_ // block_n
    segs_per_block = block_n // seg_rows

    kernel = functools.partial(
        _pq_segmax_kernel, seg_rows=seg_rows, block_n=block_n,
        n_real=n, m=m,
    )
    seg_m = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((m, block_n), lambda j: (0, j)),
            pl.BlockSpec((m, 256, q), lambda j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((q, segs_per_block), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((q, nb * segs_per_block), jnp.float32),
        interpret=interpret,
    )(codes_t, lut.astype(jnp.bfloat16))

    if n_valid is not None:
        # traced validity: whole segments past n_valid can never hold a
        # real doc — mask them so pad segments don't crowd out real ones
        seg_start = (
            jnp.arange(seg_m.shape[1], dtype=jnp.int32) * seg_rows
        )
        seg_m = jnp.where(seg_start[None, :] < n_valid, seg_m, _NEG_F32)

    # phase 2: top segments, gather their members' codes, exact PQ
    # rescore of just those docs, final (score desc, id asc) order
    kk = min(k + 16, nb * segs_per_block)
    _, seg_pos = jax.lax.top_k(seg_m, kk)                   # [Q, kk]
    member = (
        seg_pos[:, :, None] * seg_rows
        + jax.lax.broadcasted_iota(jnp.int32, (q, kk, seg_rows), 2)
    ).reshape(q, kk * seg_rows)
    member_safe = jnp.clip(member, 0, np_ - 1)

    cand_codes = jnp.transpose(
        jnp.take(codes_t, member_safe, axis=1), (1, 2, 0)
    )                                                       # [Q, C, m]
    # LUT lookup per (query, candidate, subspace) — small, XLA gather:
    # lut is [m, 256, Q]; index with the candidate codes
    lut_qmc = jnp.transpose(lut, (2, 0, 1))                 # [Q, m, 256]
    gath = jnp.take_along_axis(
        lut_qmc[:, None, :, :],                             # [Q, 1, m, 256]
        cand_codes.astype(jnp.int32)[:, :, :, None],        # [Q, C, m, 1]
        axis=3,
    )[..., 0]                                               # [Q, C, m]
    cand_scores = jnp.sum(gath, axis=2)
    limit = n if n_valid is None else jnp.minimum(n_valid, n)
    cand_scores = jnp.where(member < limit, cand_scores, -jnp.inf)

    neg_s, ids_sorted = jax.lax.sort(
        (-cand_scores, member), num_keys=2, dimension=1
    )
    return -neg_s[:, :k], ids_sorted[:, :k].astype(jnp.int32)


def pq_search_rescored(
    queries: np.ndarray,
    codes_t: jax.Array,
    cb: PQCodebook,
    embeddings: np.ndarray,
    k: int,
    *,
    oversample: int = 8,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """End-to-end capacity-mode search: PQ candidates on device, exact
    fp32 rescore of the oversampled list on host (mmap-friendly — only
    ``k * oversample`` rows of ``embeddings`` are touched per query).

    Returns ``(scores [Q, k], ids [Q, k])`` with exact fp32 ordering
    whenever the true top-k survives in the candidate list (tested
    recall in tests/test_pq.py).
    """
    from legal_rag_tpu.ops.dense import exact_rescore

    _, cand = pq_topk(
        jnp.asarray(cb.rotate(np.asarray(queries)), jnp.float32), codes_t,
        jnp.asarray(cb.codebooks), k * oversample, interpret=interpret,
    )
    fused, ids, _, _ = exact_rescore(
        np.asarray(queries, np.float32), np.asarray(cand), embeddings,
        k=k,
    )
    return fused, ids
