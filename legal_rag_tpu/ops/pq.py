"""Product quantization: the HBM-capacity tier of the dense index.

The storage ladder for a `[N, 384]` document matrix on one chip:

  fp32 1536 B/doc -> bf16 768 B/doc -> int8 384 B/doc -> PQ m B/doc

PQ splits each vector into subspaces and stores one centroid code per
subspace (codebooks k-means-trained). This implementation is **4-bit**
PQ: ``2*m`` subspaces of 16 centroids each, two codes packed per byte
— ``m`` bytes/doc (default 48, 32x smaller than fp32), so ~300M
documents fit in a v5e's 16 GB HBM where fp32 flat search caps out at
~10M. The reference's FAISS dependency ships the 8-bit variant as
``IndexPQ``/``IVFPQ`` (faiss C++); ScaNN uses the 4-bit variant for
exactly the reason it wins here.

Why 4-bit is the TPU-shaped choice: scoring never decompresses — the
inner product against a coded doc is ``sum_s LUT[s, code[n, s]]``, a
table lookup, executed on the MXU as a one-hot matmul per subspace.
Building a one-hot costs VPU work proportional to its WIDTH: 8-bit
codes need ``[block, 256]`` one-hots (measured 137 ms / 1M docs /
64-query batch — the VPU wall), while 4-bit needs 16-wide ones. This
mirrors the SIMD-register justification for 4-bit PQ on CPUs (pshufb's
16-lane shuffle); on TPU the "register width" is the one-hot the VPU
must materialize. The shipped kernel then recovers full MXU occupancy
by stacking 8 nibble subspaces per contraction: a constant spread
MATMUL broadcasts each group's packed bytes into 32-lane bands and one
elementwise nibble-select + compare builds the ``[block, 128]``
one-hot for a K=128 LUT dot — 5.3 ms / 1M docs / 64-query batch for
the sweep, 8.2 ms for the full ``pq_topk`` path, vs 3.87 ms for the
bf16 flat sweep that reads 16x more HBM. (The spread matmul is also
the ONLY multi-column combination the Mosaic backend accepts:
in-kernel lane ``concatenate`` and every VPU merge of several
lane-extracted columns — or/max/add/repeat — crash the backend
compiler; isolated by bisection, pinned by the hardware test suite.)

Selection reuses the two-phase shape (ops/dense.py): the kernel emits
per-*segment* maxima (segment = ``seg_rows`` docs, lane-aligned), a
tiny XLA phase-2 picks top segments, gathers only those segments'
codes, rescores them exactly under the PQ metric (fp32 LUT), and
returns an oversampled candidate list for the fp32 rescore
(:func:`legal_rag_tpu.ops.dense.exact_rescore`), same exactness-
recovery contract as the int8 mode.

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

_NEG_F32 = float(np.finfo(np.float32).min)


class PQCodebook(NamedTuple):
    """Trained product-quantization codebooks (4-bit).

    codebooks: ``[2m, 16, dsub]`` float32 — 16 centroids per nibble
      subspace; byte ``b`` of a packed code holds subspaces ``2b`` (low
      nibble) and ``2b+1`` (high nibble).
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
    def n_subspaces(self) -> int:
        return self.codebooks.shape[0]

    @property
    def m(self) -> int:
        """Packed bytes per document."""
        return self.codebooks.shape[0] // 2

    @property
    def dsub(self) -> int:
        return self.codebooks.shape[2]

    @property
    def dim(self) -> int:
        return self.n_subspaces * self.dsub

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
    [K, dsub]``. Returns updated centroids. Empty clusters keep their
    previous centroid (deterministic; fine for codebook purposes)."""

    def step(c, _):
        # argmin ||x - c||^2 == argmax (x.c - ||c||^2/2); one matmul
        logits = x @ c.T - 0.5 * jnp.sum(c * c, axis=1)[None, :]
        assign = jnp.argmax(logits, axis=1)
        onehot = jax.nn.one_hot(assign, c.shape[0], dtype=x.dtype)
        counts = jnp.sum(onehot, axis=0)
        sums = onehot.T @ x
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None], c
        )
        return new, None

    out, _ = jax.lax.scan(step, init, None, length=iters)
    return out


def _train_pq_sample(
    x: np.ndarray, n_sub: int, iters: int, rng: np.random.Generator,
) -> np.ndarray:
    """16-centroid k-means codebooks for a pre-sampled ``[S, D]``."""
    s, d = x.shape
    dsub = d // n_sub
    xs = x.reshape(s, n_sub, dsub).transpose(1, 0, 2)   # [n_sub, S, dsub]
    init_rows = rng.choice(s, size=16, replace=s < 16)
    init = xs[:, init_rows, :]                          # [n_sub, 16, dsub]
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
    """Train 4-bit PQ codebooks: ``2m`` nibble subspaces, 16 centroids
    each (``m`` packed bytes/doc).

    ``embeddings [N, D]`` with ``D % 2m == 0``. Training runs on
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
    n_sub = 2 * m
    if d % n_sub:
        raise ValueError(f"dim {d} not divisible by 2*m={n_sub}")
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
            cb_t = PQCodebook(_train_pq_sample(xr, n_sub, 6, rng))
            recon = decode_pq(encode_pq(xr, cb_t), cb_t)   # [S, D]
            u, _, vt = np.linalg.svd(x.T @ recon)
            rotation = (u @ vt).astype(np.float32)
        x = x @ rotation

    trained = _train_pq_sample(x, n_sub, iters, rng)
    return PQCodebook(trained, rotation)


def encode_pq(embeddings: np.ndarray, cb: PQCodebook,
              batch: int = 131072) -> np.ndarray:
    """Assign every document to its nearest centroid per nibble
    subspace (in the OPQ-rotated space when the codebook carries a
    rotation) and pack two 4-bit codes per byte. Returns ``codes
    [N, m]`` uint8. Batched so encode is O(batch) device memory at
    any N."""
    n, d = embeddings.shape
    n_sub, dsub = cb.n_subspaces, cb.dsub
    if d != cb.dim:
        raise ValueError(f"dim {d} != codebook dim {cb.dim}")
    c = jnp.asarray(cb.codebooks)                       # [2m, 16, dsub]
    c_norm = 0.5 * jnp.sum(c * c, axis=2)               # [2m, 16]
    rot = None if cb.rotation is None else jnp.asarray(cb.rotation)

    @jax.jit
    def assign(xb):
        if rot is not None:
            xb = xb @ rot
        xs = xb.reshape(xb.shape[0], n_sub, dsub)
        logits = jnp.einsum("bmd,mcd->bmc", xs, c) - c_norm[None]
        nib = jnp.argmax(logits, axis=2).astype(jnp.uint8)   # [B, 2m]
        return nib[:, 0::2] | (nib[:, 1::2] << 4)            # packed

    out = np.empty((n, cb.m), dtype=np.uint8)
    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        out[lo:hi] = np.asarray(
            assign(jnp.asarray(embeddings[lo:hi], jnp.float32))
        )
    return out


def unpack_codes(codes: np.ndarray) -> np.ndarray:
    """``[..., m]`` packed bytes -> ``[..., 2m]`` nibble codes."""
    codes = np.asarray(codes)
    out = np.empty(codes.shape[:-1] + (codes.shape[-1] * 2,), np.uint8)
    out[..., 0::2] = codes & 0xF
    out[..., 1::2] = codes >> 4
    return out


def decode_pq(codes: np.ndarray, cb: PQCodebook) -> np.ndarray:
    """Reconstruct approximate vectors in the ORIGINAL space
    (debug/eval; search never does this)."""
    nibs = unpack_codes(codes)
    parts = [
        cb.codebooks[s][nibs[:, s]] for s in range(cb.n_subspaces)
    ]
    recon = np.concatenate(parts, axis=1)
    if cb.rotation is not None:
        recon = recon @ cb.rotation.T
    return recon


# ---------------------------------------------------------------------------
# Scoring kernel
# ---------------------------------------------------------------------------


def _pq_segmax_kernel(
    codes_ref, lut_ref, spread_ref, m_ref, *, seg_rows, block_n,
    n_real, m,
):
    """Per (doc-block) grid step: PQ scores for the whole query batch
    against ``block_n`` docs, reduced to per-segment maxima.

    codes_ref:  ``[BN, m]`` uint8 packed nibbles — the ONLY per-doc HBM
      read, m bytes/doc.
    lut_ref:    ``[m/4, 128, Q]`` bf16 — the per-nibble-subspace LUTs
      stacked 8 per group, so the scoring contraction is a
      full-occupancy ``K=128`` MXU dot (the naive per-subspace ``K=16``
      dots waste 7/8 of the MXU's contraction lanes and measured 4.5x
      slower). bf16 is what the MXU consumes; phase 2 rescores
      candidates against the fp32 LUT, so returned scores stay exact
      under the PQ metric.
    spread_ref: ``[4, 128]`` f32 constant 0/1 — byte ``b`` maps to its
      32-lane band. The group's 4 packed bytes broadcast into their
      bands via ONE tiny MXU matmul (values <= 255 are exact), and a
      single elementwise nibble-select + compare then builds the whole
      ``[BN, 128]`` one-hot.
    m_ref:      ``[Q, BN/seg_rows]`` f32 segment maxima.

    Why this exact construction (all found by bisection on hardware —
    the failures crash the TPU backend compiler outright, see
    tests/test_tpu_hardware.py): an in-kernel lane ``concatenate`` of
    per-subspace one-hots crashes; so does ANY VPU combination (or/
    max/add/repeat) of several lane-extracted columns into one array;
    sublane-major one-hots crash too. Routing the multi-column
    combination through the MXU spread matmul sidesteps all of it and
    is faster anyway.
    """
    j = pl.program_id(0)
    cc = codes_ref[:].astype(jnp.int32) & 0xFF
    bn = cc.shape[0]
    qn = lut_ref.shape[2]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bn, 128), 1)
    hi_band = ((lanes >> 4) & 1) == 1   # odd 16-lane window = hi nibble
    target = lanes & 0xF
    spread = spread_ref[:]
    acc = jnp.zeros((bn, qn), dtype=jnp.float32)
    for g in range(m // 4):
        grp = cc[:, g * 4:(g + 1) * 4].astype(jnp.float32)    # [BN, 4]
        rep = jax.lax.dot_general(
            grp, spread, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                                   # [BN, 128]
        nib = jnp.where(hi_band, rep >> 4, rep) & 0xF
        onehot = (nib == target).astype(jnp.bfloat16)
        acc = acc + jax.lax.dot_general(
            onehot, lut_ref[g], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    base = j * block_n
    row = jax.lax.broadcasted_iota(jnp.int32, (bn, qn), 0) + base
    acc = jnp.where(row < n_real, acc, _NEG_F32)
    segs = bn // seg_rows
    m_ref[:] = jnp.max(acc.reshape(segs, seg_rows, qn), axis=1).T


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_n", "seg_rows", "interpret"),
)
def pq_topk(
    queries: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    k: int,
    *,
    n_valid: Optional[jax.Array] = None,
    block_n: int = 4096,
    seg_rows: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k candidate generation over a 4-bit-PQ-coded corpus.

    Args:
      queries:   ``[Q, D]`` float queries (pre-rotated when OPQ is in
                 play — see :meth:`PQCodebook.rotate`).
      codes:     ``[N, m]`` uint8 packed document codes.
      codebooks: ``[2m, 16, dsub]`` float32.
      k:         candidates per query (callers oversample, then
                 :func:`legal_rag_tpu.ops.dense.exact_rescore` restores
                 exact fp32 ordering over just these candidates).
      n_valid:   optional TRACED count of real docs; rows >= n_valid
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
    n, m = codes.shape
    if m % 4:
        raise ValueError(
            f"packed bytes/doc m={m} must divide by 4 (the kernel "
            "stacks 8 nibble subspaces per K=128 MXU dot)"
        )
    # The VMEM clamp below floors block_n at lane_quantum; for query
    # batches large enough that even one lane_quantum-wide block blows
    # the measured-safe block_n*Q envelope (Q > 4096*64/lane_quantum),
    # split the batch instead of silently exceeding it (ADVICE r2).
    lane_quantum_q = seg_rows * 128
    if q > 1 and q > (4096 * 64) // lane_quantum_q:
        half = q // 2
        lo = pq_topk(
            queries[:half], codes, codebooks, k, n_valid=n_valid,
            block_n=block_n, seg_rows=seg_rows, interpret=interpret,
        )
        hi = pq_topk(
            queries[half:], codes, codebooks, k, n_valid=n_valid,
            block_n=block_n, seg_rows=seg_rows, interpret=interpret,
        )
        return (
            jnp.concatenate([lo[0], hi[0]], axis=0),
            jnp.concatenate([lo[1], hi[1]], axis=0),
        )
    n_sub = 2 * m
    dsub = d // n_sub

    # per-query per-subspace lookup tables: [2m, 16, Q]
    lut = jnp.einsum(
        "qmd,mcd->mcq",
        queries.astype(jnp.float32).reshape(q, n_sub, dsub),
        codebooks.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )

    # VMEM envelope: the unrolled per-block working set scales with
    # block_n * Q (measured: 22.8 MB at block_n=8192, Q=64 — past the
    # 16 MB scoped budget; 4096 x 64 fits comfortably). Clamp so the
    # product stays within the measured-safe envelope; small query
    # batches may therefore use proportionally larger doc blocks.
    lane_quantum = seg_rows * 128
    safe = (4096 * 64) // max(q, 1)
    if block_n > safe:
        block_n = max(lane_quantum, (safe // lane_quantum) * lane_quantum)
    # Mosaic constraint: the output block's lane dim (segments per
    # block) must be 128-divisible unless the grid is a single block —
    # align block_n so segs_per_block = block_n/seg_rows is a multiple
    # of 128 whenever more than one block would be needed.
    if n > block_n and block_n % lane_quantum:
        block_n = -(-block_n // lane_quantum) * lane_quantum
    np_ = -(-n // block_n) * block_n
    if np_ != n:
        codes = jnp.pad(codes, ((0, np_ - n), (0, 0)))
    nb = np_ // block_n
    segs_per_block = block_n // seg_rows

    # byte b of each 4-byte group -> its 32-lane band (kernel docstring)
    spread = (
        (jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1) >> 5)
        == jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
    ).astype(jnp.float32)

    kernel = functools.partial(
        _pq_segmax_kernel, seg_rows=seg_rows, block_n=block_n,
        n_real=n, m=m,
    )
    seg_m = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_n, m), lambda j: (j, 0)),
            pl.BlockSpec((m // 4, 128, q), lambda j: (0, 0, 0)),
            pl.BlockSpec((4, 128), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((q, segs_per_block), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((q, nb * segs_per_block), jnp.float32),
        interpret=interpret,
    )(codes, lut.astype(jnp.bfloat16).reshape(m // 4, 128, q), spread)

    if n_valid is not None:
        # traced validity: whole segments past n_valid can never hold a
        # real doc — mask them so pad segments don't crowd out real ones
        seg_start = (
            jnp.arange(seg_m.shape[1], dtype=jnp.int32) * seg_rows
        )
        seg_m = jnp.where(seg_start[None, :] < n_valid, seg_m, _NEG_F32)

    # phase 2: top segments, gather their members' codes, exact PQ
    # rescore of just those docs, final (score desc, id asc) order.
    # Round 4: the segment select reuses the dense kernel's two-level
    # (super-segment) machinery — the flat lax.top_k over
    # [Q, N/seg_rows] cost 1.9 ms at 1M docs (O(k*width) VPU work,
    # the round-3 roofline finding) — and the candidate gather moves
    # whole segments (one contiguous seg_rows*m-byte row of the free
    # [N/sr, sr*m] view) instead of seg_rows separate m-byte rows.
    from legal_rag_tpu.ops.dense import _select_segments

    n_segs = nb * segs_per_block
    kk = min(k + 16, n_segs)
    seg_pos = _select_segments(seg_m, kk, n_segs)           # [Q, kk]
    member = (
        seg_pos[:, :, None] * seg_rows
        + jax.lax.broadcasted_iota(jnp.int32, (q, kk, seg_rows), 2)
    ).reshape(q, kk * seg_rows)
    member_safe = jnp.clip(member, 0, np_ - 1)

    codes_seg = codes.reshape(np_ // seg_rows, seg_rows * m)
    seg_safe = jnp.clip(seg_pos, 0, np_ // seg_rows - 1)
    cand_codes = jnp.take(codes_seg, seg_safe, axis=0).reshape(
        q, kk * seg_rows, m
    )                                                       # [Q, C, m]
    cw = member_safe.shape[1]
    # unpack nibbles: [Q, C, 2m]
    cand_nibs = jnp.stack(
        [cand_codes & 0xF, cand_codes >> 4], axis=-1
    ).reshape(q, cw, n_sub).astype(jnp.int32)
    # Exact PQ rescore WITHOUT gathers (XLA TPU gathers cost ~50 ms at
    # this candidate volume — measured): since
    # sum_s lut[s, nib_s] == q · decode(nibs), decode the candidates
    # via a one-hot batched matmul and dot with the (rotated) queries.
    oh = jax.nn.one_hot(cand_nibs, 16, dtype=jnp.float32)   # [Q, C, 2m, 16]
    decoded = jnp.einsum(
        "qcsk,skd->qcsd", oh, codebooks.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )                                                       # [Q, C, 2m, dsub]
    q_sub = queries.astype(jnp.float32).reshape(q, n_sub, dsub)
    cand_scores = jnp.einsum(
        "qcsd,qsd->qc", decoded, q_sub,
        precision=jax.lax.Precision.HIGHEST,
    )
    limit = n if n_valid is None else jnp.minimum(n_valid, n)
    cand_scores = jnp.where(member < limit, cand_scores, -jnp.inf)

    neg_s, ids_sorted = jax.lax.sort(
        (-cand_scores, member), num_keys=2, dimension=1
    )
    return -neg_s[:, :k], ids_sorted[:, :k].astype(jnp.int32)


def pq_search_rescored(
    queries: np.ndarray,
    codes: jax.Array,
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
        jnp.asarray(cb.rotate(np.asarray(queries)), jnp.float32), codes,
        jnp.asarray(cb.codebooks), k * oversample, interpret=interpret,
    )
    fused, ids, _, _ = exact_rescore(
        np.asarray(queries, np.float32), np.asarray(cand), embeddings,
        k=k,
    )
    return fused, ids


# ---------------------------------------------------------------------------
# IVF coarse pruning: sub-linear scan for the capacity tier
# ---------------------------------------------------------------------------


class IVFIndex(NamedTuple):
    """Balanced-cell IVF layout over a PQ-coded corpus.

    The classic IVF (faiss ``IndexIVFPQ``) keeps ragged per-cluster
    posting lists — a shape XLA cannot tile. The TPU-shaped variant
    here is *balanced cells*: documents are sorted by coarse k-means
    cluster and chopped into consecutive fixed-size cells of
    ``cell_size`` rows, each cell summarized by the mean of its member
    embeddings. Every shape is static; a cell read is one contiguous
    ``[cell_size, m]`` slice; only the corpus tail is padding.

    centroids: ``[n_cells, D]`` float32 cell means (OPQ-rotated space,
      matching the space queries are scored in).
    codes:     ``[n_cells*cell_size, m]`` uint8, cell-ordered.
    doc_ids:   ``[n_cells*cell_size]`` int32 original doc ids, -1 on
      the padded tail.
    cell_size: rows per cell.
    """

    centroids: np.ndarray
    codes: np.ndarray
    doc_ids: np.ndarray
    cell_size: int

    @property
    def n_cells(self) -> int:
        return self.centroids.shape[0]

    @property
    def n_pad(self) -> int:
        """Padded tail rows (all in the last cell)."""
        return int((self.doc_ids < 0).sum())


def build_ivf(
    embeddings: np.ndarray,
    cb: PQCodebook,
    codes: np.ndarray,
    cell_size: int = 1024,
    sample: int = 131072,
    iters: int = 15,
    seed: int = 0,
    batch: int = 131072,
) -> IVFIndex:
    """Cluster a PQ-coded corpus into balanced cells for coarse pruning.

    Coarse k-means (``N/cell_size`` centroids, trained on a sample with
    the same jitted Lloyd loop the codebooks use) groups semantically
    close documents; sorting by cluster and chopping into fixed
    ``cell_size`` cells turns the ragged clusters into a dense
    ``[n_cells, cell_size, m]`` layout. Cell means are computed from
    the actual members, so boundary cells spanning two clusters stay
    honestly summarized.
    """
    n, d = embeddings.shape
    n_cells = max(1, -(-n // cell_size))
    rng = np.random.default_rng(seed)

    rows = (
        rng.choice(n, size=sample, replace=False) if n > sample
        else np.arange(n)
    )
    x_sample = cb.rotate(np.asarray(embeddings[rows], np.float32))
    k_coarse = min(n_cells, len(rows))
    init = x_sample[rng.choice(len(rows), size=k_coarse, replace=False)]
    coarse = np.asarray(
        _kmeans_subspace(jnp.asarray(x_sample), jnp.asarray(init), iters),
        np.float32,
    )

    # assign every doc to its nearest coarse centroid (batched device
    # matmul; cosine == inner product post-normalization is what search
    # uses, but assignment must be least-squares like the k-means)
    c_half = 0.5 * np.sum(coarse * coarse, axis=1)
    assign = np.empty(n, np.int32)

    @jax.jit
    def _assign(xb):
        return jnp.argmax(
            xb @ jnp.asarray(coarse).T - jnp.asarray(c_half)[None, :],
            axis=1,
        ).astype(jnp.int32)

    for lo in range(0, n, batch):
        hi = min(lo + batch, n)
        xb = cb.rotate(np.asarray(embeddings[lo:hi], np.float32))
        assign[lo:hi] = np.asarray(_assign(jnp.asarray(xb)))

    order = np.argsort(assign, kind="stable").astype(np.int32)
    n_total = n_cells * cell_size
    doc_ids = np.full(n_total, -1, np.int32)
    doc_ids[:n] = order
    cell_codes = np.zeros((n_total, codes.shape[1]), np.uint8)
    cell_codes[:n] = np.asarray(codes)[order]

    # cell means over actual members, in the rotated (scoring) space
    centroids = np.zeros((n_cells, d), np.float32)
    for c in range(n_cells):
        members = doc_ids[c * cell_size : (c + 1) * cell_size]
        members = members[members >= 0]
        if len(members):
            centroids[c] = cb.rotate(
                np.asarray(embeddings[members], np.float32)
            ).mean(axis=0)

    return IVFIndex(
        centroids=centroids, codes=cell_codes, doc_ids=doc_ids,
        cell_size=cell_size,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "probes", "cell_size", "interpret"),
)
def _pq_ivf_topk_impl(
    queries, centroids, cell_codes, cell_doc_ids, codebooks,
    k: int, probes: int, cell_size: int, interpret: bool,
    q_valid=None,
):
    q, _ = queries.shape
    n_cells = centroids.shape[0]

    # coarse probe: one [Q, n_cells] matmul -> shared probe set with a
    # per-query guarantee: every query's own top-(probes//Q) cells are
    # always included (scatter an indicator, bias those cells above
    # everything), remaining slots go to the globally best cells. For
    # Q=1 this degenerates to the query's exact top-`probes`.
    cell_scores = queries @ centroids.T
    # EMPTY pad cells (mesh-alignment padding in the sharded layout)
    # must be unselectable by construction, not by centroid value: any
    # sentinel centroid c scores q·c, whose SIGN depends on the query
    # (a -1e30 fill ranks TOP for queries with negative coordinate
    # sum). Validity comes from the ids: padding is tail-only within a
    # cell, so a cell is empty iff its first member id is -1.
    cell_valid = (
        cell_doc_ids.reshape(n_cells, cell_size)[:, 0] >= 0
    )
    cell_scores = jnp.where(cell_valid[None, :], cell_scores, -jnp.inf)
    # ``q_valid`` ([Q] bool, traced): PADDED queries (batch rounded to a
    # stable trace shape) must not vote — their '' embeddings otherwise
    # claim guaranteed cells and steer the shared remainder, spending
    # real read budget on rows whose results are discarded. Masked rows
    # go fully -inf so neither the per-query guarantee nor the shared
    # aggregate sees them (reads stay static: `probes` doesn't change,
    # every probed cell just serves a real query).
    if q_valid is not None:
        cell_scores = jnp.where(q_valid[:, None], cell_scores, -jnp.inf)
    t = max(1, min(probes // q, n_cells))
    _, per_q = jax.lax.top_k(cell_scores, t)            # [Q, t]
    vote = (
        jnp.ones((q, t), jnp.float32)
        if q_valid is None
        else jnp.broadcast_to(
            q_valid[:, None].astype(jnp.float32), (q, t)
        )
    )
    picked = jnp.zeros((n_cells,), jnp.float32).at[
        per_q.reshape(-1)
    ].max(vote.reshape(-1))
    agg = jnp.max(cell_scores, axis=0)
    # two-key selection (picked first, then aggregate score): an
    # additive +1e10 bias would swallow agg in fp32 and break ties by
    # cell index, so whenever more cells are picked than the budget
    # holds (probes < Q makes the guarantee infeasible) the winners
    # would be the LOWEST-INDEXED picked cells, not the best-scoring
    _, _, sel = jax.lax.sort(
        (-picked, -agg, jnp.arange(n_cells, dtype=jnp.int32)),
        num_keys=2,
    )
    sel = sel[:probes]
    # ascending cell order => the padded tail cell (id n_cells-1) lands
    # LAST in the gathered sub-corpus, so validity is a prefix count
    sel = jnp.sort(sel)

    rows = (
        sel[:, None] * cell_size
        + jnp.arange(cell_size, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    sub_codes = jnp.take(cell_codes, rows, axis=0)      # [P*S, m]
    sub_ids = jnp.take(cell_doc_ids, rows)              # [P*S]

    n_sub = probes * cell_size
    # padding (-1 ids) lives only in the tail cells by construction and
    # `sel` is ascending, so validity is a prefix count
    n_valid = jnp.sum(sub_ids >= 0).astype(jnp.int32)

    kk = min(k, n_sub)
    s, i = pq_topk(
        queries, sub_codes, codebooks, kk, n_valid=n_valid,
        interpret=interpret,
    )
    gids = jnp.take(sub_ids, jnp.clip(i, 0, n_sub - 1))
    bad = (i < 0) | (gids < 0) | ~jnp.isfinite(s)
    return jnp.where(bad, -jnp.inf, s), jnp.where(bad, -1, gids)


def pq_ivf_topk(
    queries: jax.Array,
    ivf: IVFIndex,
    codebooks,
    k: int,
    *,
    probes: int = 64,
    interpret: bool = False,
    q_valid: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k PQ candidates scanning only ``probes`` cells — o(N).

    ``q_valid`` ([Q] bool): mark PADDED batch rows so they neither
    claim guaranteed cells nor steer the shared probe set — the whole
    budget serves real queries (rows marked invalid return garbage;
    discard them).

    The flat ``pq_topk`` reads all N codes per batch; this reads
    ``probes * cell_size`` rows (one contiguous slice per probed cell),
    cutting HBM traffic by ``n_cells/probes`` — the regime where the
    capacity tier lives (10M+ docs/chip) and the single-query latency
    path. Probes are a shared sorted union across the batch
    (max-aggregated cell scores) with each query guaranteed its own
    top-(probes//Q) cells, so large diverse batches need a probe
    budget that scales with Q — callers (parallel/sharded.py
    ``_local_pq_ivf_topc``) raise the budget to ``>= 4*Q`` so every
    query keeps at least 4 guaranteed cells; pass a larger ``probes``
    directly for stricter recall, or use the flat scan (``pq_topk``)
    when the batch is large enough to amortize the full read.

    Returns ``(pq_scores [Q, k], global_ids [Q, k])``; candidates feed
    :func:`legal_rag_tpu.ops.dense.exact_rescore` exactly like the
    flat path. Tie order within equal scores follows the cell layout
    (not global id) — irrelevant post-rescore.
    """
    probes = min(probes, ivf.n_cells)
    return _pq_ivf_topk_impl(
        queries, jnp.asarray(ivf.centroids), jnp.asarray(ivf.codes),
        jnp.asarray(ivf.doc_ids), jnp.asarray(codebooks),
        k, probes, ivf.cell_size, interpret, q_valid=q_valid,
    )
