"""Dense (semantic) search: fused matmul + top-k.

TPU-native replacement for FAISS ``IndexFlatIP`` exact inner-product
search (reference create_vector_store.py:55-56, retrieval_engine.py:64).

Three interchangeable backends with identical semantics:

- :func:`dense_topk_xla` — plain ``jnp.dot`` + ``jax.lax.top_k``;
  materializes the full ``[Q, N]`` score matrix. Slope-measured on
  v5e this is the FASTEST path at every corpus size that fits in HBM
  (BASELINE.md round-2 shootout) — the production dispatch.
- :func:`dense_topk_pallas` — fused matmul + running top-k that never
  writes ``[Q, N]`` scores to HBM. Its selection is O(k·N) VPU work,
  which loses to XLA everywhere on v5e (2.7x at N=2.7k, 11x at 65k);
  kept as an explicit opt-in for its minimal-memory property and as
  the reference in-kernel selection implementation.
- :func:`dense_topk_twophase` — Pallas segment-max sweep + tiny XLA
  refine; its intermediate is ``seg_rows`` times smaller than the
  score matrix, so it takes over automatically when ``[Q, N]`` would
  crowd HBM (``_SCORE_MATRIX_BUDGET_BYTES`` in parallel/sharded.py).

Semantics (pinned by tests/test_dense.py against a numpy brute-force
golden, which is the same math FAISS flat performs):

- scores are inner products accumulated in float32 (documents may be
  stored bfloat16 for 2x HBM bandwidth; the parity mode uses float32),
- results sorted by descending score,
- ties broken by ascending document id (matches ``jax.lax.top_k``).
"""

from __future__ import annotations

import functools
import os
import threading
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Row-wise L2 normalization (reference faiss.normalize_L2,
    create_vector_store.py:51). Zero rows are left at zero."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


# ---------------------------------------------------------------------------
# XLA reference backend
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "precision"))
def dense_topk_xla(
    queries: jax.Array,
    docs: jax.Array,
    k: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k inner-product search via XLA.

    Args:
      queries: ``[Q, D]`` float query matrix (L2-normalized for cosine).
      docs:    ``[N, D]`` document matrix.
      k:       number of neighbours.
      precision: matmul precision. HIGHEST = true fp32 accumulation for
        FAISS-flat score parity; DEFAULT lets the MXU use fast bf16
        passes (fine for recall, not for exact score equality).

    Returns:
      ``(scores [Q, k] f32, ids [Q, k] i32)`` sorted descending.
    """
    scores = jnp.dot(
        queries,
        docs.T.astype(queries.dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    top_s, top_i = jax.lax.top_k(scores, k)
    return top_s, top_i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas fused backend
# ---------------------------------------------------------------------------


# plain Python scalars — jnp scalars here would be captured as constants
# by Pallas kernels, which pallas_call rejects
_INT32_MAX = 2**31 - 1
# finite stand-in for -inf inside the fused kernel: the segmented
# extraction multiplies masked scores by a 0/1 one-hot on the MXU, and
# 0 * -inf would poison the result with NaN
_NEG_F32 = float(np.finfo(np.float32).min)


def _take_max_by_id(s, ids):
    """One selection step: the max score, tie-broken by the LOWEST id.

    Deliberately avoids ``argmax``: on real TPU hardware, argmax inside
    a Pallas kernel resolves ties to the LAST occurrence (the interpret
    path gives the first), which silently breaks FAISS-parity ordering
    for duplicate documents. max-reduce the score, then min-reduce the
    id over the score-tied set — deterministic on every backend.

    Returns (m [BQ], picked_id [BQ], cleared s).
    """
    m = jnp.max(s, axis=1)
    tie = s == m[:, None]
    picked = jnp.min(jnp.where(tie, ids, _INT32_MAX), axis=1)
    s = jnp.where(tie & (ids == picked[:, None]), -jnp.inf, s)
    return m, picked, s


def _select_topk_block(s, base_col, k):
    """Iteratively select the k largest entries of ``s`` ([BQ, BN]),
    ties to the lowest id. k is small and static, so the Python loop
    unrolls into k VPU reductions — no sort network needed.
    Returns (scores [BQ, k], global ids [BQ, k])."""
    ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base_col
    out_s, out_i = [], []
    for _ in range(k):
        m, picked, s = _take_max_by_id(s, ids)
        out_s.append(m)
        out_i.append(picked)
    return jnp.stack(out_s, axis=1), jnp.stack(out_i, axis=1)


def _merge_topk(run_s, run_i, blk_s, blk_i, k):
    """Merge running top-k with a block top-k (both sorted desc), score
    ties resolved by lowest doc id (running and block id ranges are
    disjoint, so ids are unique)."""
    cs = jnp.concatenate([run_s, blk_s], axis=1)  # [BQ, 2k]
    ci = jnp.concatenate([run_i, blk_i], axis=1)
    out_s, out_i = [], []
    for _ in range(k):
        m, picked, cs = _take_max_by_id(cs, ci)
        out_s.append(m)
        out_i.append(picked)
    return jnp.stack(out_s, axis=1), jnp.stack(out_i, axis=1)


def _fused_topk_kernel(
    nv_ref, q_ref, d_ref, out_s_ref, out_i_ref, s_sc, i_sc,
    *, k, block_n, n_real, precision,
):
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        s_sc[:] = jnp.full(s_sc.shape, -jnp.inf, dtype=s_sc.dtype)
        i_sc[:] = jnp.zeros(i_sc.shape, dtype=i_sc.dtype)

    # [BQ, D] x [D, BN] -> [BQ, BN] on the MXU, fp32 accumulation.
    s = jnp.dot(
        q_ref[:], d_ref[:],
        preferred_element_type=jnp.float32, precision=precision,
    )
    base = j * block_n
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    # mask padding columns INSIDE the selection: both the static width
    # padding (n_real) and the caller's dynamic valid count (nv_ref,
    # e.g. global-padding zero docs on a mesh's last shard, whose 0.0
    # scores would otherwise evict real negative-cosine candidates)
    limit = jnp.minimum(n_real, nv_ref[0])
    s = jnp.where(col < limit, s, _NEG_F32)

    blk_s, blk_i = _select_topk_block(s, base, k)
    new_s, new_i = _merge_topk(s_sc[:], i_sc[:], blk_s, blk_i, k)
    s_sc[:] = new_s
    i_sc[:] = new_i

    @pl.when(j == nb - 1)
    def _emit():
        out_s_ref[:] = s_sc[:]
        out_i_ref[:] = i_sc[:]


def _pad_to(x: jax.Array, size: int, axis: int, value=0) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block_n", "block_q", "interpret", "precision"),
)
def dense_topk_pallas(
    queries: jax.Array,
    docs_t: jax.Array,
    k: int,
    *,
    n_valid: "Optional[jax.Array]" = None,
    block_n: int = 1024,
    block_q: int = 8,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """Fused matmul + top-k without materializing [Q, N] scores.

    Args:
      queries: ``[Q, D]`` query matrix.
      docs_t:  ``[D, N]`` *transposed* document matrix (column-major
               docs, so each grid step loads a contiguous ``[D, BN]``
               tile straight into the MXU's RHS).
      k:       neighbours per query.
      n_valid: optional dynamic scalar — only columns ``< n_valid``
               compete in selection (callers embedding this shard in a
               mesh pass their slice of the global doc count, so zero
               pad docs can't evict real negative-cosine candidates).
      block_n/block_q: tile sizes; block_n a multiple of 128,
               block_q a multiple of 8 (fp32 sublane tile).
      interpret: run in interpreter mode (CPU tests).

    Returns:
      ``(scores [Q, k] f32, ids [Q, k] i32)``, identical ordering to
      :func:`dense_topk_xla`.
    """
    q, d = queries.shape
    d2, n = docs_t.shape
    assert d == d2, f"dim mismatch {d} vs {d2}"

    qp = -(-q // block_q) * block_q
    np_ = -(-n // block_n) * block_n
    # keep the caller's dtype (bf16 fast mode casts queries upstream);
    # accumulation is always fp32 via preferred_element_type
    queries = _pad_to(queries, qp, 0)
    docs_t = _pad_to(docs_t, np_, 1)

    nv = jnp.reshape(
        jnp.asarray(n if n_valid is None else n_valid, jnp.int32), (1,)
    )
    grid = (qp // block_q, np_ // block_n)
    kernel = functools.partial(
        _fused_topk_kernel, k=k, block_n=block_n, n_real=n,
        precision=precision,
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_n), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, k), jnp.float32),
            jax.ShapeDtypeStruct((qp, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, k), jnp.float32),
            pltpu.VMEM((block_q, k), jnp.int32),
        ],
        interpret=interpret,
    )(nv, queries, docs_t)
    return out_s[:q], out_i[:q]


# ---------------------------------------------------------------------------
# Two-phase large-N backend
# ---------------------------------------------------------------------------


def _segmax_kernel(
    nv_ref, q_ref, d_ref, m_ref, *, block_n, seg_rows, n_real, precision,
):
    """Phase 1: per (query-block, doc-block) grid step, reduce the
    [BQ, BN] score tile to per-*segment* maxima (a segment =
    ``seg_rows`` docs strided 128 apart, so the reduction stays
    lane-aligned). The [Q, N] score matrix never reaches HBM — only
    [Q, N/seg_rows] segment maxima do; member doc ids are pure index
    arithmetic recovered in phase 2, so no id tracking in the hot
    loop. ``seg_rows`` trades phase-2 gather volume (k' * seg_rows
    docs per query) against phase-2 top-k width (N/seg_rows),
    independently of the DMA block size."""
    j = pl.program_id(1)
    s = jnp.dot(
        q_ref[:], d_ref[:],
        preferred_element_type=jnp.float32, precision=precision,
    )
    base = j * block_n
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    # mask both the static width padding (n_real) and the caller's
    # dynamic valid count (nv_ref — e.g. global zero-pad docs on a
    # mesh's last shard, whose 0.0 scores would otherwise evict real
    # negative-cosine candidates from the segment maxima)
    limit = jnp.minimum(n_real, nv_ref[0])
    s = jnp.where(col < limit, s, _NEG_F32)

    bq, bn = s.shape
    groups = bn // (seg_rows * 128)
    s4 = s.reshape(bq, groups, seg_rows, 128)     # minor dim stays 128
    m_ref[:] = jnp.max(s4, axis=2).reshape(bq, groups * 128)


# Extra segments taken beyond k to absorb exact-score ties at the
# selection boundary (lax.top_k breaks segment ties by position, not by
# doc id; the final rescore then orders exactly). Correct as long as no
# more than this many segments tie EXACTLY at the k-th boundary score —
# i.e. > _TIE_OVERSAMPLE duplicate documents with identical scores.
_TIE_OVERSAMPLE = 64

# Segment count above which phase 2 uses the two-level (super-segment)
# select instead of a flat lax.top_k over [Q, n_segs]. Tests lower this
# to exercise the two-level branch on small corpora.
_TWO_LEVEL_MIN_SEGS = 16384

# NOTE on a tried-and-reverted idea (late round 4): splitting the
# member top_k into <=2048-wide chunks (per-chunk top-kk + merge) to
# dodge a suspected XLA top_k "width cliff" was A/B-measured SLOWER on
# the real select input at both 262k and 1M docs (+0.10-0.13 ms;
# select-only idle-chip A/B, recorded in BASELINE.md): top_k work is
# O(k*width) with or without chunking, so chunking only adds dispatch
# and merge overhead. The flat member top_k below is the measured
# optimum; exp_member_topk's "+0.3 ms" is simply that real cost.


def _select_segments(
    seg_m: jax.Array, kk: int, n_segs: int, sup: int = 128
) -> jax.Array:
    """Top-``kk`` segment positions per query from ``seg_m [Q, n_segs]``.

    Uses the two-level (super-segment) select above
    ``_TWO_LEVEL_MIN_SEGS`` (the round-3 roofline finding: a flat
    ``lax.top_k`` over [Q, N/seg_rows] costs 1.9 ms at 1M docs — twice
    phase 1 itself — because XLA's top_k is O(k*width) VPU work).
    Level 1 reduces 128 segments to one super-segment max and top-k's
    the [Q, n_segs/128] supers; level 2 extracts the chosen supers'
    member segments via a one-hot einsum (NOT take_along_axis: an XLA
    TPU gather at [Q, kk*128] volume measured 6.4 ms — slower than the
    flat top_k it replaces — while the batched one-hot matmul is MXU
    work, the same gather-free construction as the PQ candidate
    rescore, ops/pq.py) and top-k's those. Exactness: the j-th-ranked
    segment has at most j-1 segments strictly above it, hence at most
    j-1 supers with a strictly larger max, so every top-kk segment
    lives in a top-kk super; exact boundary TIES can displace supers,
    the same >_TIE_OVERSAMPLE duplicate-score contract the flat select
    already has.
    """
    q = seg_m.shape[0]
    if (
        n_segs >= _TWO_LEVEL_MIN_SEGS
        and n_segs % sup == 0
        and n_segs // sup >= kk
    ):
        n_sup = n_segs // sup
        s3 = seg_m.reshape(q, n_sup, sup)
        m2 = jnp.max(s3, axis=2)
        _, sup_idx = jax.lax.top_k(m2, kk)                      # [Q, kk]
        onehot = (
            sup_idx[:, :, None] == jnp.arange(n_sup)[None, None, :]
        ).astype(jnp.float32)                                   # [Q,kk,S']
        vals = jnp.einsum(
            "qjs,qsl->qjl", onehot, s3,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(q, kk * sup)
        _, j = jax.lax.top_k(vals, kk)
        # member id derived from the flat position — no [Q, kk*sup]
        # member-id matrix to materialize
        sup_of = jnp.take_along_axis(sup_idx, j // sup, axis=1)
        return sup_of * sup + (j % sup)                         # [Q, kk]
    _, seg_pos = jax.lax.top_k(seg_m, kk)
    return seg_pos


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_n", "block_q", "seg_rows", "interpret", "precision",
    ),
)
def dense_topk_twophase(
    queries: jax.Array,
    docs_t: jax.Array,
    k: int,
    *,
    n_valid: "Optional[jax.Array]" = None,
    block_n: int = 1024,
    block_q: int = 8,      # for batch search use block_q >= Q so the
                           # doc matrix streams through VMEM exactly ONCE
    seg_rows: int = 8,     # docs per segment; phase-2 gather volume is
                           # k' * seg_rows docs/query, phase-2 top-k
                           # width is N/seg_rows — tune independently of
                           # the DMA block size
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> Tuple[jax.Array, jax.Array]:
    """Large-N exact top-k: Pallas segment-max sweep + XLA refine.

    Phase 1 (Pallas, bandwidth-bound): one pass over the doc matrix
    emitting per-segment (max, argmax-id) — an N/seg_rows-fold
    reduction with no [Q, N] HBM materialization and O(N) VPU work
    (the fused kernel's running-top-k selection is O(k*N), which
    dominates beyond ~100k docs). XLA's dot+top_k writes the [Q, N]
    f32 score matrix to HBM and reads it back for top_k — at 1M docs
    that is ~512 MB of extra traffic this kernel never pays.

    Phase 2 (XLA, tiny): top-(k + oversample) segments per query, a
    [Q, K', D] gather of exactly those segments' document columns, an
    exact rescore matmul, and a two-key sort for (score desc, id asc)
    final ordering — identical semantics to the other backends.

    ``n_valid``: optional dynamic scalar — only columns ``< n_valid``
    compete (mesh callers pass their slice of the global doc count so
    zero-pad docs can't evict real negative-cosine candidates).
    """
    q, d = queries.shape
    d2, n = docs_t.shape
    assert d == d2, f"dim mismatch {d} vs {d2}"
    assert block_n % (seg_rows * 128) == 0, (
        f"block_n {block_n} must be a multiple of seg_rows*128 "
        f"({seg_rows * 128})"
    )
    qp = -(-q // block_q) * block_q
    np_ = -(-n // block_n) * block_n
    queries_p = _pad_to(queries, qp, 0)
    docs_p = _pad_to(docs_t, np_, 1)
    nb = np_ // block_n
    groups = block_n // (seg_rows * 128)
    segs_per_block = groups * 128

    nv = jnp.reshape(
        jnp.asarray(n if n_valid is None else n_valid, jnp.int32), (1,)
    )
    kernel = functools.partial(
        _segmax_kernel, block_n=block_n, seg_rows=seg_rows, n_real=n,
        precision=precision,
    )
    seg_m = pl.pallas_call(
        kernel,
        grid=(qp // block_q, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec(
            (block_q, segs_per_block), lambda i, j: (i, j)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (qp, nb * segs_per_block), jnp.float32
        ),
        interpret=interpret,
    )(nv, queries_p, docs_p)

    # phase 2: segment selection (+ tie oversample), gather, rescore
    n_segs = nb * segs_per_block
    kk = min(k + _TIE_OVERSAMPLE, n_segs)
    seg_pos = _select_segments(seg_m, kk, n_segs)               # [Qp, kk]
    block_idx = seg_pos // segs_per_block
    rem = seg_pos % segs_per_block
    g_idx = rem // 128
    lane_idx = rem % 128
    # doc ids of every element of each chosen segment: [Qp, kk, seg_rows]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (qp, kk, seg_rows), 2)
    cand_ids = (
        block_idx[:, :, None] * block_n
        + g_idx[:, :, None] * (seg_rows * 128)
        + r_iota * 128
        + lane_idx[:, :, None]
    )
    cand_flat = cand_ids.reshape(qp, kk * seg_rows)
    cand_safe = jnp.clip(cand_flat, 0, np_ - 1)

    # gather candidate doc columns and rescore exactly
    gathered = jnp.take(docs_p, cand_safe, axis=1)              # [D, Qp, KR]
    scores = jnp.einsum(
        "qd,dqc->qc", queries_p.astype(jnp.float32),
        gathered.astype(jnp.float32),
        precision=precision,
    )
    limit = jnp.minimum(jnp.int32(n), nv[0])
    scores = jnp.where(cand_flat < limit, scores, -jnp.inf)

    # exact (score desc, id asc) ordering via two-key sort
    neg_s, ids_sorted = jax.lax.sort(
        (-scores, cand_flat), num_keys=2, dimension=1
    )
    return -neg_s[:q, :k], ids_sorted[:q, :k].astype(jnp.int32)


def _segmax_rm_kernel(
    nv_ref, qt_ref, d_ref, m_ref, *, block_n, seg_rows, precision,
    transpose_out,
):
    """Row-major phase 1: [BN, D] doc tile x [D, BQ] queries -> [BN, BQ]
    scores on the MXU, then max over SUBLANE groups of ``seg_rows``
    contiguous docs -> [BN/seg_rows, BQ]. Docs-major throughout: the
    doc matrix streams in its storage layout and phase 2's candidate
    gather later reads contiguous [D]-rows (the round-3 roofline
    finding — the column-major [D, N] gather cost 2.8 ms/1M docs in 384
    strided 2-byte reads per doc, 5x the row gather).

    ``transpose_out``: emit the tile QUERY-major ([BQ, BN/seg_rows]) so
    phase 2 never pays the [n_segs, Q] -> [Q, n_segs] XLA transpose
    (round-3 breakdown: the select stage cost 0.50 ms/1M docs, a large
    part of it that 2x33 MB transpose). The in-tile transpose is XLU
    work overlapped with the HBM-bound matmul; the lane dim stays
    128-divisible via the ``block_n % (seg_rows*128) == 0`` contract.
    """
    j = pl.program_id(1)
    if d_ref.dtype == jnp.int8:
        # int8 x int8 -> int32 MXU accumulation; the per-SEGMENT dequant
        # scale commutes with the in-group max (sharded.from_embeddings
        # quantizes with one scale per TWOPHASE_SEG_ROWS group), so the
        # integer segment-max is exact and dequant happens on the tiny
        # [Q, n_segs] map outside
        s = jnp.dot(
            d_ref[:], qt_ref[:], preferred_element_type=jnp.int32,
        )
        neg = jnp.int32(-(2 ** 30))
    else:
        s = jnp.dot(
            d_ref[:], qt_ref[:],
            preferred_element_type=jnp.float32, precision=precision,
        )
        neg = _NEG_F32
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * block_n
    s = jnp.where(row < nv_ref[0], s, neg)
    bn, bq = s.shape
    m = jnp.max(s.reshape(bn // seg_rows, seg_rows, bq), axis=1)
    m_ref[:] = m.T if transpose_out else m


# Per-shard doc count at which the row-major two-phase kernel becomes
# the dense dispatch. Slope-measured on v5e vs XLA dot+top_k (batch 64,
# bf16, k=10; round-4 sweep-promoted constants kt=0/sup=64,
# scripts/bench_scale.py). An IDLE-chip sweep is required — a
# contended sweep (round 4 briefly promoted 196608 from one) flattered
# the kernel because interleaved foreign programs hurt XLA's timed
# loops more. Idle-chip evidence (two independent late-round-4 runs):
# XLA wins consistently at <=262,144 (0.81 vs 0.89; 0.89 vs 0.98 ms),
# 327,680 splits across runs (XLA 1.03 vs 1.08; rm 0.84 vs 1.30), and
# rm wins consistently from 393,216 up (0.52-1.18 vs 1.03-1.31 there;
# 1.25-1.34 vs 1.96-2.03 at 524k; 1.75-2.03 vs 3.88-3.93 at 1M).
# Threshold = first CONSISTENT rm-win point, a TWOPHASE_BLOCK_N
# multiple. Shards must be 8192-row aligned for the no-copy path
# (from_embeddings aligns automatically).
TWOPHASE_MIN_DOCS = 393216

# Row-block alignment the row-major kernel wants so no in-jit pad copy
# of the doc matrix happens (measured +2.3 ms/1M docs when it does).
TWOPHASE_BLOCK_N = 8192

# Segment width for the production dispatch (scripts/exp_rm_sweep.py
# pins the measured-best value; sharded._local_dense_topc uses this).
TWOPHASE_SEG_ROWS = 8

# Lazily-probed: does this backend's Mosaic accept the round-4
# in-kernel transposed segment-max output tile? The transpose source
# has a sub-128 lane dim (the query tile), which Mosaic relayouts —
# believed fine, but a rejection here must DEGRADE (old layout + XLA
# transpose), not crash the production dispatch on real hardware the
# first time it runs. One tiny compile per map dtype (f32 / the int8
# tier's int32), cached per process.
_KERNEL_T_OK: dict = {}


def _probe_kernel_transpose(docs_dtype) -> bool:
    """Compile+run the transposed-output kernel on a tiny shape.

    The resolution of ``kernel_transpose=None`` happens while TRACING
    the production dispatch (the caller sits inside jit/shard_map), so
    the probe must escape the ambient trace — a probe that runs UNDER
    the trace sees Tracers, raises ``AttributeError`` on
    ``block_until_ready``, and silently caches False (disabling the
    in-kernel transpose everywhere) while deferring any genuine Mosaic
    rejection to the outer program's compile. JAX's trace stack is
    thread-local, so a fresh thread gives the probe a clean eager
    context: the tiny inputs are concrete, the nested jit compiles and
    executes for real, and a rejection surfaces HERE (degrade to the
    XLA-transpose layout), never at the production dispatch.
    """

    def run() -> None:
        try:
            if jnp.dtype(docs_dtype) == jnp.int8:
                q = jnp.zeros((8, 128), jnp.float32)
                d = jnp.zeros((1024, 128), jnp.int8)
                kw = {"doc_scales": jnp.ones((1024,), jnp.float32)}
            else:
                q = jnp.zeros((8, 128), docs_dtype)
                d = jnp.zeros((1024, 128), docs_dtype)
                kw = {}
            out = dense_topk_twophase_rm(
                q, d, 2, block_n=1024, seg_rows=8,
                kernel_transpose=True,
                interpret=jax.default_backend() != "tpu", **kw,
            )[0]
            out.block_until_ready()
            result["ok"] = True
        except Exception:  # noqa: BLE001 — Mosaic rejection
            result["ok"] = False

    result: dict = {}
    t = threading.Thread(target=run, name="rm-kernel-t-probe")
    t.start()
    t.join()
    return result.get("ok", False)


def _kernel_transpose_supported(docs_dtype=jnp.bfloat16) -> bool:
    key = str(jnp.dtype(docs_dtype))
    if key not in _KERNEL_T_OK:
        if jax.default_backend() != "tpu":
            _KERNEL_T_OK[key] = True  # CPU interpret handles transposes
        else:
            _KERNEL_T_OK[key] = _probe_kernel_transpose(docs_dtype)
    return _KERNEL_T_OK[key]


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_n", "block_q", "seg_rows", "interpret", "precision",
        "kernel_transpose", "sup",
    ),
)
def dense_topk_twophase_rm(
    queries: jax.Array,
    docs: jax.Array,
    k: int,
    *,
    n_valid: "Optional[jax.Array]" = None,
    block_n: int = TWOPHASE_BLOCK_N,
    block_q: int = 64,
    seg_rows: int = 8,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    kernel_transpose: Optional[bool] = None,
    sup: int = 64,
    doc_scales: "Optional[jax.Array]" = None,
) -> Tuple[jax.Array, jax.Array]:
    """Row-major large-N exact top-k: the production dense backend at
    scale (slope-measured 2.2 ms vs XLA dot+top_k's 3.9 ms per
    batch-64 at 1M docs on v5e — BASELINE.md round-3 scale table).

    Same two-phase structure as :func:`dense_topk_twophase` but with
    docs stored ``[N, D]`` (row-major), which buys two things the
    column-major variant measured dearly for:

    - phase 1 streams ``[BN, D]`` doc tiles as the matmul LHS — no
      transposed copy of the index is ever built or padded in-jit;
    - phase 2's candidate gather reads each candidate as ONE contiguous
      768 B row instead of 384 strided 2-byte column elements (2.8 ms
      -> 0.5 ms at 1M docs).

    A segment is ``seg_rows`` CONTIGUOUS docs (row-major), so member
    doc ids are ``seg_pos*seg_rows + iota`` — pure index arithmetic.
    Semantics identical to every other backend: exact scores via the
    fp32 rescore of the selected segments' members, (score desc, id
    asc) final order, ``n_valid`` masking for mesh callers. Tie
    contract: exact when < ``_TIE_OVERSAMPLE`` segments tie exactly at
    the selection boundary (the rescore then orders exactly).

    Round-4 phase-2 rework (the fixed ~1 ms at 1M docs was the whole
    gap between 46% end-to-end and 84% phase-1 HBM efficiency —
    VERDICT r3 item 4):

    - ``kernel_transpose`` (default OFF by measurement — the r4
      hardware sweep has it 0.2 ms slower at 1M; env
      ``LEGAL_RAG_RM_KERNEL_T=1`` opts in): phase 1 emits tiles
      already QUERY-major, killing the 2x33 MB [n_segs, Q] transpose —
      but the in-tile transpose costs phase 1 more than that saves.
    - the candidate gather moves whole SEGMENTS (one contiguous
      ``seg_rows*D``-byte row of the freely-reshaped
      ``[N/seg_rows, seg_rows*D]`` view — 6 KB at sr=8/bf16) instead
      of ``seg_rows`` separate 768 B doc rows.
    - the rescore keeps bf16 operands on the MXU with fp32
      accumulation (bf16 products are exact in f32 — no f32 upcast
      copy of the gathered block is materialized); mixed-dtype inputs
      fall back to the upcast path.

    int8 capacity mode (round 4): ``docs`` int8 with ``doc_scales``
    ([N] f32, constant within each ``seg_rows`` group — the
    per-segment quantization ``sharded.ShardedIndex.from_embeddings``
    produces). Queries (float) quantize per-row symmetric exactly like
    the XLA int8 path; phase 1 runs int8 x int8 -> int32 on the MXU
    and the integer segment-max commutes with the shared group scale,
    so dequant touches only the [Q, n_segs] map. Scores match the XLA
    int8 path's metric bit-for-bit (same quantization, same
    accumulator) — the engine's oversample+fp32-rescore contract is
    unchanged. This removes the [Q, N] f32 score-matrix wall from the
    4x tier at 10M+ docs/shard.
    """
    q, d = queries.shape
    n, d2 = docs.shape
    assert d == d2, f"dim mismatch {d} vs {d2}"
    assert block_n % (seg_rows * 128) == 0, (
        f"block_n {block_n} must be a multiple of seg_rows*128 "
        f"({seg_rows * 128})"
    )
    is_int8 = docs.dtype == jnp.int8
    if is_int8 and doc_scales is None:
        raise ValueError("int8 docs require doc_scales (per-segment)")
    if kernel_transpose is None:
        # Default OFF by measurement: the r4 hardware sweep
        # (scripts/exp_rm_sweep.py, 1M docs) has kt=1 at 2.047 ms vs
        # kt=0 at 1.851 ms — the in-tile transpose costs phase 1 more
        # than the [n_segs, Q] XLA transpose it saves. Opt back in
        # with LEGAL_RAG_RM_KERNEL_T=1 (still Mosaic-probed).
        kernel_transpose = (
            os.environ.get("LEGAL_RAG_RM_KERNEL_T", "") == "1"
            and _kernel_transpose_supported(docs.dtype)
        )
    qp = -(-q // block_q) * block_q
    bq = min(block_q, qp)
    np_ = -(-n // block_n) * block_n
    queries_p = _pad_to(queries, qp, 0)
    docs_p = _pad_to(docs, np_, 0)   # no-op when the caller pre-aligned
    q_scale = None
    if is_int8:
        assert np_ % seg_rows == 0
        doc_scales_p = _pad_to(
            jnp.asarray(doc_scales, jnp.float32), np_, 0, value=1.0
        )
        seg_scales = doc_scales_p[::seg_rows]            # [n_segs] (>0)
        q_scale = jnp.max(jnp.abs(queries_p), axis=1) / 127.0
        q_scale = jnp.where(q_scale == 0, 1.0, q_scale)
        queries_p = jnp.clip(
            jnp.round(queries_p / q_scale[:, None]), -127, 127
        ).astype(jnp.int8)
    qt = queries_p.T                 # [D, Qp] — queries are tiny
    nb = np_ // block_n
    segs_per_block = block_n // seg_rows

    nv = jnp.reshape(
        jnp.asarray(n if n_valid is None else n_valid, jnp.int32), (1,)
    )
    kernel = functools.partial(
        _segmax_rm_kernel, block_n=block_n, seg_rows=seg_rows,
        precision=precision, transpose_out=kernel_transpose,
    )
    n_segs = nb * segs_per_block
    map_dtype = jnp.int32 if is_int8 else jnp.float32
    if kernel_transpose:
        out_specs = pl.BlockSpec((bq, segs_per_block), lambda i, j: (i, j))
        out_shape = jax.ShapeDtypeStruct((qp, n_segs), map_dtype)
    else:
        out_specs = pl.BlockSpec((segs_per_block, bq), lambda i, j: (j, i))
        out_shape = jax.ShapeDtypeStruct((n_segs, qp), map_dtype)
    seg_m = pl.pallas_call(
        kernel,
        grid=(qp // bq, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d, bq), lambda i, j: (0, i)),
            pl.BlockSpec((block_n, d), lambda i, j: (j, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(nv, qt, docs_p)
    if not kernel_transpose:
        seg_m = seg_m.T
    if is_int8:
        # dequant on the tiny map (q_scale > 0 is monotone per query —
        # selection doesn't need it; the masked -2^30 stays dominant
        # because seg_scales > 0)
        seg_m = seg_m.astype(jnp.float32) * seg_scales[None, :]

    # phase 2: select segments (query-major), segment-granularity gather
    kk = min(k + _TIE_OVERSAMPLE, n_segs)
    seg_pos = _select_segments(seg_m, kk, n_segs, sup=sup)      # [Qp, kk]

    # contiguous members: segment s = docs [s*seg_rows, (s+1)*seg_rows)
    cand_ids = (
        seg_pos[:, :, None] * seg_rows
        + jax.lax.broadcasted_iota(jnp.int32, (qp, kk, seg_rows), 2)
    )
    cand_flat = cand_ids.reshape(qp, kk * seg_rows)

    # one gather row per SEGMENT: [N/sr, sr*D] is a free (bitcast)
    # reshape of the row-major doc matrix, so each candidate segment
    # arrives as a single contiguous sr*D*itemsize-byte read
    docs_seg = docs_p.reshape(np_ // seg_rows, seg_rows * d)
    seg_safe = jnp.clip(seg_pos, 0, np_ // seg_rows - 1)
    gathered = jnp.take(docs_seg, seg_safe, axis=0).reshape(
        qp, kk * seg_rows, d
    )                                                           # [Qp, C, D]
    if is_int8:
        # same metric as phase 1 / the XLA int8 path: int32 accumulate,
        # then dequant by (q_scale x the candidate's segment scale)
        acc = jnp.einsum(
            "qd,qcd->qc", queries_p, gathered,
            preferred_element_type=jnp.int32,
        )
        cand_scales = jnp.take(seg_scales, seg_safe)        # [Qp, kk]
        cand_scales = jnp.broadcast_to(
            cand_scales[:, :, None], (qp, kk, seg_rows)
        ).reshape(qp, kk * seg_rows)
        scores = acc.astype(jnp.float32) * q_scale[:, None] * cand_scales
    elif queries_p.dtype == gathered.dtype:
        # bf16 x bf16 products are exact in the fp32 accumulator — no
        # upcast copy of the [Qp, C, D] block
        scores = jnp.einsum(
            "qd,qcd->qc", queries_p, gathered,
            precision=precision, preferred_element_type=jnp.float32,
        )
    else:
        scores = jnp.einsum(
            "qd,qcd->qc", queries_p.astype(jnp.float32),
            gathered.astype(jnp.float32),
            precision=precision,
        )
    limit = jnp.minimum(jnp.int32(n), nv[0])
    scores = jnp.where(cand_flat < limit, scores, -jnp.inf)

    neg_s, ids_sorted = jax.lax.sort(
        (-scores, cand_flat), num_keys=2, dimension=1
    )
    return -neg_s[:q, :k], ids_sorted[:q, :k].astype(jnp.int32)


# N above which the two-phase backend beats the fused running-top-k
# kernel (its selection is O(k*N); measured crossover on TPU v5e).
# Also the shard size above which the sparse path switches to the
# segment-sum strategy (parallel/sharded.py).
LARGE_N_THRESHOLD = 65536

# [Q, N_local] f32 score-matrix budget for the XLA dot+top_k path.
# Slope-measured on v5e (round 2): XLA wins at every N that fits —
# the two-phase segment-max kernel takes over only beyond this, where
# materializing scores would crowd HBM (its intermediate is seg_rows
# times smaller).
_SCORE_MATRIX_BUDGET_BYTES = 1 << 30


def exact_rescore(
    queries: np.ndarray,        # [Q, D] float32
    cand_ids: np.ndarray,       # [Q, C*] candidate doc ids (may contain
                                #         invalid ids < 0 or >= N)
    embeddings: np.ndarray,     # [N, D] full-precision docs (mmap ok)
    keyword: Optional[np.ndarray] = None,   # [Q, C*] normalized BM25
    weights: Optional[np.ndarray] = None,   # [Q] hybrid weights
    k: Optional[int] = None,
    dense_candidates: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact re-ranking of a small candidate set against full-precision
    embeddings — the recall-recovery pass for quantized (int8) indexes.

    The int8 index finds a slightly-oversampled candidate list fast and
    small (4x less HBM); this gathers just those C* docs' fp32 vectors
    (host mmap page reads, ~C*D*4 bytes per query) and recomputes exact
    cosine + weighted fusion, restoring recall@k = 1.0 for <10% extra
    latency (BASELINE.md int8 row; VERDICT r1 item 7).

    ``dense_candidates``: when set, the fusion pool is first narrowed
    to the exact dense top-``dense_candidates`` of the rescored set —
    reproducing the reference's dense-candidates-only fusion semantics
    (retrieval_engine.py:79-92) with the SAME pool the fp32 engine
    would use, so int8+rescore returns identical results to fp32 as
    long as the oversampled list covers that pool.

    Returns ``(fused [Q,k], ids [Q,k], sem [Q,k], keyword [Q,k])``
    sorted by fused desc, ties by ascending id (backend parity order).
    """
    q, c = cand_ids.shape
    k = min(k or c, c)
    valid = (cand_ids >= 0) & (cand_ids < embeddings.shape[0])
    safe = np.where(valid, cand_ids, 0)
    gathered = np.asarray(embeddings[safe.ravel()], dtype=np.float32)
    gathered = gathered.reshape(q, c, -1)
    sem = np.einsum(
        "qd,qcd->qc", queries.astype(np.float32), gathered
    ).astype(np.float32)
    sem = np.where(valid, sem, -np.inf)
    if keyword is None:
        keyword = np.zeros((q, c), dtype=np.float32)

    if dense_candidates is not None and dense_candidates < c:
        # exact dense top-C pool (sem desc, id asc), like the device
        # program's candidate stage but at full precision
        pool = np.lexsort((safe, -sem), axis=1)[:, :dense_candidates]
        take_pool = lambda a: np.take_along_axis(a, pool, axis=1)
        cand_ids = take_pool(cand_ids)
        sem = take_pool(sem)
        keyword = take_pool(keyword)
        valid = take_pool(valid)
        safe = take_pool(safe)
        c = dense_candidates
        k = min(k, c)

    if weights is None:
        fused = sem
    else:
        w = np.asarray(weights, dtype=np.float32)[:, None]
        fused = sem * (1.0 - w) + np.where(valid, keyword, 0.0) * w
        fused = np.where(valid, fused, -np.inf)

    # (fused desc, id asc) — same tie order as the device backends
    order = np.lexsort((safe, -fused), axis=1)[:, :k]
    take = lambda a: np.take_along_axis(a, order, axis=1)
    return take(fused), take(cand_ids), take(sem), take(keyword)


def dense_topk(
    queries: jax.Array,
    docs: jax.Array,
    k: int,
    *,
    use_pallas: bool = False,
    block_n: int = 1024,
    block_q: int = 8,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Backend-dispatching exact top-k search. ``docs`` is ``[N, D]``;
    the Pallas path transposes once (callers that keep a persistent
    index should store ``docs.T`` and call :func:`dense_topk_pallas`)."""
    if use_pallas:
        return dense_topk_pallas(
            queries, docs.T, k, block_n=block_n, block_q=block_q,
            interpret=interpret,
        )
    return dense_topk_xla(queries, docs, k)
