"""Sharded hybrid search over a device mesh.

One jitted ``shard_map`` program per (Q, P, k) shape bucket:

  per shard (compute, no communication):
    - dense scores for the local ``[D, N/S]`` doc slice (MXU matmul),
      local top-C candidates with *global* ids
    - BM25 scatter-add of the query postings that land in the local row
      range, local top-C sparse candidates, local max for normalization
  collectives (ICI):
    - ``pmax`` of the BM25 normalization max
    - one ``all_gather`` of the ``[Q, C]`` candidate tuples
  replicated epilogue (tiny ``[Q, S*C]`` arrays):
    - global top-C *by dense score* (preserving the reference's
      dense-candidates-only fusion semantics, retrieval_engine.py:79-92)
    - weighted fusion + final top-k; or RRF over both candidate lists

Parity note: merging per-shard dense top-C lists by dense score yields
exactly the global dense top-C (each shard's list is a superset of its
members in the global list), so sharded results are bit-identical to
single-chip results — tested on the 8-device virtual mesh against the
unsharded engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from legal_rag_tpu.ops.dense import (
    LARGE_N_THRESHOLD, TWOPHASE_BLOCK_N, TWOPHASE_MIN_DOCS,
    TWOPHASE_SEG_ROWS,
    _SCORE_MATRIX_BUDGET_BYTES, dense_topk_twophase_rm,
)
from legal_rag_tpu.ops.fusion import rrf_fusion

AXIS = "shard"


def _dot_nd(q, docs, precision):
    """``[Q, D] x [N, D] -> [Q, N]`` contracting on D — the row-major
    doc layout feeds the MXU directly (no transposed index copy)."""
    return jax.lax.dot_general(
        q, docs, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32
        if q.dtype != jnp.int8 else jnp.int32,
        precision=precision,
    )


def _local_dense_topc(
    q, docs_local, base, n_docs, c, precision, use_pallas,
    block_n=1024, block_q=8, doc_scales=None,
):
    """Local [Q, C] dense candidates with global ids; padding masked.
    ``docs_local`` is the shard's ``[n_local, D]`` row slice.

    bfloat16 doc shards: queries cast to bf16, single MXU pass.
    int8 doc shards: queries quantize per-row symmetric, the matmul
    accumulates int32 on the MXU, and the per-query x per-doc scales
    dequantize the accumulator. fp32 keeps the requested (parity)
    precision.
    """
    n_local_w = docs_local.shape[0]
    if docs_local.dtype == jnp.int8:
        # Large shards ride the int8 two-phase kernel (round 4): the
        # per-SEGMENT quantization from_embeddings produces lets the
        # integer segment-max commute with dequant, so no [Q, n_local]
        # f32 score matrix materializes — previously this branch hit
        # the score-matrix wall at exactly the corpus sizes the 4x
        # tier exists for. Same metric (and tie order) as the XLA
        # path below, so the dispatch point doesn't change results.
        aligned8 = (
            n_local_w % TWOPHASE_BLOCK_N == 0
            and n_local_w % TWOPHASE_SEG_ROWS == 0
        )
        if aligned8 and (
            n_local_w >= TWOPHASE_MIN_DOCS
            or q.shape[0] * n_local_w * 4 > _SCORE_MATRIX_BUDGET_BYTES
        ):
            n_valid = jnp.clip(n_docs - base, 0, n_local_w)
            bq = max(8, min(64, -(-q.shape[0] // 8) * 8))
            s, i = dense_topk_twophase_rm(
                q, docs_local, c, n_valid=n_valid,
                block_n=TWOPHASE_BLOCK_N, block_q=bq,
                seg_rows=TWOPHASE_SEG_ROWS,
                doc_scales=doc_scales,
                interpret=jax.default_backend() != "tpu",
            )
            gids = jnp.where(i >= 0, i + base, i)
            s = jnp.where((gids >= 0) & (gids < n_docs), s, -jnp.inf)
            return s, gids
        q_scale = jnp.max(jnp.abs(q), axis=1) / 127.0          # [Q]
        q_scale = jnp.where(q_scale == 0, 1.0, q_scale)
        q_i8 = jnp.clip(
            jnp.round(q / q_scale[:, None]), -127, 127
        ).astype(jnp.int8)
        acc = _dot_nd(q_i8, docs_local, jax.lax.Precision.DEFAULT)
        scores = (
            acc.astype(jnp.float32)
            * q_scale[:, None]
            * doc_scales[None, :]
        )
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
        scores = jnp.where(col < n_docs, scores, -jnp.inf)
        s, i = _topk_padded(scores, c)
        return s, jnp.where(i >= 0, i + base, i)
    if docs_local.dtype == jnp.bfloat16:
        q = q.astype(jnp.bfloat16)
        precision = jax.lax.Precision.DEFAULT
    # Dispatch policy (slope-measured on v5e — BASELINE.md scale
    # tables): XLA's dot+top_k wins at small/medium shards (the fused
    # running-top-k kernel's O(k*N) VPU selection loses everywhere;
    # round 1's "2x pallas win at small N" was a relay measurement
    # artifact), but from TWOPHASE_MIN_DOCS docs/shard the row-major
    # two-phase segment-max kernel takes over (2.2 ms vs XLA's 3.9 ms
    # per batch-64 at 1M docs — it never materializes the [Q, N] score
    # matrix XLA writes AND reads back). The score-matrix HBM budget
    # keeps the large-Q case on the two-phase path regardless of
    # alignment. ``use_pallas`` is ignored — the fused kernel stays an
    # explicit opt-in via ops.dense.dense_topk.
    del use_pallas
    aligned = n_local_w % TWOPHASE_BLOCK_N == 0
    if (n_local_w >= TWOPHASE_MIN_DOCS and aligned) or (
        q.shape[0] * n_local_w * 4 > _SCORE_MATRIX_BUDGET_BYTES
    ):
        n_valid = jnp.clip(n_docs - base, 0, n_local_w)
        # bf16 doc tiles: the measured-fast 8192-row block (6.3 MB in
        # VMEM); fp32 halves it to keep the same footprint; misaligned
        # shards (only reachable via the big-Q budget guard) pay a
        # small in-jit pad at block 1024
        bn = TWOPHASE_BLOCK_N if q.dtype == jnp.bfloat16 else (
            TWOPHASE_BLOCK_N // 2
        )
        # size the query tile to the actual batch: the default
        # block_q=64 pads a q=8 single-query serving batch 8x wide
        # through phase-1 MXU columns AND the phase-2 gather/rescore
        bq = max(8, min(64, -(-q.shape[0] // 8) * 8))
        s, i = dense_topk_twophase_rm(
            q, docs_local, c, n_valid=n_valid,
            block_n=bn if aligned else 1024,
            block_q=bq, seg_rows=TWOPHASE_SEG_ROWS,
            precision=precision,
            interpret=jax.default_backend() != "tpu",
        )
        gids = jnp.where(i >= 0, i + base, i)
        s = jnp.where((gids >= 0) & (gids < n_docs), s, -jnp.inf)
        return s, gids
    scores = _dot_nd(q, docs_local, precision)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    scores = jnp.where(col < n_docs, scores, -jnp.inf)
    s, i = _topk_padded(scores, c)
    return s, jnp.where(i >= 0, i + base, i)


def _local_pq_topc(q, codes_local, codebooks, base, n_docs, c, interpret):
    """Local [Q, C] candidates from a PQ-coded shard (ops/pq.py).

    ``codes_local [n_local, m]`` uint8 packed nibbles (row-sharded) is
    the only per-doc HBM read (m bytes/doc — the capacity tier); scores
    are approximate under the PQ metric, so callers oversample and
    fp32-rescore (engine.py), same contract as the int8 mode. Ids
    return global via ``base``. ``q`` must already be OPQ-rotated when
    the codebook carries a rotation (engine.py handles this).
    """
    from legal_rag_tpu.ops.pq import pq_topk

    n_local = codes_local.shape[0]
    n_valid = jnp.clip(n_docs - base, 0, n_local)
    c_req = min(c, n_local)
    s, i = pq_topk(
        q, codes_local, codebooks, c_req, n_valid=n_valid,
        interpret=interpret,
    )
    if c_req < c:
        qn = q.shape[0]
        s = jnp.concatenate(
            [s, jnp.full((qn, c - c_req), -jnp.inf, s.dtype)], axis=1
        )
        i = jnp.concatenate(
            [i, jnp.full((qn, c - c_req), -1, i.dtype)], axis=1
        )
    bad = (i < 0) | ~jnp.isfinite(s)
    gids = jnp.where(bad, -1, i + base)
    return jnp.where(bad, -jnp.inf, s), gids


def _local_pq_ivf_topc(
    q, codes_local, ids_local, cent_local, codebooks, c, probes,
    cell_size, interpret, q_valid=None,
):
    """Local [Q, C] PQ candidates via IVF coarse pruning (ops/pq.py).

    Each shard probes its OWN cells (``probes`` is per shard), reading
    only ``probes * cell_size`` code rows instead of its full slice —
    the o(N) scan for the capacity tier. Ids arrive GLOBAL through the
    cell permutation (``ids_local``), so no base arithmetic; invalid
    slots are (-inf, -1) like every other local stage.

    The probe set is SHARED across the batch with a per-query
    guarantee of its own top-(probes//Q) cells, so a fixed budget
    starves large diverse batches (at Q=64 with 64 probes each query
    is guaranteed a single cell). The budget therefore scales with the
    batch — every query keeps >= 4 guaranteed own cells — trading
    bounded extra code reads for recall instead of silently degrading.
    The floor necessarily uses the TRACE (padded) batch size — shapes
    are static — so pow-2 query padding over-reads at most 2x the
    real-count floor; ``q_valid`` keeps the whole budget useful by
    excluding padded rows from the probe-set vote.
    """
    from legal_rag_tpu.ops.pq import _pq_ivf_topk_impl

    p = min(max(probes, 4 * q.shape[0]), cent_local.shape[0])
    kk = min(c, p * cell_size)
    s, i = _pq_ivf_topk_impl(
        q, cent_local, codes_local, ids_local, codebooks,
        kk, p, cell_size, interpret, q_valid=q_valid,
    )
    if kk < c:
        qn = q.shape[0]
        s = jnp.concatenate(
            [s, jnp.full((qn, c - kk), -jnp.inf, s.dtype)], axis=1
        )
        i = jnp.concatenate(
            [i, jnp.full((qn, c - kk), -1, i.dtype)], axis=1
        )
    return s, i


def _topk_padded(scores, c):
    """top_k that tolerates c > row length: missing slots padded with
    (-inf, -1) so gathered candidate shapes stay [Q, C] on any shard."""
    width = scores.shape[1]
    cl = min(c, width)
    s, i = jax.lax.top_k(scores, cl)
    i = i.astype(jnp.int32)
    if cl < c:
        q = scores.shape[0]
        s = jnp.concatenate(
            [s, jnp.full((q, c - cl), -jnp.inf, dtype=s.dtype)], axis=1
        )
        i = jnp.concatenate(
            [i, jnp.full((q, c - cl), -1, dtype=i.dtype)], axis=1
        )
    return s, i


def _bm25_segment_stats(pids, pw, n_docs):
    """Per-doc BM25 totals from the postings alone — no [Q, N] buffer.

    Sorts postings by doc id, then segment-sums via cumsum differences:
    each segment's total is its end-position cumsum minus the cumsum at
    the previous segment's end. The previous end is located by a
    ``cummax`` over end *positions* (integers, monotone by
    construction), so this is exact for ANY weight sign — BM25Okapi's
    ε-floored IDF can go negative on degenerate corpora where the mean
    raw IDF is negative, and a value-cummax trick would silently
    miscount there. Everything is O(P) replicated compute: the scalable
    sparse path for shards beyond ~64k docs, where a dense accumulator
    would cost a quarter-gigabyte per 64-query batch.

    Returns (sid, is_end, totals, global_max):
      sid [Q, P] sorted ids; is_end marks each doc's last posting;
      totals at end positions hold that doc's full BM25 score;
      global_max [Q] is the corpus-wide max (only docs with postings
      can have a non-zero score).
    """
    q = pids.shape[0]
    sid, sw = jax.lax.sort((pids, pw), num_keys=1, dimension=1)
    cs = jnp.cumsum(sw, axis=1)
    nxt = jnp.concatenate(
        [sid[:, 1:], jnp.full((q, 1), -2, dtype=sid.dtype)], axis=1
    )
    is_end = sid != nxt
    pos = jax.lax.broadcasted_iota(jnp.int32, sid.shape, 1)
    end_pos = jnp.where(is_end, pos, -1)
    last_end = jnp.concatenate(
        [jnp.full((q, 1), -1, dtype=jnp.int32),
         jax.lax.cummax(end_pos, axis=1)[:, :-1]],
        axis=1,
    )
    prev_end = jnp.where(
        last_end >= 0,
        jnp.take_along_axis(cs, jnp.maximum(last_end, 0), axis=1),
        0.0,
    )
    totals = cs - prev_end
    valid = is_end & (sid >= 0) & (sid < n_docs)
    masked = jnp.where(valid, totals, -jnp.inf)
    global_max = jnp.max(masked, axis=1)
    global_max = jnp.where(jnp.isfinite(global_max), global_max, 0.0)
    return sid, valid, totals, global_max


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "c", "n_docs", "mode", "use_pallas", "precision",
        "rrf_k", "block_n", "block_q", "sparse_mode", "data_axis",
        "pq_interpret", "ivf_probes", "ivf_cell_size",
    ),
)
def sharded_hybrid_search(
    docs: jax.Array,          # [Npad, D] row-sharded; or PQ codes
                              # [Npad, m] uint8 row-sharded
    post_ids: jax.Array,      # [Q, P] global doc ids (replicated)
    post_w: jax.Array,        # [Q, P]
    q_emb: jax.Array,         # [Q, D] (replicated)
    weights: jax.Array,       # [Q] hybrid weights
    doc_scales: Optional[jax.Array] = None,  # [Npad] sharded, int8 mode
    pq_codebooks: Optional[jax.Array] = None,  # [2m, 16, dsub] f32,
                                               # replicated, PQ mode
    ivf_centroids: Optional[jax.Array] = None,  # [n_cells_pad, D] f32,
                                                # row-sharded (IVF mode)
    ivf_doc_ids: Optional[jax.Array] = None,    # [Npad] i32 global ids,
                                                # row-sharded like codes
    *,
    mesh: Mesh,
    k: int,
    c: int,
    n_docs: int,
    mode: str = "weighted",
    use_pallas: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    rrf_k: int = 60,
    block_n: int = 1024,
    block_q: int = 8,
    sparse_mode: str = "auto",   # auto | scatter | segsum
    data_axis: Optional[str] = None,
    pq_interpret: Optional[bool] = None,
    ivf_probes: int = 64,
    ivf_cell_size: int = 1024,
    n_queries: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns ``(fused [Q,k], ids [Q,k], sem [Q,k], keyword [Q,k])``.

    ``mode='weighted'``: reference-parity fusion over dense candidates.
    ``mode='rrf'``: reciprocal-rank fusion of dense + sparse lists
    (sem/keyword outputs carry the per-list RRF contributions' source
    scores where defined, else 0).

    ``data_axis``: on a 2-D ``(data, shard)`` mesh (make_mesh_2d), the
    query batch additionally shards over this axis — pure data
    parallelism on top of doc sharding. The doc matrix replicates
    across ``data`` rows; the candidate-merge all_gather stays within a
    row (the minor/fast ICI axis); no cross-row collectives exist. Q
    must divide the data-axis size.

    PQ capacity mode: when ``docs`` is uint8 packed codes
    ``[Npad, m]`` (row-sharded) and ``pq_codebooks`` is given, the
    local dense stage scores via the 4-bit PQ one-hot-matmul kernel
    (ops/pq.py). Dense scores are then approximate under the PQ metric
    — the engine oversamples and fp32-rescores (same contract as int8
    mode) — and ``q_emb`` must arrive pre-rotated when OPQ is in play.
    """
    is_pq = docs.dtype == jnp.uint8
    if is_pq and pq_codebooks is None:
        raise ValueError("uint8 (PQ) doc codes require pq_codebooks")
    is_ivf = is_pq and ivf_centroids is not None
    if is_ivf and ivf_doc_ids is None:
        raise ValueError("IVF mode requires ivf_doc_ids (the global-id "
                         "cell permutation)")
    n_shards = mesh.shape[AXIS]
    n_pad_docs = docs.shape[0]
    n_local = n_pad_docs // n_shards
    if data_axis is not None and q_emb.shape[0] % mesh.shape[data_axis]:
        raise ValueError(
            f"query batch {q_emb.shape[0]} must divide data axis "
            f"size {mesh.shape[data_axis]}"
        )
    if doc_scales is None:
        # dummy (unsharded-content-free) scales so the shard_map
        # signature is static; only the int8 path reads them
        doc_scales = jnp.ones((n_pad_docs,), dtype=jnp.float32)
    if pq_codebooks is None:
        # dummy replicated operand keeps the body signature static
        pq_codebooks = jnp.zeros((1, 1, 1), dtype=jnp.float32)
    if pq_interpret is None:
        pq_interpret = jax.devices()[0].platform != "tpu"

    # IVF cells hold arbitrary GLOBAL doc ids (the cell permutation), so
    # the scatter sparse path's local-row arithmetic cannot apply —
    # segsum matches candidates by global id and is the capacity-tier
    # path anyway.
    use_segsum = is_ivf or sparse_mode == "segsum" or (
        sparse_mode == "auto" and n_local > LARGE_N_THRESHOLD
    )

    if not is_ivf:
        # tiny replicated dummies keep one body signature across modes
        ivf_centroids = jnp.zeros((1, 1), dtype=jnp.float32)
        ivf_doc_ids = jnp.zeros((1,), dtype=jnp.int32)

    # real (unpadded) query count, TRACED so serving batches of any
    # size share one compile; defaults to "all rows real"
    nq = jnp.reshape(
        jnp.asarray(
            q_emb.shape[0] if n_queries is None else n_queries, jnp.int32
        ),
        (1,),
    )

    def body(docs_local, scales_local, cb, ivf_cent, ivf_ids, nqr, pids,
             pw, qe, w):
        q = qe.shape[0]  # LOCAL query count (Q/data on a 2-D mesh)
        shard = jax.lax.axis_index(AXIS)
        base = (shard * n_local).astype(jnp.int32)
        qidx = jnp.arange(q, dtype=jnp.int32)[:, None]

        # ---- dense local candidates
        if is_ivf:
            # padded batch rows (the engine rounds Q to a stable trace
            # shape) must not spend IVF probe budget: mark real rows by
            # GLOBAL query index (2-D meshes split Q contiguously over
            # the data axis)
            goff = (
                jnp.int32(0)
                if data_axis is None
                else (jax.lax.axis_index(data_axis) * q).astype(jnp.int32)
            )
            q_valid = (jnp.arange(q, dtype=jnp.int32) + goff) < nqr[0]
            d_s, d_i = _local_pq_ivf_topc(
                qe, docs_local, ivf_ids, ivf_cent, cb, c,
                ivf_probes, ivf_cell_size, pq_interpret, q_valid=q_valid,
            )
        elif is_pq:
            d_s, d_i = _local_pq_topc(
                qe, docs_local, cb, base, n_docs, c, pq_interpret,
            )
        else:
            d_s, d_i = _local_dense_topc(
                qe, docs_local, base, n_docs, c, precision, use_pallas,
                block_n, block_q, doc_scales=scales_local,
            )

        # ---- BM25 scores, two strategies:
        # scatter: dense [Q, n_local] accumulator + pmax — cheap at
        #   small shards, O(n_local) memory.
        # segsum: sorted-postings segment sums — O(P) replicated
        #   compute, no dense buffer; the scalable path for big shards.
        if use_segsum:
            sid, s_valid, s_totals, global_max = _bm25_segment_stats(
                pids, pw, n_docs
            )
        else:
            # postings below the shard's range would otherwise wrap as
            # negative indices — remap out-of-range ids to n_local so
            # scatter mode="drop" discards them
            local_pid = pids - base
            local_pid = jnp.where(
                (local_pid >= 0) & (local_pid < n_local), local_pid, n_local
            )
            bm_local = jnp.zeros((q, n_local), dtype=jnp.float32)
            bm_local = bm_local.at[qidx, local_pid].add(pw, mode="drop")
            global_max = jax.lax.pmax(jnp.max(bm_local, axis=1), AXIS)

            # BM25 value at the dense candidates (all local here)
            cand_local = jnp.clip(d_i - base, 0, n_local - 1)
            d_bm = bm_local[qidx, cand_local]
            d_bm = jnp.where((d_i >= n_docs) | (d_i < 0), 0.0, d_bm)

        # ---- merge candidates across shards (one gather each)
        gather = lambda x: jax.lax.all_gather(x, AXIS)       # [S, Q, C]
        to_qc = lambda x: x.transpose(1, 0, 2).reshape(q, n_shards * c)
        all_ds = to_qc(gather(d_s))
        all_di = to_qc(gather(d_i))

        if mode == "rrf" and not use_segsum:
            # sparse local candidates — a full [Q, n_local] top-C that
            # only RRF needs (weighted mode fuses dense candidates only)
            col = (
                jax.lax.broadcasted_iota(jnp.int32, bm_local.shape, 1) + base
            )
            bm_masked = jnp.where(col < n_docs, bm_local, -jnp.inf)
            s_s, s_i = _topk_padded(bm_masked, c)
            s_i = jnp.where(s_i >= 0, s_i + base, s_i)
            all_ss = to_qc(gather(s_s))
            all_si = to_qc(gather(s_i))

        # ---- replicated epilogue
        top_ds, pos = jax.lax.top_k(all_ds, c)               # global dense top-C
        top_di = jnp.take_along_axis(all_di, pos, axis=1)
        if use_segsum:
            # BM25 at the global candidates straight from segment sums.
            # Each doc has exactly one valid end position, so a masked
            # sum extracts its total exactly (a max would clamp
            # negative totals to 0 — possible under ε-floored IDF).
            sel = (sid[:, None, :] == top_di[:, :, None]) & s_valid[:, None, :]
            top_dbm = jnp.sum(
                jnp.where(sel, s_totals[:, None, :], 0.0), axis=2
            )
        else:
            all_dbm = to_qc(gather(d_bm))
            top_dbm = jnp.take_along_axis(all_dbm, pos, axis=1)

        gmax = jnp.where(global_max > 0, global_max, 1.0)[:, None]
        bm_norm = top_dbm / gmax

        if mode == "weighted":
            fused = top_ds * (1.0 - w[:, None]) + bm_norm * w[:, None]
            f, fpos = jax.lax.top_k(fused, k)
            ids = jnp.take_along_axis(top_di, fpos, axis=1)
            sem = jnp.take_along_axis(top_ds, fpos, axis=1)
            key = jnp.take_along_axis(bm_norm, fpos, axis=1)
        else:  # rrf
            if use_segsum:
                # global sparse top-C straight from segment totals
                # (_topk_padded: c may exceed the postings budget P)
                masked = jnp.where(s_valid, s_totals, -jnp.inf)
                top_ss, spos = _topk_padded(masked, c)
                safe_pos = jnp.clip(spos, 0, masked.shape[1] - 1)
                top_si = jnp.take_along_axis(sid, safe_pos, axis=1)
                top_si = jnp.where(
                    (spos >= 0) & jnp.isfinite(top_ss),
                    top_si,
                    jnp.int32(-1),
                )
            else:
                top_ss, spos = jax.lax.top_k(all_ss, c)
                top_si = jnp.take_along_axis(all_si, spos, axis=1)

            # invalid slots (pad -1 or global-padding docs): remap each
            # to a unique out-of-range id so dedupe-by-sort never merges
            # them; rrf_fusion's n_valid then zeroes their rank mass and
            # sinks them to -inf, so real tail docs always win over pads
            def sanitize(ids_, offset):
                slot = jax.lax.broadcasted_iota(jnp.int32, ids_.shape, 1)
                bad = (ids_ < 0) | (ids_ >= n_docs)
                return jnp.where(bad, n_docs + offset + slot, ids_)

            f, ids = rrf_fusion(
                sanitize(top_di, 0), sanitize(top_si, c), k,
                rrf_k=rrf_k, n_valid=n_docs,
            )
            sem = jnp.zeros_like(f)
            key = jnp.zeros_like(f)
        return f, ids, sem, key

    dax = data_axis
    spec_docs = P(AXIS, None)    # every storage mode is row-sharded
    spec_ivf_cent = P(AXIS, None) if is_ivf else P(None, None)
    spec_ivf_ids = P(AXIS) if is_ivf else P(None)
    spec_q2 = P(dax, None)   # [Q, ...] operands: data-sharded when 2-D
    spec_q1 = P(dax)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            spec_docs, P(AXIS), P(None, None, None),
            spec_ivf_cent, spec_ivf_ids, P(None),
            spec_q2, spec_q2, spec_q2, spec_q1,
        ),
        out_specs=(spec_q2, spec_q2, spec_q2, spec_q2),
        check_vma=False,
    )(docs, doc_scales, pq_codebooks, ivf_centroids, ivf_doc_ids, nq,
      post_ids, post_w, q_emb, weights)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "n_docs", "block_n", "precision", "data_axis",
    ),
)
def sharded_maxsim_topk(
    doc_tokens: jax.Array,   # [Npad, Td, D] row-sharded over AXIS
    doc_mask: jax.Array,     # [Npad, Td] row-sharded
    q_tokens: jax.Array,     # [Q, Tq, D] replicated (or data-sharded)
    q_mask: jax.Array,       # [Q, Tq] replicated (or data-sharded)
    *,
    mesh: Mesh,
    k: int,
    n_docs: int,
    block_n: int = 512,
    precision: jax.lax.Precision = jax.lax.Precision.DEFAULT,
    data_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sharded late-interaction (MaxSim) top-k over the mesh.

    Same collective shape as the dense path: each shard scores its
    local token slab with :func:`legal_rag_tpu.ops.maxsim.maxsim_topk`
    (global padding masked via ``n_valid``), one ``all_gather`` merges
    the per-shard ``[Q, k]`` candidates, and a replicated two-key sort
    yields the exact global (score desc, id asc) order — bit-identical
    across mesh shapes because every shard's local top-k is a superset
    of its members in the global top-k.

    Returns ``(scores [Q, k] f32, ids [Q, k] i32)``; slots beyond the
    corpus (k > n_docs) carry ``(-inf, -1)``.

    ``data_axis``: on a 2-D ``(data, shard)`` mesh the query batch
    additionally shards over this axis (pure data parallelism; the
    slab replicates across rows and the merge stays within a row) —
    the same contract as :func:`sharded_hybrid_search`.
    """
    from legal_rag_tpu.ops.maxsim import maxsim_topk

    n_shards = mesh.shape[AXIS]
    n_pad = doc_tokens.shape[0]
    n_local = n_pad // n_shards
    kl = min(k, n_local)
    if data_axis is not None and q_tokens.shape[0] % mesh.shape[data_axis]:
        raise ValueError(
            f"query batch {q_tokens.shape[0]} must divide data axis "
            f"size {mesh.shape[data_axis]}"
        )

    def body(dt, dm, qt, qm):
        q = qt.shape[0]
        shard = jax.lax.axis_index(AXIS)
        base = (shard * n_local).astype(jnp.int32)
        n_valid = jnp.clip(n_docs - base, 0, n_local)
        s, i = maxsim_topk(
            qt, qm, dt, dm, kl, block_n=block_n, precision=precision,
            n_valid=n_valid,
        )
        bad = ~jnp.isfinite(s)
        gids = jnp.where(bad, jnp.int32(-1), i + base)
        s = jnp.where(bad, -jnp.inf, s)
        if kl < k:
            s = jnp.concatenate(
                [s, jnp.full((q, k - kl), -jnp.inf, s.dtype)], axis=1
            )
            gids = jnp.concatenate(
                [gids, jnp.full((q, k - kl), -1, gids.dtype)], axis=1
            )

        all_s = jax.lax.all_gather(s, AXIS)          # [S, Q, k]
        all_i = jax.lax.all_gather(gids, AXIS)
        all_s = all_s.transpose(1, 0, 2).reshape(q, n_shards * k)
        all_i = all_i.transpose(1, 0, 2).reshape(q, n_shards * k)

        # exact (score desc, id asc): invalid slots get unique
        # out-of-range ids so the two-key sort sinks them last
        slot = jax.lax.broadcasted_iota(jnp.int32, all_i.shape, 1)
        sort_ids = jnp.where(all_i < 0, n_docs + slot, all_i)
        neg_s, ids_sorted = jax.lax.sort(
            (-all_s, sort_ids), num_keys=2, dimension=1
        )
        out_s = -neg_s[:, :k]
        out_i = ids_sorted[:, :k]
        out_i = jnp.where(out_i >= n_docs, -1, out_i)
        return out_s, out_i.astype(jnp.int32)

    dax = data_axis
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(AXIS, None, None), P(AXIS, None),
            P(dax, None, None), P(dax, None),
        ),
        out_specs=(P(dax, None), P(dax, None)),
        check_vma=False,
    )(doc_tokens, doc_mask, q_tokens, q_mask)


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "c", "n_docs", "block_n", "block_q", "precision",
        "data_axis",
    ),
)
def sharded_maxsim_rerank_topk(
    docs: jax.Array,         # [Npad, D] single-vector matrix, row-sharded
    doc_tokens: jax.Array,   # [Npad, Td, D] token slab, row-sharded
    doc_mask: jax.Array,     # [Npad, Td] row-sharded
    q_emb: jax.Array,        # [Q, D] sentence embeddings, replicated
    q_tokens: jax.Array,     # [Q, Tq, D] query token embeddings, replicated
    q_mask: jax.Array,       # [Q, Tq] replicated
    *,
    mesh: Mesh,
    k: int,
    c: int,
    n_docs: int,
    block_n: int = 1024,
    block_q: int = 8,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    data_axis: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Dense-first late interaction: the capacity-safe MaxSim tier.

    :func:`sharded_maxsim_topk` streams the FULL ``[N, Td, D]`` token
    slab every query batch — Td x the single-vector HBM traffic, which
    caps the tier's corpus size (ARCHITECTURE.md capacity table). This
    variant runs the ordinary single-vector dense stage first (each
    shard's top-``c`` via the measured dense dispatch), then
    MaxSim-rescores ONLY those candidates against the shard-local slab
    (:func:`legal_rag_tpu.ops.maxsim.maxsim_rescore` — one contiguous
    ``Td*D`` row per candidate), so per-batch slab traffic is
    ``O(c * Td * D)`` per shard instead of ``O(N_local * Td * D)``.

    The slab stays row-sharded exactly like ``docs``, candidates stay
    local to their shard (no cross-shard slab reads), and the usual
    ``all_gather`` + two-key sort merges per-shard winners. MaxSim
    recall then hinges on the dense candidate stage covering the true
    MaxSim winners — measured on the eval splits, not assumed
    (EVAL_RETRIEVAL.json maxsim-rerank rows).

    Returns ``(scores [Q, k] f32, ids [Q, k] i32)``, (score desc, id
    asc), ``(-inf, -1)`` beyond the corpus.
    """
    from legal_rag_tpu.ops.maxsim import maxsim_rescore

    n_shards = mesh.shape[AXIS]
    n_pad = docs.shape[0]
    if doc_tokens.shape[0] != n_pad or doc_mask.shape[0] != n_pad:
        # a mismatch silently rescales another shard-local document's
        # tokens (local id = global id - dense base), so this must be
        # a hard error, not an assert that -O strips
        raise ValueError(
            "dense tier and token slab must share row padding: docs "
            f"{n_pad} vs doc_tokens {doc_tokens.shape[0]} / doc_mask "
            f"{doc_mask.shape[0]}; build the slab with n_pad=docs.shape[0]"
        )
    n_local = n_pad // n_shards
    cl = min(c, n_local)
    kl = min(k, cl)
    if data_axis is not None and q_emb.shape[0] % mesh.shape[data_axis]:
        raise ValueError(
            f"query batch {q_emb.shape[0]} must divide data axis "
            f"size {mesh.shape[data_axis]}"
        )

    def body(d_local, dt, dm, qe, qt, qm):
        q = qe.shape[0]
        shard = jax.lax.axis_index(AXIS)
        base = (shard * n_local).astype(jnp.int32)
        n_valid = jnp.clip(n_docs - base, 0, n_local)

        d_s, d_i = _local_dense_topc(
            qe, d_local, base, n_docs, cl, precision, False,
            block_n, block_q,
        )
        local_ids = jnp.where(d_i >= 0, d_i - base, -1)
        s, i = maxsim_rescore(
            qt, qm, dt, dm, local_ids, kl, n_valid=n_valid,
        )
        bad = (i < 0) | ~jnp.isfinite(s)
        gids = jnp.where(bad, jnp.int32(-1), i + base)
        s = jnp.where(bad, -jnp.inf, s)
        if kl < k:
            s = jnp.concatenate(
                [s, jnp.full((q, k - kl), -jnp.inf, s.dtype)], axis=1
            )
            gids = jnp.concatenate(
                [gids, jnp.full((q, k - kl), -1, gids.dtype)], axis=1
            )

        all_s = jax.lax.all_gather(s, AXIS)          # [S, Q, k]
        all_i = jax.lax.all_gather(gids, AXIS)
        all_s = all_s.transpose(1, 0, 2).reshape(q, n_shards * k)
        all_i = all_i.transpose(1, 0, 2).reshape(q, n_shards * k)

        slot = jax.lax.broadcasted_iota(jnp.int32, all_i.shape, 1)
        sort_ids = jnp.where(all_i < 0, n_docs + slot, all_i)
        neg_s, ids_sorted = jax.lax.sort(
            (-all_s, sort_ids), num_keys=2, dimension=1
        )
        out_s = -neg_s[:, :k]
        out_i = ids_sorted[:, :k]
        out_i = jnp.where(out_i >= n_docs, -1, out_i)
        return out_s, out_i.astype(jnp.int32)

    dax = data_axis
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(AXIS, None), P(AXIS, None, None), P(AXIS, None),
            P(dax, None), P(dax, None, None), P(dax, None),
        ),
        out_specs=(P(dax, None), P(dax, None)),
        check_vma=False,
    )(docs, doc_tokens, doc_mask, q_emb, q_tokens, q_mask)


@dataclasses.dataclass
class ShardedIndex:
    """Device-resident sharded index handle.

    Storage modes (``dtype``):
      - ``float32`` — exact-parity mode,
      - ``bfloat16`` — 2x HBM footprint/bandwidth, single-pass MXU,
      - ``int8`` — 4x compression: symmetric per-document quantization
        (scale = max|x|/127 per column) with the dequant scale applied
        to the int32 MXU accumulator; queries quantize per-row at
        search time. Recall≈exact for well-separated neighbours
        (tested); the memory mode for 10M+ docs/chip.
      - ``pq`` — 4-bit product quantization (ops/pq.py): m packed
        bytes/doc (default m=48 → 32x vs fp32, ~300M docs on a 16 GB
        chip); scored on the MXU via per-nibble-subspace one-hot
        matmuls, candidates fp32-rescored by the engine. ``docs``
        then holds the codes ``[Npad, m]`` row-sharded,
        ``pq_codebooks`` the trained ``[2m, 16, dsub]`` centroids, and
        ``pq_rotation`` the optional OPQ rotation.

    Layout: ``[Npad, D]`` ROW-major, row-sharded over the mesh in every
    mode (round 3 — previously float modes stored the transposed
    ``[D, Npad]``). Row-major is what the measured-fastest large-N
    backend wants: the two-phase kernel streams ``[BN, D]`` tiles as
    the matmul LHS and its candidate gather reads contiguous rows
    (ops/dense.py dense_topk_twophase_rm), and big corpora pad so each
    shard's slice is TWOPHASE_BLOCK_N-aligned (no in-jit pad copy).
    """

    docs: jax.Array        # [Npad, D] row-sharded; PQ: [Npad, m] u8
    mesh: Mesh
    n_docs: int
    doc_scales: Optional[jax.Array] = None   # [Npad] f32, int8 mode only
    pq_codebooks: Optional[jax.Array] = None  # [2m, 16, dsub], pq mode
    pq_rotation: Optional[jax.Array] = None   # [D, D] OPQ rotation —
                                              # queries rotate at prep
                                              # time (engine), kernel
                                              # unchanged
    ivf_centroids: Optional[jax.Array] = None  # [n_cells_pad, D] f32
                                               # row-sharded (IVF mode)
    ivf_doc_ids: Optional[jax.Array] = None    # [Npad] i32 global ids,
                                               # row-sharded like codes
    ivf_cell_size: int = 0

    @classmethod
    def from_pq_ivf(
        cls,
        ivf,                          # ops.pq.IVFIndex
        codebooks: np.ndarray,        # [2m, 16, dsub] f32
        mesh: Optional[Mesh] = None,
        rotation: Optional[np.ndarray] = None,
    ) -> "ShardedIndex":
        """IVF-pruned PQ layout: cell-ordered codes row-sharded along
        cell boundaries, cell centroids and the global-id permutation
        sharded alongside. The cell count pads to the mesh with EMPTY
        cells (all ids -1); the probe kernel masks empty cells to -inf
        by checking ids (a sentinel centroid value cannot guarantee
        unselectability — its dot with the query has query-dependent
        sign). Real padding already sits only in the corpus tail cell,
        so each shard's validity stays a prefix.
        """
        from legal_rag_tpu.parallel.mesh import (
            device_put_global, make_mesh, replicate_global,
        )

        mesh = mesh or make_mesh()
        n_shards = mesh.shape[AXIS]
        n_cells = ivf.n_cells
        s_cell = ivf.cell_size
        m = ivf.codes.shape[1]
        d = ivf.centroids.shape[1]
        nc_pad = -(-n_cells // n_shards) * n_shards

        cents = np.zeros((nc_pad, d), np.float32)  # value irrelevant:
        cents[:n_cells] = ivf.centroids            # kernel masks by ids
        codes = np.zeros((nc_pad * s_cell, m), np.uint8)
        codes[: n_cells * s_cell] = ivf.codes
        ids = np.full((nc_pad * s_cell,), -1, np.int32)
        ids[: n_cells * s_cell] = ivf.doc_ids
        n_real = int((ivf.doc_ids >= 0).sum())

        return cls(
            docs=device_put_global(codes, mesh, P(AXIS, None)),
            mesh=mesh,
            n_docs=n_real,
            pq_codebooks=replicate_global(
                np.asarray(codebooks, dtype=np.float32), mesh
            ),
            pq_rotation=(
                None if rotation is None
                else jnp.asarray(rotation, dtype=jnp.float32)
            ),
            ivf_centroids=device_put_global(cents, mesh, P(AXIS, None)),
            ivf_doc_ids=device_put_global(ids, mesh, P(AXIS)),
            ivf_cell_size=s_cell,
        )

    @classmethod
    def from_pq(
        cls,
        codes: np.ndarray,           # [N, m] uint8
        codebooks: np.ndarray,       # [2m, 16, dsub] f32
        mesh: Optional[Mesh] = None,
        rotation: Optional[np.ndarray] = None,
    ) -> "ShardedIndex":
        from legal_rag_tpu.parallel.mesh import (
            device_put_global, make_mesh, replicate_global,
        )

        mesh = mesh or make_mesh()
        n, m = codes.shape
        n_shards = mesh.shape[AXIS]
        n_pad = -(-n // n_shards) * n_shards
        padded = np.zeros((n_pad, m), dtype=np.uint8)
        padded[:n] = codes
        return cls(
            docs=device_put_global(padded, mesh, P(AXIS, None)),
            mesh=mesh,
            n_docs=n,
            pq_codebooks=replicate_global(
                np.asarray(codebooks, dtype=np.float32), mesh
            ),
            pq_rotation=(
                None if rotation is None
                else jnp.asarray(rotation, dtype=jnp.float32)
            ),
        )

    @classmethod
    def from_embeddings(
        cls,
        embeddings: np.ndarray,
        mesh: Optional[Mesh] = None,
        dtype: str = "float32",
        pq_m: int = 48,
    ) -> "ShardedIndex":
        from legal_rag_tpu.parallel.mesh import (
            device_put_global, make_mesh,
        )

        mesh = mesh or make_mesh()
        n, d = embeddings.shape
        n_shards = mesh.shape[AXIS]
        # big corpora align each shard's row count to the two-phase
        # kernel's block so the large-N dispatch never pays an in-jit
        # pad copy (measured +2.3 ms/1M docs); small corpora ride the
        # XLA dot path where plain shard alignment suffices
        unit = n_shards
        if dtype == "int8":
            # per-segment quantization groups rows by TWOPHASE_SEG_ROWS
            unit = n_shards * TWOPHASE_SEG_ROWS
        if -(-n // n_shards) >= TWOPHASE_MIN_DOCS:
            unit = n_shards * TWOPHASE_BLOCK_N
        n_pad = -(-n // unit) * unit

        if dtype == "pq":
            # train-on-the-fly convenience; builds persist the trained
            # artifacts instead (index/store.py) so loads skip k-means
            from legal_rag_tpu.ops.pq import encode_pq, train_pq

            cb = train_pq(
                np.asarray(embeddings, np.float32), m=pq_m, opq_iters=8,
            )
            codes = encode_pq(np.asarray(embeddings, np.float32), cb)
            return cls.from_pq(codes, cb.codebooks, mesh, cb.rotation)
        docs = np.zeros((n_pad, d), dtype=np.float32)
        docs[:n] = embeddings

        if dtype == "int8":
            # Per-SEGMENT symmetric quantization (round 4): the scale
            # is shared across each TWOPHASE_SEG_ROWS-row group, so the
            # two-phase kernel's integer segment-max commutes with the
            # dequant multiply and the int8 tier rides the large-N
            # dispatch (no [Q, N] score matrix at 10M+ docs/shard).
            # doc_scales keeps the per-doc [Npad] layout (values repeat
            # within a group) so the XLA path's math is unchanged in
            # form. Unit-norm embeddings have tightly clustered per-doc
            # maxima, so the group max costs almost no resolution — and
            # the tier's oversample+fp32-rescore contract recovers
            # exactness either way (tests/test_int8_rescore.py).
            g = TWOPHASE_SEG_ROWS
            per_doc = np.abs(docs).max(axis=1) / 127.0
            scales = per_doc.reshape(n_pad // g, g).max(axis=1)
            scales[scales == 0] = 1.0
            scales = np.repeat(scales, g)
            quant = np.clip(
                np.rint(docs / scales[:, None]), -127, 127
            ).astype(np.int8)
            return cls(
                docs=device_put_global(quant, mesh, P(AXIS, None)),
                mesh=mesh,
                n_docs=n,
                doc_scales=device_put_global(
                    scales.astype(np.float32), mesh, P(AXIS)
                ),
            )

        # ml_dtypes gives numpy a true bfloat16 dtype, so the cast
        # happens host-side and multi-host processes slice the same
        # global buffer
        host = docs.astype(
            jnp.bfloat16 if dtype == "bfloat16" else np.float32
        )
        return cls(
            docs=device_put_global(host, mesh, P(AXIS, None)),
            mesh=mesh,
            n_docs=n,
        )


@dataclasses.dataclass
class ShardedMultiVectorIndex:
    """Device-resident token-level index for late-interaction search.

    The multi-vector analogue of :class:`ShardedIndex`: the
    ``[N, Td, D]`` token slab and its mask shard row-wise over the
    mesh's ``shard`` axis, and :func:`sharded_maxsim_topk` runs the
    ColBERT-style MaxSim scan locally with an ``all_gather`` merge.
    Storage defaults to bfloat16 (token slabs are Td times larger than
    single-vector embeddings — at the default Td=32 budget a bf16 slab
    is 16x the fp32 single-vector matrix).
    """

    doc_tokens: jax.Array   # [Npad, Td, D] row-sharded
    doc_mask: jax.Array     # [Npad, Td] row-sharded
    mesh: Mesh
    n_docs: int

    @classmethod
    def from_arrays(
        cls,
        tokens: np.ndarray,      # [N, Td, D] float (any precision)
        mask: np.ndarray,        # [N, Td]
        mesh: Optional[Mesh] = None,
        dtype: str = "bfloat16",
        n_pad: Optional[int] = None,
    ) -> "ShardedMultiVectorIndex":
        from legal_rag_tpu.parallel.mesh import (
            device_put_global, make_mesh,
        )

        mesh = mesh or make_mesh()
        n, td, d = tokens.shape
        n_shards = mesh.shape[AXIS]
        # ``n_pad``: callers serving the maxsim-rerank tier pass the
        # SAME padded row count as their ShardedIndex so each global
        # doc id lands on the same shard in both layouts (the local
        # rescore reads the shard-local slab by ``id - base``)
        if n_pad is None:
            n_pad = -(-n // n_shards) * n_shards
        if n_pad % n_shards != 0 or n_pad < n:
            raise ValueError(
                f"n_pad {n_pad} must be a >=N multiple of {n_shards}"
            )
        # Allocate the padded slab directly at the TARGET dtype and
        # fill in row chunks: the slab is the capacity-dominating
        # artifact (Td x the embedding matrix; the source arrives as
        # mmap'd float16), so a transient fp32 copy of all of it would
        # double-to-quadruple peak host RAM at exactly the scale the
        # tier exists for.
        target = jnp.bfloat16 if dtype == "bfloat16" else np.float32
        host = np.zeros((n_pad, td, d), dtype=target)
        step = max(1, (1 << 28) // max(1, td * d * 4))  # ~256 MB chunks
        for lo in range(0, n, step):
            hi = min(lo + step, n)
            host[lo:hi] = np.asarray(tokens[lo:hi]).astype(target)
        mpad = np.zeros((n_pad, td), dtype=np.int32)
        mpad[:n] = np.asarray(mask, dtype=np.int32)
        return cls(
            doc_tokens=device_put_global(host, mesh, P(AXIS, None, None)),
            doc_mask=device_put_global(mpad, mesh, P(AXIS, None)),
            mesh=mesh,
            n_docs=n,
        )

    def search(
        self, q_tokens, q_mask, k: int, block_n: int = 512
    ) -> Tuple[jax.Array, jax.Array]:
        q_tokens = jnp.asarray(q_tokens, dtype=self.doc_tokens.dtype)
        return sharded_maxsim_topk(
            self.doc_tokens, self.doc_mask, q_tokens,
            jnp.asarray(q_mask), mesh=self.mesh,
            k=min(k, self.n_docs), n_docs=self.n_docs, block_n=block_n,
        )

    def rerank_search(
        self,
        index: "ShardedIndex",   # the single-vector tier (same padding!)
        q_emb, q_tokens, q_mask, k: int, c: int,
        block_n: int = 1024, block_q: int = 8,
    ) -> Tuple[jax.Array, jax.Array]:
        """Dense-first MaxSim: candidates from ``index``'s float tier,
        late interaction only on those (bounded slab reads — see
        :func:`sharded_maxsim_rerank_topk`)."""
        if index.docs.dtype not in (jnp.float32, jnp.bfloat16):
            raise ValueError(
                "maxsim-rerank needs a float/bf16 dense tier for the "
                f"candidate stage (got {index.docs.dtype}); serve the "
                "quantized tiers with mode='maxsim' or 'weighted'"
            )
        if index.docs.shape[0] != self.doc_tokens.shape[0]:
            raise ValueError(
                "single-vector matrix and token slab must share row "
                f"padding ({index.docs.shape[0]} vs "
                f"{self.doc_tokens.shape[0]}); build the slab with "
                "n_pad=index.docs.shape[0]"
            )
        q_tokens = jnp.asarray(q_tokens, dtype=self.doc_tokens.dtype)
        return sharded_maxsim_rerank_topk(
            index.docs, self.doc_tokens, self.doc_mask,
            jnp.asarray(q_emb, index.docs.dtype), q_tokens,
            jnp.asarray(q_mask), mesh=self.mesh,
            k=min(k, self.n_docs), c=c, n_docs=self.n_docs,
            block_n=block_n, block_q=block_q,
        )
