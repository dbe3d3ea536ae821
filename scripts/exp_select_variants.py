"""Fine-grained decomposition + cut candidates for the rm phase-2
select/sort at 1M docs (the two measured costs left after the r4 stage
breakdown: select +0.461 ms, final ordering +0.254 ms — exp_rm_stages).

Decomposition (cumulative over phase1+transpose):
  C1 +lvl1 max    — reshape [Q, n_sup, sup] -> max              (reads 33 MB)
  C2 +sup top_k   — lax.top_k(m2, kk) over [Q, 2048]
  C3 +one-hot     — member values via one-hot einsum (current)
  C3b +blockgather— member values via take_along_axis of sup-rows
  C4 +member topk — final segment positions (full current select)

Sort variants on the full path:
  E0 current      — two-key lax.sort over all kk*sr=592 candidates
  E1 narrowed     — top_k(scores, kk) first, two-key sort 74 wide
                    (same <_TIE_OVERSAMPLE duplicate-tie contract as
                    the segment select)

Run on the TPU:  python scripts/exp_select_variants.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legal_rag_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.expanduser("~/.cache/legal_rag_roofline"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from legal_rag_tpu.ops.dense import (
    _segmax_rm_kernel, _TIE_OVERSAMPLE, dense_topk_twophase_rm,
)

N = int(os.environ.get("BENCH_N", str(1 << 20)))
D, Q, K = 384, 64, 10
BN, SR = 8192, 8
SUP = int(os.environ.get("SUP", "64"))
N_SEGS = N // SR
N_SUP = N_SEGS // SUP
KK = K + _TIE_OVERSAMPLE
PREC = jax.lax.Precision.DEFAULT


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, q, d, r1=4, r2=24):
    def loop(r, q, d):
        def step(i, acc):
            qq = q * (1.0 + i.astype(jnp.float32) * 1e-30).astype(q.dtype)
            return acc + fn(qq, d)
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    j = jax.jit(loop)
    t0 = time.perf_counter()
    float(j(1, q, d))
    compile_s = time.perf_counter() - t0

    def timed(r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(r, q, d))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(r2) - timed(r1)) / (r2 - r1)
    return dt, compile_s


def phase1(qq, dd):
    nv = jnp.full((1,), N, jnp.int32)
    qt = qq.T
    nb = N // BN
    segs_per_block = BN // SR
    kernel = functools.partial(
        _segmax_rm_kernel, block_n=BN, seg_rows=SR,
        precision=PREC, transpose_out=False,
    )
    return pl.pallas_call(
        kernel,
        grid=(1, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((D, Q), lambda i, j: (0, i)),
            pl.BlockSpec((BN, D), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((segs_per_block, Q), lambda i, j: (j, i)),
        out_shape=jax.ShapeDtypeStruct((N_SEGS, Q), jnp.float32),
        interpret=False,
    )(nv, qt, dd)


def c1_lvl1(qq, dd):
    seg_m = phase1(qq, dd).T
    m2 = jnp.max(seg_m.reshape(Q, N_SUP, SUP), axis=2)
    return m2.sum()


def c2_suptopk(qq, dd):
    seg_m = phase1(qq, dd).T
    m2 = jnp.max(seg_m.reshape(Q, N_SUP, SUP), axis=2)
    v, sup_idx = jax.lax.top_k(m2, KK)
    return v.sum() + sup_idx.sum().astype(jnp.float32)


def _member_onehot(seg_m, sup_idx):
    s3 = seg_m.reshape(Q, N_SUP, SUP)
    onehot = (
        sup_idx[:, :, None] == jnp.arange(N_SUP)[None, None, :]
    ).astype(jnp.float32)
    vals = jnp.einsum(
        "qjs,qsl->qjl", onehot, s3, precision=jax.lax.Precision.HIGHEST,
    ).reshape(Q, KK * SUP)
    return vals


def _member_blockgather(seg_m, sup_idx):
    s3 = seg_m.reshape(Q, N_SUP, SUP)
    vals = jnp.take_along_axis(
        s3, sup_idx[:, :, None], axis=1
    ).reshape(Q, KK * SUP)
    return vals


def c3_onehot(qq, dd):
    seg_m = phase1(qq, dd).T
    m2 = jnp.max(seg_m.reshape(Q, N_SUP, SUP), axis=2)
    _, sup_idx = jax.lax.top_k(m2, KK)
    return _member_onehot(seg_m, sup_idx).sum()


def c3b_blockgather(qq, dd):
    seg_m = phase1(qq, dd).T
    m2 = jnp.max(seg_m.reshape(Q, N_SUP, SUP), axis=2)
    _, sup_idx = jax.lax.top_k(m2, KK)
    return _member_blockgather(seg_m, sup_idx).sum()


def _select_full(qq, dd, member_fn):
    seg_m = phase1(qq, dd).T
    m2 = jnp.max(seg_m.reshape(Q, N_SUP, SUP), axis=2)
    _, sup_idx = jax.lax.top_k(m2, KK)
    vals = member_fn(seg_m, sup_idx)
    member = (
        sup_idx[:, :, None] * SUP
        + jax.lax.broadcasted_iota(jnp.int32, (Q, KK, SUP), 2)
    ).reshape(Q, KK * SUP)
    _, pos = jax.lax.top_k(vals, KK)
    return jnp.take_along_axis(member, pos, axis=1)


def c4_onehot(qq, dd):
    return _select_full(qq, dd, _member_onehot).sum().astype(jnp.float32)


def c4_blockgather(qq, dd):
    return _select_full(qq, dd, _member_blockgather).sum().astype(
        jnp.float32)


def e0_current(qq, dd):
    s, i = dense_topk_twophase_rm(
        qq, dd, K, block_n=BN, seg_rows=SR, sup=SUP, precision=PREC,
    )
    return s.sum() + i.sum().astype(jnp.float32)


def e1_narrowed(qq, dd):
    """Full path with the final ordering narrowed: top_k by score to
    KK, then the exact two-key (score desc, id asc) sort on 74 wide
    instead of 592."""
    seg_pos = _select_full(qq, dd, _member_onehot)
    cand = (
        seg_pos[:, :, None] * SR
        + jax.lax.broadcasted_iota(jnp.int32, (Q, KK, SR), 2)
    ).reshape(Q, KK * SR)
    docs_seg = dd.reshape(N_SEGS, SR * D)
    gathered = jnp.take(docs_seg, seg_pos, axis=0).reshape(Q, KK * SR, D)
    scores = jnp.einsum(
        "qd,qcd->qc", qq, gathered,
        precision=PREC, preferred_element_type=jnp.float32,
    )
    v, pos = jax.lax.top_k(scores, KK)
    ids_n = jnp.take_along_axis(cand, pos, axis=1)
    neg_s, ids_sorted = jax.lax.sort(
        (-v, ids_n), num_keys=2, dimension=1
    )
    return (-neg_s[:, :K]).sum() + ids_sorted[:, :K].sum().astype(
        jnp.float32)


def main():
    log(f"devices: {jax.devices()}  N={N} Q={Q} k={K} bn={BN} sr={SR} "
        f"sup={SUP} kk={KK}")
    rng = np.random.default_rng(0)
    docs = jnp.asarray(
        rng.standard_normal((N, D), dtype=np.float32), jnp.bfloat16
    )
    qs = jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
    )
    jax.block_until_ready((docs, qs))

    for name, fn in [
        ("C1 +lvl1 max", c1_lvl1),
        ("C2 +sup top_k", c2_suptopk),
        ("C3 +one-hot vals", c3_onehot),
        ("C3b +block gather", c3b_blockgather),
        ("C4 select (onehot)", c4_onehot),
        ("C4b select (bgather)", c4_blockgather),
        ("E0 full current", e0_current),
        ("E1 full narrowed", e1_narrowed),
    ]:
        try:
            dt, comp = slope(fn, qs, docs)
            log(f"{name:<22} {dt*1e3:8.3f} ms  compile {comp:.1f}s")
        except Exception as e:  # noqa: BLE001
            log(f"{name:<22} FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
