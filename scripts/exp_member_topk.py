"""Micro-decomposition of the rm select's member stage at 1M docs.

exp_select_variants r4: C3 (one-hot member vals) 1.247 ms -> C4 (full
select) 1.646 ms. The +0.40 ms is some mix of the final
top_k([Q, kk*sup]) and the member-id extraction; and the width scales
with sup. This pins the op and sweeps sup:

  M1 C3 + top_k(vals, kk) only          (is the top_k the cost?)
  M2 C3 + member iota + take_along      (or the id extraction?)
  M3 full select                         (baseline C4)
  full path at sup in {16, 32, 64}       (width lever)

Run on the TPU:  python scripts/exp_member_topk.py
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
N_SEGS = N // SR
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


def upto_vals(qq, dd, sup):
    n_sup = N_SEGS // sup
    seg_m = phase1(qq, dd).T
    m2 = jnp.max(seg_m.reshape(Q, n_sup, sup), axis=2)
    _, sup_idx = jax.lax.top_k(m2, KK)
    s3 = seg_m.reshape(Q, n_sup, sup)
    onehot = (
        sup_idx[:, :, None] == jnp.arange(n_sup)[None, None, :]
    ).astype(jnp.float32)
    vals = jnp.einsum(
        "qjs,qsl->qjl", onehot, s3, precision=jax.lax.Precision.HIGHEST,
    ).reshape(Q, KK * sup)
    return vals, sup_idx


def m1_topk_only(qq, dd):
    vals, _ = upto_vals(qq, dd, 64)
    v, pos = jax.lax.top_k(vals, KK)
    return v.sum() + pos.sum().astype(jnp.float32)


def m2_extract_only(qq, dd):
    vals, sup_idx = upto_vals(qq, dd, 64)
    member = (
        sup_idx[:, :, None] * 64
        + jax.lax.broadcasted_iota(jnp.int32, (Q, KK, 64), 2)
    ).reshape(Q, KK * 64)
    # fixed positions (skip the top_k) — isolates the take_along cost
    pos = jnp.broadcast_to(jnp.arange(KK)[None, :], (Q, KK))
    picked = jnp.take_along_axis(member, pos, axis=1)
    return vals.sum() + picked.sum().astype(jnp.float32)


def m3_full(qq, dd):
    vals, sup_idx = upto_vals(qq, dd, 64)
    member = (
        sup_idx[:, :, None] * 64
        + jax.lax.broadcasted_iota(jnp.int32, (Q, KK, 64), 2)
    ).reshape(Q, KK * 64)
    _, pos = jax.lax.top_k(vals, KK)
    picked = jnp.take_along_axis(member, pos, axis=1)
    return picked.sum().astype(jnp.float32)


def full_at(sup):
    def fn(qq, dd):
        s, i = dense_topk_twophase_rm(
            qq, dd, K, block_n=BN, seg_rows=SR, sup=sup, precision=PREC,
        )
        return s.sum() + i.sum().astype(jnp.float32)
    return fn


def main():
    log(f"devices: {jax.devices()}  N={N} Q={Q} k={K} kk={KK}")
    rng = np.random.default_rng(0)
    docs = jnp.asarray(
        rng.standard_normal((N, D), dtype=np.float32), jnp.bfloat16
    )
    qs = jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
    )
    jax.block_until_ready((docs, qs))

    cases = [
        ("M1 +member topk only", m1_topk_only),
        ("M2 +extract only", m2_extract_only),
        ("M3 +both (=C4)", m3_full),
        ("FULL sup=64", full_at(64)),
        ("FULL sup=32", full_at(32)),
        ("FULL sup=16", full_at(16)),
    ]
    for name, fn in cases:
        try:
            dt, comp = slope(fn, qs, docs)
            log(f"{name:<22} {dt*1e3:8.3f} ms  compile {comp:.1f}s")
        except Exception as e:  # noqa: BLE001
            log(f"{name:<22} FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
