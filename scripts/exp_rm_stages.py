"""Stage breakdown of the ROUND-4 row-major two-phase path at 1M docs.

The r4 sweep (exp_rm_sweep.py) has the full path at 1.85 ms/batch-64
with phase 1 alone near 1.1 ms — this pins where the remaining ~0.7 ms
of phase 2 goes, stage by cumulative stage, so the next cut is aimed at
the measured bottleneck instead of a guess:

  A phase1      — pallas rm segmax, consume the [n_segs, Q] map
  B +transpose  — A + the [n_segs, Q] -> [Q, n_segs] XLA transpose
  C +select     — B + two-level super-segment select (sup=64)
  D +gather+res — C + segment-granularity gather + bf16 rescore
  E full        — dense_topk_twophase_rm (adds final two-key sort)

Run on the TPU:  python scripts/exp_rm_stages.py
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
    _segmax_rm_kernel, _select_segments, _TIE_OVERSAMPLE,
    dense_topk_twophase_rm,
)

N = int(os.environ.get("BENCH_N", str(1 << 20)))
D, Q, K = 384, 64, 10
BN, SR = 8192, 8
SUP = int(os.environ.get("SUP", "64"))


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
    """The rm segmax kernel exactly as the production path invokes it."""
    nv = jnp.full((1,), N, jnp.int32)
    qt = qq.T
    nb = N // BN
    segs_per_block = BN // SR
    kernel = functools.partial(
        _segmax_rm_kernel, block_n=BN, seg_rows=SR,
        precision=jax.lax.Precision.DEFAULT, transpose_out=False,
    )
    return pl.pallas_call(
        kernel,
        grid=(1, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((D, Q), lambda i, j: (0, i)),
            pl.BlockSpec((BN, D), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (segs_per_block, Q), lambda i, j: (j, i)
        ),
        out_shape=jax.ShapeDtypeStruct((N // SR, Q), jnp.float32),
        interpret=False,
    )(nv, qt, dd)


def stage_a(qq, dd):
    return phase1(qq, dd).sum()


def stage_b(qq, dd):
    return phase1(qq, dd).T.sum()


def stage_c(qq, dd):
    seg_m = phase1(qq, dd).T
    kk = min(K + _TIE_OVERSAMPLE, N // SR)
    seg_pos = _select_segments(seg_m, kk, N // SR, sup=SUP)
    return seg_pos.sum().astype(jnp.float32)


def stage_d(qq, dd):
    seg_m = phase1(qq, dd).T
    kk = min(K + _TIE_OVERSAMPLE, N // SR)
    seg_pos = _select_segments(seg_m, kk, N // SR, sup=SUP)
    docs_seg = dd.reshape(N // SR, SR * D)
    seg_safe = jnp.clip(seg_pos, 0, N // SR - 1)
    gathered = jnp.take(docs_seg, seg_safe, axis=0).reshape(
        Q, kk * SR, D
    )
    scores = jnp.einsum(
        "qd,qcd->qc", qq, gathered,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return scores.sum()


def stage_e(qq, dd):
    s, i = dense_topk_twophase_rm(
        qq, dd, K, block_n=BN, seg_rows=SR, sup=SUP,
        precision=jax.lax.Precision.DEFAULT,
    )
    return s.sum() + i.sum().astype(jnp.float32)


def main():
    log(f"devices: {jax.devices()}  N={N} D={D} Q={Q} k={K} "
        f"bn={BN} sr={SR} sup={SUP}")
    rng = np.random.default_rng(0)
    docs = jnp.asarray(
        rng.standard_normal((N, D), dtype=np.float32), jnp.bfloat16
    )
    qs = jnp.asarray(
        rng.standard_normal((Q, D), dtype=np.float32), jnp.bfloat16
    )
    jax.block_until_ready((docs, qs))

    prev = 0.0
    for name, fn in [
        ("A phase1", stage_a),
        ("B +transpose", stage_b),
        ("C +select", stage_c),
        ("D +gather+rescore", stage_d),
        ("E full rm path", stage_e),
    ]:
        try:
            dt, comp = slope(fn, qs, docs)
            log(f"{name:<20} {dt*1e3:8.3f} ms  (+{(dt-prev)*1e3:6.3f})  "
                f"compile {comp:.1f}s")
            prev = dt
        except Exception as e:  # noqa: BLE001
            log(f"{name:<20} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
