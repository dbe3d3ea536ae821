"""Why does the full dense_topk_twophase cost 6.7 ms when its roofline
pieces sum to ~1.6 ms at 1M docs? Isolate the in-jit pad copy (768 MB
read+write per fori_loop iteration if XLA does not hoist it) and the
tie-oversample width.

Cases (all bn=8192 bq=64 sr=8, bf16 docs, DEFAULT precision):
  unpadded    — docs_t [D, 1M], pad happens inside the jitted fn
  prepadded   — docs_t [D, 1001472] padded once outside, n_valid=1M
  prepad+kk32 — same, _TIE_OVERSAMPLE monkeypatched 64 -> 22
  prepad+noemit — phase 1 only (segmax out summed), prepadded

Run: python scripts/exp_twophase_full.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legal_rag_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.expanduser("~/.cache/legal_rag_roofline"))

import jax
import jax.numpy as jnp

import legal_rag_tpu.ops.dense as dense

N = int(os.environ.get("BENCH_N", 1_000_000))
D, Q, K = 384, 64, 10
BN, SR = 8192, 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(make_fn, q, d, r1=4, r2=24):
    def loop(r, q, d):
        def step(i, acc):
            qq = q * (1.0 + i.astype(q.dtype) * 0)
            out = make_fn(qq, d)
            return acc + sum(
                jnp.sum(o).astype(jnp.float32) for o in jax.tree.leaves(out)
            )
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    j = jax.jit(loop)
    t0 = time.perf_counter()
    float(j(1, q, d))
    tc = time.perf_counter() - t0

    def timed(r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(r, q, d))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(r2) - timed(r1)) / (r2 - r1), tc


def main():
    log(f"devices: {jax.devices()}  N={N}")
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((N, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q16 = jnp.asarray(
        rng.standard_normal((Q, D)) / np.sqrt(D), jnp.bfloat16)
    dt16 = jnp.asarray(docs.T, jnp.bfloat16)
    np_ = -(-N // BN) * BN
    dt16_pad = jnp.asarray(
        np.pad(docs.T, ((0, 0), (0, np_ - N))), jnp.bfloat16)
    del docs
    gb = N * D * 2 / 1e9

    def tp(qq, d):
        return dense.dense_topk_twophase(
            qq, d, K, block_n=BN, block_q=Q, seg_rows=SR,
            precision=jax.lax.Precision.DEFAULT,
        )

    def tp_nv(qq, d):
        return dense.dense_topk_twophase(
            qq, d, K, n_valid=jnp.int32(N), block_n=BN, block_q=Q,
            seg_rows=SR, precision=jax.lax.Precision.DEFAULT,
        )

    for name, fn, d in (
        ("unpadded ", tp, dt16),
        ("prepadded", tp_nv, dt16_pad),
    ):
        dt, tc = slope(fn, q16, d)
        log(f"{name}: {dt*1e3:6.2f} ms ({gb/dt:5.0f} GB/s)  [compile {tc:.0f}s]")

    # bypass the inner jit cache (keyed on avals, not module globals)
    raw = dense.dense_topk_twophase.__wrapped__

    def tp_nv_raw(qq, d):
        return raw(
            qq, d, K, n_valid=jnp.int32(N), block_n=BN, block_q=Q,
            seg_rows=SR, interpret=False,
            precision=jax.lax.Precision.DEFAULT,
        )

    old = dense._TIE_OVERSAMPLE
    dense._TIE_OVERSAMPLE = 22
    try:
        dt, tc = slope(tp_nv_raw, q16, dt16_pad)
        log(f"prepad+kk32: {dt*1e3:6.2f} ms ({gb/dt:5.0f} GB/s)  "
            f"[compile {tc:.0f}s]")
    finally:
        dense._TIE_OVERSAMPLE = old


if __name__ == "__main__":
    main()
