"""Dense-sweep roofline experiments (VERDICT r2 item 2).

Isolates where the two-phase kernel's phase 1 loses bandwidth vs the
~800 GB/s v5e HBM roofline:

  stream     — kernel that only reads doc tiles and emits a scalar max
               (the achievable DMA ceiling for this grid/block shape)
  matmul     — dot + per-block row max (matmul cost on top of stream)
  segmax     — the shipped phase-1 kernel
  variants   — block_n / seg_rows / dimension_semantics / vmem limit
  phase2     — piece timings: lax.top_k over [Q, N/sr], member gather,
               exact rescore einsum

Slope method throughout (fori_loop, host-fetch sync).
Run: python scripts/exp_dense_roofline.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("EXP_N", 1_000_000))
D, Q, K = 384, 64, 10
SR = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, r1=4, r2=24):
    """fn(i) -> array; returns per-iteration seconds."""
    def loop(r):
        def step(i, acc):
            return acc + fn(i).astype(jnp.float32)
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    j = jax.jit(loop)
    float(j(1))

    def timed(r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(r))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(r2) - timed(r1)) / (r2 - r1)


def main():
    log(f"devices: {jax.devices()}  N={N}")
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((N, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    dt16 = jnp.asarray(docs.T, jnp.bfloat16)   # [D, N]
    q16 = jnp.asarray(q, jnp.bfloat16)
    del docs
    gb = N * D * 2 / 1e9

    # ---- 1. raw stream ceiling
    def stream_kernel(d_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.max(d_ref[:].astype(jnp.float32))

    for bn in (4096, 8192, 16384, 32768):
        np_ = -(-N // bn) * bn
        dpad = jnp.pad(dt16, ((0, 0), (0, np_ - N)))

        def run(i, bn=bn, dpad=dpad, np_=np_):
            return pl.pallas_call(
                stream_kernel,
                grid=(np_ // bn,),
                in_specs=[pl.BlockSpec((D, bn), lambda j: (0, j))],
                out_specs=pl.BlockSpec((1, 1), lambda j: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            )(dpad + i.astype(jnp.bfloat16) * 0).sum()

        dt = slope(run)
        log(f"stream bn={bn:6d}: {dt*1e3:6.2f} ms  ({gb/dt:5.0f} GB/s)")

    # ---- 2. matmul + row-max only (no segment structure)
    def mm_kernel(q_ref, d_ref, o_ref):
        s = jnp.dot(q_ref[:], d_ref[:],
                    preferred_element_type=jnp.float32)
        o_ref[:] = jnp.max(s, axis=1, keepdims=True)

    for bn in (8192, 16384, 32768):
        np_ = -(-N // bn) * bn
        dpad = jnp.pad(dt16, ((0, 0), (0, np_ - N)))

        def run(i, bn=bn, dpad=dpad, np_=np_):
            return pl.pallas_call(
                mm_kernel,
                grid=(np_ // bn,),
                in_specs=[
                    pl.BlockSpec((Q, D), lambda j: (0, 0)),
                    pl.BlockSpec((D, bn), lambda j: (0, j)),
                ],
                out_specs=pl.BlockSpec((Q, 1), lambda j: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((Q, 1), jnp.float32),
            )(q16 * (1 + i.astype(jnp.bfloat16) * 0), dpad).sum()

        dt = slope(run)
        log(f"matmul bn={bn:6d}: {dt*1e3:6.2f} ms  ({gb/dt:5.0f} GB/s)")

    # ---- 3. segmax (shipped phase 1) + variants
    from legal_rag_tpu.ops.dense import _segmax_kernel

    def segmax_run(bn, sr, dims=None, vmem=None, out_dtype=jnp.float32):
        np_ = -(-N // bn) * bn
        dpad = jnp.pad(dt16, ((0, 0), (0, np_ - N)))
        nb = np_ // bn
        segs = bn // (sr * 128) * 128
        nv = jnp.asarray([N], jnp.int32)
        kernel = functools.partial(
            _segmax_kernel, block_n=bn, seg_rows=sr, n_real=N,
            precision=jax.lax.Precision.DEFAULT,
        )
        kwargs = {}
        params = {}
        if dims is not None:
            params["dimension_semantics"] = dims
        if vmem is not None:
            params["vmem_limit_bytes"] = vmem
        if params:
            kwargs["compiler_params"] = pltpu.CompilerParams(**params)

        def run(i):
            return pl.pallas_call(
                kernel,
                grid=(1, nb),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((Q, D), lambda i, j: (0, 0)),
                    pl.BlockSpec((D, bn), lambda i, j: (0, j)),
                ],
                out_specs=pl.BlockSpec((Q, segs), lambda i, j: (0, j)),
                out_shape=jax.ShapeDtypeStruct((Q, nb * segs), jnp.float32),
                **kwargs,
            )(nv, q16 * (1 + i.astype(jnp.bfloat16) * 0), dpad).sum()

        return slope(run)

    for bn, sr in ((8192, 8), (16384, 8), (16384, 16), (32768, 8),
                   (32768, 16), (32768, 32)):
        try:
            dt = segmax_run(bn, sr)
            log(f"segmax bn={bn:6d} sr={sr:2d}: {dt*1e3:6.2f} ms "
                f"({gb/dt:5.0f} GB/s)")
        except Exception as e:  # noqa: BLE001
            log(f"segmax bn={bn} sr={sr}: FAIL {type(e).__name__}: "
                f"{str(e)[:120]}")

    for dims in (("parallel", "arbitrary"), ("arbitrary", "arbitrary")):
        try:
            dt = segmax_run(16384, 8, dims=dims)
            log(f"segmax bn=16384 sr=8 dims={dims}: {dt*1e3:6.2f} ms "
                f"({gb/dt:5.0f} GB/s)")
        except Exception as e:  # noqa: BLE001
            log(f"segmax dims={dims}: FAIL {type(e).__name__}: "
                f"{str(e)[:120]}")
    try:
        dt = segmax_run(16384, 8, vmem=100 * 1024 * 1024)
        log(f"segmax bn=16384 sr=8 vmem=100MB: {dt*1e3:6.2f} ms "
            f"({gb/dt:5.0f} GB/s)")
    except Exception as e:  # noqa: BLE001
        log(f"segmax vmem: FAIL {type(e).__name__}: {str(e)[:120]}")

    # ---- 4. phase-2 pieces at sr=8 (width 125k)
    width = N // SR
    segm = jnp.asarray(
        rng.standard_normal((Q, width)).astype(np.float32))
    kk = K + 64

    dt = slope(lambda i: jax.lax.top_k(segm + i * 0.0, kk)[0].sum())
    log(f"p2 top_k [{Q},{width}] kk={kk}: {dt*1e3:6.2f} ms")

    dt = slope(lambda i: jax.lax.approx_max_k(segm + i * 0.0, kk)[0].sum())
    log(f"p2 approx_max_k:              {dt*1e3:6.2f} ms")

    # hierarchical: reduce 128x then top_k over [Q, width/128]
    def hier(i):
        m2 = jnp.max((segm + i * 0.0).reshape(Q, width // 128, 128), axis=2)
        s, idx = jax.lax.top_k(m2, kk)
        return s.sum() + idx.sum().astype(jnp.float32)

    dt = slope(hier)
    log(f"p2 hier max128+top_k [{Q},{width//128}]: {dt*1e3:6.2f} ms")

    # member gather: [Q, kk*SR] ids from docs_t [D, N]
    ids = jnp.asarray(
        rng.integers(0, N, (Q, kk * SR)).astype(np.int32))

    def gath(i):
        g = jnp.take(dt16, ids + i * 0, axis=1)     # [D, Q, kk*SR]
        s = jnp.einsum("qd,dqc->qc", q16.astype(jnp.float32),
                       g.astype(jnp.float32))
        return s.sum()

    dt = slope(gath)
    log(f"p2 gather+rescore [{Q},{kk*SR}] cols: {dt*1e3:6.2f} ms")

    # segment-maxima gather via take_along_axis (hier stage 2)
    sids = jnp.asarray(rng.integers(0, width, (Q, kk)).astype(np.int32))

    def seg_gather(i):
        return jnp.take_along_axis(segm, sids + i * 0, axis=1).sum()

    dt = slope(seg_gather)
    log(f"p2 take_along_axis [{Q},{kk}] of [Q,{width}]: {dt*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
