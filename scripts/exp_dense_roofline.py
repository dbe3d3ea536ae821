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

from legal_rag_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.expanduser("~/.cache/legal_rag_roofline"))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(os.environ.get("EXP_N", 1_000_000))
D, Q, K = 384, 64, 10
SR = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, *ops, r1=4, r2=24):
    """fn(i, *ops) -> array; returns per-iteration seconds.

    ``ops`` (the big device arrays) are passed as jit ARGUMENTS, not
    captured in the closure: a closed-over 768 MB array becomes a
    constant in the lowered computation, and serializing it into the
    remote-compile request kills the relay (broken pipe — the failure
    mode that ate two roofline runs).
    """
    def loop(r, *ops):
        def step(i, acc):
            return acc + fn(i, *ops).astype(jnp.float32)
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    j = jax.jit(loop)
    for attempt in range(3):
        try:
            float(j(1, *ops))
            break
        except Exception as e:  # noqa: BLE001 — relay transport flake
            if attempt == 2 or "transport" not in str(e).lower():
                raise
            log(f"  compile transport error, retrying in 30s: "
                f"{str(e)[:80]}")
            time.sleep(30)

    def timed(r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(r, *ops))
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

    only_p2 = os.environ.get("EXP_ONLY_P2") == "1"
    sections = os.environ.get("EXP_SECTIONS", "xla,stream,matmul,segmax,p2")
    if only_p2:
        sections = "p2"
    sections = set(sections.split(","))

    # ---- 0. XLA-only variants: decompose XLA's 3.88 ms.
    # dot+top_k is the production dispatch; top_k on [Q, 1M] is an
    # O(k*N) VPU pass suspected of costing ~half the total. The
    # two-phase select (segment max via reshape + two-level one-hot
    # refine) replaces it with two narrow top_ks.
    if "xla" in sections:
        kk = K + 64
        npad = -(-N // (SR * 128)) * (SR * 128)
        dxp = jnp.pad(dt16, ((0, 0), (0, npad - N)))
        nseg = npad // SR
        wpad2 = -(-nseg // 128) * 128
        nsup2 = wpad2 // 128

        def prep(i, q16):
            return q16 * (1 + i.astype(jnp.bfloat16) * 0)

        def xla_dot_topk(i, q16, dxp):
            s = jnp.dot(prep(i, q16), dxp,
                        preferred_element_type=jnp.float32)
            v, idx = jax.lax.top_k(s, K)
            return v.sum() + idx.sum().astype(jnp.float32)

        def xla_dot_sum(i, q16, dxp):
            s = jnp.dot(prep(i, q16), dxp,
                        preferred_element_type=jnp.float32)
            return s.sum()

        def xla_dot_segmax(i, q16, dxp):
            s = jnp.dot(prep(i, q16), dxp,
                        preferred_element_type=jnp.float32)
            return jnp.max(s.reshape(Q, nseg, SR), axis=2).sum()

        def xla_two_phase(i, q16, dxp, out_dtype=jnp.float32):
            s = jnp.dot(prep(i, q16), dxp,
                        preferred_element_type=out_dtype)
            m = jnp.max(s.reshape(Q, nseg, SR), axis=2)      # [Q, nseg]
            mp = jnp.pad(m.astype(jnp.float32),
                         ((0, 0), (0, wpad2 - nseg)),
                         constant_values=-1e30)
            m3 = mp.reshape(Q, nsup2, 128)
            m2 = jnp.max(m3, axis=2)
            _, sup = jax.lax.top_k(m2, kk)                   # [Q, kk]
            onehot = (
                sup[:, :, None] == jnp.arange(nsup2)[None, None, :]
            ).astype(jnp.float32)
            segv = jnp.einsum(
                "qjs,qsl->qjl", onehot, m3,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(Q, kk * 128)                           # seg maxima
            sv, spos = jax.lax.top_k(segv, kk)               # top kk segs
            # refine: the full score matrix s is already materialized,
            # so the member refine is a small take_along_axis from it
            seg_id = (sup[:, :, None] * 128
                      + jnp.arange(128)[None, None, :]).reshape(Q, kk * 128)
            top_seg = jnp.take_along_axis(seg_id, spos, axis=1)  # [Q, kk]
            mem_ids = (
                top_seg[:, :, None] * SR
                + jnp.arange(SR)[None, None, :]
            ).reshape(Q, kk * SR)
            mem = jnp.take_along_axis(
                s.reshape(Q, npad), mem_ids, axis=1
            ).astype(jnp.float32)
            v, pos = jax.lax.top_k(mem, K)
            ids = jnp.take_along_axis(mem_ids, pos, axis=1)
            return v.sum() + ids.sum().astype(jnp.float32)

        def xla_dot_approx(i, q16, dxp):
            s = jnp.dot(prep(i, q16), dxp,
                        preferred_element_type=jnp.float32)
            v, idx = jax.lax.approx_max_k(s, kk)
            return v.sum() + idx.sum().astype(jnp.float32)

        for name, fn in (
            ("dot+top_k (prod)", xla_dot_topk),
            ("dot+sum   (floor)", xla_dot_sum),
            ("dot+segmax reduce", xla_dot_segmax),
            ("dot+two-phase f32", xla_two_phase),
            ("dot+two-phase bf16 scores",
             functools.partial(xla_two_phase, out_dtype=jnp.bfloat16)),
            ("dot+approx_max_k", xla_dot_approx),
        ):
            try:
                dt = slope(fn, q16, dxp)
                log(f"xla {name}: {dt*1e3:6.2f} ms  ({gb/dt:5.0f} GB/s)")
            except Exception as e:  # noqa: BLE001
                log(f"xla {name}: FAIL {type(e).__name__}: {str(e)[:140]}")

    # ---- 1. raw stream ceiling
    def stream_kernel(d_ref, o_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.max(d_ref[:].astype(jnp.float32))

    _VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    for bn in () if "stream" not in sections else (
            8192, 16384, 32768, 65536):
        np_ = -(-N // bn) * bn
        dpad = jnp.pad(dt16, ((0, 0), (0, np_ - N)))

        def run(i, dpad, bn=bn, np_=np_):
            return pl.pallas_call(
                stream_kernel,
                grid=(np_ // bn,),
                in_specs=[pl.BlockSpec((D, bn), lambda j: (0, j))],
                out_specs=pl.BlockSpec((1, 1), lambda j: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
                compiler_params=_VMEM,
            )(dpad + i.astype(jnp.bfloat16) * 0).sum()

        try:
            dt = slope(run, dpad)
            log(f"stream bn={bn:6d}: {dt*1e3:6.2f} ms  ({gb/dt:5.0f} GB/s)")
        except Exception as e:  # noqa: BLE001 — VMEM OOM at big blocks
            log(f"stream bn={bn}: FAIL {type(e).__name__}: {str(e)[:120]}")

    # ---- 2. matmul + row-max only (no segment structure)
    def mm_kernel(q_ref, d_ref, o_ref):
        s = jnp.dot(q_ref[:], d_ref[:],
                    preferred_element_type=jnp.float32)
        o_ref[:] = jnp.max(s, axis=1, keepdims=True)

    for bn in () if "matmul" not in sections else (8192, 16384, 32768):
        np_ = -(-N // bn) * bn
        dpad = jnp.pad(dt16, ((0, 0), (0, np_ - N)))

        def run(i, dpad, q16, bn=bn, np_=np_):
            return pl.pallas_call(
                mm_kernel,
                grid=(np_ // bn,),
                in_specs=[
                    pl.BlockSpec((Q, D), lambda j: (0, 0)),
                    pl.BlockSpec((D, bn), lambda j: (0, j)),
                ],
                out_specs=pl.BlockSpec((Q, 1), lambda j: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((Q, 1), jnp.float32),
                compiler_params=_VMEM,
            )(q16 * (1 + i.astype(jnp.bfloat16) * 0), dpad).sum()

        try:
            dt = slope(run, dpad, q16)
            log(f"matmul bn={bn:6d}: {dt*1e3:6.2f} ms  ({gb/dt:5.0f} GB/s)")
        except Exception as e:  # noqa: BLE001 — VMEM OOM at big blocks
            log(f"matmul bn={bn}: FAIL {type(e).__name__}: {str(e)[:120]}")

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

        def run(i, dpad, q16, nv):
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

        return slope(run, dpad, q16, nv)

    for bn, sr in () if "segmax" not in sections else (
            (8192, 8), (16384, 8), (16384, 16), (32768, 8),
            (32768, 16), (32768, 32)):
        try:
            dt = segmax_run(bn, sr)
            log(f"segmax bn={bn:6d} sr={sr:2d}: {dt*1e3:6.2f} ms "
                f"({gb/dt:5.0f} GB/s)")
        except Exception as e:  # noqa: BLE001
            log(f"segmax bn={bn} sr={sr}: FAIL {type(e).__name__}: "
                f"{str(e)[:120]}")

    for dims in () if "segmax" not in sections else (
            ("parallel", "arbitrary"), ("arbitrary", "arbitrary")):
        try:
            dt = segmax_run(16384, 8, dims=dims)
            log(f"segmax bn=16384 sr=8 dims={dims}: {dt*1e3:6.2f} ms "
                f"({gb/dt:5.0f} GB/s)")
        except Exception as e:  # noqa: BLE001
            log(f"segmax dims={dims}: FAIL {type(e).__name__}: "
                f"{str(e)[:120]}")
    if "segmax" in sections:
        try:
            dt = segmax_run(16384, 8, vmem=100 * 1024 * 1024)
            log(f"segmax bn=16384 sr=8 vmem=100MB: {dt*1e3:6.2f} ms "
                f"({gb/dt:5.0f} GB/s)")
        except Exception as e:  # noqa: BLE001
            log(f"segmax vmem: FAIL {type(e).__name__}: {str(e)[:120]}")

    # ---- 4. phase-2 pieces at sr=8 (width 125k)
    if "p2" not in sections:
        return
    width = N // SR
    segm = jnp.asarray(
        rng.standard_normal((Q, width)).astype(np.float32))
    kk = K + 64

    dt = slope(lambda i, segm: jax.lax.top_k(segm + i * 0.0, kk)[0].sum(),
               segm)
    log(f"p2 top_k [{Q},{width}] kk={kk}: {dt*1e3:6.2f} ms")

    dt = slope(
        lambda i, segm: jax.lax.approx_max_k(segm + i * 0.0, kk)[0].sum(),
        segm)
    log(f"p2 approx_max_k:              {dt*1e3:6.2f} ms")

    # hierarchical: reduce 128x then top_k over [Q, ceil(width/128)]
    wpad = -(-width // 128) * 128
    nsup = wpad // 128

    def hier(i, segm):
        sp = jnp.pad(segm + i * 0.0, ((0, 0), (0, wpad - width)),
                     constant_values=-np.inf)
        m2 = jnp.max(sp.reshape(Q, nsup, 128), axis=2)
        s, idx = jax.lax.top_k(m2, kk)
        return s.sum() + idx.sum().astype(jnp.float32)

    dt = slope(hier, segm)
    log(f"p2 hier max128+top_k [{Q},{nsup}]: {dt*1e3:6.2f} ms")

    # full exact two-level select: super top-k, gather member segments,
    # refine top-k over [Q, kk*128]
    def hier2(i, segm):
        sp = jnp.pad(segm + i * 0.0, ((0, 0), (0, wpad - width)),
                     constant_values=-np.inf)
        m2 = jnp.max(sp.reshape(Q, nsup, 128), axis=2)
        _, sup = jax.lax.top_k(m2, kk)                   # [Q, kk]
        segidx = sup[:, :, None] * 128 + jnp.arange(128)[None, None, :]
        vals = jnp.take_along_axis(
            sp, segidx.reshape(Q, kk * 128), axis=1)     # [Q, kk*128]
        s, pos = jax.lax.top_k(vals, kk)
        return s.sum() + pos.sum().astype(jnp.float32)

    dt = slope(hier2, segm)
    log(f"p2 two-level select kk={kk}: {dt*1e3:6.2f} ms")

    # gather-free variant: member values via one-hot einsum (the PQ
    # decode trick — XLA TPU gathers at [Q, kk*128] volume are slow)
    def hier3(i, segm):
        # finite pad: 0 * -inf = NaN under the one-hot einsum
        sp = jnp.pad(segm + i * 0.0, ((0, 0), (0, wpad - width)),
                     constant_values=-1e30)
        s3 = sp.reshape(Q, nsup, 128)
        m2 = jnp.max(s3, axis=2)
        _, sup = jax.lax.top_k(m2, kk)                   # [Q, kk]
        onehot = (
            sup[:, :, None] == jnp.arange(nsup)[None, None, :]
        ).astype(jnp.float32)                            # [Q, kk, nsup]
        vals = jnp.einsum(
            "qjs,qsl->qjl", onehot, s3,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(Q, kk * 128)
        s, pos = jax.lax.top_k(vals, kk)
        return s.sum() + pos.sum().astype(jnp.float32)

    dt = slope(hier3, segm)
    log(f"p2 two-level one-hot kk={kk}: {dt*1e3:6.2f} ms")

    # member gather: [Q, kk*SR] ids from docs_t [D, N]
    ids = jnp.asarray(
        rng.integers(0, N, (Q, kk * SR)).astype(np.int32))

    def gath(i, dt16, ids, q16):
        g = jnp.take(dt16, ids + i * 0, axis=1)     # [D, Q, kk*SR]
        s = jnp.einsum("qd,dqc->qc", q16.astype(jnp.float32),
                       g.astype(jnp.float32))
        return s.sum()

    dt = slope(gath, dt16, ids, q16)
    log(f"p2 gather+rescore [{Q},{kk*SR}] cols: {dt*1e3:6.2f} ms")

    # segment-maxima gather via take_along_axis (hier stage 2)
    sids = jnp.asarray(rng.integers(0, width, (Q, kk)).astype(np.int32))

    def seg_gather(i, segm, sids):
        return jnp.take_along_axis(segm, sids + i * 0, axis=1).sum()

    dt = slope(seg_gather, segm, sids)
    log(f"p2 take_along_axis [{Q},{kk}] of [Q,{width}]: {dt*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
