"""Stage-by-stage timing of the dense_topk_twophase body at 1M docs
(prepadded, bn=8192 bq=64 sr=8, DEFAULT matmul precision) to find the
~3 ms the full path costs above its roofline piece-sum (~1.6 ms).

Stages (cumulative):
  A phase1        — pallas segmax, sum the [Q, n_segs] maxima
  B +select       — two-level super-segment select -> seg_pos
  C +gather       — member ids + doc-column gather + exact rescore
  D +sort (full)  — two-key (score desc, id asc) final ordering
  E flat-select   — B with flat lax.top_k over [Q, n_segs] instead

Run: python scripts/exp_twophase_stages.py
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

from legal_rag_tpu.ops.dense import _segmax_kernel

N = int(os.environ.get("BENCH_N", 1_000_000))
D, Q, K = 384, 64, 10
BN, SR = 8192, 8
KK = K + 64
PREC = jax.lax.Precision.DEFAULT


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, *ops, r1=4, r2=24):
    def loop(r, *ops):
        def step(i, acc):
            return acc + fn(i, *ops).astype(jnp.float32)
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    j = jax.jit(loop)
    float(j(1, *ops))

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
    np_ = -(-N // BN) * BN
    dpad = jnp.asarray(np.pad(docs.T, ((0, 0), (0, np_ - N))), jnp.bfloat16)
    q16 = jnp.asarray(
        rng.standard_normal((Q, D)) / np.sqrt(D), jnp.bfloat16)
    del docs
    gb = N * D * 2 / 1e9

    nb = np_ // BN
    groups = BN // (SR * 128)
    segs_per_block = groups * 128
    n_segs = nb * segs_per_block
    n_sup = n_segs // 128
    nv = jnp.asarray([N], jnp.int32)

    kernel = functools.partial(
        _segmax_kernel, block_n=BN, seg_rows=SR, n_real=np_, precision=PREC,
    )

    def phase1(qq, d, nv):
        return pl.pallas_call(
            kernel,
            grid=(1, nb),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((Q, D), lambda i, j: (i, 0)),
                pl.BlockSpec((D, BN), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec(
                (Q, segs_per_block), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((Q, n_segs), jnp.float32),
        )(nv, qq, d)

    def select(seg_m):
        s3 = seg_m.reshape(Q, n_sup, 128)
        m2 = jnp.max(s3, axis=2)
        _, sup = jax.lax.top_k(m2, KK)
        onehot = (
            sup[:, :, None] == jnp.arange(n_sup)[None, None, :]
        ).astype(jnp.float32)
        vals = jnp.einsum(
            "qjs,qsl->qjl", onehot, s3,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(Q, KK * 128)
        member = (
            sup[:, :, None] * 128
            + jax.lax.broadcasted_iota(jnp.int32, (Q, KK, 128), 2)
        ).reshape(Q, KK * 128)
        _, pos = jax.lax.top_k(vals, KK)
        return jnp.take_along_axis(member, pos, axis=1)

    def gather_rescore(qq, d, seg_pos):
        block_idx = seg_pos // segs_per_block
        rem = seg_pos % segs_per_block
        g_idx = rem // 128
        lane_idx = rem % 128
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (Q, KK, SR), 2)
        cand = (
            block_idx[:, :, None] * BN
            + g_idx[:, :, None] * (SR * 128)
            + r_iota * 128
            + lane_idx[:, :, None]
        ).reshape(Q, KK * SR)
        cand_safe = jnp.clip(cand, 0, np_ - 1)
        gathered = jnp.take(d, cand_safe, axis=1)
        scores = jnp.einsum(
            "qd,dqc->qc", qq.astype(jnp.float32),
            gathered.astype(jnp.float32), precision=PREC,
        )
        scores = jnp.where(cand < N, scores, -jnp.inf)
        return scores, cand

    def stage_a(i, qq, d, nv):
        return phase1(qq * (1 + i.astype(qq.dtype) * 0), d, nv).sum()

    def stage_b(i, qq, d, nv):
        seg_m = phase1(qq * (1 + i.astype(qq.dtype) * 0), d, nv)
        return select(seg_m).sum().astype(jnp.float32)

    def stage_c(i, qq, d, nv):
        qq = qq * (1 + i.astype(qq.dtype) * 0)
        seg_m = phase1(qq, d, nv)
        scores, cand = gather_rescore(qq, d, select(seg_m))
        return scores.sum() + cand.sum().astype(jnp.float32)

    def stage_d(i, qq, d, nv):
        qq = qq * (1 + i.astype(qq.dtype) * 0)
        seg_m = phase1(qq, d, nv)
        scores, cand = gather_rescore(qq, d, select(seg_m))
        neg_s, ids = jax.lax.sort((-scores, cand), num_keys=2, dimension=1)
        return -neg_s[:, :K].sum() + ids[:, :K].sum().astype(jnp.float32)

    def stage_e(i, qq, d, nv):
        seg_m = phase1(qq * (1 + i.astype(qq.dtype) * 0), d, nv)
        _, seg_pos = jax.lax.top_k(seg_m, KK)
        return seg_pos.sum().astype(jnp.float32)

    for name, fn in (
        ("A phase1     ", stage_a),
        ("B +select    ", stage_b),
        ("C +gather    ", stage_c),
        ("D full       ", stage_d),
        ("E flat-select", stage_e),
    ):
        try:
            dt = slope(fn, q16, dpad, nv)
            log(f"{name}: {dt*1e3:6.2f} ms ({gb/dt:5.0f} GB/s)")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()
