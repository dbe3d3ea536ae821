"""Large-N dense backend shootout (reproducible; VERDICT r1 item 5).

Synthetic [N, 384] corpus at N=1M (override BENCH_N), batch 64, k=10:
XLA dot+top_k vs the two-phase Pallas segment-max kernel, bf16 storage.

Measurement methodology (this matters on the shared TPU relay): the
relay adds a large, *variable* per-dispatch overhead after big
compiles (~25 ms observed), which swamps single-program wall times. So
each backend is run R times INSIDE one jitted program (lax.map over a
stacked query batch) — one relay round trip — and the per-iteration
device time is the slope: (t(R) - t(1)) / (R - 1). Recall of every
backend is checked against the bf16-XLA ranking.

Run on the TPU:  python scripts/bench_scale.py
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

from legal_rag_tpu.ops.dense import dense_topk_twophase

N = int(os.environ.get("BENCH_N", 1_000_000))
D, Q, K = 384, 64, 10
R = int(os.environ.get("BENCH_R", 8))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(make_fn, q, d, r1=4, r2=24):
    """Per-iteration device time: r reps inside ONE jitted fori_loop,
    HOST-FETCH synced (block_until_ready can return early on this
    relay — the round-2 fake-sync artifact), constant dispatch
    overhead cancelled by (t(r2)-t(r1))/(r2-r1). Operands are jit
    ARGUMENTS, never closure captures (a closed-over 768 MB constant
    kills the remote-compile relay)."""
    def loop(r, q, d):
        def step(i, acc):
            qq = q * (1.0 + i.astype(q.dtype) * 0)
            s, ids = make_fn(qq, d)
            return acc + s.sum().astype(jnp.float32) + ids.sum().astype(
                jnp.float32)
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    j = jax.jit(loop)
    t0 = time.perf_counter()
    float(j(1, q, d))
    t_compile = time.perf_counter() - t0

    def timed(r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(r, q, d))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (timed(r2) - timed(r1)) / (r2 - r1)
    out = jax.jit(make_fn)(q, d)
    return dt, t_compile, out


def recall(ids, ref_ids):
    ids, ref_ids = np.asarray(ids), np.asarray(ref_ids)
    return np.mean([
        len(set(ids[i]) & set(ref_ids[i])) / ref_ids.shape[1]
        for i in range(ids.shape[0])
    ])


def main():
    log(f"devices: {jax.devices()}  N={N} D={D} Q={Q} k={K} R={R}")
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((N, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((R, Q, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=2, keepdims=True)
    q16 = jnp.asarray(q, jnp.bfloat16)
    d_docs16 = jnp.asarray(docs, jnp.bfloat16)       # [N, D] for XLA
    d_docs_t16 = jnp.asarray(docs.T, jnp.bfloat16)   # [D, N] for pallas
    del docs

    gbytes = N * D * 2 / 1e9

    def xla_one(qq, d):
        scores = jnp.dot(
            qq, d.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        s, i = jax.lax.top_k(scores, K)
        return s, i.astype(jnp.int32)

    dt, tc, out = slope(xla_one, q16[0], d_docs16)
    ref_ids = np.asarray(out[1])
    log(f"xla bf16:      {dt*1e3:7.2f} ms/iter device "
        f"({gbytes/dt:5.0f} GB/s eff)  [compile {tc:.0f}s]")
    results = {"xla_bf16": dt}

    for block_n, block_q, seg_rows in (
        (8192, 64, 8), (8192, 64, 16), (4096, 64, 8), (8192, 64, 4),
    ):
        if block_n % (seg_rows * 128):
            continue
        name = f"twophase bn={block_n} bq={block_q} sr={seg_rows}"
        try:
            def tp_one(qq, d, bn=block_n, bq=block_q, sr=seg_rows):
                return dense_topk_twophase(
                    qq, d, K, block_n=bn, block_q=bq, seg_rows=sr,
                    precision=jax.lax.Precision.DEFAULT,
                )

            dt, tc, out = slope(tp_one, q16[0], d_docs_t16)
            r = recall(out[1], ref_ids)
            log(f"{name}: {dt*1e3:7.2f} ms/iter device "
                f"({gbytes/dt:5.0f} GB/s eff)  recall={r:.4f} "
                f"[compile {tc:.0f}s]")
            results[name] = dt
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")

    best = min(results, key=results.get)
    log(f"\nWINNER: {best} at {results[best]*1e3:.2f} ms/iter device time")


if __name__ == "__main__":
    main()
