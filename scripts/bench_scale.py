"""Large-N dense backend shootout (reproducible; VERDICT r2 item 2).

Synthetic [N, 384] corpora, batch 64, k=10: XLA dot+top_k vs the
row-major two-phase Pallas kernel (the production large-N dispatch,
ops/dense.py dense_topk_twophase_rm) vs the legacy column-major
variant, bf16 storage, at several N to pin the dispatch crossover
(TWOPHASE_MIN_DOCS).

Measurement methodology (this matters on the shared TPU relay): the
relay adds a large, *variable* per-dispatch overhead after big
compiles (~25 ms observed), which swamps single-program wall times. So
each backend runs r reps INSIDE one jitted fori_loop — one relay round
trip — and per-iteration device time is the slope
(t(r2) - t(r1)) / (r2 - r1). Recall of every backend is checked
against the bf16-XLA ranking.

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

from legal_rag_tpu.ops.dense import dense_topk_twophase, dense_topk_twophase_rm

SIZES = [
    int(s) for s in os.environ.get(
        "BENCH_SIZES", "262144,524288,1048576"
    ).split(",")
]
D, Q, K = 384, 64, 10


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


def xla_one(qq, d):
    scores = jax.lax.dot_general(
        qq, d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    s, i = jax.lax.top_k(scores, K)
    return s, i.astype(jnp.int32)


def rm_one(qq, d):
    return dense_topk_twophase_rm(
        qq, d, K, block_n=8192, seg_rows=8,
        precision=jax.lax.Precision.DEFAULT,
    )


def cm_one(qq, d):
    return dense_topk_twophase(
        qq, d, K, block_n=8192, block_q=64, seg_rows=8,
        precision=jax.lax.Precision.DEFAULT,
    )


def main():
    nmax = max(SIZES)
    log(f"devices: {jax.devices()}  sizes={SIZES} D={D} Q={Q} k={K}")
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((nmax, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q16 = jnp.asarray(q, jnp.bfloat16)
    docs16 = np.asarray(docs, dtype=jnp.bfloat16)
    include_cm = os.environ.get("BENCH_CM", "0") == "1"
    del docs

    for n in SIZES:
        gb = n * D * 2 / 1e9
        d_rm = jnp.asarray(docs16[:n])                      # [N, D]
        ref_ids = None
        rows = [("xla dot+top_k", xla_one, d_rm)]
        rows.append(("twophase-rm bn=8192 sr=8", rm_one, d_rm))
        if include_cm:
            d_cm = jnp.asarray(docs16[:n].T)                # [D, N]
            rows.append(("twophase-cm bn=8192 sr=8", cm_one, d_cm))
        results = {}
        for name, fn, d in rows:
            try:
                dt, tc, out = slope(fn, q16, d)
                r = 1.0 if ref_ids is None else recall(out[1], ref_ids)
                if ref_ids is None:
                    ref_ids = np.asarray(out[1])
                log(f"N={n:>8}  {name:<26}: {dt*1e3:7.2f} ms "
                    f"({gb/dt:5.0f} GB/s)  recall={r:.4f} "
                    f"[compile {tc:.0f}s]")
                results[name] = dt
            except Exception as e:  # noqa: BLE001
                log(f"N={n:>8}  {name:<26}: FAILED "
                    f"{type(e).__name__}: {str(e)[:160]}")
        if results:
            best = min(results, key=results.get)
            log(f"N={n:>8}  WINNER: {best} "
                f"({results[best]*1e3:.2f} ms)\n")


if __name__ == "__main__":
    main()
