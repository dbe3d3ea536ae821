"""PQ capacity-tier benchmark (reproducible; BASELINE.md PQ table).

Synthetic [N, 384] corpus at N=1M (override BENCH_N), batch 64, k=80
candidates: the production 4-bit pq_topk (ops/pq.py) across block
sizes, plus candidate recall vs exact fp32 on clustered data.

Measurement: slope-method device time — the kernel runs R times inside
ONE jitted fori_loop (a single relay round trip) and the per-iteration
time is (t(R) - t(1)) / (R - 1), cancelling the relay's variable
dispatch overhead; see BASELINE.md for why naive wall timing lies on
this platform.

Run on the TPU:  python scripts/bench_pq.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from legal_rag_tpu.ops.pq import encode_pq, pq_topk, train_pq
from legal_rag_tpu.utils.cache import enable_compile_cache

N = int(os.environ.get("BENCH_N", 1_000_000))
D, MB, Q, K = 384, 48, 64, 80
R = int(os.environ.get("BENCH_R", 8))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(body, q, r1, r2):
    def loop(r):
        def step(i, acc):
            qq = q * (1.0 + i.astype(jnp.float32) * 1e-30)
            s, ids = body(qq)
            return acc + s.sum().astype(jnp.float32) + ids.sum().astype(
                jnp.float32
            )
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    lj = jax.jit(loop, static_argnums=0)
    float(lj(r1))

    def timed(r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(lj(r))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(r2) - timed(r1)) / (r2 - r1)


def main():
    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".bench_cache", "jax")
    )
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    # --- speed: random codes (identical compute profile to trained)
    codes = jnp.asarray(rng.integers(0, 256, (N, MB), dtype=np.uint8))
    cb_arr = jnp.asarray(
        (rng.standard_normal((2 * MB, 16, D // (2 * MB))) * 0.2)
        .astype(np.float32)
    )
    q = jnp.asarray(rng.standard_normal((Q, D)).astype(np.float32))
    for bn, sr in ((4096, 8), (4096, 16)):
        body = lambda qq, bn=bn, sr=sr: pq_topk(
            qq, codes, cb_arr, K, block_n=bn, seg_rows=sr
        )
        try:
            t0 = time.time()
            jax.block_until_ready(body(q))
            log(f"bn={bn} sr={sr}: compile+run {time.time() - t0:.1f}s")
            dt = slope(body, q, 2, 2 + R)
            log(
                f"bn={bn} sr={sr}: {dt * 1e3:.2f} ms/batch-{Q} device "
                f"({N * MB / 1e9 / dt:.0f} GB/s codes)"
            )
        except Exception as e:  # noqa: BLE001
            log(f"bn={bn} sr={sr}: FAILED {type(e).__name__}: {e}")

    # --- recall: trained codes on clustered data (PQ's use case)
    n_small = min(N, 200_000)
    centers = rng.standard_normal((2048, D)).astype(np.float32)
    docs = centers[rng.integers(0, 2048, n_small)] + 0.3 * (
        rng.standard_normal((n_small, D)).astype(np.float32)
    )
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    qs = docs[rng.integers(0, n_small, 16)] + 0.05 * (
        rng.standard_normal((16, D)).astype(np.float32)
    )
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    cb = train_pq(docs, m=MB, iters=15, sample=32768, opq_iters=4)
    trained = jnp.asarray(encode_pq(docs, cb))
    _, ids = pq_topk(
        jnp.asarray(cb.rotate(qs)), trained, jnp.asarray(cb.codebooks), K
    )
    ids = np.asarray(ids)
    exact = qs @ docs.T
    rec = np.mean([
        len(set(np.argsort(-exact[i])[:10]) & set(ids[i].tolist())) / 10
        for i in range(16)
    ])
    log(
        f"candidate recall@10 (k={K} oversample, {n_small} clustered "
        f"docs, OPQ): {rec:.3f}"
    )


if __name__ == "__main__":
    main()
