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

    # --- IVF coarse pruning at full N on clustered data (VERDICT r2
    # item 8): sub-linear scan + candidate recall at several probe
    # counts, vs the flat pq_topk at the same N
    from legal_rag_tpu.ops.pq import build_ivf, pq_ivf_topk

    n_big = N
    big_docs = centers[rng.integers(0, 2048, n_big)] + 0.3 * (
        rng.standard_normal((n_big, D)).astype(np.float32)
    )
    big_docs /= np.linalg.norm(big_docs, axis=1, keepdims=True)
    bq = big_docs[rng.integers(0, n_big, 16)] + 0.05 * (
        rng.standard_normal((16, D)).astype(np.float32)
    )
    bq /= np.linalg.norm(bq, axis=1, keepdims=True)
    cb_big = train_pq(big_docs, m=MB, iters=15, sample=32768, opq_iters=4)
    codes_big = encode_pq(big_docs, cb_big)
    t0 = time.time()
    ivf = build_ivf(big_docs, cb_big, codes_big, cell_size=1024)
    log(f"IVF build at N={n_big}: {time.time()-t0:.0f}s "
        f"({ivf.n_cells} cells x 1024)")

    exact_big = bq @ big_docs.T
    gold = [set(np.argsort(-exact_big[i])[:10]) for i in range(16)]
    qrot = jnp.asarray(cb_big.rotate(bq))
    codes_big_d = jnp.asarray(codes_big)
    cbs = jnp.asarray(cb_big.codebooks)

    t0 = time.time()
    _, fids = pq_topk(qrot, codes_big_d, cbs, K)
    log(f"flat pq_topk compile+run: {time.time()-t0:.1f}s")
    dt_flat = slope(
        lambda qq: pq_topk(qq, codes_big_d, cbs, K), qrot, 1, 1 + R
    )
    fids = np.asarray(fids)
    rec_flat = np.mean([
        len(set(fids[i].tolist()) & gold[i]) / 10 for i in range(16)
    ])
    log(f"flat  scan: {dt_flat*1e3:6.2f} ms/batch-16  recall@10 "
        f"{rec_flat:.3f} (reads {n_big*MB/1e6:.0f} MB)")

    for probes in (32, 64, 128):
        body = lambda qq, p=probes: pq_ivf_topk(
            qq, ivf, cb_big.codebooks, K, probes=p
        )
        t0 = time.time()
        _, iids = body(qrot)
        log(f"ivf p={probes}: compile+run {time.time()-t0:.1f}s")
        dt = slope(body, qrot, 1, 1 + R)
        iids = np.asarray(iids)
        rec_i = np.mean([
            len(set(iids[i].tolist()) & gold[i]) / 10 for i in range(16)
        ])
        log(
            f"ivf p={probes:4d}: {dt*1e3:6.2f} ms/batch-16  recall@10 "
            f"{rec_i:.3f} (reads {probes*1024*MB/1e6:.0f} MB, "
            f"{ivf.n_cells/probes:.0f}x less)"
        )


if __name__ == "__main__":
    main()
