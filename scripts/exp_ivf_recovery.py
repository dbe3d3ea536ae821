"""PQ/IVF measured recovery contract at 1M clustered docs
(VERDICT r3 item 5).

Round 3 measured IVF candidate recall 0.53 @k=80 on the clustered
stress corpus — matching flat PQ, i.e. PQ distortion (not coarse
pruning) is the limiter. The tier's practical contract therefore
rides the oversample+rescore levers, but no measured point showed
what oversample restores recall@10 >= 0.95 in that regime. This
experiment produces the table: for flat-PQ and IVF dispatches, sweep
the oversample factor and report post-exact-rescore recall@10 plus
the scan + rescore cost, so the config default is set from data.

Run on the TPU:  python scripts/exp_ivf_recovery.py
Env: RECOVERY_N (default 1M), RECOVERY_Q (default 64).
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

from legal_rag_tpu.ops.pq import (
    train_pq, encode_pq, build_ivf, pq_topk, pq_ivf_topk,
)

N = int(os.environ.get("RECOVERY_N", str(1 << 20)))
Q = int(os.environ.get("RECOVERY_Q", "64"))
D, M, K = 384, 48, 10
OVERSAMPLES = (4, 8, 16, 32, 64)
INTERPRET = jax.default_backend() != "tpu"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, *ops, r1=1, r2=6):
    def loop(r, *ops):
        def step(i, acc):
            s, ids = fn(i, *ops)
            return acc + s.sum().astype(jnp.float32) + ids.sum().astype(
                jnp.float32)
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    j = jax.jit(loop)
    float(j(1, *ops))

    def timed(r):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(j(r, *ops))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(r2) - timed(r1)) / (r2 - r1)


def main():
    log(f"devices: {jax.devices()}  N={N} Q={Q} m={M} k={K} "
        f"interpret={INTERPRET}")
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((2048, D)).astype(np.float32)
    docs = centers[rng.integers(0, 2048, N)] + 0.3 * (
        rng.standard_normal((N, D)).astype(np.float32)
    )
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    qs = docs[rng.integers(0, N, Q)] + 0.05 * (
        rng.standard_normal((Q, D)).astype(np.float32)
    )
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    cb = train_pq(docs, m=M, iters=15, sample=32768, opq_iters=4)
    codes = encode_pq(docs, cb)
    ivf = build_ivf(docs, cb, codes, cell_size=1024)
    log(f"PQ+IVF trained ({ivf.n_cells} cells x 1024)")

    # golden exact top-10 (f32 on host — the contract's ground truth)
    gold = []
    for lo in range(0, Q, 16):
        sc = qs[lo:lo + 16] @ docs.T
        gold.extend(
            set(np.argsort(-sc[i], kind="stable")[:K]) for i in
            range(sc.shape[0])
        )
    qrot = jnp.asarray(cb.rotate(qs))
    codes_d = jnp.asarray(codes)
    cbs = jnp.asarray(cb.codebooks)

    def post_rescore_recall(cand_ids):
        rec = []
        for i in range(Q):
            ids = cand_ids[i][cand_ids[i] >= 0]
            sc = qs[i] @ docs[ids].T
            top = ids[np.argsort(-sc, kind="stable")[:K]]
            rec.append(len(set(top.tolist()) & gold[i]) / K)
        return float(np.mean(rec))

    for name in ("flat", "ivf256", "ivf512"):
        for x in OVERSAMPLES:
            kk = K * x
            if name == "flat":
                fn = lambda i, qq: pq_topk(
                    qq * (1 + i.astype(jnp.float32) * 1e-30).astype(
                        qq.dtype),
                    codes_d, cbs, kk, interpret=INTERPRET)
            else:
                probes = int(name[3:])
                fn = lambda i, qq, p=probes: pq_ivf_topk(
                    qq * (1 + i.astype(jnp.float32) * 1e-30).astype(
                        qq.dtype),
                    ivf, cb.codebooks, kk, probes=p, interpret=INTERPRET)
            try:
                dt = slope(fn, qrot)
                _, ids = jax.jit(lambda qq: fn(jnp.int32(0), qq))(qrot)
                ids = np.asarray(ids)
                t0 = time.perf_counter()
                rec = post_rescore_recall(ids)
                t_rescore = time.perf_counter() - t0
                log(f"{name:<7} oversample={x:<3} (cand {kk:4}): "
                    f"scan {dt*1e3:7.2f} ms/batch-{Q}  "
                    f"host rescore {t_rescore*1e3/Q:5.2f} ms/q  "
                    f"post-rescore recall@{K} = {rec:.3f}")
            except Exception as e:  # noqa: BLE001
                log(f"{name:<7} oversample={x:<3}: FAILED "
                    f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
