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

import jax
import jax.numpy as jnp

from legal_rag_tpu.ops.dense import dense_topk_twophase

N = int(os.environ.get("BENCH_N", 1_000_000))
D, Q, K = 384, 64, 10
R = int(os.environ.get("BENCH_R", 8))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wall(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def slope(make_fn, qstack1, qstackR):
    """Per-iteration device time via the in-program loop."""
    fn1 = jax.jit(lambda qs, d: jax.lax.map(lambda q: make_fn(q, d), qs))
    t1, out1 = wall(fn1, qstack1[0], qstack1[1])
    tR, outR = wall(fn1, qstackR[0], qstackR[1])
    n1, nR = qstack1[0].shape[0], qstackR[0].shape[0]
    return (tR - t1) / (nR - n1), t1, out1


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

    dt, t1, out = slope(
        xla_one, (q16[:1], d_docs16), (q16, d_docs16)
    )
    ref_ids = np.asarray(out[1][0])
    log(f"xla bf16:      {dt*1e3:7.2f} ms/iter device "
        f"({gbytes/dt:5.0f} GB/s eff)  [1-iter wall {t1*1e3:.1f} ms]")
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

            dt, t1, out = slope(
                tp_one, (q16[:1], d_docs_t16), (q16, d_docs_t16)
            )
            r = recall(out[1][0], ref_ids)
            log(f"{name}: {dt*1e3:7.2f} ms/iter device "
                f"({gbytes/dt:5.0f} GB/s eff)  recall={r:.4f} "
                f"[1-iter wall {t1*1e3:.1f} ms]")
            results[name] = dt
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")

    best = min(results, key=results.get)
    log(f"\nWINNER: {best} at {results[best]*1e3:.2f} ms/iter device time")


if __name__ == "__main__":
    main()
