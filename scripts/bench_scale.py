"""Large-N dense backend shootout (reproducible; VERDICT r1 item 5).

Synthetic [N, 384] corpus at N=1M (override BENCH_N), batch 64, k=10:
- XLA dot+top_k (f32 and bf16) — the round-1 large-N incumbent,
- dense_topk_twophase over a (block_n, block_q, seg_rows) sweep,
- the fused running-top-k kernel (reference point; O(k*N) selection).

Run on the TPU:  python scripts/bench_scale.py
Every backend's ids are checked against the bf16-XLA ranking (recall@k)
so a fast-but-wrong configuration can't win.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from legal_rag_tpu.ops.dense import (
    dense_topk_pallas, dense_topk_twophase, dense_topk_xla,
)

N = int(os.environ.get("BENCH_N", 1_000_000))
D, Q, K = 384, 64, 10
REPEATS = int(os.environ.get("BENCH_REPEATS", 8))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPEATS, out


def recall(ids, ref_ids):
    ids, ref_ids = np.asarray(ids), np.asarray(ref_ids)
    return np.mean([
        len(set(ids[i]) & set(ref_ids[i])) / ref_ids.shape[1]
        for i in range(ids.shape[0])
    ])


def main():
    log(f"devices: {jax.devices()}  N={N} D={D} Q={Q} k={K}")
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((N, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    d_q32 = jnp.asarray(q)
    d_docs32 = jnp.asarray(docs)              # [N, D] for the XLA path
    d_docs_t16 = jnp.asarray(docs.T, dtype=jnp.bfloat16)
    d_q16 = jnp.asarray(q, dtype=jnp.bfloat16)
    del docs

    results = {}

    # --- XLA incumbents
    dt, out = timeit(
        lambda: dense_topk_xla(d_q32, d_docs32, K,
                               precision=jax.lax.Precision.DEFAULT)
    )
    results["xla_f32stor_bf16pass"] = dt
    log(f"xla f32-storage bf16-pass: {dt*1e3:7.2f} ms/batch")

    d_docs16 = jnp.asarray(d_docs32, dtype=jnp.bfloat16)
    del d_docs32
    dt, ref_out = timeit(
        lambda: dense_topk_xla(d_q16, d_docs16, K,
                               precision=jax.lax.Precision.DEFAULT)
    )
    results["xla_bf16"] = dt
    ref_ids = np.asarray(ref_out[1])
    log(f"xla bf16:                  {dt*1e3:7.2f} ms/batch (reference ids)")
    del d_docs16

    # --- two-phase sweep (bf16 storage, fp32 accumulation)
    for block_n in (2048, 4096, 8192):
        for block_q in (8, 32, 64):
            for seg_rows in (2, 4, 8, 16):
                if block_n % (seg_rows * 128):
                    continue
                name = f"twophase bn={block_n} bq={block_q} sr={seg_rows}"
                try:
                    dt, out = timeit(
                        lambda bn=block_n, bq=block_q, sr=seg_rows:
                        dense_topk_twophase(
                            d_q16, d_docs_t16, K, block_n=bn, block_q=bq,
                            seg_rows=sr,
                            precision=jax.lax.Precision.DEFAULT,
                        )
                    )
                except Exception as e:  # noqa: BLE001
                    log(f"{name:<38} FAILED: {type(e).__name__}: {e}")
                    continue
                r = recall(out[1], ref_ids)
                results[name] = dt
                log(f"{name:<38} {dt*1e3:7.2f} ms/batch  recall={r:.4f}")

    # --- fused running-top-k (reference point; expected to lose big)
    if os.environ.get("BENCH_FUSED") == "1":
        dt, out = timeit(
            lambda: dense_topk_pallas(
                d_q16, d_docs_t16, K, block_n=4096, block_q=8,
                precision=jax.lax.Precision.DEFAULT,
            )
        )
        log(f"fused running-top-k:       {dt*1e3:7.2f} ms/batch "
            f"recall={recall(out[1], ref_ids):.4f}")

    best = min(results, key=results.get)
    log(f"\nWINNER: {best} at {results[best]*1e3:.2f} ms/batch")


if __name__ == "__main__":
    main()
