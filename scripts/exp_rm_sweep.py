"""seg_rows / block_n sweep for the row-major two-phase kernel at 1M.

VERDICT r2 item 2 set the bar at <= 2 ms/batch-64 at 1M docs; the
shipped default (bn=8192, sr=8) measures 2.13 ms. Phase 1 is already at
84% of HBM peak, so the headroom is phase 2: seg_rows=16 halves the
phase-2 segment-select width (N/16 vs N/8) at the cost of a 2x wider
candidate gather (kk*16 contiguous rows/query — still tiny), and bigger
block_n amortizes grid overhead. This sweep pins the best (bn, sr) to
promote into the production dispatch defaults.

Run on the TPU:  python scripts/exp_rm_sweep.py
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

from legal_rag_tpu.ops.dense import dense_topk_twophase_rm

N = int(os.environ.get("SWEEP_N", str(1 << 20)))
D, Q, K = 384, 64, 10
CONFIGS = [
    (8192, 8),     # shipped default
    (8192, 16),
    (8192, 32),
    (16384, 8),
    (16384, 16),
    (32768, 16),
    (32768, 32),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(make_fn, q, d, r1=4, r2=24):
    def loop(r, q, d):
        def step(i, acc):
            # i-dependence (epsilon-scaled, bf16-invisible) stops XLA
            # hoisting the loop-invariant search out of the fori_loop
            qq = q * (1.0 + i.astype(jnp.float32) * 1e-30).astype(q.dtype)
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


def main():
    log(f"devices: {jax.devices()}  N={N} D={D} Q={Q} k={K}")
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((N, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q = rng.standard_normal((Q, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q16 = jnp.asarray(q, jnp.bfloat16)
    d_rm = jnp.asarray(docs, jnp.bfloat16)
    del docs

    dt, tc, out = slope(xla_one, q16, d_rm)
    ref_ids = np.asarray(out[1])
    gb = N * D * 2 / 1e9
    log(f"xla dot+top_k: {dt*1e3:8.3f} ms  ({gb/dt:5.0f} GB/s)  "
        f"compile {tc:.1f}s")

    # kt=True measures the in-kernel-transpose phase-2 variant. The
    # sweep found it a wash, so production ships kt=False (opt-in via
    # LEGAL_RAG_RM_KERNEL_T=1, ops/dense.py); every config retries
    # kt=False on a Mosaic rejection so the sweep still yields data.
    for bn, sr in CONFIGS:
        # the shipped default measures BOTH variants (quantifies the
        # in-kernel-transpose win); other configs run kt=True and only
        # fall back to kt=False on failure
        both = (bn, sr) == (8192, 8)
        for kt in (True, False):
            def rm_one(qq, d, bn=bn, sr=sr, kt=kt):
                return dense_topk_twophase_rm(
                    qq, d, K, block_n=bn, seg_rows=sr,
                    precision=jax.lax.Precision.DEFAULT,
                    kernel_transpose=kt,
                )
            ok = False
            try:
                dt, tc, out = slope(rm_one, q16, d_rm)
                r = recall(out[1], ref_ids)
                log(f"rm bn={bn:<6} sr={sr:<3} kt={int(kt)}: "
                    f"{dt*1e3:8.3f} ms  "
                    f"({gb/dt:5.0f} GB/s eff, {gb/dt/819*100:4.1f}% peak)  "
                    f"recall@{K}={r:.4f}  compile {tc:.1f}s")
                ok = True
            except Exception as e:  # noqa: BLE001 — sweep survives bad cfg
                log(f"rm bn={bn:<6} sr={sr:<3} kt={int(kt)}: FAILED "
                    f"{type(e).__name__}: {str(e)[:120]}")
            if ok and not both:
                break

    # int8 capacity mode (round 4): per-segment quantization, int32
    # segment-max on the MXU — 1 byte/doc-dim vs bf16's 2, so the
    # ceiling is ~2x the bf16 GB/s-equivalent if MXU int8 keeps pace
    per_doc = np.abs(np.asarray(d_rm, np.float32)).max(axis=1) / 127.0
    seg_sc = per_doc.reshape(-1, 8).max(axis=1)
    seg_sc[seg_sc == 0] = 1.0
    sc = np.repeat(seg_sc, 8).astype(np.float32)
    d_i8 = jnp.asarray(np.clip(np.rint(
        np.asarray(d_rm, np.float32) / sc[:, None]), -127, 127
    ).astype(np.int8))
    sc_d = jnp.asarray(sc)
    qf = jnp.asarray(np.asarray(q16, np.float32))
    for kt in (True, False):
        def rm_i8(qq, d, kt=kt):
            return dense_topk_twophase_rm(
                qq, d, K, block_n=8192, seg_rows=8,
                doc_scales=sc_d, kernel_transpose=kt,
            )
        try:
            dt, tc, out = slope(rm_i8, qf, d_i8)
            r = recall(out[1], ref_ids)
            gb8 = N * D / 1e9
            log(f"rm int8 bn=8192 sr=8 kt={int(kt)}: {dt*1e3:8.3f} ms  "
                f"({gb8/dt:5.0f} GB/s codes)  recall@{K}={r:.4f}  "
                f"compile {tc:.1f}s")
            break
        except Exception as e:  # noqa: BLE001
            log(f"rm int8 kt={int(kt)}: FAILED {type(e).__name__}: "
                f"{str(e)[:120]}")

    # super-segment width for the best default config: the level-2
    # extract/top_k widths scale with `sup` while level-1 scales with
    # n_segs/sup — measured, not guessed
    for sup in (64, 256):
        def rm_sup(qq, d, sup=sup):
            return dense_topk_twophase_rm(
                qq, d, K, block_n=8192, seg_rows=8,
                precision=jax.lax.Precision.DEFAULT, sup=sup,
            )
        try:
            dt, tc, out = slope(rm_sup, q16, d_rm)
            r = recall(out[1], ref_ids)
            log(f"rm bn=8192   sr=8   sup={sup:<4}: {dt*1e3:8.3f} ms  "
                f"({gb/dt:5.0f} GB/s eff)  recall@{K}={r:.4f}  "
                f"compile {tc:.1f}s")
        except Exception as e:  # noqa: BLE001
            log(f"rm sup={sup}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
