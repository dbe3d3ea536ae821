"""Slope-measured MaxSim tier latency at scale (VERDICT r3 item 7).

Measures the full-scan tier (`sharded_maxsim_topk`) and the round-4
dense-first tier (`sharded_maxsim_rerank_topk`) at >= 100k docs,
Td=32 bf16 — the numbers behind ARCHITECTURE.md's capacity table.
The full scan reads the whole ``N*Td*D`` slab per batch; the rerank
tier reads the dense matrix plus ``C*Td*D`` candidate rows, so its
slope should track the plain dense sweep with a near-constant MaxSim
tail.

Run on the TPU:  python scripts/bench_maxsim_scale.py
Env: BENCH_N (default 131072), BENCH_Q (default 64).
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

from legal_rag_tpu.parallel.mesh import make_mesh
from legal_rag_tpu.parallel.sharded import (
    ShardedIndex, ShardedMultiVectorIndex,
)

N = int(os.environ.get("BENCH_N", str(1 << 17)))
Q = int(os.environ.get("BENCH_Q", "64"))
D, TD, TQ, K, C = 384, 32, 32, 10, 80


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(make_fn, *ops, r1=2, r2=10):
    def loop(r, *ops):
        def step(i, acc):
            s, ids = make_fn(i, *ops)
            return acc + s.sum().astype(jnp.float32) + ids.sum().astype(
                jnp.float32)
        return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

    j = jax.jit(loop, static_argnums=())
    t0 = time.perf_counter()
    float(j(1, *ops))
    tc = time.perf_counter() - t0

    def timed(r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(j(r, *ops))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(r2) - timed(r1)) / (r2 - r1), tc


def main():
    log(f"devices: {jax.devices()}  N={N} Q={Q} Td={TD} D={D}")
    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    # token slab: correlated with the sentence embedding so the
    # dense-first candidate stage is a realistic (not adversarial) one
    toks = (
        emb[:, None, :]
        + 0.25 * rng.standard_normal((N, TD, D)).astype(np.float32)
    )
    toks /= np.linalg.norm(toks, axis=2, keepdims=True)
    mask = np.ones((N, TD), np.int32)

    sidx = ShardedIndex.from_embeddings(emb, mesh, dtype="bfloat16")
    midx = ShardedMultiVectorIndex.from_arrays(
        toks, mask, mesh, dtype="bfloat16",
        n_pad=int(sidx.docs.shape[0]),
    )
    del toks
    # realistic coupling: query tokens are a noisy view of a target
    # doc's tokens, and the sentence embedding is their normalized
    # mean — the same relationship a real encoder produces, so the
    # dense candidate stage carries genuine signal about the MaxSim
    # winners (agreement below measures that coverage, not luck)
    targets = rng.choice(N, Q, replace=False)
    src = np.asarray(
        np.asarray(midx.doc_tokens[targets, :TQ], np.float32)
    )
    qt = src + 0.1 * rng.standard_normal((Q, TQ, D)).astype(np.float32)
    qt /= np.linalg.norm(qt, axis=2, keepdims=True)
    q_emb_np = qt.mean(axis=1)
    q_emb_np /= np.linalg.norm(q_emb_np, axis=1, keepdims=True)
    q_emb = jnp.asarray(q_emb_np, jnp.bfloat16)
    qt = jnp.asarray(qt, jnp.bfloat16)
    qm = jnp.ones((Q, TQ), jnp.int32)

    slab_gb = N * TD * D * 2 / 1e9
    dense_gb = N * D * 2 / 1e9

    # Pass the slab/matrix through jit ARGUMENTS, never closures: a
    # closure-captured device array is lifted into the lowering as a
    # CONSTANT (3.2 GB at N=131072 — the captured-constants warning),
    # which multiplies compile time through the relay and wedged the
    # first attempt at this benchmark.
    from legal_rag_tpu.parallel.sharded import (
        sharded_maxsim_rerank_topk, sharded_maxsim_topk,
    )

    def full_one(i, dtok, dmask, qt, qm):
        qq = qt * (1.0 + i.astype(jnp.float32) * 1e-30).astype(qt.dtype)
        return sharded_maxsim_topk(
            dtok, dmask, qq, qm, mesh=midx.mesh,
            k=min(K, midx.n_docs), n_docs=midx.n_docs, block_n=2048,
        )

    dt, tc = slope(full_one, midx.doc_tokens, midx.doc_mask, qt, qm)
    log(f"full-scan maxsim : {dt*1e3:8.2f} ms/batch-{Q}  "
        f"({slab_gb/dt:5.0f} GB/s slab, {slab_gb/dt/819*100:4.1f}% peak)  "
        f"compile {tc:.0f}s")

    def rerank_one(i, docs, dtok, dmask, q_emb, qt, qm):
        qq = qt * (1.0 + i.astype(jnp.float32) * 1e-30).astype(qt.dtype)
        return sharded_maxsim_rerank_topk(
            docs, dtok, dmask,
            jnp.asarray(q_emb, docs.dtype), qq, qm, mesh=midx.mesh,
            k=min(K, midx.n_docs), c=C, n_docs=midx.n_docs,
        )

    dt2, tc2 = slope(
        rerank_one, sidx.docs, midx.doc_tokens, midx.doc_mask,
        q_emb, qt, qm,
    )
    log(f"dense-first rerank: {dt2*1e3:8.2f} ms/batch-{Q}  "
        f"(dense sweep {dense_gb:.2f} GB + {Q*C*TD*D*2/1e6:.0f} MB "
        f"candidate slab)  compile {tc2:.0f}s")

    # agreement: how often does the bounded tier reproduce the exact
    # full-scan top-1/top-10 on this synthetic corpus
    zero = jnp.int32(0)
    s_f, i_f = jax.jit(full_one)(zero, midx.doc_tokens, midx.doc_mask,
                                 qt, qm)
    s_r, i_r = jax.jit(rerank_one)(zero, sidx.docs, midx.doc_tokens,
                                   midx.doc_mask, q_emb, qt, qm)
    i_f, i_r = np.asarray(i_f), np.asarray(i_r)
    top1 = float(np.mean(i_f[:, 0] == i_r[:, 0]))
    ov = float(np.mean([
        len(set(i_f[r]) & set(i_r[r])) / K for r in range(Q)
    ]))
    log(f"rerank vs full-scan: top-1 agreement {top1:.3f}, "
        f"top-{K} overlap {ov:.3f} (C={C}; synthetic-corpus proxy — "
        f"the real-corpus coverage number is EVAL_RETRIEVAL.json's "
        f"maxsim-rerank row)")


if __name__ == "__main__":
    main()
