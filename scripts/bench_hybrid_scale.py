"""Hybrid (dense + BM25 segsum + fusion) at 1M docs, single chip
(VERDICT r2 item 6).

Measures, slope method throughout:
  1. full sharded hybrid ms/batch-64 at N=1M with the default postings
     budget cap (BM25Config.postings_budget_cap) and uncapped,
  2. the vectorized host postings gather (ops/sparse.py) at both budgets,
  3. the recall effect of the cap: capped sparse top-10 vs exact host
     golden, and capped hybrid top-10 vs uncapped hybrid.

The corpus is synthetic-but-adversarial: Zipf document frequencies, so
every query carries two stopword-class terms whose postings alone
overflow the cap (the regime the cap exists for).

Run on TPU: python scripts/bench_hybrid_scale.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from legal_rag_tpu.config import BM25Config
from legal_rag_tpu.ops.sparse import BM25Index

N = int(os.environ.get("HYB_N", 1_000_000))
V = 50_000
D, Q, K = 384, 64, 10
CAP = BM25Config.postings_budget_cap


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synth_index(rng) -> BM25Index:
    """CSR BM25 index with Zipf df: head terms hit ~30% of the corpus."""
    ranks = np.arange(1, V + 1, dtype=np.float64)
    df = np.minimum(N * 0.3, N * 0.3 / ranks ** 0.9).astype(np.int64)
    df = np.maximum(df, 1)
    indptr = np.zeros(V + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(df)
    nnz = int(indptr[-1])
    log(f"synthetic CSR: V={V} nnz={nnz/1e6:.1f}M "
        f"({nnz*8/1e9:.2f} GB device)")
    doc_ids = rng.integers(0, N, nnz).astype(np.int32)
    # postings sorted by doc id per term (matches build_bm25's layout)
    for t in range(V):
        lo, hi = indptr[t], indptr[t + 1]
        if hi - lo > 1:
            doc_ids[lo:hi].sort()
    idf = np.log((N - df + 0.5) / (df + 0.5)).astype(np.float32)
    idf = np.maximum(idf, 0.05)
    weights = np.empty(nnz, dtype=np.float32)
    for t in range(V):
        lo, hi = indptr[t], indptr[t + 1]
        weights[lo:hi] = idf[t] * (
            0.5 + rng.random(hi - lo, dtype=np.float32)
        )
    vocab = {f"t{t}": t for t in range(V)}
    return BM25Index(
        vocab=vocab, indptr=indptr, doc_ids=doc_ids, weights=weights,
        idf=idf, doc_len=np.full(N, 100, np.int32), n_docs=N,
        avgdl=100.0, k1=1.5, b=0.75, epsilon=0.25,
    )


def golden_sparse_topk(index, queries, k):
    """Exact host BM25 top-k (full postings, float64 accumulate)."""
    out = np.empty((len(queries), k), dtype=np.int64)
    for qi, query in enumerate(queries):
        scores = np.zeros(index.n_docs, dtype=np.float64)
        counts = {}
        for t in index.query_term_ids(query):
            counts[t] = counts.get(t, 0) + 1
        for t, c in counts.items():
            lo, hi = int(index.indptr[t]), int(index.indptr[t + 1])
            np.add.at(scores, index.doc_ids[lo:hi],
                      c * index.weights[lo:hi].astype(np.float64))
        out[qi] = np.argsort(-scores, kind="stable")[:k]
    return out


def slope(fn, r1=2, r2=10):
    def timed(r):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(r))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = timed(r1), timed(r2)
    return (t2 - t1) / (r2 - r1)


def main():
    log(f"devices: {jax.devices()}  N={N}  cap={CAP}")
    rng = np.random.default_rng(0)
    index = synth_index(rng)

    # queries: 2 stopword-class head terms + 10 tail terms each
    queries = []
    for _ in range(Q):
        head = rng.integers(0, 8, 2)
        tail = rng.integers(100, V, 10)
        queries.append(" ".join(f"t{t}" for t in np.r_[head, tail]))

    b_full = index.postings_budget(queries)
    b_cap = index.postings_budget(queries, cap=CAP)
    log(f"budget uncapped={b_full} capped={b_cap}")

    t0 = time.perf_counter()
    pid_c, pw_c = index.gather_postings(queries, b_cap)
    t_gather_cap = time.perf_counter() - t0
    t0 = time.perf_counter()
    pid_f, pw_f = index.gather_postings(queries, b_full)
    t_gather_full = time.perf_counter() - t0
    log(f"host gather (vectorized): capped {t_gather_cap*1e3:.1f} ms, "
        f"uncapped {t_gather_full*1e3:.1f} ms / batch-{Q}")

    gold = golden_sparse_topk(index, queries, K)
    log("host golden sparse top-k done")

    # ---- capped sparse recall vs exact (device scoring = scatter-add
    # of the gathered postings; recall loss is purely the truncation)
    from legal_rag_tpu.ops.sparse import bm25_topk
    _, top_c = bm25_topk(jnp.asarray(pid_c), jnp.asarray(pw_c), N, K)
    top_c = np.asarray(top_c)
    sparse_recall = np.mean([
        len(set(top_c[i]) & set(gold[i])) / K for i in range(Q)
    ])
    log(f"capped sparse recall@{K} vs exact: {sparse_recall:.4f}")

    # ---- full hybrid at 1M
    from legal_rag_tpu.parallel.mesh import make_mesh
    from legal_rag_tpu.parallel.sharded import (
        ShardedIndex, sharded_hybrid_search,
    )

    docs = rng.standard_normal((N, D)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q_emb = rng.standard_normal((Q, D)).astype(np.float32)
    q_emb /= np.linalg.norm(q_emb, axis=1, keepdims=True)
    w = np.full(Q, 0.5, np.float32)

    mesh = make_mesh(1)
    sidx = ShardedIndex.from_embeddings(docs, mesh, dtype="bfloat16")
    del docs
    d_q, d_w = jnp.asarray(q_emb), jnp.asarray(w)

    results = {}
    for name, (pid, pw) in (
        ("capped", (pid_c, pw_c)), ("uncapped", (pid_f, pw_f)),
    ):
        d_pid, d_pw = jnp.asarray(pid), jnp.asarray(pw)

        # big operands are jit ARGUMENTS, not closure captures: a
        # closed-over 768 MB array becomes a constant in the lowered
        # computation and kills the remote-compile relay (broken pipe)
        def loop(r, docs_t, d_pid, d_pw, d_q, d_w):
            def step(i, acc):
                qq = d_q * (1.0 + i.astype(jnp.float32) * 1e-30)
                f, ids, _, _ = sharded_hybrid_search(
                    docs_t, d_pid, d_pw, qq, d_w,
                    mesh=mesh, k=K, c=2 * K, n_docs=N, mode="weighted",
                )
                return acc + f.sum() + ids.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, r, step, jnp.float32(0.0))

        jj = jax.jit(loop)

        def j(r):
            return jj(r, sidx.docs, d_pid, d_pw, d_q, d_w)

        t0 = time.time()
        float(j(1))
        log(f"{name}: compiled ({time.time()-t0:.0f}s)")
        dt = slope(j)
        results[name] = dt
        log(f"hybrid {name} (budget {pid.shape[1]}): "
            f"{dt*1e3:.2f} ms/batch-{Q} -> {Q/dt:.0f} QPS")

        _, ids, _, _ = sharded_hybrid_search(
            sidx.docs, d_pid, d_pw, d_q, d_w,
            mesh=mesh, k=K, c=2 * K, n_docs=N, mode="weighted",
        )
        results[name + "_ids"] = np.asarray(ids)

    overlap = np.mean([
        len(set(results["capped_ids"][i]) & set(results["uncapped_ids"][i]))
        / K for i in range(Q)
    ])
    log(f"hybrid top-{K} overlap capped vs uncapped: {overlap:.4f}")
    log(f"SUMMARY cap={CAP} sparse_recall={sparse_recall:.4f} "
        f"hybrid_overlap={overlap:.4f} "
        f"ms_capped={results['capped']*1e3:.2f} "
        f"ms_uncapped={results['uncapped']*1e3:.2f}")


if __name__ == "__main__":
    main()
