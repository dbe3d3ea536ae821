"""Hardware-only regression checks — run intentionally on a real TPU:

    LEGAL_RAG_TPU_TESTS=1 python -m pytest tests/test_tpu_hardware.py -q

Skipped by default: the standard suite runs on the virtual CPU mesh
(conftest forces jax to cpu), and these checks exist precisely because
interpret-mode behavior DIFFERS from hardware (see each test).
Run them in a separate process — conftest's platform override is
process-wide, so this module re-selects the TPU via a subprocess.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("LEGAL_RAG_TPU_TESTS") != "1",
    reason="hardware suite: set LEGAL_RAG_TPU_TESTS=1 on a TPU machine",
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_on_tpu(code: str, timeout: int = 560) -> dict:
    """Execute a snippet in a fresh process on the default (TPU)
    platform; the snippet must print one JSON line."""
    script = textwrap.dedent(code)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the platform plugin win
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_pallas_argmax_last_occurrence_assumption():
    """The kernels avoid argmax because hardware resolves ties to the
    LAST occurrence. If this ever changes (fixed upstream), this test
    flags that the workaround can be revisited."""
    result = _run_on_tpu("""
        import json, numpy as np, jax, jax.numpy as jnp
        from jax.experimental import pallas as pl
        def k(x_ref, o_ref):
            o_ref[0, :] = jnp.argmax(x_ref[:], axis=1).astype(jnp.int32)
        x = np.zeros((8, 256), np.float32); x[:, 33] = 1.0; x[:, 200] = 1.0
        out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((1, 8), jnp.int32))(jnp.asarray(x))
        print(json.dumps({"argmax": int(np.asarray(out)[0][0])}))
    """)
    assert result["argmax"] in (33, 200)  # documents the behavior either way


def test_fused_kernel_tie_break_on_hardware():
    """Duplicate docs must order by ascending id on REAL hardware (the
    regression the max/min-id selection fixed)."""
    result = _run_on_tpu("""
        import json, sys, numpy as np, jax.numpy as jnp
        sys.path.insert(0, ".")
        from legal_rag_tpu.ops.dense import dense_topk_pallas
        docs = np.concatenate([np.ones((6, 8), np.float32),
                               np.zeros((2, 8), np.float32)])
        q = np.ones((1, 8), np.float32)
        _, i = dense_topk_pallas(jnp.asarray(q), jnp.asarray(docs.T), 4,
                                 block_n=128)
        print(json.dumps({"ids": np.asarray(i)[0].tolist()}))
    """)
    assert result["ids"] == [0, 1, 2, 3]


def test_sharded_search_end_to_end_on_chip():
    """Full hybrid search on the real chip: recall vs exact golden."""
    result = _run_on_tpu("""
        import json, sys, numpy as np, jax, jax.numpy as jnp
        sys.path.insert(0, ".")
        from legal_rag_tpu.parallel.mesh import make_mesh
        from legal_rag_tpu.parallel.sharded import ShardedIndex, sharded_hybrid_search
        rng = np.random.default_rng(0)
        n, d, q, k = 5000, 128, 16, 10
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        qe = rng.standard_normal((q, d)).astype(np.float32)
        mesh = make_mesh(1)
        idx = ShardedIndex.from_embeddings(docs, mesh)
        pi = jnp.full((q, 64), n, jnp.int32); pw = jnp.zeros((q, 64))
        _, ids, _, _ = sharded_hybrid_search(
            idx.docs, pi, pw, jnp.asarray(qe),
            jnp.zeros((q,), jnp.float32),
            mesh=mesh, k=k, c=2*k, n_docs=n, mode="weighted",
            use_pallas=True)
        gold = np.argsort(-(qe @ docs.T), axis=1)[:, :k]
        ids = np.asarray(ids)
        rec = float(np.mean([len(set(ids[i]) & set(gold[i]))/k
                             for i in range(q)]))
        print(json.dumps({"recall": rec}))
    """)
    assert result["recall"] >= 0.999

def test_twophase_kernel_on_chip():
    """The segment-max two-phase backend: exact golden parity on the
    real chip (compiled Mosaic, not interpret mode)."""
    result = _run_on_tpu("""
        import json, sys, numpy as np, jax, jax.numpy as jnp
        sys.path.insert(0, ".")
        from legal_rag_tpu.ops.dense import dense_topk_twophase
        rng = np.random.default_rng(1)
        n, d, q, k = 40000, 128, 16, 10
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        qe = rng.standard_normal((q, d)).astype(np.float32)
        s, i = dense_topk_twophase(
            jnp.asarray(qe), jnp.asarray(docs.T), k,
            block_n=8192, block_q=16, seg_rows=16)
        gold = np.argsort(-(qe.astype(np.float64) @ docs.T.astype(np.float64)),
                          axis=1, kind="stable")[:, :k]
        ok = bool((np.asarray(i) == gold).all())
        print(json.dumps({"exact": ok}))
    """)
    assert result["exact"]


def test_int8_rescore_on_chip():
    """int8 index + fp32 rescore restores exact ordering on hardware."""
    result = _run_on_tpu("""
        import json, sys, numpy as np, jax, jax.numpy as jnp
        sys.path.insert(0, ".")
        from legal_rag_tpu.ops.dense import exact_rescore
        from legal_rag_tpu.parallel.mesh import make_mesh
        from legal_rag_tpu.parallel.sharded import ShardedIndex, sharded_hybrid_search
        rng = np.random.default_rng(2)
        base = rng.standard_normal((64, 64)).astype(np.float32)
        docs = np.repeat(base, 8, axis=0) + 1e-3 * rng.standard_normal((512, 64)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        qe = rng.standard_normal((8, 64)).astype(np.float32)
        qe /= np.linalg.norm(qe, axis=1, keepdims=True)
        mesh = make_mesh(1)
        idx = ShardedIndex.from_embeddings(docs, mesh, dtype="int8")
        n, k = 512, 10
        pi = jnp.full((8, 8), n, jnp.int32); pw = jnp.zeros((8, 8))
        w = np.zeros(8, np.float32)
        _, ids8, _, key8 = sharded_hybrid_search(
            idx.docs, pi, pw, jnp.asarray(qe), jnp.asarray(w),
            idx.doc_scales, mesh=mesh, k=4*k, c=8*k, n_docs=n,
            mode="weighted")
        _, ids, _, _ = exact_rescore(qe, np.asarray(ids8), docs,
                                     keyword=np.asarray(key8), weights=w, k=k)
        gold = np.argsort(-(qe.astype(np.float64) @ docs.T.astype(np.float64)),
                          axis=1, kind="stable")[:, :k]
        print(json.dumps({"exact": bool((ids == gold).all())}))
    """)
    assert result["exact"]


def test_pq_kernel_on_chip():
    """4-bit PQ segment-max kernel: Mosaic lowering + numerical parity
    with the nibble-LUT golden on real hardware (bf16 phase-1 scoring,
    exact phase-2 ordering). Also pins the two compiler findings that
    shaped the kernel: lane-major one-hots and summed K=16 dots (an
    in-kernel lane concatenate or a sublane-major one-hot crashes the
    TPU backend compiler — see ops/pq.py)."""
    result = _run_on_tpu("""
        import json, numpy as np, jax.numpy as jnp
        from legal_rag_tpu.ops.pq import (
            encode_pq, pq_topk, train_pq, unpack_codes,
        )
        rng = np.random.default_rng(11)
        D, M, N = 64, 8, 6000
        centers = rng.standard_normal((50, D)).astype(np.float32)
        docs = centers[rng.integers(0, 50, N)] + 0.15 * rng.standard_normal((N, D))
        docs = (docs / np.linalg.norm(docs, axis=1, keepdims=True)).astype(np.float32)
        q = docs[rng.integers(0, N, 8)].copy()
        cb = train_pq(docs, m=M, iters=10, seed=0)
        codes = encode_pq(docs, cb)
        s, ids = pq_topk(
            jnp.asarray(q), jnp.asarray(codes), jnp.asarray(cb.codebooks),
            k=10, block_n=512, seg_rows=8,
        )
        s, ids = np.asarray(s), np.asarray(ids)
        nibs = unpack_codes(codes)
        lut = np.einsum(
            "qmd,mcd->qmc",
            q.reshape(8, cb.n_subspaces, cb.dsub), cb.codebooks)
        golden = np.zeros((8, N), np.float32)
        for sub in range(cb.n_subspaces):
            golden += lut[np.arange(8)[:, None], sub, nibs[None, :, sub]]
        exact = 0
        for qi in range(8):
            order = np.lexsort((np.arange(N), -golden[qi]))[:10]
            exact += int((ids[qi] == order).all())
        print(json.dumps({"exact_rows": exact,
                          "max_rel": float(np.max(np.abs(
                              s - np.take_along_axis(golden, ids, 1))
                              / (np.abs(s) + 1e-6)))}))
    """, timeout=1200)  # kernel compiles are minutes through a cold/degraded relay
    # phase-2 rescores candidates in fp32, so ordering should match the
    # golden on nearly every row (bf16 phase-1 only picks segments)
    assert result["exact_rows"] >= 7, result
    assert result["max_rel"] < 1e-3, result
