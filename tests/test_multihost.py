"""Multi-host (multi-process) execution of the sharded search program
(VERDICT r2 item 7, SURVEY §5.8 "same pjit program over DCN").

Spawns 2 OS processes x 4 virtual CPU devices each, initializes
``jax.distributed`` against a local coordinator, builds one GLOBAL
8-device mesh spanning the process boundary, runs
``sharded_hybrid_search`` on a shared synthetic corpus, and checks
both processes return exactly the single-process golden ranking.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json
import os
import sys

sys.path.insert(0, os.environ["LR_REPO"])

import jax

jax.config.update("jax_platforms", "cpu")

from legal_rag_tpu.parallel.mesh import (
    initialize_distributed, make_mesh, replicate_global,
)

initialize_distributed(
    coordinator_address=os.environ["LR_COORD"],
    num_processes=2,
    process_id=int(os.environ["LR_PID"]),
)

import numpy as np
import jax.numpy as jnp

from legal_rag_tpu.parallel.sharded import ShardedIndex, sharded_hybrid_search

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

rng = np.random.default_rng(0)            # identical on both processes
n, d, q = 96, 16, 4
docs = rng.standard_normal((n, d)).astype(np.float32)
docs /= np.linalg.norm(docs, axis=1, keepdims=True)
q_emb = rng.standard_normal((q, d)).astype(np.float32)
post_ids = rng.integers(0, n, (q, 16)).astype(np.int32)
post_w = rng.random((q, 16)).astype(np.float32)
weights = np.full((q,), 0.5, dtype=np.float32)

mesh = make_mesh(8)                       # global: spans both processes
index = ShardedIndex.from_embeddings(docs, mesh)

scores, ids, _, _ = sharded_hybrid_search(
    index.docs,
    replicate_global(post_ids, mesh),
    replicate_global(post_w, mesh),
    replicate_global(q_emb, mesh),
    replicate_global(weights, mesh),
    mesh=mesh, k=5, c=10, n_docs=n, mode="weighted",
)
print("RESULT " + json.dumps({
    "process": jax.process_index(),
    "ids": np.asarray(ids).tolist(),
    "scores": np.asarray(scores).tolist(),
}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_sharded_search_across_two_processes():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["LR_REPO"] = str(REPO)
        env["LR_COORD"] = f"localhost:{port}"
        env["LR_PID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out
        results.append(json.loads(lines[-1][len("RESULT "):]))

    # both processes observed the identical replicated result
    assert results[0]["ids"] == results[1]["ids"]
    np.testing.assert_allclose(
        results[0]["scores"], results[1]["scores"], rtol=1e-6
    )

    # ... and it matches the single-process golden exactly
    rng = np.random.default_rng(0)
    n, d, q = 96, 16, 4
    docs = rng.standard_normal((n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    q_emb = rng.standard_normal((q, d)).astype(np.float32)
    post_ids = rng.integers(0, n, (q, 16)).astype(np.int32)
    post_w = rng.random((q, 16)).astype(np.float32)
    weights = np.full((q,), 0.5, dtype=np.float32)

    import jax.numpy as jnp

    from legal_rag_tpu.parallel.mesh import make_mesh
    from legal_rag_tpu.parallel.sharded import (
        ShardedIndex, sharded_hybrid_search,
    )

    mesh = make_mesh(8)
    index = ShardedIndex.from_embeddings(docs, mesh)
    _, gold_ids, _, _ = sharded_hybrid_search(
        index.docs, jnp.asarray(post_ids), jnp.asarray(post_w),
        jnp.asarray(q_emb), jnp.asarray(weights),
        mesh=mesh, k=5, c=10, n_docs=n, mode="weighted",
    )
    assert results[0]["ids"] == np.asarray(gold_ids).tolist()
