"""Mesh construction + row-sharding helpers.

The framework's parallelism model (SURVEY.md §2.3/§5.8): the document
dimension N is sharded across a 1-D ``shard`` mesh axis — each chip
owns an equal row-slice of the embedding matrix and scores only its
slice of the BM25 postings; query batches replicate. Per-shard top-k
candidates merge via ``all_gather`` over ICI (k is small, so a gather
of ``[S, Q, C]`` candidates beats any reduction tree). The same
program spans hosts over DCN unchanged — that is pjit's contract.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Multi-host (multi-process) runtime init.

    Call once per process BEFORE any jax operation; afterwards
    ``jax.devices()`` spans every host and :func:`make_mesh` /
    :func:`make_mesh_2d` build *global* meshes, so the same pjit
    programs (parallel/sharded.py) run unchanged over DCN — pjit's
    multi-controller contract (SURVEY.md §5.8). On TPU pods all
    arguments auto-detect from the environment; for CPU/GPU clusters
    pass them explicitly. Host arrays then enter programs via
    :func:`device_put_global` / :func:`replicate_global` (plain
    ``jnp.asarray`` produces process-local arrays a global program
    cannot consume).

    Tested by ``tests/test_multihost.py``: 2 processes x 4 virtual CPU
    devices running ``sharded_hybrid_search`` over the process
    boundary, bit-identical to the single-process result.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def device_put_global(
    arr: np.ndarray, mesh: Mesh, spec: PartitionSpec
) -> jax.Array:
    """Place a host array onto a (possibly multi-host) mesh.

    Single-process: plain ``jax.device_put``. Multi-process: every
    process passes the SAME global host array and each device
    materializes only its slice (``jax.make_array_from_callback``) —
    the standard multi-controller ingestion pattern for index shards.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def replicate_global(arr: np.ndarray, mesh: Mesh) -> jax.Array:
    """Fully-replicated global array (queries/postings/weights) for a
    multi-host program; equals ``jnp.asarray`` in single-process runs."""
    return device_put_global(np.asarray(arr), mesh, PartitionSpec())


def make_mesh(num_shards: Optional[int] = None, axis: str = "shard") -> Mesh:
    """A 1-D device mesh over the first ``num_shards`` devices (global
    across hosts after :func:`initialize_distributed`)."""
    devices = jax.devices()
    num_shards = num_shards or len(devices)
    if num_shards > len(devices):
        raise ValueError(
            f"requested {num_shards} shards but only {len(devices)} devices"
        )
    return Mesh(np.array(devices[:num_shards]), (axis,))


def make_mesh_2d(
    data: int,
    shards: int,
    data_axis: str = "data",
    shard_axis: str = "shard",
) -> Mesh:
    """A 2-D ``(data, shard)`` mesh: query batches shard over ``data``
    (pure data parallelism — each row of chips serves its own queries)
    while documents shard over ``shard`` within each row (the top-k
    merge collective stays within a row). Lay the doc-shard axis minor
    so its ``all_gather`` rides the fastest ICI links."""
    devices = jax.devices()
    need = data * shards
    if need > len(devices):
        raise ValueError(
            f"requested {data}x{shards} mesh but only "
            f"{len(devices)} devices"
        )
    grid = np.array(devices[:need]).reshape(data, shards)
    return Mesh(grid, (data_axis, shard_axis))
