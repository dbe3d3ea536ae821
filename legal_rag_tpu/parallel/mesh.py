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

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_shards: Optional[int] = None, axis: str = "shard") -> Mesh:
    """A 1-D device mesh over the first ``num_shards`` devices."""
    devices = jax.devices()
    num_shards = num_shards or len(devices)
    if num_shards > len(devices):
        raise ValueError(
            f"requested {num_shards} shards but only {len(devices)} devices"
        )
    return Mesh(np.array(devices[:num_shards]), (axis,))


def pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad axis 0 to a multiple (so shards divide evenly)."""
    n = arr.shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return arr
    pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)


def shard_rows(
    arr: np.ndarray, mesh: Mesh, axis: str = "shard"
) -> Tuple[jax.Array, int]:
    """Place ``arr`` row-sharded on the mesh (zero-padding rows so the
    shard count divides N). Returns (device array, padded row count)."""
    num = mesh.shape[axis]
    padded = pad_rows(arr, num)
    sharding = NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1))))
    return jax.device_put(padded, sharding), padded.shape[0]
