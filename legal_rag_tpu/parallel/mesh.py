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
from jax.sharding import Mesh


def make_mesh(num_shards: Optional[int] = None, axis: str = "shard") -> Mesh:
    """A 1-D device mesh over the first ``num_shards`` devices."""
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
