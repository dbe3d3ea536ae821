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
