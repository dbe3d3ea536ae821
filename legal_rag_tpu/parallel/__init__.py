"""Multi-chip execution: mesh helpers + sharded hybrid search."""

from legal_rag_tpu.parallel.mesh import make_mesh, shard_rows
from legal_rag_tpu.parallel.sharded import ShardedIndex, sharded_hybrid_search

__all__ = ["make_mesh", "shard_rows", "ShardedIndex", "sharded_hybrid_search"]
