"""Versioned on-disk index artifacts + TPU ingest/build pipeline."""

from legal_rag_tpu.index.store import VectorStore
from legal_rag_tpu.index.builder import build_index

__all__ = ["VectorStore", "build_index"]
