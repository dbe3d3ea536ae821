"""Serving-path retrieval stack: engine, classifier, orchestrator, responder."""

from legal_rag_tpu.retrieval.engine import RetrievalEngine, SearchResult

__all__ = ["RetrievalEngine", "SearchResult"]
