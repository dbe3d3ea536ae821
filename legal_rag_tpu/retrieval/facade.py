"""LegalEngine facade: one call = full RAG cycle.

Contract parity with the reference ``LegalEngine.query``
(engine.py:13-41): classify -> retrieve (batched concept expansion) ->
prioritize/expand -> generate, returning
``{query, intent, response, context_used}``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

from legal_rag_tpu.config import RetrievalConfig, DEFAULT_CONFIG
from legal_rag_tpu.index.store import VectorStore
from legal_rag_tpu.retrieval.engine import RetrievalEngine
from legal_rag_tpu.retrieval.llm import LLMClient, default_llm_client
from legal_rag_tpu.retrieval.classifier import QueryClassifier
from legal_rag_tpu.retrieval.orchestrator import LegalOrchestrator
from legal_rag_tpu.retrieval.responder import LegalResponder


class LegalEngine:
    def __init__(
        self,
        store_dir=None,
        store: Optional[VectorStore] = None,
        config: RetrievalConfig = DEFAULT_CONFIG,
        classifier_llm: Optional[LLMClient] = None,
        responder_llm: Optional[LLMClient] = None,
        use_llm: bool = True,
    ):
        if store is None:
            if store_dir is None:
                raise ValueError("need store_dir or store")
            store = VectorStore.load(Path(store_dir))
        if use_llm:
            if classifier_llm is None:
                classifier_llm = default_llm_client(
                    ("CLASSIFIER_MODELS", "LLM_MODELS")
                )
            if responder_llm is None:
                responder_llm = default_llm_client(
                    ("RESPONDER_MODELS", "LLM_MODELS")
                )
        self.engine = RetrievalEngine(store, config=config)
        self.orchestrator = LegalOrchestrator(
            self.engine, classifier=QueryClassifier(classifier_llm)
        )
        self.responder = LegalResponder(responder_llm)

    def query(self, query_text: str, k: int = 5) -> Dict[str, Any]:
        orchestration = self.orchestrator.orchestrate(query_text, k=k)
        response = self.responder.generate_response(
            query=query_text,
            context=orchestration["results"],
            intent=orchestration["intent"],
        )
        return {
            "query": query_text,
            "intent": orchestration["intent"],
            "response": response.to_dict(),
            "context_used": [
                {
                    "citation": c["chunk"]["canonical_header"],
                    "section_id": c["chunk"].get("section_id"),
                    "expanded": "parent_context" in c,
                }
                for c in orchestration["results"]
            ],
        }
