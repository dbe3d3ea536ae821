"""Classifier / orchestrator / responder / facade tests — all offline
via the deterministic paths (the reference cannot test any of this
without an API key)."""

import numpy as np
import pytest

from legal_rag_tpu.retrieval.classifier import (
    QueryClassifier, QueryIntent, classify_heuristic, QUERY_TYPES,
)
from legal_rag_tpu.retrieval.orchestrator import (
    LegalOrchestrator, expansion_queries,
)
from legal_rag_tpu.retrieval.responder import (
    LegalResponder, format_context, context_sources, DISCLAIMER,
)
from legal_rag_tpu.retrieval.facade import LegalEngine


# --- classifier --------------------------------------------------------


@pytest.mark.parametrize("query,category,context", [
    ("I was just robbed at gunpoint, what do I do?", "procedure", "victim_distress"),
    ("What is the punishment for theft?", "punishment", "informational"),
    ("How much compensation for acid attack victims?", "compensation", "informational"),
    ("Is rape a bailable offence?", "bailability", "informational"),
    ("What is Section 302 of BNS?", "definition", "informational"),
    ("I am a lawyer looking for high court powers", "court_power", "professional"),
    ("How to file FIR?", "procedure", "informational"),
    # round-4 paraphrase forms: scenario vocabulary, no statute terms
    ("A man grabbed my gold chain and ran", "procedure", "victim_distress"),
    ("My ex keeps following me around after I told him to stop",
     "procedure", "victim_distress"),
    ("Someone threw a corrosive liquid at my cousin", "procedure",
     "victim_distress"),
    ("How many hours can police hold someone before a judge sees them?",
     "general_explanation", "informational"),
    # "ransom" is word-bounded: it must fire on the kidnapping form but
    # NOT on "ransomware" (an unrelated cyber-offence domain)
    ("They are holding my brother and demanding a ransom",
     "procedure", "victim_distress"),
    ("My office computer was hit by ransomware, how do I report it?",
     "procedure", "informational"),
])
def test_heuristic_classifier(query, category, context):
    intent = classify_heuristic(query)
    assert intent.category == category
    assert intent.user_context == context
    assert intent.category in QUERY_TYPES


def test_heuristic_extracts_entities():
    intent = classify_heuristic("Section 309 BNS robbery punishment")
    assert "BNS" in intent.key_entities
    assert "robbery" in intent.key_entities
    assert "Section 309" in intent.key_entities


class _FailingLLM:
    def generate_json(self, prompt, system=None):
        raise RuntimeError("boom")


class _CannedLLM:
    def __init__(self, payload):
        self.payload = payload

    def generate_json(self, prompt, system=None):
        return self.payload


def test_classifier_llm_fallback_on_error():
    c = QueryClassifier(_FailingLLM())
    intent = c.classify("what is the punishment for theft")
    assert intent.category == "punishment"


def test_classifier_llm_fallback_on_invalid_payload():
    c = QueryClassifier(_CannedLLM({"category": "nonsense", "user_context": "x"}))
    intent = c.classify("what is the punishment for theft")
    assert intent.category == "punishment"  # heuristic took over


def test_classifier_llm_valid_payload_used():
    c = QueryClassifier(_CannedLLM({
        "category": "procedure", "user_context": "victim_distress",
        "confidence": 0.9, "sub_intent": "FIR filing",
        "key_entities": ["FIR", "robbery"],
    }))
    intent = c.classify("anything")
    assert intent.category == "procedure"
    assert intent.sub_intent == "FIR filing"
    assert intent.confidence == 0.9


# --- orchestrator ------------------------------------------------------


@pytest.fixture(scope="module")
def legal_engine():
    """Offline facade over the real corpus with a tiny encoder."""
    from legal_rag_tpu.config import (
        RetrievalConfig, EncoderConfig, ShardingConfig,
    )
    from legal_rag_tpu.index.builder import build_index

    cfg = RetrievalConfig(
        encoder=EncoderConfig(
            vocab_size=8000, hidden=32, layers=2, heads=4,
            intermediate=64, max_len=64, encode_batch=512,
        ),
        sharding=ShardingConfig(num_shards=4),
    )
    store = build_index("/root/reference/legal_chunks.json", config=cfg)
    return LegalEngine(store=store, config=cfg, use_llm=False)


def test_expansion_queries_keyed_on_offence():
    intent = QueryIntent(
        category="procedure", user_context="victim_distress",
        confidence=0.9, key_entities=["robbery", "FIR"],
    )
    qs = expansion_queries(intent)
    assert len(qs) == 3
    assert "robbery" in qs[0] and "BNSS" in qs[0]
    assert "NALSA" in qs[1]
    assert "Zero FIR" in qs[2]
    # unknown offence falls back to "crime"
    intent.key_entities = []
    assert "crime" in expansion_queries(intent)[0]


def test_orchestrate_victim_expands_and_boosts(legal_engine):
    out = legal_engine.orchestrator.orchestrate(
        "I was robbed at knifepoint just now, help", k=5
    )
    assert out["intent"]["user_context"] == "victim_distress"
    results = out["results"]
    assert 0 < len(results) <= 5
    # dedupe by canonical header
    headers = [r["chunk"]["canonical_header"] for r in results]
    assert len(headers) == len(set(headers))


def test_orchestrate_informational_no_expansion(legal_engine):
    out = legal_engine.orchestrator.orchestrate(
        "What is the punishment for theft?", k=5
    )
    assert out["intent"]["user_context"] == "informational"
    assert len(out["results"]) <= 5


def test_priority_boost_rules(legal_engine):
    intent = QueryIntent(
        category="procedure", user_context="victim_distress",
        confidence=0.9, key_entities=["BNSS"],
    )
    mk = lambda law, score: {
        "chunk": {"metadata": {"law": law}, "canonical_header": law},
        "score": score, "semantic": score, "keyword": 0.0,
    }
    results = [mk("BNS", 1.0), mk("BNSS", 1.0), mk("NALSA", 1.0), mk("SOP", 1.0)]
    out = legal_engine.orchestrator.prioritize_results(results, intent)
    laws = [r["chunk"]["metadata"]["law"] for r in out]
    # BNSS gets +0.5 (police task) +0.2 (entity match) = 1.7x;
    # SOP +0.5 = 1.5; NALSA +0.2 = 1.2; BNS -0.2 = 0.8
    assert laws == ["BNSS", "SOP", "NALSA", "BNS"]
    assert out[0]["score"] == pytest.approx(1.7)
    assert out[-1]["score"] == pytest.approx(0.8)


def test_parent_expansion_attaches_section_text(legal_engine):
    orch = legal_engine.orchestrator
    # find a real sub-unit whose parent section exists
    target = None
    for c in legal_engine.engine.store.chunks:
        meta = c["metadata"]
        if meta["unit_type"] in ("illustration", "sub_section") and (
            (meta["law"], meta["section"]) in orch.section_lookup
        ):
            parent = orch.section_lookup[(meta["law"], meta["section"])]
            if parent["canonical_header"] != c["canonical_header"]:
                target = c
                break
    assert target is not None
    res = [{"chunk": target, "score": 1.0, "semantic": 1.0, "keyword": 0.0}]
    out = orch.expand_results(res)
    assert "parent_context" in out[0]
    assert out[0]["parent_context"].startswith(
        orch.section_lookup[
            (target["metadata"]["law"], target["metadata"]["section"])
        ]["text"][:20]
    )


# --- fusion form policy (round 5) ---------------------------------------


def test_query_form_detector():
    from legal_rag_tpu.quality import PARAPHRASE_SUITE
    from legal_rag_tpu.retrieval.query_form import is_heading, is_narrative

    # every paraphrase-suite query is narrative (the policy's target)
    for q, _, _ in PARAPHRASE_SUITE:
        assert is_narrative(q), q
    # short heading-register queries are never narrative
    for q in ("Punishment for robbery", "Zero FIR", "Section 103 murder"):
        assert is_heading(q) and not is_narrative(q), q
    # long section titles without function words stay non-narrative
    assert not is_narrative(
        "Punishment for criminal breach of trust by public servant banker "
        "merchant agent"
    )
    # statute-register sentences carry auxiliaries -> narrative
    assert is_narrative(
        "whoever commits robbery shall be punished with rigorous "
        "imprisonment for a term"
    )


class _RecordingEngine:
    """Stub engine capturing search_batch calls for routing tests."""

    def __init__(self, narrative_mode="dense"):
        from legal_rag_tpu.config import RetrievalConfig, FusionConfig
        import dataclasses

        self.config = dataclasses.replace(
            RetrievalConfig(),
            fusion=FusionConfig(narrative_mode=narrative_mode),
        )
        self.store = type("S", (), {"chunks": []})()
        self.calls = []
        self.canned = {}

    def search_batch(self, queries, k=None, hybrid_weights=None, mode=None):
        self.calls.append(
            {"queries": list(queries), "weights": list(hybrid_weights),
             "mode": mode}
        )
        return [self.canned.get((q, mode), []) for q in queries]


def _orchestrator(engine):
    from legal_rag_tpu.retrieval.orchestrator import LegalOrchestrator

    return LegalOrchestrator(engine, classifier=QueryClassifier(None))


def test_narrative_policy_routes_dense():
    eng = _RecordingEngine()
    orch = _orchestrator(eng)
    narrative = "someone is spreading made-up stories that ruined my standing"
    rows = orch._search_with_form_policy([narrative], 5, [0.5], None)
    assert rows == [[]]
    assert len(eng.calls) == 1
    # dense = weighted program with weight 0 (evaluation.py semantics)
    assert eng.calls[0]["mode"] == "weighted"
    assert eng.calls[0]["weights"] == [0.0]


def _sr(doc_id, score=1.0):
    from legal_rag_tpu.retrieval.engine import SearchResult

    return SearchResult(
        chunk={"canonical_header": f"h{doc_id}"}, score=score,
        semantic=score, keyword=0.0, doc_id=doc_id,
    )


def test_narrative_dense_union_interleaves_and_rescoring():
    eng = _RecordingEngine(narrative_mode="dense-union")
    orch = _orchestrator(eng)
    narrative = "my ex keeps following me around and contacting me after"
    # dense ranking surfaces 7,8; default (rrf) ranking has 8,9
    eng.canned[(narrative, None)] = [_sr(8, 0.03), _sr(9, 0.02)]
    eng.canned[(narrative, "weighted")] = [_sr(7, 0.9), _sr(8, 0.8)]
    rows = orch._search_with_form_policy([narrative], 3, [0.5], None)
    assert len(eng.calls) == 2
    # both programs ran: default over the whole batch, dense over the
    # narrative subset
    assert eng.calls[0]["mode"] is None
    assert eng.calls[1]["mode"] == "weighted"
    assert eng.calls[1]["weights"] == [0.0]
    merged = rows[0]
    # dense-first interleave, deduped: 7 (dense), 8 (rrf), 9
    assert [r.doc_id for r in merged] == [7, 8, 9]
    # rescored by reciprocal interleave rank on one scale
    rrf_k = eng.config.fusion.rrf_k
    assert [r.score for r in merged] == [
        1.0 / rrf_k, 1.0 / (rrf_k + 1), 1.0 / (rrf_k + 2)
    ]
    # monotone: downstream minmax/boost stages preserve this order
    assert merged[0].score > merged[1].score > merged[2].score


def test_heading_queries_keep_default_mode():
    eng = _RecordingEngine()
    orch = _orchestrator(eng)
    orch._search_with_form_policy(["Punishment for robbery"], 5, [0.5], None)
    assert eng.calls == [
        {"queries": ["Punishment for robbery"], "weights": [0.5],
         "mode": None}
    ]


def test_mixed_batch_splits_and_preserves_order():
    eng = _RecordingEngine()
    orch = _orchestrator(eng)
    narrative = "my ex keeps following me around and contacting me after"
    heading = "Punishment for robbery"
    rows = orch._search_with_form_policy(
        [narrative, heading], 5, [0.5, 0.6], None
    )
    assert len(rows) == 2 and all(r == [] for r in rows)
    assert len(eng.calls) == 2
    narr_call = next(c for c in eng.calls if c["mode"] == "weighted")
    head_call = next(c for c in eng.calls if c["mode"] is None)
    assert narr_call["queries"] == [narrative]
    assert narr_call["weights"] == [0.0]
    assert head_call["queries"] == [heading]
    assert head_call["weights"] == [0.6]


def test_explicit_mode_bypasses_policy():
    eng = _RecordingEngine()
    orch = _orchestrator(eng)
    narrative = "my ex keeps following me around and contacting me after"
    orch._search_with_form_policy([narrative], 5, [0.5], "rrf")
    assert eng.calls == [
        {"queries": [narrative], "weights": [0.5], "mode": "rrf"}
    ]


def test_policy_disabled_when_narrative_mode_none():
    eng = _RecordingEngine(narrative_mode=None)
    orch = _orchestrator(eng)
    narrative = "my ex keeps following me around and contacting me after"
    orch._search_with_form_policy([narrative], 5, [0.5], None)
    assert eng.calls[0]["mode"] is None
    assert eng.calls[0]["weights"] == [0.5]


# --- responder ---------------------------------------------------------


def _ctx(law="BNS", section="309", parent=None):
    c = {
        "chunk": {
            "canonical_header": f"{law} Section {section}",
            "text": f"{law} Section {section}\n\nBody text about the offence.",
            "metadata": {"law": law, "section": section},
        },
        "score": 1.0,
    }
    if parent:
        c["parent_context"] = parent
    return c


def test_format_context_parent_stitching():
    s = format_context([_ctx(parent="PARENT TEXT")])
    assert "[PARENT CONTEXT]: PARENT TEXT" in s
    assert "[SPECIFIC CLAUSE]:" in s


def test_context_sources_limit_and_parent():
    ctx = [_ctx(section=str(i)) for i in range(6)]
    ctx[0]["parent_context"] = "PARENT"
    sources = context_sources(ctx)
    assert len(sources) == 4  # reference limit responder.py:135
    assert sources[0].content.startswith("PARENT")
    assert "[Clause]:" in sources[0].content


def test_extractive_responder_victim_fields():
    r = LegalResponder(None).generate_response(
        "I was robbed", [_ctx()],
        {"user_context": "victim_distress", "category": "procedure"},
    )
    assert r.safety_alert and "112" in r.safety_alert
    assert len(r.immediate_action_plan) >= 3
    assert r.sources and r.sources[0].law == "BNS"
    assert r.disclaimer == DISCLAIMER


def test_responder_nulls_safety_outside_victim():
    canned = _CannedLLM({
        "answer": "A", "legal_basis": "B", "disclaimer": "D",
        "safety_alert": "should vanish",
        "immediate_action_plan": ["x"],
        "sources": [{"law": "FAKE", "section": "1", "content": "c", "citation": "z"}],
    })
    r = LegalResponder(canned).generate_response(
        "what is theft", [_ctx()], {"user_context": "informational"},
    )
    assert r.safety_alert is None
    assert r.immediate_action_plan == []
    # LLM-claimed sources replaced by actual context
    assert r.sources[0].law == "BNS"


def test_responder_llm_failure_degrades_to_extractive():
    r = LegalResponder(_FailingLLM()).generate_response(
        "what is theft", [_ctx()], {"user_context": "informational"},
    )
    assert "Section 309" in r.answer


# --- facade ------------------------------------------------------------


def test_full_engine_query_offline(legal_engine):
    out = legal_engine.query("I was robbed at gunpoint, what should I do?")
    assert set(out) == {
        "query", "intent", "response", "context_used", "adapted",
    }
    resp = out["response"]
    assert len(resp["answer"]) >= 10
    assert len(resp["sources"]) >= 1
    # victim queries must carry safety fields (quality gate,
    # reference test_quality.py:52-68)
    assert resp["safety_alert"]
    assert resp["immediate_action_plan"]
    assert resp["disclaimer"]
    assert all("citation" in c for c in out["context_used"])


def test_full_engine_informational_no_safety(legal_engine):
    out = legal_engine.query("What is the punishment for theft?")
    assert out["response"]["safety_alert"] is None
    assert out["response"]["immediate_action_plan"] == []


def test_strip_json_fences_variants():
    from legal_rag_tpu.retrieval.llm import strip_json_fences

    assert strip_json_fences('```\n{"a": 1}\n```') == '{"a": 1}'
    assert strip_json_fences('```json\n{"a": 1}\n```') == '{"a": 1}'
    assert strip_json_fences('{"a": 1}') == '{"a": 1}'
    assert strip_json_fences('prose\n```json\n{"a": 1}\n```\nmore') == '{"a": 1}'


def test_parse_answer_units_top_level_array_is_garbage():
    from legal_rag_tpu.server.answer_units import parse_answer_units_response

    assert parse_answer_units_response('[{"text": "x", "kind": "derived"}]') == []


def test_relevant_excerpt_picks_matching_sentences():
    from legal_rag_tpu.retrieval.responder import _relevant_excerpt

    body = (
        "Preliminary provisions apply to this chapter. "
        "The victim may lodge the FIR at any police station. "
        "Unrelated administrative detail about filing cabinets. "
        "A copy of the FIR shall be given free of cost to the victim."
    )
    out = _relevant_excerpt("where do I lodge an FIR and get a copy", body)
    assert "lodge the FIR" in out
    assert "free of cost" in out
    assert "filing cabinets" not in out
    # order preserved (document order, not score order)
    assert out.index("lodge") < out.index("free of cost")


def test_relevant_excerpt_falls_back_without_overlap():
    from legal_rag_tpu.retrieval.responder import _relevant_excerpt

    body = "First sentence here. Second sentence follows. Third one."
    out = _relevant_excerpt("zzz qqq", body)
    assert out.startswith("First sentence")
