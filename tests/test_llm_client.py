"""GeminiClient model-fallback chain (SURVEY §5.3 failure recovery),
tested against a stubbed google.genai SDK — no network, no key leaves
the process."""

import sys
import types

import pytest


class _FakeResponse:
    def __init__(self, text):
        self.text = text


class _FakeModels:
    def __init__(self, behavior):
        self.behavior = behavior   # model_id -> text | Exception
        self.calls = []

    def generate_content(self, model, contents, config=None):
        self.calls.append(model)
        out = self.behavior[model]
        if isinstance(out, Exception):
            raise out
        return _FakeResponse(out)


@pytest.fixture
def fake_genai(monkeypatch):
    """Install a fake google.genai with controllable per-model behavior."""
    fake_models = {}

    genai_mod = types.ModuleType("google.genai")

    class Client:
        def __init__(self, api_key=None):
            self.models = fake_models["models"]

    genai_mod.Client = Client
    types_mod = types.ModuleType("google.genai.types")

    class GenerateContentConfig:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    types_mod.GenerateContentConfig = GenerateContentConfig
    genai_mod.types = types_mod

    google_mod = types.ModuleType("google")
    google_mod.genai = genai_mod
    monkeypatch.setitem(sys.modules, "google", google_mod)
    monkeypatch.setitem(sys.modules, "google.genai", genai_mod)
    monkeypatch.setitem(sys.modules, "google.genai.types", types_mod)
    monkeypatch.setenv("GEMINI_API_KEY", "test-key")
    monkeypatch.delenv("LLM_MODELS", raising=False)
    return fake_models


def test_fallback_chain_skips_failing_models(fake_genai):
    from legal_rag_tpu.retrieval.llm import GeminiClient

    models = _FakeModels({
        "gemma-3-4b-it": RuntimeError("quota"),
        "gemini-2.5-flash-lite": '{"category": "procedure"}',
    })
    fake_genai["models"] = models
    client = GeminiClient()
    out = client.generate_json("classify this")
    assert out == {"category": "procedure"}
    assert models.calls == ["gemma-3-4b-it", "gemini-2.5-flash-lite"]


def test_all_models_failing_raises_last(fake_genai):
    from legal_rag_tpu.retrieval.llm import GeminiClient

    fake_genai["models"] = _FakeModels({
        "gemma-3-4b-it": RuntimeError("quota-a"),
        "gemini-2.5-flash-lite": RuntimeError("quota-b"),
    })
    client = GeminiClient()
    with pytest.raises(RuntimeError, match="quota-b"):
        client.generate_json("anything")


def test_gemma_fenced_json_parsed(fake_genai):
    from legal_rag_tpu.retrieval.llm import GeminiClient

    fake_genai["models"] = _FakeModels({
        "gemma-3-4b-it": '```json\n{"a": 1}\n```',
    })
    client = GeminiClient(model_ids=["gemma-3-4b-it"])
    # env unset -> uses provided model list
    assert client.generate_json("x") == {"a": 1}


def test_env_model_list_wins(fake_genai, monkeypatch):
    from legal_rag_tpu.retrieval.llm import GeminiClient

    monkeypatch.setenv("LLM_MODELS", "custom-a, custom-b")
    models = _FakeModels({
        "custom-a": RuntimeError("down"),
        "custom-b": '{"ok": true}',
    })
    fake_genai["models"] = models
    client = GeminiClient()
    assert client.generate_json("x") == {"ok": True}
    assert models.calls == ["custom-a", "custom-b"]


def test_default_llm_client_none_without_key(monkeypatch):
    from legal_rag_tpu.retrieval.llm import default_llm_client

    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    monkeypatch.delenv("GOOGLE_API_KEY", raising=False)
    assert default_llm_client() is None


# ---------------------------------------------------------------------------
# Transcript fixtures (VERDICT r4 item 7): captured-shape payloads for the
# two real prompt shapes (classifier intent JSON, responder 8-field JSON),
# one set per model family — gemma-* (conversational text around a ```json
# fence; the prompt appends "Return ONLY valid JSON") and gemini-* JSON mode
# (bare JSON document, no fence, may carry \uXXXX escapes and nulls). The
# payload shapes are hand-verified against the google-genai SDK contract the
# reference drives (reference classifier.py:79-100, responder.py:83-130).
# ---------------------------------------------------------------------------

import json as _json
import os as _os

_FIXTURES = _json.load(open(
    _os.path.join(_os.path.dirname(__file__), "fixtures",
                  "llm_transcripts.json")))


@pytest.mark.parametrize(
    "case", _FIXTURES["classifier"], ids=lambda c: c["name"])
def test_generate_json_classifier_transcripts(fake_genai, case):
    """generate_json parses every captured classifier payload, and the
    QueryClassifier accepts the parsed intent without heuristic fallback."""
    from legal_rag_tpu.retrieval.llm import GeminiClient

    model = ("gemma-3-4b-it" if case["model_kind"] == "gemma"
             else "gemini-2.5-flash-lite")
    fake_genai["models"] = _FakeModels({model: case["raw"]})
    client = GeminiClient(model_ids=[model])
    parsed = client.generate_json("classify: where do I file a zero FIR?")
    assert parsed == case["expected"]

    from legal_rag_tpu.retrieval.classifier import QueryClassifier

    class _Canned:
        def generate_json(self, prompt, system=None):
            return parsed

    intent = QueryClassifier(llm=_Canned()).classify("any query")
    assert intent.category == case["expected"]["category"]
    assert intent.user_context == case["expected"]["user_context"]
    assert intent.key_entities == case["expected"]["key_entities"]


@pytest.mark.parametrize(
    "case", _FIXTURES["responder"], ids=lambda c: c["name"])
def test_generate_json_responder_transcripts(fake_genai, case):
    """generate_json parses the captured responder payloads and the
    LegalResponder materializes the 8-field contract from them (nulls
    coerced, disclaimer defaulted, lists stringified)."""
    from legal_rag_tpu.retrieval.llm import GeminiClient

    model = ("gemma-3-4b-it" if case["model_kind"] == "gemma"
             else "gemini-2.5-flash-lite")
    fake_genai["models"] = _FakeModels({model: case["raw"]})
    client = GeminiClient(model_ids=[model])
    parsed = client.generate_json("respond with fields")

    from legal_rag_tpu.retrieval.responder import DISCLAIMER, LegalResponder

    class _Canned:
        def generate_json(self, prompt, system=None):
            return parsed

    resp = LegalResponder(llm=_Canned()).generate_response(
        "where do I file a zero FIR?",
        context=[],
        intent={"category": "procedure", "key_entities": [],
                "user_context": "victim_distress"},
    )
    exp = case["expected_fields"]
    assert resp.answer == exp["answer"]
    assert resp.legal_basis == exp["legal_basis"]
    assert resp.safety_alert == exp["safety_alert"]
    assert resp.immediate_action_plan == exp["immediate_action_plan"]
    assert resp.procedure_steps == exp["procedure_steps"]
    assert resp.important_notes == exp["important_notes"]
    # null/missing disclaimer always falls back to the canonical one
    assert resp.disclaimer
    if case["name"] == "gemini_json_mode_nulls_and_unicode":
        assert resp.disclaimer == DISCLAIMER


def test_reference_fence_cleaner_bug_not_reproduced():
    """The reference's own cleaner (classifier.py:84-90) does
    split("```")[-1] — the segment AFTER the closing fence — so a
    well-formed '```json ... ```' payload parses to the empty string
    there. Pin that our strip_json_fences extracts the fenced body."""
    from legal_rag_tpu.retrieval.llm import strip_json_fences

    raw = _FIXTURES["classifier"][1]["raw"]   # gemma_wellformed_fence_only
    assert raw.startswith("```json") and raw.rstrip().endswith("```")
    # the reference's cleaner on this payload:
    assert raw.split("```")[-1].strip() == ""
    # ours:
    assert _json.loads(strip_json_fences(raw)) == \
        _FIXTURES["classifier"][1]["expected"]
