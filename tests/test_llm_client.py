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
