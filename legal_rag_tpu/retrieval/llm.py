"""Pluggable LLM client with ordered-model fallback.

The reference hard-wires the google-genai SDK with per-model fallback
chains (reference classifier.py:32-105, responder.py:28-130). Here the
LLM is an injectable interface so every pipeline stage has a
deterministic offline path (the test strategy SURVEY.md §4 calls for):

- :class:`GeminiClient` — same capability as the reference: ordered
  model list from env (``CLASSIFIER_MODELS``/``RESPONDER_MODELS``/
  ``LLM_MODELS``), gemma models via prompt+JSON-fence stripping, gemini
  models via native JSON mode. Import-gated: missing SDK or key just
  means callers fall back.
- ``None`` client — callers use their deterministic heuristic path.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Protocol, Sequence


class LLMClient(Protocol):
    def generate_json(
        self, prompt: str, system: Optional[str] = None
    ) -> Dict:
        """Return a parsed JSON object for the prompt."""
        ...


def strip_json_fences(text: str) -> str:
    """Extract a JSON payload from possibly-fenced LLM output.

    (The reference's version, classifier.py:84-90, takes
    ``split("```")[-1]`` — the segment AFTER the closing fence, i.e.
    the empty string for well-formed fenced output; a regex over the
    fenced body is what it meant.)"""
    import re

    text = text.strip()
    fenced = re.search(r"```(?:json)?\s*(.*?)```", text, re.S)
    if fenced:
        return fenced.group(1).strip()
    return text


class GeminiClient:
    """google-genai backed client with ordered model fallback."""

    def __init__(
        self,
        model_ids: Optional[Sequence[str]] = None,
        env_keys: Sequence[str] = ("LLM_MODELS",),
        default_models: Sequence[str] = ("gemma-3-4b-it", "gemini-2.5-flash-lite"),
    ):
        api_key = os.getenv("GEMINI_API_KEY") or os.getenv("GOOGLE_API_KEY")
        if not api_key:
            raise RuntimeError("no GEMINI_API_KEY/GOOGLE_API_KEY in env")
        try:
            from google import genai  # type: ignore
        except ImportError as e:
            raise RuntimeError("google-genai SDK not installed") from e
        self._genai = genai
        self.client = genai.Client(api_key=api_key)
        env_models = next(
            (os.getenv(k) for k in env_keys if os.getenv(k)), None
        )
        if env_models:
            self.model_ids: List[str] = [m.strip() for m in env_models.split(",")]
        else:
            self.model_ids = list(model_ids or default_models)

    def generate_json(
        self, prompt: str, system: Optional[str] = None
    ) -> Dict:
        last_exc: Optional[Exception] = None
        for model_id in self.model_ids:
            try:
                if "gemma" in model_id.lower():
                    full = (
                        (f"{system}\n\n" if system else "")
                        + prompt
                        + "\nIMPORTANT: Return ONLY valid JSON."
                    )
                    resp = self.client.models.generate_content(
                        model=model_id, contents=full
                    )
                    return json.loads(strip_json_fences(resp.text))
                from google.genai import types  # type: ignore

                resp = self.client.models.generate_content(
                    model=model_id,
                    contents=prompt,
                    config=types.GenerateContentConfig(
                        system_instruction=system,
                        response_mime_type="application/json",
                    ),
                )
                return json.loads(strip_json_fences(resp.text))
            except Exception as e:  # noqa: BLE001 — per-model fallback
                last_exc = e
        raise last_exc or RuntimeError("all models failed")


def default_llm_client(
    env_keys: Sequence[str] = ("LLM_MODELS",),
) -> Optional[GeminiClient]:
    """A GeminiClient when SDK+key are available, else None (heuristic
    fallback mode — the framework stays fully functional offline)."""
    try:
        return GeminiClient(env_keys=env_keys)
    except RuntimeError:
        return None
