"""End-to-end quality gate.

The reference's eval harness (test_quality.py:10-103): a labeled query
suite run through the full engine with pass/fail rules — answer length,
source presence, and victim-context queries must carry a safety alert
and an action plan. This version runs offline (deterministic paths) or
with an LLM, and throttles only when an LLM client is actually in use
(the reference always sleeps 20 s for rate limits).
"""

from __future__ import annotations

import json
import time
from typing import Dict, List, Optional

# (query, expected_context, grounding) — victim queries must produce
# safety fields; grounding (optional) is a set of section_id prefixes
# of which at least one must appear in the retrieved context, pinning
# retrieval quality end-to-end (keyword side is deterministic even
# with a random-weight encoder)
QUALITY_SUITE = (
    ("I was robbed at gunpoint just now, what do I do?",
     "victim_distress", None),
    ("Someone just assaulted my sister, help us", "victim_distress", None),
    ("My house was burgled and my jewellery was stolen",
     "victim_distress", None),
    ("I have been cheated by an online seller", "victim_distress", None),
    ("What is the punishment for robbery under BNS?",
     "informational", ("BNS_",)),
    ("What is a Zero FIR?", "informational", ("GSOP_", "BNSS_")),
    ("Is rape a bailable offence?", "informational", None),
    ("How much compensation can an acid attack victim get?",
     "informational", ("NALSA_",)),
    ("What is the procedure to file an FIR electronically?",
     "informational", ("GSOP_", "BNSS_")),
    ("Which sections of BNSS deal with medical examination of victims?",
     "informational", ("BNSS_", "GSOP_")),
)


def validate_result(
    result: Dict, expected_context: str, grounding=None
) -> List[str]:
    """Returns a list of failure strings (empty = pass)."""
    failures: List[str] = []
    resp = result.get("response", {})
    answer = resp.get("answer") or ""
    if len(answer) < 10:
        failures.append(f"answer too short ({len(answer)} chars)")
    if not resp.get("sources"):
        failures.append("no sources")
    if not resp.get("disclaimer"):
        failures.append("missing disclaimer")
    if expected_context == "victim_distress":
        if not resp.get("safety_alert"):
            failures.append("victim query missing safety_alert")
        if not resp.get("immediate_action_plan"):
            failures.append("victim query missing immediate_action_plan")
    else:
        if resp.get("safety_alert"):
            failures.append("informational query has safety_alert")
    if grounding:
        sids = [
            c.get("section_id") or ""
            for c in result.get("context_used", [])
        ]
        if not any(
            sid.startswith(prefix) for sid in sids for prefix in grounding
        ):
            failures.append(
                f"retrieval missed expected sources {grounding}; got {sids}"
            )
    return failures


def run_quality_eval(
    store_dir=None,
    engine=None,
    report_path: Optional[str] = None,
    suite=QUALITY_SUITE,
    llm_throttle_s: float = 20.0,
) -> Dict:
    """Run the suite; returns (and optionally writes) the report."""
    if engine is None:
        import dataclasses

        from legal_rag_tpu.config import DEFAULT_CONFIG, FusionConfig
        from legal_rag_tpu.retrieval.facade import LegalEngine

        # the gate evaluates the framework's best configuration: RRF
        # lets keyword-only hits surface (the weighted parity mode
        # cannot — the reference's blind spot), which matters whenever
        # the encoder is untrained/offline
        cfg = dataclasses.replace(
            DEFAULT_CONFIG, fusion=FusionConfig(mode="rrf")
        )
        engine = LegalEngine(store_dir=store_dir, config=cfg)

    uses_llm = (
        getattr(engine.responder, "llm", None) is not None
        or getattr(engine.orchestrator.classifier, "llm", None) is not None
    )

    results = []
    for i, case in enumerate(suite):
        query, expected_context = case[0], case[1]
        grounding = case[2] if len(case) > 2 else None
        t0 = time.time()
        try:
            out = engine.query(query)
            failures = validate_result(out, expected_context, grounding)
            detected = out.get("intent", {}).get("user_context")
        except Exception as e:  # noqa: BLE001 — a crash is a failure
            out = None
            failures = [f"exception: {e}"]
            detected = None
        results.append({
            "query": query,
            "expected_context": expected_context,
            "detected_context": detected,
            "passed": not failures,
            "failures": failures,
            "latency_s": round(time.time() - t0, 3),
        })
        if uses_llm and i + 1 < len(suite):
            time.sleep(llm_throttle_s)

    report = {
        "total": len(results),
        "passed": sum(1 for r in results if r["passed"]),
        "uses_llm": uses_llm,
        "results": results,
    }
    if report_path:
        with open(report_path, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2, ensure_ascii=False)
    return report
