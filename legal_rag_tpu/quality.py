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

# (query, expected_context) — victim queries must produce safety fields
QUALITY_SUITE = (
    ("I was robbed at gunpoint just now, what do I do?", "victim_distress"),
    ("Someone just assaulted my sister, help us", "victim_distress"),
    ("My house was burgled and my jewellery was stolen", "victim_distress"),
    ("I have been cheated by an online seller", "victim_distress"),
    ("What is the punishment for robbery under BNS?", "informational"),
    ("What is a Zero FIR?", "informational"),
    ("Is rape a bailable offence?", "informational"),
    ("How much compensation can an acid attack victim get?", "informational"),
    ("What is the procedure to file an FIR electronically?", "informational"),
    ("Which sections of BNSS deal with medical examination of victims?",
     "informational"),
)


def validate_result(result: Dict, expected_context: str) -> List[str]:
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
        from legal_rag_tpu.retrieval.facade import LegalEngine

        engine = LegalEngine(store_dir=store_dir)

    uses_llm = (
        getattr(engine.responder, "llm", None) is not None
        or getattr(engine.orchestrator.classifier, "llm", None) is not None
    )

    results = []
    for i, (query, expected_context) in enumerate(suite):
        t0 = time.time()
        try:
            out = engine.query(query)
            failures = validate_result(out, expected_context)
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
