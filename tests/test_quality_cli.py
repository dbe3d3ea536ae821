"""Quality gate + CLI smoke tests (offline, real corpus)."""

import json

import pytest

from legal_rag_tpu.quality import run_quality_eval, validate_result


@pytest.fixture(scope="module")
def offline_engine():
    from legal_rag_tpu.config import (
        RetrievalConfig, EncoderConfig, ShardingConfig,
    )
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.facade import LegalEngine

    from legal_rag_tpu.config import FusionConfig

    cfg = RetrievalConfig(
        encoder=EncoderConfig(
            vocab_size=8000, hidden=32, layers=2, heads=4,
            intermediate=64, max_len=64, encode_batch=512,
        ),
        sharding=ShardingConfig(num_shards=2),
        # RRF: keyword-only hits can surface (the weighted parity mode
        # fuses dense candidates only — the reference's blind spot —
        # and an untrained offline encoder gives junk dense candidates)
        fusion=FusionConfig(mode="rrf"),
    )
    # build from the documents (our ingest assigns section_ids, which
    # the grounding checks in the quality suite rely on)
    store = build_index("/root/reference/documents", config=cfg)
    return LegalEngine(store=store, config=cfg, use_llm=False)


def test_quality_suite_passes_offline(offline_engine, tmp_path):
    report = run_quality_eval(
        engine=offline_engine, report_path=tmp_path / "report.json"
    )
    assert report["uses_llm"] is False
    failed = [r for r in report["results"] if not r["passed"]]
    assert not failed, failed
    # report written and loadable
    saved = json.loads((tmp_path / "report.json").read_text())
    assert saved["passed"] == saved["total"] == 10


def test_validate_rules():
    ok_victim = {
        "response": {
            "answer": "x" * 20, "sources": [{"law": "BNS"}],
            "disclaimer": "d", "safety_alert": "call 112",
            "immediate_action_plan": ["go to police"],
        }
    }
    assert validate_result(ok_victim, "victim_distress") == []
    assert "victim query missing safety_alert" in validate_result(
        {"response": {"answer": "x" * 20, "sources": [1], "disclaimer": "d"}},
        "victim_distress",
    )
    assert "answer too short (1 chars)" in validate_result(
        {"response": {"answer": "x", "sources": [1], "disclaimer": "d"}},
        "informational",
    )
    assert "informational query has safety_alert" in validate_result(
        {"response": {"answer": "x" * 20, "sources": [1], "disclaimer": "d",
                      "safety_alert": "no!"}},
        "informational",
    )


def test_cli_ingest_build_search(tmp_path, capsys):
    from legal_rag_tpu.cli import main

    chunks_out = tmp_path / "chunks.json"
    assert main([
        "ingest", "--docs", "/root/reference/documents",
        "--out", str(chunks_out),
    ]) == 0
    data = json.loads(chunks_out.read_text())
    assert len(data) == 2620
    assert any(c.get("section_id") == "BNSS_183" for c in data)
    out = capsys.readouterr().out
    assert "2620 chunks" in out
