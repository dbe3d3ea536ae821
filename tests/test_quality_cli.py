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


def test_report_carries_provenance(offline_engine, tmp_path):
    """VERDICT r3 item 8: a 10/10 on a CPU fallback store must be
    distinguishable from the gated serving build by the artifact."""
    report = run_quality_eval(engine=offline_engine)
    prov = report["provenance"]
    assert prov["platform"] == "cpu"
    assert prov["n_docs"] == 2620
    assert prov["cross_encoder"] is False
    assert prov["fusion_mode"] == "rrf"
    assert len(prov["corpus_hash"]) == 16


def test_paraphrase_suite_reports_and_discriminates(offline_engine):
    """The paraphrase gate exists to FAIL on untrained stores (the
    core suite saturated at 10/10 with BM25 alone). Structure checks
    only — the pass count is the trained-store gate, measured on TPU."""
    report = run_quality_eval(engine=offline_engine, include_paraphrase=True)
    para = report["paraphrase"]
    assert para["total"] == 10
    # the threshold is a measured regression floor (see
    # quality.PARAPHRASE_PASS_THRESHOLD) — only its consistency is
    # structural here
    assert 1 <= para["threshold"] <= 10
    assert para["gate_passed"] == (para["passed"] >= para["threshold"])
    # every row records grounding failures explicitly, not crashes
    for r in para["results"]:
        assert not any("exception" in f for f in r["failures"]), r


def test_retrieval_gate_untrained_floors(offline_engine):
    """The big-split gate machinery on the tiny untrained store: CI
    floors pin the untrained regime (BM25-carried RRF), so a harness
    regression (split generation, eval, thresholds) fails loudly. The
    serving floors (RETRIEVAL_GATE_THRESHOLDS) run on TPU builds."""
    from legal_rag_tpu.quality import run_retrieval_gate

    store = offline_engine.engine.store
    ci_thresholds = {
        "structure": {"mode": "rrf", "recall@10": 0.88},
        "sibling": {"mode": "rrf", "recall@10": 0.40},
    }
    report = run_retrieval_gate(
        store, thresholds=ci_thresholds, engine=offline_engine.engine,
        max_queries=120,
    )
    assert report["gate_passed"], report["checks"]
    assert report["provenance"]["platform"] == "cpu"
    by_name = {c["name"]: c for c in report["checks"]}
    assert by_name["structure"]["measured"] >= 0.88
    assert by_name["sibling"]["measured"] >= 0.40
