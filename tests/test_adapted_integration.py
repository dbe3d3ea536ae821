"""The adapted (timeline + confidence + attribution) view must flow
through the LIVE engine, not just exist as modules."""

import pytest

from legal_rag_tpu.server.adapter import infer_stage, rag_view_from_engine


@pytest.fixture(scope="module")
def engine():
    from legal_rag_tpu.config import (
        RetrievalConfig, EncoderConfig, ShardingConfig,
    )
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.facade import LegalEngine

    cfg = RetrievalConfig(
        encoder=EncoderConfig(
            vocab_size=8000, hidden=32, layers=2, heads=4,
            intermediate=64, max_len=64, encode_batch=512,
        ),
        sharding=ShardingConfig(num_shards=2),
    )
    store = build_index("/root/reference/legal_chunks.json", config=cfg)
    return LegalEngine(store=store, config=cfg, use_llm=False)


def test_infer_stage_keywords():
    mk = lambda title: {"metadata": {"chapter_title": title}}
    assert infer_stage(mk("SOP ON REGISTRATION OF FIR")) == "fir_registration"
    assert infer_stage(mk("TIME BOUND MEDICAL EXAMINATION")) == "medical_examination"
    assert infer_stage(mk("EXAMINATION OF WITNESSES BY POLICE")) == "statement_recording"
    assert infer_stage(mk("SEARCH AND SEIZURE OF DIGITAL EVIDENCE")) == "investigation_commencement"
    assert infer_stage(mk("SOMETHING UNRELATED ENTIRELY")) is None


def test_victim_query_gets_timeline_and_confidence(engine):
    out = engine.query("I was robbed at gunpoint just now, what do I do?")
    adapted = out["adapted"]
    assert adapted["case_type"] == "robbery"
    assert adapted["tier"] == "tier3"
    timeline = adapted["timeline"]
    assert timeline and timeline[0]["stage"] == "fir_registration"
    assert timeline[0]["is_anchor"] is True
    assert adapted["confidence"] in ("high", "medium", "low")
    # sentence attribution present with sentences + mapping
    attr = adapted["sentence_attribution"]
    assert attr and attr["sentences"]
    assert set(attr["mapping"]) == {s["sid"] for s in attr["sentences"]}


def test_tier1_query_injects_victim_anchors(engine):
    out = engine.query("My sister was raped, what must the police do?")
    adapted = out["adapted"]
    assert adapted["tier"] == "tier1"
    stages = {t["stage"] for t in adapted["timeline"] if t["is_anchor"]}
    assert {
        "fir_registration", "medical_examination",
        "statement_recording", "victim_protection",
    } <= stages


def test_rag_view_shape(engine):
    out = engine.query("What is the punishment for theft?")
    view = rag_view_from_engine(out)
    assert set(view) == {
        "case_type", "detected_stages", "citations", "answer", "retrieval",
    }
    assert view["answer"]
    assert view["citations"]
