"""Response layer: timeline anchors, confidence, answer units, sentence
attribution, source fetching — the capability surface specified by the
reference's ghost-module tests (SURVEY.md §2.4), re-asserted here
against this framework's implementations."""

import pytest

from legal_rag_tpu.server.schemas import (
    ConfidenceLevel, SourceType, TierType, TimelineItem,
)
from legal_rag_tpu.server.adapter import (
    TIMELINE_ANCHORS, TIER1_CASE_TYPES, _normalize_case_type,
    adapt_response, calculate_confidence, extract_timeline_with_anchors,
)
from legal_rag_tpu.server import answer_units as au
from legal_rag_tpu.server import sentence_attribution as sa
from legal_rag_tpu.server.source_fetcher import (
    SourceCatalog, fetch_source_content, normalize_section_id,
)


VICTIM_STAGES = {
    "fir_registration", "medical_examination",
    "statement_recording", "victim_protection",
}
PROPERTY_STAGES = {"fir_registration", "investigation_commencement"}


# =====================  anchors  =====================


@pytest.mark.parametrize("case", ["rape", "sexual_assault", "pocso"])
def test_victim_critical_anchor_tables(case):
    stages = {a["stage"] for a in TIMELINE_ANCHORS[case]}
    assert VICTIM_STAGES <= stages


@pytest.mark.parametrize("case", ["robbery", "theft"])
def test_property_anchor_tables(case):
    stages = {a["stage"] for a in TIMELINE_ANCHORS[case]}
    assert PROPERTY_STAGES <= stages


def test_every_tier1_type_has_anchors_and_general_fallback():
    for case in TIER1_CASE_TYPES:
        assert TIMELINE_ANCHORS.get(_normalize_case_type(case))
    assert TIMELINE_ANCHORS["general"]


def test_anchor_fields_complete():
    for case, anchors in TIMELINE_ANCHORS.items():
        for a in anchors:
            assert a["audience"] in ("victim", "police", "court"), (case, a)
            assert a.get("deadline"), (case, a)
            if a["stage"] == "fir_registration":
                assert a["audience"] == "victim"


def _rag(case, blocks=(), general_blocks=()):
    return {
        "case_type": case,
        "retrieval": {
            "sop_blocks": list(blocks),
            "general_sop_blocks": list(general_blocks),
        },
    }


def test_rape_extraction_injects_all_anchors_even_on_empty_retrieval():
    timeline, notice = extract_timeline_with_anchors(
        _rag("rape"), "rape", TierType.TIER1
    )
    anchors = [t for t in timeline if t.is_anchor]
    assert VICTIM_STAGES <= {t.stage for t in anchors}
    assert notice is not None and notice.type == "ANCHOR_MISSING"
    for item in timeline:
        if item.stage in ("fir_registration", "medical_examination"):
            assert item.audience == "victim"


def test_anchors_precede_secondary_and_property_attachment_regression():
    """Regression (ghost spec): a property-attachment SOP must never
    lead a robbery timeline."""
    timeline, _ = extract_timeline_with_anchors(
        _rag("robbery", general_blocks=[{
            "text": "Property attachment under Section 107",
            "metadata": {
                "stage": "property_attachment",
                "time_limit": "14 days",
                "title": "SOP on Sec 107 Attachment",
            },
        }]),
        "robbery",
        TierType.TIER3,
    )
    assert timeline[0].stage == "fir_registration"
    assert timeline[0].is_anchor and timeline[0].audience == "victim"
    first_secondary = next(
        i for i, t in enumerate(timeline) if not t.is_anchor
    )
    assert all(t.is_anchor for t in timeline[:first_secondary])
    assert timeline[-1].stage == "property_attachment"
    assert timeline[-1].deadline == "14 days"


def test_evidence_enriches_anchor_deadline():
    timeline, notice = extract_timeline_with_anchors(
        _rag("sexual_assault", blocks=[{
            "text": "Medical examination within 24 hours",
            "metadata": {"stage": "medical_examination",
                         "time_limit": "24 hours"},
        }]),
        "sexual_assault",
        TierType.TIER1,
    )
    med = next(t for t in timeline if t.stage == "medical_examination")
    assert med.deadline == "24 hours"
    assert med.description == "Medical examination within 24 hours"
    # other anchors still injected
    assert VICTIM_STAGES <= {t.stage for t in timeline if t.is_anchor}


def test_no_notice_when_all_anchors_evidenced():
    timeline, notice = extract_timeline_with_anchors(
        _rag("robbery", general_blocks=[
            {"text": "FIR registration immediately",
             "metadata": {"stage": "fir_registration"}},
            {"text": "Investigation commences",
             "metadata": {"stage": "investigation_commencement"}},
        ]),
        "robbery",
        TierType.TIER3,
    )
    assert notice is None


def test_unknown_case_type_falls_back_to_general():
    timeline, _ = extract_timeline_with_anchors(
        _rag("unknown_crime_xyz"), "unknown_crime_xyz", TierType.STANDARD
    )
    assert "fir_registration" in {t.stage for t in timeline if t.is_anchor}


# =====================  confidence  =====================


def _conf(**kw):
    base = dict(
        tier=TierType.TIER1, case_type="rape",
        detected_stages=["fir_registration"], has_citations=True,
        has_answer=True, anchors_resolved=True, has_system_notice=False,
        clarification_needed=False, timeline_count=4,
    )
    base.update(kw)
    return calculate_confidence(**base)


def test_confidence_rules():
    assert _conf() == ConfidenceLevel.HIGH
    assert _conf(clarification_needed=True) == ConfidenceLevel.LOW
    assert _conf(has_system_notice=True, anchors_resolved=False) == ConfidenceLevel.LOW
    assert _conf(has_citations=False) == ConfidenceLevel.MEDIUM
    assert _conf(has_answer=False) == ConfidenceLevel.MEDIUM


def test_adapt_response_integration():
    out = adapt_response({
        "case_type": "robbery",
        "is_procedural": True,
        "detected_stages": ["fir_registration"],
        "citations": ["General SOP 1.2", "BNSS Section 173"],
        "answer": "File FIR immediately at the nearest police station.",
        "retrieval": {
            "sop_blocks": [],
            "general_sop_blocks": [
                {"text": "FIR registration procedure",
                 "metadata": {"stage": "fir_registration",
                              "time_limit": "immediately"}},
                {"text": "Investigation must commence",
                 "metadata": {"stage": "investigation_commencement"}},
            ],
        },
    }, "What do I do in case of robbery?")
    assert out.tier == TierType.TIER3
    assert out.confidence == ConfidenceLevel.HIGH
    assert out.system_notice is None
    assert out.timeline[0].stage == "fir_registration"


# =====================  answer units  =====================


def _chunk(text, sid="GSOP_004", start=0):
    return au.ChunkWithOffsets(
        doc_id="GENERAL_SOP", section_id=sid, text=text,
        start_char=start, end_char=start + len(text),
    )


def test_span_exact_and_normalized_resolution():
    chunks = [_chunk(
        "Every citizen has the right to file FIR immediately at any "
        "police station."
    )]
    span = au.resolve_span("file FIR immediately", chunks)
    assert span is not None and span.section_id == "GSOP_004"
    assert "FIR immediately" in span.quote

    messy = [_chunk("The   victim   should   file    FIR.")]
    span = au.resolve_span("victim should file FIR", messy)
    assert span is not None
    assert span.quote.startswith("victim")


def test_span_offsets_respect_chunk_base():
    chunks = [_chunk("Preamble. File FIR immediately.", start=100)]
    span = au.resolve_span("File FIR immediately", chunks)
    assert span.start_char == 110
    assert span.end_char == 130


def test_span_no_match_and_empty_inputs():
    assert au.resolve_span("quote", []) is None
    assert au.resolve_span("", [_chunk("text")]) is None
    assert au.resolve_span("does not exist anywhere", [_chunk("other")]) is None


def test_resolve_all_downgrades_unresolvable_verbatim():
    units = [
        au.AnswerUnit(id="S1", text="Real.", kind="verbatim",
                      quote="File FIR"),
        au.AnswerUnit(id="S2", text="Synth.", kind="derived"),
        au.AnswerUnit(id="S3", text="Fake.", kind="verbatim",
                      quote="made up quote zzz qqq xxx"),
    ]
    chunks = [_chunk("File FIR at the police station.")]
    out = au.resolve_all_spans(units, chunks)
    assert out[0].kind == "verbatim" and out[0].is_clickable
    assert out[1].kind == "derived"
    assert out[2].kind == "derived" and out[2].source_spans == []


def test_clickability_invariants():
    derived = au.AnswerUnit(id="S1", text="t", kind="derived")
    derived.source_spans.append(
        au.SourceSpan("D", "001", 0, 4, "fake")
    )
    assert derived.is_clickable is False  # derived NEVER clickable
    verbatim = au.AnswerUnit(id="S2", text="t", kind="verbatim", quote="q")
    assert verbatim.is_clickable is False  # no span resolved yet


@pytest.mark.parametrize("payload,expect", [
    ('{"answer_units": []}', "{"),
    ('```json\n{"answer_units": []}\n```', "{"),
    ('```\n{"answer_units": []}\n```', "{"),
    ('Here it is:\n\n{"answer_units": []}', "{"),
])
def test_json_extraction_formats(payload, expect):
    import json
    extracted = au._extract_json_from_response(payload)
    assert extracted.startswith(expect)
    assert "```" not in extracted
    assert "answer_units" in json.loads(extracted)


def test_json_extraction_nested_braces_and_trailing_text():
    import json
    payload = '{"answer_units": [{"text": "Use {curly} braces", "kind": "derived"}]}'
    assert json.loads(au._extract_json_from_response(payload))[
        "answer_units"][0]["text"] == "Use {curly} braces"
    payload2 = '```json\n{"answer_units": []}\n```\n\nnotes after.'
    assert json.loads(au._extract_json_from_response(payload2)) == {
        "answer_units": []
    }


def test_parse_answer_units():
    units = au.parse_answer_units_response("""
    {"answer_units": [
        {"id": "S1", "text": "File FIR immediately.", "kind": "verbatim",
         "quote": "File FIR"},
        {"id": "S2", "text": "Preserve evidence.", "kind": "derived",
         "supporting_sources": ["GSOP_004"]}
    ]}""")
    assert [u.kind for u in units] == ["verbatim", "derived"]
    assert units[0].quote == "File FIR"
    assert units[1].supporting_sources == ["GSOP_004"]
    # garbage -> [] (legacy path)
    assert au.parse_answer_units_response("not json at all") == []
    # verbatim without quote downgrades
    u = au.parse_answer_units_response(
        '{"answer_units": [{"id": "S1", "text": "x", "kind": "verbatim"}]}'
    )
    assert u[0].kind == "derived"


def test_answer_unit_prompt_contract():
    p = au.get_answer_unit_prompt("Section 183 BNSS states...", "What?")
    assert "Section 183 BNSS" in p and "What?" in p
    assert "JSON" in p and "answer_units" in p
    assert "verbatim" in p.lower() and "derived" in p.lower()


@pytest.mark.parametrize("raw,expected", [
    ("GSOP_057", "GSOP_057"),
    ("gsop_004 - SOP ON RECEIPT", "GSOP_004"),
    ("Section 173 BNSS", "173"),
    ("section 183", "183"),
    ("BNSS Section 244", "244"),
    ("BNSS_183", "183"),
    ("BNS-351", "351"),
    ("BSA 147", "147"),
    ("183", "183"),
    ("  351  ", "351"),
])
def test_extract_section_id(raw, expected):
    assert au._extract_section_id(raw) == expected


def test_extract_section_id_truncates_long_junk():
    junk = "An extremely long source description with no id whatsoever in it"
    out = au._extract_section_id(junk)
    assert out.endswith("...") and len(out) <= 28


def test_clean_supporting_sources():
    cleaned = au._clean_supporting_sources(
        ["GSOP_004", 123, None, "Section 183", "GSOP_004"]
    )
    assert cleaned == ["GSOP_004", "183"]
    assert au._clean_supporting_sources(None) == []
    assert au._clean_supporting_sources([]) == []


def test_normalize_and_fuzzy_helpers():
    assert au._normalize_text("  Hello   World  ") == "hello world"
    assert au._normalize_text("Multiple\n\nNewlines") == "multiple newlines"
    assert au._fuzzy_find("xyz123", "completely different text", 0.8) is None
    hit = au._fuzzy_find(
        "Electronic communication should be sent to official email",
        "Electronic communication should preferably be sent to the "
        "official email address of the SHO",
        0.75,
    )
    assert hit is None or isinstance(hit, tuple)


# =====================  sentence attribution  =====================


def test_sentence_splitting():
    out = sa.split_into_sentences(
        "File FIR immediately. Police must register the case. Contact "
        "nearest station."
    )
    assert [s["sid"] for s in out] == ["S1", "S2", "S3"]
    assert "FIR" in out[0]["text"]


def test_sentence_splitting_abbreviations_and_headers():
    out = sa.split_into_sentences(
        "Under BNSS u/s 183, the statement must be recorded. "
        "Dr. Smith confirmed this."
    )
    assert len(out) == 2
    out = sa.split_into_sentences(
        "## Immediate Steps\n\nFile FIR at the police station. "
        "This is required by law."
    )
    assert all(not s["text"].startswith("#") for s in out)
    assert sa.split_into_sentences("") == []
    assert sa.split_into_sentences("   ") == []
    single = sa.split_into_sentences("No ending punctuation here")
    assert len(single) == 1 and single[0]["sid"] == "S1"


def test_citation_keys():
    assert sa.build_citation_key("bnss", "183") == "bnss:183"
    assert sa.parse_citation_key("bnss:183") == ("bnss", "183")
    assert sa.parse_citation_key("invalid") == ("unknown", "invalid")
    keys = sa.get_available_citations([
        {"source_type": "bnss", "source_id": "183", "display": "BNSS 183"},
        {"source_type": "general_sop", "source_id": "GSOP_004"},
    ])
    assert keys == ["bnss:183", "general_sop:GSOP_004"]


def test_heuristic_attribution():
    sentences = [
        {"sid": "S1", "text": "File FIR immediately at the police station."},
        {"sid": "S2", "text": "Under BNSS Section 183, the statement must "
                              "be recorded."},
    ]
    citations = [
        {"source_type": "general_sop", "source_id": "GSOP_004",
         "display": "FIR Registration Procedure",
         "context_snippet": "File FIR immediately when victim reports."},
        {"source_type": "bnss", "source_id": "183",
         "display": "BNSS Section 183",
         "context_snippet": "Recording of statement of victim."},
    ]
    mapping = sa._heuristic_attribution(sentences, citations)
    assert "general_sop:GSOP_004" in mapping["S1"]
    assert "bnss:183" in mapping["S2"]
    assert sa._heuristic_attribution(
        [{"sid": "S1", "text": "Some text."}], []
    ) == {"S1": []}


def test_compute_sentence_attribution():
    assert sa.compute_sentence_attribution("", [], None) is None
    out = sa.compute_sentence_attribution("An answer here.", [], None)
    assert all(v == [] for v in out["mapping"].values())
    out = sa.compute_sentence_attribution(
        "File FIR immediately. Police must act within 24 hours.",
        [{"source_type": "general_sop", "source_id": "GSOP_004",
          "display": "FIR Registration",
          "context_snippet": "File FIR immediately upon complaint."}],
        None,
    )
    assert set(out) == {"sentences", "mapping"}
    assert len(out["sentences"]) == 2


def test_attribution_prompt():
    p = sa.create_attribution_prompt(
        [{"sid": "S1", "text": "First sentence."},
         {"sid": "S2", "text": "Second sentence."}],
        ["bnss:183", "general_sop:GSOP_004"],
        "Full answer",
    )
    assert "S1: First sentence." in p and "S2: Second sentence." in p
    assert "bnss:183" in p and "general_sop:GSOP_004" in p and "JSON" in p


# =====================  source fetcher  =====================


@pytest.fixture(scope="module")
def catalog():
    from pathlib import Path

    if not Path("/root/reference/documents").exists():
        pytest.skip("reference documents unavailable")
    from legal_rag_tpu.ingest import parse_corpus

    chunks = []
    for c in parse_corpus("/root/reference/documents"):
        d = c.to_reference_dict()
        d["section_id"] = c.section_id
        chunks.append(d)
    return SourceCatalog(chunks)


def test_normalize_section_id_forms():
    assert normalize_section_id(SourceType.BNSS, "183") == "BNSS_183"
    assert normalize_section_id(SourceType.BNSS, "Section 183") == "BNSS_183"
    assert normalize_section_id(SourceType.BNSS, "BNSS Section 183") == "BNSS_183"
    assert normalize_section_id(SourceType.BNSS, "§183") == "BNSS_183"
    assert normalize_section_id(SourceType.GENERAL_SOP, "gsop_004") == "GSOP_004"
    assert normalize_section_id(SourceType.GENERAL_SOP, "") is None


def test_fetch_gsop_block(catalog):
    # GSOP_004 = the FIR Issuance & Jurisdiction block (the id the
    # reference spec pins, tests/test_source_fetcher.py:20-27)
    out = fetch_source_content(
        SourceType.GENERAL_SOP, "GSOP_004", catalog=catalog
    )
    assert out is not None
    assert out.section_id == "GSOP_004"
    assert "FIR" in out.content
    assert out.metadata.get("procedural_stage") is not None
    assert out.highlights == []
    # case-insensitive
    assert fetch_source_content(
        SourceType.GENERAL_SOP, "gsop_004", catalog=catalog
    ).section_id == "GSOP_004"


def test_fetch_bnss_section_with_metadata(catalog):
    for raw in ("183", "Section 183", "BNSS Section 183"):
        out = fetch_source_content(SourceType.BNSS, raw, catalog=catalog)
        assert out is not None and "183" in out.section_id
        assert len(out.content) > 0
    assert out.metadata.get("chapter_no") is not None


def test_fetch_nonexistent_and_empty(catalog):
    assert fetch_source_content(
        SourceType.GENERAL_SOP, "GSOP_99999", catalog=catalog
    ) is None
    assert fetch_source_content(
        SourceType.GENERAL_SOP, "", catalog=catalog
    ) is None


def test_fetch_verbatim_not_summarized(catalog):
    out = fetch_source_content(
        SourceType.GENERAL_SOP, "GSOP_003", catalog=catalog
    )
    # verbatim markdown survives (#### sub-headings / bullets from the
    # SOP doc; reference tests/test_source_fetcher.py:81-88)
    assert "####" in out.content or "•" in out.content


def test_highlight_offsets(catalog):
    base = fetch_source_content(
        SourceType.GENERAL_SOP, "GSOP_004", catalog=catalog
    )
    snippet = base.content[50:150]
    out = fetch_source_content(
        SourceType.GENERAL_SOP, "GSOP_004",
        highlight_snippet=snippet, catalog=catalog,
    )
    assert out.highlights and out.highlights[0].start == 50
    assert out.highlights[0].end == 150
    assert out.highlights[0].reason == "Referenced in response"

    # truncated snippet ("...")
    out = fetch_source_content(
        SourceType.GENERAL_SOP, "GSOP_004",
        highlight_snippet=base.content[100:200] + "...", catalog=catalog,
    )
    assert out.highlights and out.highlights[0].start == 100

    # non-matching snippet
    out = fetch_source_content(
        SourceType.GENERAL_SOP, "GSOP_004",
        highlight_snippet="definitely not present xyz123", catalog=catalog,
    )
    assert out.highlights == []

    # statute section highlight
    sec = fetch_source_content(SourceType.BNSS, "183", catalog=catalog)
    out = fetch_source_content(
        SourceType.BNSS, "183",
        highlight_snippet=sec.content[:100], catalog=catalog,
    )
    assert out.highlights and out.highlights[0].start == 0


def test_nalsa_schedule_fetchable(catalog):
    out = fetch_source_content(
        SourceType.NALSA, "NALSA_SCHEDULE", catalog=catalog
    )
    assert out is not None
    assert out.section_id == "NALSA_SCHEDULE"
    assert "Lakh" in out.content  # compensation amounts
