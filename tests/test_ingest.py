"""Ingest parity + unit tests for the stateful legal-markdown chunker."""

import json
from pathlib import Path

import pytest

from legal_rag_tpu.ingest import parse_corpus, LegalMarkdownParser
from legal_rag_tpu.ingest.pipeline import law_counts

DOCS = Path("/root/reference/documents")


@pytest.fixture(scope="module")
def corpus_chunks():
    if not DOCS.exists():
        pytest.skip("reference documents not available")
    return parse_corpus(DOCS)


def test_full_corpus_byte_parity(corpus_chunks, reference_chunks):
    """The parity gate: every chunk identical to the reference artifact
    (text, canonical header, and metadata), same order, same count."""
    assert len(corpus_chunks) == len(reference_chunks)
    for ours, golden in zip(corpus_chunks, reference_chunks):
        assert ours.to_reference_dict() == golden


def test_law_counts_match_published(corpus_chunks):
    """PROGRESS.md:13 counts, re-derived."""
    assert law_counts(corpus_chunks) == {
        "BNS": 815, "BNSS": 1339, "BSA": 325, "NALSA": 67, "SOP": 74,
    }


def test_section_ids_assigned(corpus_chunks):
    ids = {c.section_id for c in corpus_chunks if c.section_id}
    assert "BNSS_183" in ids
    assert "BNS_1" in ids
    assert "NALSA_C2" in ids
    # GSOP chunk ids are block BASES (004 is a sub-block of chunk 001,
    # resolved by the source catalog; see test_gsop_ids_follow_block_order)
    assert "GSOP_000" in ids and "GSOP_001" in ids
    # every statute section chunk gets an id
    for c in corpus_chunks:
        if c.metadata["unit_type"] == "section" and c.metadata["law"] in (
            "BNS", "BNSS", "BSA",
        ):
            assert c.section_id == f"{c.metadata['law']}_{c.metadata['section']}"


def test_gsop_ids_follow_block_order(corpus_chunks):
    """GSOP ids are 0-based over addressable BLOCKS (unnumbered ###
    sub-headings split their topic; each chunk carries its first
    block's id and reserves one id per block). This is the numbering
    the ghost source-fetcher spec pins: GSOP_004 is the FIR-Issuance
    block of the RECEIPT OF COMPLAINT topic (reference
    tests/test_source_fetcher.py:20-27), and GSOP_007 is the
    REGISTRATION OF FIR topic."""
    from legal_rag_tpu.ingest.parser import split_sop_blocks

    gsop = [c for c in corpus_chunks
            if c.section_id and c.section_id.startswith("GSOP")]
    assert gsop[0].section_id == "GSOP_000"
    # chunk bases are cumulative block counts
    expect = 0
    for c in gsop:
        assert c.section_id == f"GSOP_{expect:03d}"
        body = c.text[len(c.canonical_header):].lstrip("\n")
        expect += len(split_sop_blocks(body))
    # the RECEIPT topic (base 001) spans blocks 001-004; 004 is the
    # FIR Issuance & Jurisdiction block per the reference spec
    receipt = [c for c in gsop if c.section_id == "GSOP_001"]
    assert receipt and receipt[0].metadata["chapter_title"] == (
        "SOP ON RECEIPT OF COMPLAINT"
    )
    blocks = split_sop_blocks(
        receipt[0].text[len(receipt[0].canonical_header):].lstrip("\n")
    )
    assert len(blocks) == 4
    assert blocks[3][0].startswith("FIR Issuance")
    fir = [c for c in gsop if c.section_id == "GSOP_007"]
    assert fir and fir[0].metadata["chapter_title"] == (
        "SOP ON REGISTRATION OF FIR"
    )


def _parse_lines(lines, overrides):
    import tempfile, os

    parser = LegalMarkdownParser()
    with tempfile.NamedTemporaryFile(
        "w", suffix=".md", delete=False, encoding="utf-8"
    ) as f:
        f.write("\n".join(lines))
        name = f.name
    try:
        parser.parse_file(name, overrides)
    finally:
        os.unlink(name)
    return parser.chunks


BNS_OVERRIDES = {
    "law": "BNS", "law_name": "Bharatiya Nyaya Sanhita",
    "year": 2023, "doc_type": "primary_legislation",
}


def test_section_header_synthesis():
    chunks = _parse_lines(
        [
            "# CHAPTER II",
            "## OF PUNISHMENTS",
            "## Section 4 — Punishments",
            "The punishments are fines and imprisonment.",
        ],
        BNS_OVERRIDES,
    )
    assert len(chunks) == 1
    c = chunks[0]
    assert c.canonical_header == (
        "Bharatiya Nyaya Sanhita, 2023\n"
        "CHAPTER II – OF PUNISHMENTS\n"
        "Section 4 – Punishments"
    )
    assert c.metadata["unit_type"] == "section"
    assert c.text.endswith("The punishments are fines and imprisonment.")


def test_sub_section_and_illustration_modes():
    chunks = _parse_lines(
        [
            "## Section 9 — Things",
            "Intro text.",
            "**(1)** First sub-section body.",
            "Illustration",
            "An example follows here.",
        ],
        BNS_OVERRIDES,
    )
    types = [c.metadata["unit_type"] for c in chunks]
    assert types == ["section", "sub_section", "illustration"]
    assert "Sub-section (1)" in chunks[1].canonical_header
    # sub-section marker line is kept in the chunk body
    assert "First sub-section body." in chunks[1].text
    assert chunks[2].canonical_header.endswith("Sub-section (1) / Illustration")


def test_explanation_line_stays_in_chunk():
    chunks = _parse_lines(
        [
            "## Section 10 — Acts",
            "Main body.",
            "**Explanation.**—Details of the explanation.",
        ],
        BNS_OVERRIDES,
    )
    assert chunks[-1].metadata["unit_type"] == "explanation"
    assert "Details of the explanation." in chunks[-1].text


def test_table_rows_chunk_individually():
    chunks = _parse_lines(
        [
            "| S. No. | Particulars of loss | Minimum |",
            "| --- | --- | --- |",
            "| 1 | Loss of Life | Rs. 5 Lakh |",
            "| 2 | Rape | Rs. 4 Lakh |",
        ],
        {"law": "NALSA", "law_name": "NALSA Compensation Scheme", "year": 2018},
    )
    # header ("Particulars") + separator rows are NOT table rows: they
    # buffer as normal text and flush as one "general" chunk when the
    # first data row arrives; each data row then chunks individually
    # (reference ingest_legal_docs.py:222-228 semantics)
    assert len(chunks) == 3
    assert chunks[0].metadata["unit_type"] == "general"
    assert all(c.metadata["unit_type"] == "table_row" for c in chunks[1:])
    assert "Loss of Life" in chunks[1].text


def test_page_markers_dropped():
    chunks = _parse_lines(
        ["## 3 | Page", "| 4 | Page |", "Real content."],
        BNS_OVERRIDES,
    )
    assert len(chunks) == 1
    assert "Real content." in chunks[0].text


def test_nalsa_clause_only_for_nalsa():
    nalsa = _parse_lines(
        ["## 2. DEFINITIONS", "Terms defined here."],
        {"law": "NALSA", "law_name": "NALSA Compensation Scheme", "year": 2018},
    )
    assert nalsa[0].metadata["clause"] == "2"
    assert "Clause 2 – DEFINITIONS" in nalsa[0].canonical_header
    bns = _parse_lines(
        ["# CHAPTER I", "## 2. DEFINITIONS", "Terms defined here."],
        BNS_OVERRIDES,
    )
    # numbered heading is recognized (suppresses chapter-title rule)
    # but not applied outside NALSA
    assert bns[0].metadata["clause"] is None
    assert bns[0].metadata["chapter_title"] is None


def test_sop_steps():
    chunks = _parse_lines(
        [
            "## **SOP ON X**",
            "Topic intro.",
            "**01. FIR - Suggested time limit: Immediately**",
            "Record the FIR fast.",
            "**Step 2:** trailing text on marker line is consumed",
        ],
        {"law": "SOP", "law_name": "SOP on Rape Against Women", "doc_type": "sop"},
    )
    # the bare `**Step N:**` marker consumes its whole line (text after
    # the marker is dropped — reference :194-199 semantics), so no
    # third chunk is emitted here
    assert [c.metadata["step"] for c in chunks] == [None, "Step 01"]
    assert chunks[1].canonical_header.endswith("Step 01")
    assert chunks[1].metadata["unit_type"] == "step"


def test_generic_corpus_ingest(tmp_path):
    """Arbitrary markdown trees ingest without predefined specs."""
    from legal_rag_tpu.ingest.pipeline import parse_any_corpus

    (tmp_path / "handbook.md").write_text(
        "# CHAPTER I\n## Section 1 — Greetings\nHello world.\n", encoding="utf-8"
    )
    sub = tmp_path / "policies"
    sub.mkdir()
    (sub / "leave.md").write_text(
        "## Section 2 — Leave policy\nTake leave responsibly.\n",
        encoding="utf-8",
    )
    chunks = parse_any_corpus(tmp_path)
    assert len(chunks) == 2
    laws = {c.metadata["law"] for c in chunks}
    assert laws == {"HANDBOOK", "POLICIES"}
    assert any("Section 1 – Greetings" in c.canonical_header for c in chunks)
