# Vendored verbatim from the reference repo (tests/test_answer_units.py) as an
# executable parity gate for the ghost modules — see conftest.py.
"""
Tests for span-based attribution (Option B from UPDATES.md).

This tests the answer unit system that classifies sentences as
verbatim (directly quoted, can be highlighted) or derived (synthesized, no highlight).
"""

import pytest
from src.server.answer_units import (
    SourceSpan,
    AnswerUnit,
    ChunkWithOffsets,
    resolve_span,
    resolve_all_spans,
    parse_answer_units_response,
    get_answer_unit_prompt,
    _normalize_text,
    _fuzzy_find,
    _extract_section_id,
    _clean_supporting_sources,
    _extract_json_from_response,
)


class TestSourceSpan:
    """Tests for SourceSpan data model."""
    
    def test_source_span_creation(self):
        """Test creating a SourceSpan."""
        span = SourceSpan(
            doc_id="GENERAL_SOP_BPRD",
            section_id="GSOP_057",
            start_char=100,
            end_char=200,
            quote="This is the quoted text."
        )
        
        assert span.doc_id == "GENERAL_SOP_BPRD"
        assert span.section_id == "GSOP_057"
        assert span.start_char == 100
        assert span.end_char == 200
        assert span.quote == "This is the quoted text."
    
    def test_source_span_to_dict(self):
        """Test converting SourceSpan to dict."""
        span = SourceSpan(
            doc_id="BNSS_2023",
            section_id="183",
            start_char=0,
            end_char=50,
            quote="Test quote"
        )
        
        result = span.to_dict()
        
        assert result["doc_id"] == "BNSS_2023"
        assert result["section_id"] == "183"
        assert result["start_char"] == 0
        assert result["end_char"] == 50
        assert result["quote"] == "Test quote"


class TestAnswerUnit:
    """Tests for AnswerUnit data model."""
    
    def test_verbatim_unit(self):
        """Test creating a verbatim answer unit."""
        unit = AnswerUnit(
            id="S1",
            text="File FIR immediately at the police station.",
            kind="verbatim",
            quote="FIR immediately at the police station"
        )
        
        assert unit.id == "S1"
        assert unit.kind == "verbatim"
        assert unit.quote is not None
        assert unit.is_clickable is False  # No span resolved yet
    
    def test_derived_unit(self):
        """Test creating a derived answer unit."""
        unit = AnswerUnit(
            id="S2",
            text="Preserve evidence if it is safe to do so.",
            kind="derived",
            supporting_sources=["GSOP_004", "GSOP_057"]
        )
        
        assert unit.kind == "derived"
        assert unit.quote is None
        assert len(unit.supporting_sources) == 2
        assert unit.is_clickable is False  # Derived units are never clickable
    
    def test_verbatim_with_resolved_span(self):
        """Test verbatim unit becomes clickable after span resolution."""
        unit = AnswerUnit(
            id="S1",
            text="File FIR immediately.",
            kind="verbatim",
            quote="File FIR immediately"
        )
        
        # Add resolved span
        unit.source_spans.append(SourceSpan(
            doc_id="GENERAL_SOP",
            section_id="GSOP_004",
            start_char=10,
            end_char=30,
            quote="File FIR immediately"
        ))
        
        assert unit.is_clickable is True


class TestSpanResolution:
    """Tests for span resolution logic."""
    
    def test_exact_match_resolution(self):
        """Test finding exact quote in chunk."""
        chunks = [
            ChunkWithOffsets(
                doc_id="GENERAL_SOP_BPRD",
                section_id="GSOP_004",
                text="Every citizen has the right to file FIR immediately at any police station.",
                start_char=0,
                end_char=74
            )
        ]
        
        span = resolve_span("file FIR immediately", chunks)
        
        assert span is not None
        assert span.section_id == "GSOP_004"
        assert "FIR immediately" in span.quote
    
    def test_no_match_returns_none(self):
        """Test returns None when quote not found."""
        chunks = [
            ChunkWithOffsets(
                doc_id="BNSS_2023",
                section_id="183",
                text="Statement must be recorded.",
                start_char=0,
                end_char=27
            )
        ]
        
        span = resolve_span("This quote does not exist in the chunk", chunks)
        
        assert span is None
    
    def test_empty_inputs(self):
        """Test handling empty inputs."""
        assert resolve_span("", []) is None
        assert resolve_span("quote", []) is None
        assert resolve_span("", [ChunkWithOffsets("d", "s", "text", 0, 4)]) is None
    
    def test_normalized_match(self):
        """Test matching with whitespace differences."""
        chunks = [
            ChunkWithOffsets(
                doc_id="SOP",
                section_id="001",
                text="The   victim   should   file    FIR.",
                start_char=0,
                end_char=36
            )
        ]
        
        # Quote has normal spacing
        span = resolve_span("victim should file FIR", chunks)
        
        # Should still find match (normalized)
        # Note: depends on implementation details
        assert span is not None or True  # Allow for implementation flexibility


class TestResolveAllSpans:
    """Tests for batch span resolution."""
    
    def test_resolve_multiple_units(self):
        """Test resolving spans for multiple units."""
        units = [
            AnswerUnit(
                id="S1",
                text="File FIR immediately.",
                kind="verbatim",
                quote="File FIR"
            ),
            AnswerUnit(
                id="S2",
                text="General guidance here.",
                kind="derived"
            ),
            AnswerUnit(
                id="S3",
                text="Police must act within 24 hours.",
                kind="verbatim",
                quote="within 24 hours"
            )
        ]
        
        chunks = [
            ChunkWithOffsets(
                doc_id="SOP",
                section_id="GSOP_004",
                text="File FIR at police station immediately. Act within 24 hours.",
                start_char=0,
                end_char=60
            )
        ]
        
        resolved = resolve_all_spans(units, chunks)
        
        # S1 and S3 are verbatim, should attempt resolution
        # S2 is derived, should be unchanged
        assert resolved[1].kind == "derived"
    
    def test_downgrade_on_failed_resolution(self):
        """Test verbatim unit is downgraded if quote not found."""
        units = [
            AnswerUnit(
                id="S1",
                text="This claim is not in the source.",
                kind="verbatim",
                quote="completely made up quote that doesn't exist"
            )
        ]
        
        chunks = [
            ChunkWithOffsets(
                doc_id="DOC",
                section_id="001",
                text="Some unrelated text here.",
                start_char=0,
                end_char=25
            )
        ]
        
        resolved = resolve_all_spans(units, chunks)
        
        # Should be downgraded to derived
        assert resolved[0].kind == "derived"
        assert len(resolved[0].source_spans) == 0


class TestExtractJsonFromResponse:
    """Tests for extracting JSON from various LLM response formats."""
    
    def test_plain_json(self):
        """Test extraction from plain JSON."""
        response = '{"answer_units": [{"id": "S1", "text": "Test.", "kind": "derived"}]}'
        result = _extract_json_from_response(response)
        assert '"answer_units"' in result
        assert '"Test."' in result
    
    def test_markdown_code_block(self):
        """Test extraction from markdown code block."""
        response = '```json\n{"answer_units": [{"id": "S1", "text": "Test.", "kind": "derived"}]}\n```'
        result = _extract_json_from_response(response)
        assert '"answer_units"' in result
        # Should not contain backticks
        assert '```' not in result
    
    def test_markdown_without_json_tag(self):
        """Test extraction from markdown code block without json tag."""
        response = '```\n{"answer_units": []}\n```'
        result = _extract_json_from_response(response)
        assert '"answer_units"' in result
    
    def test_json_with_leading_text(self):
        """Test extraction when there's text before JSON."""
        response = 'Here is the response:\n\n{"answer_units": []}'
        result = _extract_json_from_response(response)
        assert result.startswith('{')
    
    def test_json_with_trailing_text_in_codeblock(self):
        """Test extraction when there's text after JSON code block."""
        response = '```json\n{"answer_units": []}\n```\n\nSome additional notes.'
        result = _extract_json_from_response(response)
        # Should extract just the JSON
        import json
        parsed = json.loads(result)
        assert "answer_units" in parsed
    
    def test_nested_braces_in_strings(self):
        """Test extraction handles nested braces in strings."""
        response = '{"answer_units": [{"text": "Use {curly} braces", "kind": "derived"}]}'
        result = _extract_json_from_response(response)
        import json
        parsed = json.loads(result)
        assert parsed["answer_units"][0]["text"] == "Use {curly} braces"
    
    def test_real_llm_format(self):
        """Test extraction from realistic LLM response format."""
        response = '''```json
{
  "answer_units": [
    {
      "id": "S1",
      "text": "If you have been assaulted, you can report it to the police.",
      "kind": "derived",
      "supporting_sources": ["GSOP_004"]
    }
  ]
}
```'''
        result = _extract_json_from_response(response)
        import json
        parsed = json.loads(result)
        assert len(parsed["answer_units"]) == 1


class TestParseAnswerUnitsResponse:
    """Tests for parsing LLM response into answer units."""
    
    def test_parse_valid_json(self):
        """Test parsing valid JSON response."""
        response = '''
        {
            "answer_units": [
                {
                    "id": "S1",
                    "text": "File FIR immediately.",
                    "kind": "verbatim",
                    "quote": "File FIR"
                },
                {
                    "id": "S2",
                    "text": "Preserve evidence safely.",
                    "kind": "derived",
                    "supporting_sources": ["GSOP_004"]
                }
            ]
        }
        '''
        
        units = parse_answer_units_response(response)
        
        assert len(units) == 2
        assert units[0].kind == "verbatim"
        assert units[0].quote == "File FIR"
        assert units[1].kind == "derived"
        assert "GSOP_004" in units[1].supporting_sources
    
    def test_parse_with_markdown_code_block(self):
        """Test parsing response wrapped in markdown code block."""
        response = '''```json
        {
            "answer_units": [
                {"id": "S1", "text": "Test.", "kind": "derived"}
            ]
        }
        ```'''
        
        units = parse_answer_units_response(response)
        
        assert len(units) == 1
        assert units[0].text == "Test."
    
    def test_parse_invalid_json_fallback(self):
        """Test fallback when JSON is completely invalid."""
        response = "This is not valid JSON at all."
        
        units = parse_answer_units_response(response)
        
        # Should return empty list to trigger legacy answer generation
        assert len(units) == 0
    
    def test_verbatim_without_quote_downgraded(self):
        """Test verbatim unit without quote is downgraded."""
        response = '''
        {
            "answer_units": [
                {"id": "S1", "text": "Claimed verbatim.", "kind": "verbatim"}
            ]
        }
        '''
        
        units = parse_answer_units_response(response)
        
        # Should be downgraded to derived (no quote provided)
        assert units[0].kind == "derived"


class TestPromptGeneration:
    """Tests for answer unit prompt generation."""
    
    def test_prompt_includes_context(self):
        """Test prompt includes provided context."""
        prompt = get_answer_unit_prompt(
            context="Section 183 BNSS states...",
            question="What is the procedure?"
        )
        
        assert "Section 183 BNSS" in prompt
        assert "What is the procedure?" in prompt
    
    def test_prompt_includes_json_instruction(self):
        """Test prompt asks for JSON output."""
        prompt = get_answer_unit_prompt("context", "question")
        
        assert "JSON" in prompt
        assert "answer_units" in prompt
    
    def test_prompt_includes_verbatim_derived_rules(self):
        """Test prompt explains verbatim vs derived."""
        prompt = get_answer_unit_prompt("context", "question")
        
        assert "verbatim" in prompt.lower()
        assert "derived" in prompt.lower()


class TestHelperFunctions:
    """Tests for helper functions."""
    
    def test_normalize_text(self):
        """Test text normalization."""
        assert _normalize_text("  Hello   World  ") == "hello world"
        assert _normalize_text("Multiple\n\nNewlines") == "multiple newlines"
    
    def test_fuzzy_find_exact(self):
        """Test fuzzy find with close match."""
        # Fuzzy find is designed for longer strings with minor variations
        # Short exact matches may not meet the threshold
        result = _fuzzy_find(
            "Electronic communication should be sent to official email",
            "Electronic communication should preferably be sent to official email address",
            0.75  # Lower threshold for variation
        )
        
        # May or may not find depending on implementation
        # The main point is it doesn't crash
        assert result is None or isinstance(result, tuple)
    
    def test_fuzzy_find_no_match(self):
        """Test fuzzy find with no match."""
        result = _fuzzy_find("xyz123", "completely different text", 0.8)
        
        assert result is None


class TestRegressionNoFakeHighlights:
    """
    Regression tests ensuring derived units never get highlights.
    
    From UPDATES.md: "Do not highlight derived text"
    """
    
    def test_derived_unit_never_clickable(self):
        """Test derived units are never clickable regardless of source_spans."""
        unit = AnswerUnit(
            id="S1",
            text="General guidance without exact quote.",
            kind="derived"
        )
        
        # Even if someone tries to add spans (they shouldn't)
        unit.source_spans.append(SourceSpan(
            doc_id="DOC",
            section_id="001",
            start_char=0,
            end_char=10,
            quote="fake"
        ))
        
        # is_clickable checks kind first
        assert unit.is_clickable is False
    
    def test_verbatim_without_span_not_clickable(self):
        """Test verbatim unit without resolved span is not clickable."""
        unit = AnswerUnit(
            id="S1",
            text="Claimed verbatim but unverified.",
            kind="verbatim",
            quote="some quote"
        )
        
        # No span added
        assert unit.is_clickable is False


class TestSupportingSourcesCleanup:
    """Tests for supporting_sources cleanup functions.
    
    The LLM sometimes returns full display strings instead of section IDs.
    These functions extract clean IDs.
    """
    
    def test_extract_gsop_from_full_string(self):
        """Test extracting GSOP_XXX from full display string."""
        source = "General SOP (BPR&D) - SOP ON RECEIPT OF COMPLAINT - FIR Issuance & Jurisdiction [COMPLAINT] immediately"
        # This doesn't contain GSOP_XXX in the string, but real responses would
        
        source_with_id = "GSOP_004 - SOP ON RECEIPT OF COMPLAINT"
        assert _extract_section_id(source_with_id) == "GSOP_004"
    
    def test_extract_gsop_standalone(self):
        """Test extracting standalone GSOP ID."""
        assert _extract_section_id("GSOP_057") == "GSOP_057"
        assert _extract_section_id("GSOP_004") == "GSOP_004"
    
    def test_extract_section_number(self):
        """Test extracting section numbers."""
        assert _extract_section_id("Section 173 BNSS") == "173"
        assert _extract_section_id("section 183") == "183"
        assert _extract_section_id("BNSS Section 244") == "244"
    
    def test_extract_law_code(self):
        """Test extracting from law code format."""
        assert _extract_section_id("BNSS_183") == "183"
        assert _extract_section_id("BNS-351") == "351"
        assert _extract_section_id("BSA 147") == "147"
    
    def test_extract_plain_number(self):
        """Test extracting plain section number."""
        assert _extract_section_id("183") == "183"
        assert _extract_section_id("  351  ") == "351"
    
    def test_short_string_preserved(self):
        """Test short strings are preserved."""
        assert _extract_section_id("Section 173") == "173"
        assert _extract_section_id("GSOP_004") == "GSOP_004"
    
    def test_long_string_truncated(self):
        """Test long unrecognized strings are truncated."""
        long_str = "Some very long description that doesn't match any pattern and has no identifiable section ID"
        result = _extract_section_id(long_str)
        assert len(result) <= 28  # 25 + "..."
        assert result.endswith("...")
    
    def test_clean_supporting_sources(self):
        """Test cleaning a list of supporting sources."""
        dirty_sources = [
            "General SOP (BPR&D) - SOP ON RECEIPT OF COMPLAINT - FIR Issuance & Jurisdiction [COMPLAINT] immediately",
            "GSOP_004",
            "Section 173 BNSS",
            "GSOP_004",  # duplicate
        ]
        
        # Note: First item has no GSOP pattern, will be truncated
        cleaned = _clean_supporting_sources(dirty_sources)
        
        # GSOP_004 should appear once (deduped)
        assert "GSOP_004" in cleaned
        assert "173" in cleaned
        # No duplicates
        assert cleaned.count("GSOP_004") == 1
    
    def test_clean_empty_sources(self):
        """Test cleaning empty sources list."""
        assert _clean_supporting_sources([]) == []
        assert _clean_supporting_sources(None) == []
    
    def test_clean_non_string_items(self):
        """Test non-string items are filtered out."""
        sources = ["GSOP_004", 123, None, "Section 183"]
        cleaned = _clean_supporting_sources(sources)
        assert "GSOP_004" in cleaned
        assert "183" in cleaned
        assert len(cleaned) == 2


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
