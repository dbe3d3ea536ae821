"""Corpus-level ingest driver.

Mirrors the reference's corpus traversal order exactly (reference
ingest_legal_docs.py:247-298): the three chapter-split statute
directories in sorted order, then the NALSA scheme, its compensation
schedule table, and the two SOPs — order matters because chunk ids are
positional and the index artifacts address documents by row.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

from legal_rag_tpu.ingest.parser import LegalChunk, LegalMarkdownParser

# (relative path, is_directory, context overrides)
CORPUS_SPECS: Sequence[Tuple[str, bool, Dict]] = (
    ("BNS", True, {
        "law": "BNS",
        "law_name": "Bharatiya Nyaya Sanhita",
        "year": 2023,
        "doc_type": "primary_legislation",
    }),
    ("BNSS", True, {
        "law": "BNSS",
        "law_name": "Bharatiya Nagarik Suraksha Sanhita",
        "year": 2023,
        "doc_type": "primary_legislation",
    }),
    ("BSA", True, {
        "law": "BSA",
        "law_name": "Bharatiya Sakshya Adhiniyam",
        "year": 2023,
        "doc_type": "primary_legislation",
    }),
    ("nalsa.md", False, {
        "law": "NALSA",
        "law_name": "NALSA Compensation Scheme",
        "year": 2018,
        "doc_type": "compensation_scheme",
    }),
    ("nalsa_table.md", False, {
        "law": "NALSA",
        "law_name": "NALSA Compensation Scheme",
        "year": 2018,
        "doc_type": "compensation_scheme",
        "chapter_title": "Schedule – Women Victims of Crimes",
    }),
    ("General SOP.md", False, {
        "law": "SOP",
        "law_name": "General SOP",
        "doc_type": "sop",
    }),
    ("sop_rape_against_women.md", False, {
        "law": "SOP",
        "law_name": "SOP on Rape Against Women",
        "doc_type": "sop",
    }),
)


def parse_corpus(
    docs_dir,
    specs: Sequence[Tuple[str, bool, Dict]] = CORPUS_SPECS,
) -> List[LegalChunk]:
    """Parse the full legal corpus rooted at ``docs_dir``.

    Missing entries are skipped (same tolerance as the reference), so a
    partial corpus still ingests.
    """
    docs_dir = Path(docs_dir)
    parser = LegalMarkdownParser()
    for rel, is_dir, overrides in specs:
        path = docs_dir / rel
        if not path.exists():
            continue
        if is_dir:
            for f in sorted(path.iterdir()):
                if f.name.endswith(".md"):
                    parser.parse_file(f, overrides)
        else:
            parser.parse_file(path, overrides)
    return parser.chunks


def law_counts(chunks: Sequence[LegalChunk]) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for c in chunks:
        law = c.metadata.get("law") or "Unknown"
        counts[law] = counts.get(law, 0) + 1
    return counts
