"""Permanent parity gate: the reference's OWN ghost-spec test files
(vendored verbatim from /root/reference/tests at build time — they are
the only specification of the ghost modules, SURVEY.md §2.4) run
against this framework's implementations through an import shim that
aliases ``src.server.*`` onto ``legal_rag_tpu.server.*``.

The source-fetcher tests hit the real corpus; the default catalog is
installed from the reference documents parsed by this framework's own
ingest layer.
"""

import sys
import types
from pathlib import Path

import pytest

REFERENCE_DOCS = Path("/root/reference/documents")


def _install_shim():
    import legal_rag_tpu.server as server_pkg
    import legal_rag_tpu.server.adapter as adapter
    import legal_rag_tpu.server.answer_units as answer_units
    import legal_rag_tpu.server.schemas as schemas
    import legal_rag_tpu.server.sentence_attribution as sentence_attribution
    import legal_rag_tpu.server.source_fetcher as source_fetcher

    src = types.ModuleType("src")
    src.server = server_pkg
    sys.modules.setdefault("src", src)
    sys.modules["src.server"] = server_pkg
    sys.modules["src.server.adapter"] = adapter
    sys.modules["src.server.answer_units"] = answer_units
    sys.modules["src.server.schemas"] = schemas
    sys.modules["src.server.sentence_attribution"] = sentence_attribution
    sys.modules["src.server.source_fetcher"] = source_fetcher


_install_shim()


@pytest.fixture(scope="session", autouse=True)
def _reference_catalog():
    """The spec's source-fetcher tests fetch real corpus content; feed
    the default catalog from the reference documents via this
    framework's ingest."""
    if not REFERENCE_DOCS.exists():
        pytest.skip("reference corpus unavailable")
    from legal_rag_tpu.ingest import parse_corpus
    from legal_rag_tpu.server.source_fetcher import set_default_catalog

    chunks = []
    for c in parse_corpus(REFERENCE_DOCS):
        d = c.to_reference_dict()
        d["section_id"] = c.section_id
        chunks.append(d)
    set_default_catalog(chunks)
