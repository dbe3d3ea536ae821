"""Shared utilities: timing/tracing, logging."""

from legal_rag_tpu.utils.timing import StageTimer

__all__ = ["StageTimer"]
