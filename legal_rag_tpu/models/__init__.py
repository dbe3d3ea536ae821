"""Pure-JAX sentence encoder stack (MiniLM) + host-side WordPiece."""

from legal_rag_tpu.models.wordpiece import WordPieceTokenizer, build_wordpiece_vocab
from legal_rag_tpu.models.minilm import (
    MiniLMParams,
    init_minilm_params,
    minilm_encode,
    minilm_hidden_states,
)
from legal_rag_tpu.models.encoder import SentenceEncoder

__all__ = [
    "WordPieceTokenizer",
    "build_wordpiece_vocab",
    "MiniLMParams",
    "init_minilm_params",
    "minilm_encode",
    "minilm_hidden_states",
    "SentenceEncoder",
]
