"""SentenceEncoder: tokenizer + MiniLM forward, batched for ingest and
query encode (the role SentenceTransformer.encode plays in the
reference, create_vector_store.py:41-46 / retrieval_engine.py:61)."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from legal_rag_tpu.config import EncoderConfig
from legal_rag_tpu.models.minilm import (
    MiniLMParams,
    init_minilm_params,
    minilm_encode,
)
from legal_rag_tpu.models.wordpiece import (
    WordPieceTokenizer,
    build_wordpiece_vocab,
)


class SentenceEncoder:
    """Batched text -> normalized ``[B, 384]`` embeddings on device.

    Weight sources, in order of preference:
      1. converted pretrained checkpoint (``convert.load_params_npz``),
      2. deterministic random init + corpus-built vocab — keeps the
         whole stack runnable with zero egress; retrieval parity tests
         are weight-agnostic (they compare search backends on whatever
         embeddings this produces).
    """

    def __init__(
        self,
        cfg: Optional[EncoderConfig] = None,
        params: Optional[MiniLMParams] = None,
        tokenizer: Optional[WordPieceTokenizer] = None,
        vocab_corpus: Optional[Sequence[str]] = None,
        seed: int = 0,
        prefer_tokenizer: str = "auto",
    ):
        self.cfg = cfg or EncoderConfig()
        self.seed = seed
        if tokenizer is None:
            corpus = list(vocab_corpus) if vocab_corpus else ["placeholder"]
            vocab = build_wordpiece_vocab(corpus, size=self.cfg.vocab_size)
            tokenizer = WordPieceTokenizer(vocab)
        self.tokenizer = tokenizer
        # native C++ tokenizer when built (parity-tested drop-in);
        # falls back to the pure-Python path transparently. The two
        # paths can diverge on exotic non-Latin input, so the CHOICE is
        # recorded in the store manifest (tokenizer_impl) and stores
        # pin it at query time via ``prefer_tokenizer``.
        self._fast_tokenizer = None
        if prefer_tokenizer not in ("auto", "python", "native-cpp"):
            raise ValueError(f"unknown prefer_tokenizer {prefer_tokenizer!r}")
        if prefer_tokenizer != "python":
            try:
                from legal_rag_tpu import native_ext

                if native_ext.native_available():
                    self._fast_tokenizer = native_ext.NativeWordPiece(
                        tokenizer.vocab
                    )
            except Exception:  # noqa: BLE001 — accelerator only
                self._fast_tokenizer = None
            if prefer_tokenizer == "native-cpp" and self._fast_tokenizer is None:
                import logging

                logging.getLogger("legal_rag_tpu.encoder").warning(
                    "store was built with the native-cpp tokenizer but it "
                    "is unavailable here; falling back to pure Python "
                    "(tokenizations may differ on non-Latin input)"
                )
        if params is None:
            # vocab may be smaller than cfg.vocab_size; size the table
            # to the tokenizer so ids always index in range.
            import dataclasses

            cfg_eff = dataclasses.replace(
                self.cfg, vocab_size=max(len(tokenizer.vocab), 1)
            )
            params = init_minilm_params(cfg_eff, seed=seed)
            self.cfg = cfg_eff
        # Pin the weights on device ONCE: checkpoint-loaded params are
        # host numpy arrays, and passing them into the jitted forward
        # re-transfers the full ~90 MB weight pytree on EVERY encode
        # call (measured: encode throughput collapsed ~40x through the
        # TPU relay). After this, each call ships only the token ids.
        self.params = jax.device_put(params)

    @property
    def tokenizer_impl(self) -> str:
        """Which tokenizer implementation encode() uses — recorded in
        the store manifest so query-side tokenization always matches
        the one that embedded the documents."""
        return "native-cpp" if self._fast_tokenizer is not None else "python"

    def encode(
        self,
        texts: Sequence[str],
        batch_size: Optional[int] = None,
        normalize: bool = True,
    ) -> np.ndarray:
        """Encode texts in device batches; returns ``[B, H]`` float32.
        ``normalize=True`` gives unit vectors (cosine == inner product,
        matching the reference's normalize_L2 + IndexFlatIP setup)."""
        del normalize  # embeddings are always L2-normalized (cosine)
        batch_size = batch_size or self.cfg.encode_batch
        if not texts:
            return np.zeros((0, self.cfg.hidden), dtype=np.float32)
        tokenizer = self._fast_tokenizer or self.tokenizer
        # bfloat16 encoder config runs single-pass MXU matmuls (~3x
        # ingest throughput); float32 keeps full torch-parity precision
        precision = (
            jax.lax.Precision.DEFAULT
            if self.cfg.dtype == "bfloat16"
            else jax.lax.Precision.HIGHEST
        )
        # Tokenize once, then batch in LENGTH-SORTED order: corpus-order
        # batches pad every doc to the batch max (one 256-token statute
        # drags a batch of 40-token clauses to 256 — mean doc is ~104
        # tokens), while sorted batches pad to tight power-of-two
        # buckets (pad_and_bucket). Attention masking + masked mean-pool
        # make embeddings padding-invariant, so only throughput changes;
        # results are unsorted back to input order.
        from legal_rag_tpu.models.wordpiece import pad_and_bucket

        # int32 arrays, not Python int lists: tokenizing the whole
        # corpus up front would otherwise hold ~28 B/token of boxed
        # ints alive (GBs at 1M+ docs); arrays are 4 B/token.
        encoded = [
            np.asarray(
                tokenizer.encode(t, max_len=self.cfg.max_len), np.int32
            )
            for t in texts
        ]
        order = sorted(range(len(texts)), key=lambda i: len(encoded[i]))
        out = np.empty((len(texts), self.cfg.hidden), dtype=np.float32)
        for lo in range(0, len(order), batch_size):
            idx = order[lo : lo + batch_size]
            ids, mask = pad_and_bucket(
                [encoded[i] for i in idx], self.cfg.max_len,
                tokenizer.pad_id,
            )
            emb = minilm_encode(
                self.params, jnp.asarray(ids), jnp.asarray(mask), self.cfg,
                precision=precision,
            )
            out[idx] = np.asarray(emb)
        return out
