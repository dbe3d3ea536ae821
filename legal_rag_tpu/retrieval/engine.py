"""Hybrid retrieval engine: the serving-path core.

Replaces the reference ``RetrievalEngine`` (retrieval_engine.py:23-96)
with arrays-as-interface semantics: the native API is
:meth:`RetrievalEngine.search_batch` — one ``[Q, D]`` query matrix in,
``(scores, ids, sem, keyword)`` out, a single jitted sharded program on
device. The reference's per-query ``search(query, k, hybrid_weight)``
is a thin compatibility wrapper returning the same result dicts
(``{chunk, score, semantic, keyword}``).

Parity semantics reproduced exactly (tested in tests/test_engine.py):
  - dense candidates = top ``2k`` by cosine (reference :64),
  - BM25 scored over the whole corpus, max-normalized (reference :68-74),
  - fused = ``sem*(1-w) + bm25n*w`` over dense candidates only
    (reference :84),
  - plus the framework-native RRF mode the reference only advertises.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from legal_rag_tpu.config import RetrievalConfig, DEFAULT_CONFIG
from legal_rag_tpu.index.store import VectorStore
from legal_rag_tpu.models.encoder import SentenceEncoder
from legal_rag_tpu.models.wordpiece import WordPieceTokenizer
from legal_rag_tpu.ops.dense import exact_rescore
from legal_rag_tpu.parallel.mesh import make_mesh
from legal_rag_tpu.parallel.sharded import ShardedIndex, sharded_hybrid_search
from legal_rag_tpu.utils.timing import StageTimer

logger = logging.getLogger("LegalRAG-RetrievalEngine")


@dataclasses.dataclass
class SearchResult:
    chunk: Dict
    score: float
    semantic: float
    keyword: float
    doc_id: int

    def to_dict(self) -> Dict:
        """Reference-shaped result dict (retrieval_engine.py:86-91)."""
        return {
            "chunk": self.chunk,
            "score": self.score,
            "semantic": self.semantic,
            "keyword": self.keyword,
        }


def _pad_pow2(n: int, lo: int = 8) -> int:
    n = max(n, lo)
    return 1 << (n - 1).bit_length()


class RetrievalEngine:
    """Device-resident hybrid searcher over a VectorStore."""

    def __init__(
        self,
        store: VectorStore,
        config: RetrievalConfig = DEFAULT_CONFIG,
        encoder: Optional[SentenceEncoder] = None,
        mesh=None,
        use_pallas: Optional[bool] = None,
    ):
        self.store = store
        self.config = config
        self.timer = StageTimer()
        if encoder is None:
            enc_cfg = config.encoder
            # The store records the encoder that built its embeddings;
            # query encoding MUST match it, not whatever the session
            # config happens to default to.
            if store.encoder_info:
                info = dict(store.encoder_info)
                seed = info.pop("seed", 0)
                # pin the tokenizer implementation that embedded the
                # docs (python vs native-cpp diverge on non-Latin text)
                prefer_tok = info.pop("tokenizer_impl", "auto")
                enc_cfg = dataclasses.replace(
                    enc_cfg, **{
                        k: v for k, v in info.items()
                        if hasattr(enc_cfg, k) and v is not None
                    }
                )
            else:
                seed = 0
                prefer_tok = "auto"
            # stored weights win over seed-reconstruction: a fine-tuned
            # or converted encoder is not derivable from (seed, config)
            params = store.encoder_params
            if store.wp_vocab:
                tokenizer = WordPieceTokenizer(store.wp_vocab)
                encoder = SentenceEncoder(
                    cfg=enc_cfg, tokenizer=tokenizer, seed=seed,
                    params=params, prefer_tokenizer=prefer_tok,
                )
            else:
                encoder = SentenceEncoder(
                    cfg=enc_cfg,
                    vocab_corpus=[c["text"] for c in store.chunks],
                    seed=seed,
                    params=params,
                    prefer_tokenizer=prefer_tok,
                )
        if encoder.cfg.hidden != store.dim:
            raise ValueError(
                f"encoder hidden dim {encoder.cfg.hidden} != store "
                f"embedding dim {store.dim}; the store was built with a "
                "different encoder (see manifest['encoder'])"
            )
        self.encoder = encoder
        self.mesh = mesh or make_mesh(config.sharding.num_shards)
        if config.dense.dtype == "pq" and store.pq_codes is not None:
            # build-time-trained PQ artifacts: loads skip k-means
            ivf = (
                store.ivf_index() if config.dense.use_ivf else None
            )
            if ivf is not None:
                self.index = ShardedIndex.from_pq_ivf(
                    ivf, store.pq_codebooks, self.mesh,
                    rotation=store.pq_rotation,
                )
            else:
                self.index = ShardedIndex.from_pq(
                    store.pq_codes, store.pq_codebooks, self.mesh,
                    rotation=store.pq_rotation,
                )
        else:
            if config.dense.dtype == "pq":
                logger.warning(
                    "dense.dtype='pq' but the store has no persisted PQ "
                    "artifacts — falling back to boot-time k-means over "
                    "all %d embeddings, which can add a long cold start "
                    "on large corpora. Rebuild with `build --pq-m %d` "
                    "to persist the codebooks.",
                    store.n_docs, config.dense.pq_m,
                )
            self.index = ShardedIndex.from_embeddings(
                store.embeddings, self.mesh, dtype=config.dense.dtype,
                pq_m=config.dense.pq_m,
            )
        # permit-pallas flag (dense top-C itself always rides XLA after
        # the r2 shootout; sharded.py dispatches per measured policy)
        if use_pallas is None:
            use_pallas = (
                config.dense.use_pallas
                and jax.devices()[0].platform == "tpu"
            )
        self.use_pallas = use_pallas

    # -- native batched API -------------------------------------------------

    def enable_request_coalescing(
        self, window_s: float = 0.003, max_batch: int = 64
    ):
        """Route concurrent ``search_batch`` calls (e.g. parallel HTTP
        requests, each on its own worker thread) through a shared
        micro-batch window: one device dispatch serves them all
        (server/batching.py). Returns the coalescer for observability.
        """
        from legal_rag_tpu.server.batching import RequestCoalescer

        self._coalescer = RequestCoalescer(
            self._search_batch_impl, window_s=window_s, max_batch=max_batch
        )
        return self._coalescer

    def search_batch(
        self,
        queries: Sequence[str],
        k: Optional[int] = None,
        hybrid_weights: Optional[Sequence[float]] = None,
        mode: Optional[str] = None,
    ) -> List[List[SearchResult]]:
        """Hybrid search for a whole query batch in one device program
        (coalesced with concurrent callers when enabled)."""
        cfg = self.config
        k = k or cfg.k
        mode = mode or cfg.fusion.mode
        if hybrid_weights is None:
            hybrid_weights = [cfg.fusion.hybrid_weight] * len(queries)
        coalescer = getattr(self, "_coalescer", None)
        if coalescer is not None:
            return coalescer.submit(queries, k, hybrid_weights, mode)
        return self._search_batch_impl(
            queries, k=k, hybrid_weights=hybrid_weights, mode=mode
        )

    def _search_batch_impl(
        self,
        queries: Sequence[str],
        k: int,
        hybrid_weights: Sequence[float],
        mode: str,
    ) -> List[List[SearchResult]]:
        self.device_dispatches = getattr(self, "device_dispatches", 0) + 1
        cfg = self.config
        n_real = len(queries)
        # int8/pq indexes trade exactness for 4-32x HBM; recover it by
        # fp32-rescoring an oversampled candidate set after the device
        # pass (weighted mode only — RRF is rank-based over both lists)
        rescore = (
            cfg.dense.dtype in ("int8", "pq")
            and cfg.dense.int8_rescore
            and mode == "weighted"
        )
        # int8 error is mild (4x recovers recall); PQ ADC distortion on
        # clustered corpora needs 64x (measured recovery contract at 1M:
        # EVAL_IVF_RECOVERY.json / BASELINE.md)
        oversample = (
            cfg.dense.pq_oversample
            if cfg.dense.dtype == "pq"
            else cfg.dense.int8_oversample
        )
        k_dev = (
            min(max(k * oversample, k), self.store.n_docs)
            if rescore
            else k
        )

        # Bucket the query count to a power of two (min 8): one compiled
        # executable per bucket instead of one per batch size, and tiny
        # batches ride the well-trodden vector shapes.
        q_pad = _pad_pow2(n_real)
        queries = list(queries) + [""] * (q_pad - n_real)
        hybrid_weights = list(hybrid_weights) + [0.0] * (q_pad - n_real)

        if mode in ("maxsim", "maxsim-rerank"):
            # late-interaction tier: token-level MaxSim over the
            # sharded [N, Td, D] slab (ops/maxsim.py); no sparse side.
            # "maxsim" full-scans the slab (exact, O(N*Td*D) HBM —
            # capacity-capped, see ARCHITECTURE.md); "maxsim-rerank"
            # runs the single-vector dense stage first and
            # late-interacts only its top-C candidates (bounded slab
            # reads — the capacity-safe default for big corpora).
            mv = self.mv_index     # raises early when artifacts absent
            with self.timer.stage("encode"):
                q_tok, q_mask, q_emb = self._encode_query_tokens(queries)
            with self.timer.stage("device_search"):
                if mode == "maxsim":
                    s, i = mv.search(q_tok, q_mask, k)
                else:
                    s, i = mv.rerank_search(
                        self.index, jnp.asarray(q_emb), q_tok, q_mask,
                        k, c=max(cfg.fusion.candidate_multiplier * k, k),
                        block_n=cfg.dense.block_n,
                        block_q=cfg.dense.block_q,
                    )
                scores, ids = np.asarray(s), np.asarray(i)
            sem, key = scores, np.zeros_like(scores)
            return self._assemble_results(n_real, k, scores, ids, sem, key)

        with self.timer.stage("encode"):
            q_emb = self.encoder.encode(queries)
        # OPQ: the device pass scores in the rotated space
        # (q·x ≈ (qR)·(x̂R)); the fp32 rescore below stays in the
        # original space against the mmap'd embeddings
        q_dev = q_emb
        if self.index.pq_rotation is not None:
            q_dev = np.asarray(q_emb, np.float32) @ np.asarray(
                self.index.pq_rotation
            )
        with self.timer.stage("postings"):
            budget = _pad_pow2(
                self.store.bm25.postings_budget(
                    queries, cap=cfg.bm25.postings_budget_cap
                )
            )
            post_ids, post_w = self.store.bm25.gather_postings(queries, budget)
        with self.timer.stage("device_search"):
            scores, ids, sem, key = sharded_hybrid_search(
                self.index.docs,
                jnp.asarray(post_ids),
                jnp.asarray(post_w),
                jnp.asarray(q_dev),
                jnp.asarray(np.asarray(hybrid_weights, dtype=np.float32)),
                self.index.doc_scales,
                self.index.pq_codebooks,
                self.index.ivf_centroids,
                self.index.ivf_doc_ids,
                mesh=self.mesh,
                k=k_dev,
                c=max(cfg.fusion.candidate_multiplier * k_dev, k_dev),
                n_docs=self.store.n_docs,
                mode=mode,
                use_pallas=self.use_pallas,
                rrf_k=cfg.fusion.rrf_k,
                block_n=cfg.dense.block_n,
                block_q=cfg.dense.block_q,
                ivf_probes=cfg.dense.ivf_probes,
                ivf_cell_size=self.index.ivf_cell_size,
                n_queries=jnp.int32(n_real),
            )
            scores, ids = np.asarray(scores), np.asarray(ids)
            sem, key = np.asarray(sem), np.asarray(key)
        if rescore:
            with self.timer.stage("int8_rescore"):
                # narrow to the exact dense top-C pool first so the
                # fusion semantics (dense candidates only) and results
                # match the fp32 engine bit-for-bit
                scores, ids, sem, key = exact_rescore(
                    np.asarray(q_emb),
                    ids,
                    self.store.embeddings,
                    keyword=key,
                    weights=np.asarray(hybrid_weights, dtype=np.float32),
                    k=k,
                    dense_candidates=max(
                        cfg.fusion.candidate_multiplier * k, k
                    ),
                )

        return self._assemble_results(n_real, k, scores, ids, sem, key)

    def _assemble_results(
        self, n_real, k, scores, ids, sem, key
    ) -> List[List[SearchResult]]:
        out: List[List[SearchResult]] = []
        k = min(k, ids.shape[1])
        for qi in range(n_real):
            row = []
            for j in range(k):
                doc = int(ids[qi, j])
                if doc < 0 or doc >= self.store.n_docs:
                    continue
                if not np.isfinite(scores[qi, j]):
                    continue
                row.append(
                    SearchResult(
                        chunk=self.store.chunks[doc],
                        score=float(scores[qi, j]),
                        semantic=float(sem[qi, j]),
                        keyword=float(key[qi, j]),
                        doc_id=doc,
                    )
                )
            out.append(row)
        return out

    # -- late-interaction (multi-vector) tier --------------------------------

    @property
    def mv_index(self):
        """Sharded token-level index, device-put lazily on first use
        (the slab is Td times the embedding matrix — only maxsim-mode
        callers pay for it)."""
        if self.store.mv_tokens is None:
            raise ValueError(
                "store has no multi-vector artifacts; rebuild with "
                "`build --multi-vector <token_budget>`"
            )
        mv = getattr(self, "_mv_index", None)
        if mv is None:
            from legal_rag_tpu.parallel.sharded import (
                ShardedMultiVectorIndex,
            )

            # match the dense tier's row padding so maxsim-rerank's
            # shard-local candidate rescore sees every candidate's
            # tokens on its own shard — but ONLY for the float tiers
            # rerank_search accepts: a quantized tier's `docs` is the
            # code matrix (IVF stores are even cell-reordered, with
            # nc_pad*cell_size rows), and padding the 24 KB/doc slab to
            # the cell-slot count would inflate it by the clusters'
            # slack for a mode that tier can't serve anyway
            n_pad = None
            if self.index.docs.dtype in (jnp.float32, jnp.bfloat16):
                n_pad = int(self.index.docs.shape[0])
            mv = ShardedMultiVectorIndex.from_arrays(
                self.store.mv_tokens, self.store.mv_mask, self.mesh,
                n_pad=n_pad,
            )
            self._mv_index = mv
        return mv

    def _encode_query_tokens(self, queries: Sequence[str]):
        """Query-side token embeddings (same encoder, same budget as
        the stored slab) PLUS the pooled sentence embedding from the
        SAME forward — maxsim-rerank's dense candidate stage must not
        pay a second transformer pass over the batch. The pooled view
        is mean-pooled over the Td-truncated tokens, so for queries
        longer than the slab budget it deviates (slightly) from
        SentenceEncoder.encode's full-length embedding; queries are
        far shorter than Td=32 in practice."""
        from legal_rag_tpu.ops.maxsim import minilm_token_and_pooled

        td = int(self.store.mv_tokens.shape[1])
        tokenizer = getattr(self.encoder, "_fast_tokenizer", None) or (
            self.encoder.tokenizer
        )
        ids, am = tokenizer.encode_batch(
            list(queries), max_len=min(self.encoder.cfg.max_len, td)
        )
        # match SentenceEncoder.encode's precision policy
        precision = (
            jax.lax.Precision.DEFAULT
            if self.encoder.cfg.dtype == "bfloat16"
            else jax.lax.Precision.HIGHEST
        )
        q_tok, q_emb = minilm_token_and_pooled(
            self.encoder.params, jnp.asarray(ids), jnp.asarray(am),
            self.encoder.cfg, precision=precision,
        )
        return q_tok, np.asarray(am), q_emb

    # -- reference-compatible API --------------------------------------------

    def search(
        self, query: str, k: int = 5, hybrid_weight: float = 0.5
    ) -> List[Dict]:
        """Single-query compatibility wrapper (reference
        retrieval_engine.py:59 contract)."""
        results = self.search_batch(
            [query], k=k, hybrid_weights=[hybrid_weight], mode="weighted"
        )[0]
        return [r.to_dict() for r in results]
