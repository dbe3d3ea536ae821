"""Index build pipeline: chunks -> embeddings + BM25 -> VectorStore.

The TPU-native equivalent of the reference's offline build
(create_vector_store.py:14-78): chunk texts are encoded in device
batches by the JAX MiniLM encoder (already L2-normalized — cosine via
inner product), BM25 postings built host-side, everything saved as the
versioned artifact directory.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Union

from jax.tree_util import tree_leaves as jax_leaves

from legal_rag_tpu.config import RetrievalConfig, DEFAULT_CONFIG
from legal_rag_tpu.ingest import parse_corpus
from legal_rag_tpu.ingest.parser import LegalChunk
from legal_rag_tpu.models.encoder import SentenceEncoder
from legal_rag_tpu.ops.sparse import build_bm25
from legal_rag_tpu.index.store import VectorStore


def _chunk_dicts(chunks: Sequence[Union[LegalChunk, Dict]]) -> List[Dict]:
    out = []
    for c in chunks:
        if isinstance(c, LegalChunk):
            d = c.to_reference_dict()
            d["section_id"] = c.section_id
        else:
            d = dict(c)
            d.setdefault("section_id", None)
        out.append(d)
    return out


def build_index(
    source,
    encoder: Optional[SentenceEncoder] = None,
    config: RetrievalConfig = DEFAULT_CONFIG,
    store_dir=None,
    finetune_steps: int = 0,
    finetune_token_weight: float = 0.0,
    finetune_augment: float = 0.0,
    finetune_augment_kinds: str = "",
    pq_m: int = 0,
    ivf_cell_size: int = 0,
    rerank_steps: int = 0,
    rerank_sibling_prob: float = 0.0,
    multi_vector: int = 0,
    log_fn=None,
) -> VectorStore:
    """Build a full index.

    Args:
      source: a documents directory (ingested via :func:`parse_corpus`),
        a path to a chunks json artifact, or a chunk sequence.
      encoder: sentence encoder; defaults to a corpus-vocab encoder.
      store_dir: if given, artifacts are saved there.
      finetune_steps: when > 0, contrastively fine-tune the encoder on
        corpus span pairs BEFORE encoding (models/finetune.py), so the
        dense side of hybrid search is domain-adapted rather than
        random-init — measured to lift dense recall materially
        (see BASELINE.md retrieval-quality table). Deterministic given
        (encoder weights, corpus, steps), and fingerprinted into the
        resume hash.
      pq_m: when > 0, additionally train product-quantization codebooks
        with ``m = pq_m`` subspaces and persist codes + codebooks in the
        store (ops/pq.py), so serving with ``dense.dtype='pq'`` (the
        32x-compression capacity tier) loads pre-trained artifacts
        instead of running k-means at boot.
      rerank_steps: when > 0, train the cross-encoder reranker on
        corpus span pairs (models/cross_encoder.py) and persist its
        checkpoint; stores carrying it serve with a joint-attention
        precision stage on top of hybrid retrieval (LegalEngine
        auto-enables it).
      multi_vector: when > 0, additionally persist per-chunk TOKEN
        embeddings (first ``multi_vector`` tokens, L2-normalized, from
        the same encoder's hidden states) so the store serves the
        ColBERT-style late-interaction tier (``search --mode maxsim``,
        ops/maxsim.py + parallel/sharded.py sharded_maxsim_topk).
    """
    if isinstance(source, (str, Path)):
        path = Path(source)
        if path.is_dir():
            chunks = _chunk_dicts(parse_corpus(path))
        else:
            import json

            with open(path, "r", encoding="utf-8") as f:
                chunks = _chunk_dicts(json.load(f))
    else:
        chunks = _chunk_dicts(source)

    texts = [c["text"] for c in chunks]

    # Resumable builds: the corpus+config+ENCODER identity hashes into
    # the manifest; a store_dir already holding a matching build is
    # reused instead of re-encoding (SURVEY.md §5.4 checkpoint/resume).
    import hashlib

    h = hashlib.sha256()
    for t in texts:
        h.update(t.encode("utf-8"))
        h.update(b"\x00")
    h.update(repr((config.encoder, config.bm25)).encode())
    if finetune_steps:
        # (omitted when 0 so pre-existing store hashes stay valid)
        # "sib" fingerprints the round-3 sibling-positive pair stream
        # (models/finetune.py make_sibling_pairs); the prob tag comes
        # from the constant the finetune actually uses, so a recipe
        # change can never leave matching hashes on stale stores
        from legal_rag_tpu.models.finetune import SIBLING_PROB_DEFAULT

        ftag = f"finetune:{finetune_steps}:sib{SIBLING_PROB_DEFAULT}"
        if finetune_token_weight:
            # round-4 token-level (late-interaction) co-training
            ftag += f":tok{finetune_token_weight}"
        if finetune_augment:
            # round-5 register/dropout/unique-token query augmentation
            ftag += f":aug{finetune_augment}"
            if finetune_augment_kinds:
                # restricted kind mix ("register,dropout") — part of the
                # recipe identity, so it invalidates the resume hash
                ftag += f":kinds[{finetune_augment_kinds}]"
        h.update(ftag.encode())
    if pq_m:
        # "opq8" fingerprints the quantizer recipe (8 OPQ iterations);
        # bump if the training procedure changes so stale stores rebuild
        h.update(f"pq:{pq_m}:opq8".encode())
    if ivf_cell_size:
        h.update(f"ivf:{ivf_cell_size}".encode())
    if rerank_steps:
        # "meanpool-hard" fingerprints the CE recipe (masked mean
        # pooling forward + hard-negative listwise training + alpha
        # gate); bump whenever the scoring/training recipe changes so
        # a pre-existing store trained under an older recipe can never
        # hash-match and get silently scored by the new forward
        tag = f"rerank:{rerank_steps}:meanpool-hard"
        if rerank_sibling_prob:
            # round-4 paraphrase-aware recipe (sibling positives)
            tag += f":sib{rerank_sibling_prob}"
        h.update(tag.encode())
    if multi_vector:
        h.update(f"mv:{multi_vector}".encode())
    if encoder is not None:
        # a caller-supplied encoder (fine-tuned / converted weights)
        # must invalidate stores built by a different one — fingerprint
        # its config, seed, and actual parameter bytes
        h.update(repr(encoder.cfg).encode())
        h.update(str(getattr(encoder, "seed", 0)).encode())
        import numpy as _np

        for leaf in jax_leaves(encoder.params):
            arr = _np.asarray(leaf)
            h.update(arr.shape.__repr__().encode())
            h.update(arr.tobytes()[:4096])
    corpus_hash = h.hexdigest()
    if store_dir is not None:
        manifest_path = Path(store_dir) / "manifest.json"
        if manifest_path.exists():
            try:
                existing = VectorStore.load(store_dir)
                if existing.corpus_hash == corpus_hash:
                    return existing
            except Exception:  # noqa: BLE001 — fall through to rebuild
                pass
    if encoder is None:
        encoder = SentenceEncoder(cfg=config.encoder, vocab_corpus=texts)
    if finetune_steps > 0:
        from legal_rag_tpu.models.finetune import finetune_encoder
        from legal_rag_tpu.parallel.mesh import make_mesh

        encoder, losses = finetune_encoder(
            encoder,
            texts,
            make_mesh(config.sharding.num_shards),
            steps=finetune_steps,
            log_fn=log_fn,
            chunks=chunks,
            token_maxsim_weight=finetune_token_weight,
            augment_prob=finetune_augment,
            **(
                {"augment_kinds": tuple(
                    k.strip() for k in finetune_augment_kinds.split(",")
                    if k.strip()
                )}
                if finetune_augment_kinds else {}
            ),
        )
        if log_fn:
            log_fn(
                f"fine-tuned {finetune_steps} steps "
                f"(loss {losses[0]:.3f} -> {losses[-1]:.3f})"
            )

    embeddings = encoder.encode(texts, batch_size=config.encoder.encode_batch)
    mv_tokens = mv_mask = None
    if multi_vector > 0:
        mv_tokens, mv_mask = _encode_token_embeddings(
            encoder, texts, multi_vector, config.encoder.encode_batch
        )
        if log_fn:
            log_fn(
                f"token-level index: [{mv_tokens.shape[0]}, "
                f"{mv_tokens.shape[1]}, {mv_tokens.shape[2]}] f16 "
                f"({mv_tokens.nbytes / 1e6:.0f} MB)"
            )
    pq_codes = pq_codebooks = pq_rotation = None
    ivf_centroids = ivf_doc_ids = None
    if pq_m > 0:
        from legal_rag_tpu.ops.pq import encode_pq, train_pq

        cb = train_pq(embeddings, m=pq_m, opq_iters=8)
        pq_codes = encode_pq(embeddings, cb)
        pq_codebooks = cb.codebooks
        pq_rotation = cb.rotation
        if log_fn:
            log_fn(f"trained OPQ+PQ codebooks (m={pq_m}, {pq_m} B/doc)")
        if ivf_cell_size > 0:
            from legal_rag_tpu.ops.pq import build_ivf

            ivf = build_ivf(
                embeddings, cb, pq_codes, cell_size=ivf_cell_size,
            )
            ivf_centroids = ivf.centroids
            ivf_doc_ids = ivf.doc_ids
            if log_fn:
                log_fn(
                    f"built IVF coarse index ({ivf.n_cells} cells x "
                    f"{ivf_cell_size} docs)"
                )
    elif ivf_cell_size > 0:
        raise ValueError("--ivf-cell-size requires --pq-m (IVF prunes "
                         "the PQ capacity tier)")
    bm25 = build_bm25(
        texts,
        k1=config.bm25.k1,
        b=config.bm25.b,
        epsilon=config.bm25.epsilon,
    )
    store = VectorStore(
        embeddings=embeddings,
        bm25=bm25,
        chunks=chunks,
        wp_vocab=dict(encoder.tokenizer.vocab),
        encoder_info={
            "vocab_size": encoder.cfg.vocab_size,
            "hidden": encoder.cfg.hidden,
            "layers": encoder.cfg.layers,
            "heads": encoder.cfg.heads,
            "intermediate": encoder.cfg.intermediate,
            "max_len": encoder.cfg.max_len,
            # dtype decides matmul precision at encode time — queries
            # must use the same precision the doc embeddings got
            "dtype": encoder.cfg.dtype,
            "seed": getattr(encoder, "seed", 0),
            # the python and native-cpp WordPiece paths can diverge on
            # non-Latin input; pin whichever built these embeddings so
            # query encoding reproduces it
            "tokenizer_impl": getattr(encoder, "tokenizer_impl", "python"),
        },
        corpus_hash=corpus_hash,
        build_params={
            "finetune_steps": finetune_steps,
            "finetune_token_weight": finetune_token_weight,
            "finetune_augment": finetune_augment,
            "finetune_augment_kinds": finetune_augment_kinds,
            "pq_m": pq_m,
            "ivf_cell_size": ivf_cell_size,
            "rerank_steps": rerank_steps,
            "rerank_sibling_prob": rerank_sibling_prob,
            "multi_vector": multi_vector,
        },
        encoder_params=encoder.params,
        pq_codes=pq_codes,
        pq_codebooks=pq_codebooks,
        pq_rotation=pq_rotation,
        mv_tokens=mv_tokens,
        mv_mask=mv_mask,
        ivf_centroids=ivf_centroids,
        ivf_doc_ids=ivf_doc_ids,
        ivf_cell_size=ivf_cell_size if ivf_centroids is not None else 0,
    )
    if rerank_steps > 0:
        _train_validated_reranker(
            store, encoder, texts, rerank_steps, config, log_fn,
            sibling_prob=rerank_sibling_prob,
        )
    if store_dir is not None:
        store.save(store_dir)
    return store


def _encode_token_embeddings(
    encoder: SentenceEncoder,
    texts: Sequence[str],
    token_budget: int,
    batch_size: int,
):
    """Per-chunk contextual token embeddings for the late-interaction
    tier: the same MiniLM forward the pooled embeddings come from, but
    keeping the (L2-normalized) per-token hidden states — truncated to
    the first ``token_budget`` WordPiece tokens per chunk.

    Returns ``(tokens [N, Td, D] float16, mask [N, Td] uint8)``.
    """
    import numpy as np
    import jax.numpy as jnp

    from legal_rag_tpu.ops.maxsim import minilm_token_embeddings

    n = len(texts)
    d = encoder.cfg.hidden
    toks = np.zeros((n, token_budget, d), dtype=np.float16)
    mask = np.zeros((n, token_budget), dtype=np.uint8)
    tokenizer = getattr(encoder, "_fast_tokenizer", None) or (
        encoder.tokenizer
    )
    max_len = min(encoder.cfg.max_len, token_budget)
    for lo in range(0, n, batch_size):
        batch = list(texts[lo : lo + batch_size])
        ids, am = tokenizer.encode_batch(batch, max_len=max_len)
        te = np.asarray(
            minilm_token_embeddings(
                encoder.params, jnp.asarray(ids), jnp.asarray(am),
                encoder.cfg,
            ),
            dtype=np.float32,
        )
        t = min(te.shape[1], token_budget)
        toks[lo : lo + len(batch), :t] = te[:, :t].astype(np.float16)
        mask[lo : lo + len(batch), :t] = np.asarray(am)[:, :t]
    return toks, mask


def _train_validated_reranker(
    store, encoder, texts, rerank_steps, config, log_fn,
    sibling_prob: float = 0.0,
) -> None:
    """Train the cross-encoder and persist it ONLY if it measurably
    helps on this corpus.

    Serving auto-enables the precision stage whenever the store carries
    a checkpoint, so an undertrained cross-encoder must never ship:
    measured on the real corpus, a 300-step CE trained from the
    (even fine-tuned) trunk DESTROYED ranking (RRF recall@1 0.86 ->
    0.09) — joint-attention rerankers need far more training signal
    than the bi-encoder's contrastive warm-up provides. The gate
    reranks the corpus-structure eval queries and keeps the checkpoint
    only when reranked MRR >= base MRR.
    """
    from legal_rag_tpu.evaluation import (
        evaluate_rerank, labeled_pairs_from_chunks,
    )
    from legal_rag_tpu.models.cross_encoder import (
        CrossEncoder, train_cross_encoder_hard,
    )
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    # held-out validation: every 7th title pair is NEVER sampled during
    # training, so the gate measures generalization to unseen titles,
    # not memorization of the train set
    all_pairs = labeled_pairs_from_chunks(store.chunks)
    train_pairs = [p for i, p in enumerate(all_pairs) if i % 7]
    valid_pairs = [p for i, p in enumerate(all_pairs) if not i % 7]

    ce = CrossEncoder(encoder)
    losses = train_cross_encoder_hard(
        ce, texts, chunks=store.chunks, steps=rerank_steps, log_fn=log_fn,
        title_pairs=train_pairs, sibling_prob=sibling_prob,
    )
    if log_fn:
        log_fn(
            f"trained cross-encoder reranker {rerank_steps} steps "
            f"(hard-negative listwise, loss {losses[0]:.3f} -> "
            f"{losses[-1]:.3f})"
        )
    if not valid_pairs:
        # nothing to validate against (unstructured corpus): persist,
        # flagged in the log — the caller opted in explicitly
        if log_fn:
            log_fn("reranker persisted UNVALIDATED (no labeled pairs)")
        store.ce_params = ce.params
        return
    engine = RetrievalEngine(store, config=config, encoder=encoder)
    # fit the blend weight on the held-out split: small alphas let a
    # noisy-but-real CE refine the base order without the authority to
    # destroy it; alpha=1 is the pure-CE ordering. ONE evaluate_rerank
    # call scores the whole grid — retrieval + CE forward run once,
    # only the cheap host-side blend varies per alpha.
    grid = (0.1, 0.25, 0.5, 0.75, 1.0)
    report = evaluate_rerank(
        store, valid_pairs, ce, config=config, engine=engine,
        alphas=grid,
    )
    base = report["modes"]["base"]["mrr"]
    if log_fn:
        for alpha in grid:
            rer = report["modes"][f"reranked@{alpha}"]["mrr"]
            log_fn(f"  gate alpha={alpha}: mrr {base:.4f} -> {rer:.4f}")
    best_alpha = report["best_alpha"]
    best = report["modes"]["reranked"]["mrr"]
    if best >= base:
        store.ce_params = ce.params
        store.ce_alpha = best_alpha
        if log_fn:
            log_fn(
                f"reranker validated (held-out mrr {base:.3f} -> "
                f"{best:.3f} at alpha={best_alpha})"
            )
    elif log_fn:
        log_fn(
            f"reranker REJECTED: best reranked mrr {best:.3f} < base "
            f"{base:.3f} on {len(valid_pairs)} held-out queries — "
            f"checkpoint not persisted (train longer or from a "
            f"stronger trunk)"
        )
