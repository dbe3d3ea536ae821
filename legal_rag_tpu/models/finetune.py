"""Encoder fine-tuning loop: corpus-driven contrastive adaptation.

Builds (query, positive) training pairs straight from the indexed
corpus — a pseudo-query is a sampled keyword span of a chunk, the
chunk itself is the positive — and drives the data-parallel InfoNCE
step from :mod:`legal_rag_tpu.models.train`. This turns the reference's
frozen black-box encoder into a domain-adaptable one: after
fine-tuning, rebuild the index with the returned encoder (the
builder's cache fingerprints encoder weights, so stale stores
invalidate automatically).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
import optax

from legal_rag_tpu.config import EncoderConfig
from legal_rag_tpu.models.encoder import SentenceEncoder
from legal_rag_tpu.models.train import make_train_step


def make_pairs(
    texts: Sequence[str],
    rng: np.random.Generator,
    span_words: Tuple[int, int] = (3, 9),
) -> Iterator[Tuple[str, str]]:
    """Endless (pseudo-query, positive-chunk) pair stream.

    Uses plain whitespace tokens (an isalpha filter here once caused an
    unbounded rejection loop on corpora of mostly non-alpha tokens);
    texts shorter than one word are skipped, and a corpus with no
    usable text raises instead of spinning.
    """
    usable = [t for t in texts if t.split()]
    if not usable:
        raise ValueError("no non-empty texts to build training pairs from")
    n = len(usable)
    while True:
        text = usable[int(rng.integers(n))]
        words = text.split()
        take = int(rng.integers(span_words[0], span_words[1]))
        take = min(take, len(words))
        lo = int(rng.integers(0, len(words) - take + 1))
        yield " ".join(words[lo : lo + take]), text


def finetune_encoder(
    encoder: SentenceEncoder,
    texts: Sequence[str],
    mesh,
    steps: int = 100,
    batch_size: int = 32,
    learning_rate: float = 2e-5,
    temperature: float = 0.05,
    seed: int = 0,
    log_every: int = 20,
    log_fn=None,
) -> Tuple[SentenceEncoder, List[float]]:
    """Fine-tune in place-ish: returns a NEW SentenceEncoder holding the
    trained params (tokenizer shared) plus the loss history.

    ``batch_size`` is the GLOBAL batch; it must divide by the mesh
    size. Negatives are the whole global batch (cross-shard gather).
    """
    n_shards = mesh.shape["shard"]
    if batch_size % n_shards:
        batch_size += n_shards - batch_size % n_shards

    optimizer = optax.adamw(learning_rate)
    params = encoder.params
    opt_state = optimizer.init(params)
    step = make_train_step(
        encoder.cfg, optimizer, mesh, temperature=temperature
    )

    rng = np.random.default_rng(seed)
    pair_stream = make_pairs(texts, rng)
    max_len = min(encoder.cfg.max_len, 128)
    losses: List[float] = []
    for i in range(steps):
        queries, docs = zip(*(next(pair_stream) for _ in range(batch_size)))
        q_ids, q_mask = encoder.tokenizer.encode_batch(queries, max_len=max_len)
        d_ids, d_mask = encoder.tokenizer.encode_batch(docs, max_len=max_len)
        # fixed-length batches: one executable regardless of sampled text
        def fix(a, fill):
            out = np.full((batch_size, max_len), fill, dtype=np.int32)
            out[:, : a.shape[1]] = a
            return out

        batch = (
            jnp.asarray(fix(q_ids, encoder.tokenizer.pad_id)),
            jnp.asarray(fix(q_mask, 0)),
            jnp.asarray(fix(d_ids, encoder.tokenizer.pad_id)),
            jnp.asarray(fix(d_mask, 0)),
        )
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
        if log_fn and (i % log_every == 0 or i == steps - 1):
            log_fn(f"step {i}: loss {losses[-1]:.4f}")

    tuned = SentenceEncoder(
        cfg=encoder.cfg, params=params, tokenizer=encoder.tokenizer,
        seed=encoder.seed,
    )
    return tuned, losses
