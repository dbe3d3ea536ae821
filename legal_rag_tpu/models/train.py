"""Contrastive fine-tuning of the MiniLM encoder on TPU.

The reference treats its encoder as a frozen black box; a production
retrieval stack needs domain adaptation, so the framework ships an
InfoNCE (in-batch softmax contrastive) trainer:

- (query, positive-document) pairs, loss = cross-entropy of the query
  against all documents in the *global* batch,
- data-parallel over the ``shard`` mesh axis: each chip encodes its
  slice of the batch, document embeddings are ``all_gather``-ed over
  ICI so every chip scores its queries against the full global negative
  pool (the standard dual-encoder recipe — negatives scale with total
  batch, not per-chip batch),
- gradients ``psum``-ed across the mesh, optax optimizer step applied
  identically everywhere.

Everything is one jitted ``shard_map`` program; the driver's
``dryrun_multichip`` compiles and runs exactly this step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from legal_rag_tpu.config import EncoderConfig
from legal_rag_tpu.models.minilm import minilm_hidden_states

AXIS = "shard"


def _encode_raw(params, ids, mask, cfg: EncoderConfig):
    """Unjitted encode (mean-pool + L2) usable inside transforms."""
    hidden = minilm_hidden_states(
        params, ids, mask, cfg, precision=jax.lax.Precision.DEFAULT
    )
    m = mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)


def contrastive_loss_local(
    params,
    q_ids, q_mask, d_ids, d_mask,
    cfg: EncoderConfig,
    temperature: float,
):
    """Per-shard InfoNCE with cross-shard negatives.

    Runs INSIDE shard_map: encodes the local batch slice, gathers all
    shards' document embeddings, and targets the diagonal offset by
    this shard's position in the global batch.
    """
    qe = _encode_raw(params, q_ids, q_mask, cfg)          # [b, H]
    de = _encode_raw(params, d_ids, d_mask, cfg)          # [b, H]
    all_de = jax.lax.all_gather(de, AXIS)                 # [S, b, H]
    s, b, h = all_de.shape
    all_de = all_de.reshape(s * b, h)

    logits = qe @ all_de.T / temperature                  # [b, S*b]
    shard = jax.lax.axis_index(AXIS)
    labels = shard * b + jnp.arange(b, dtype=jnp.int32)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(loss)


def make_train_step(
    cfg: EncoderConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    temperature: float = 0.05,
):
    """Build the jitted data-parallel train step.

    Returns ``step(params, opt_state, batch) -> (params, opt_state,
    loss)`` where ``batch = (q_ids, q_mask, d_ids, d_mask)`` with
    leading dim divisible by the mesh size. Params/opt state replicate;
    the batch shards along axis 0.
    """
    from jax.sharding import PartitionSpec as P

    def local_step(params, opt_state, q_ids, q_mask, d_ids, d_mask):
        loss, grads = jax.value_and_grad(contrastive_loss_local)(
            params, q_ids, q_mask, d_ids, d_mask, cfg, temperature
        )
        # mean over shards: every chip computed a different batch slice
        grads = jax.lax.pmean(grads, AXIS)
        loss = jax.lax.pmean(loss, AXIS)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_spec = P(AXIS)
    rep = P()

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, batch_spec, batch_spec, batch_spec, batch_spec),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, batch):
        q_ids, q_mask, d_ids, d_mask = batch
        return sharded(params, opt_state, q_ids, q_mask, d_ids, d_mask)

    return step
