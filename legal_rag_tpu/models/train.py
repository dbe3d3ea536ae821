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
    pooled, _ = _encode_with_tokens(params, ids, mask, cfg)
    return pooled


def _encode_with_tokens(params, ids, mask, cfg: EncoderConfig):
    """One forward, two views: the L2-normalized mean-pooled sentence
    embedding AND the L2-normalized per-token hidden states (the
    late-interaction representation, ops/maxsim.py)."""
    hidden = minilm_hidden_states(
        params, ids, mask, cfg, precision=jax.lax.Precision.DEFAULT
    )
    m = mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(hidden * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True))
    tnorm = jnp.sqrt(jnp.sum(hidden * hidden, axis=-1, keepdims=True))
    return (
        pooled / jnp.maximum(norm, 1e-12),
        hidden / jnp.maximum(tnorm, 1e-12),
    )


def contrastive_loss_local(
    params,
    q_ids, q_mask, d_ids, d_mask,
    cfg: EncoderConfig,
    temperature: float,
    maxsim_weight: float = 0.0,
):
    """Per-shard InfoNCE with cross-shard negatives.

    Runs INSIDE shard_map: encodes the local batch slice, gathers all
    shards' document embeddings, and targets the diagonal offset by
    this shard's position in the global batch.

    ``maxsim_weight`` (round 4): adds a token-level late-interaction
    InfoNCE term computed from the SAME forward — per-pair score =
    MaxSim (sum over query tokens of the best-matching doc-token
    cosine, padding masked), softmaxed over the global doc pool. The
    round-4 MaxSim quality measurement (BASELINE.md round-4 table)
    showed pooled-only contrastive training leaves token states
    untrained for late interaction — the full-scan tier scored BELOW
    plain dense on both eval splits. This term trains exactly the
    representation ``ops/maxsim.py`` serves. 0.0 keeps the pooled-only
    recipe byte-identical.
    """
    qe, qt = _encode_with_tokens(params, q_ids, q_mask, cfg)  # [b,H],[b,T,H]
    de, dt = _encode_with_tokens(params, d_ids, d_mask, cfg)
    all_de = jax.lax.all_gather(de, AXIS)                 # [S, b, H]
    s, b, h = all_de.shape
    all_de = all_de.reshape(s * b, h)

    logits = qe @ all_de.T / temperature                  # [b, S*b]
    shard = jax.lax.axis_index(AXIS)
    labels = shard * b + jnp.arange(b, dtype=jnp.int32)
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )
    if maxsim_weight:
        all_dt = jax.lax.all_gather(dt, AXIS)             # [S, b, T, H]
        all_dm = jax.lax.all_gather(d_mask, AXIS)         # [S, b, T]
        t = all_dt.shape[2]
        all_dt = all_dt.reshape(s * b, t, h)
        all_dm = all_dm.reshape(s * b, t)
        sims = jnp.einsum(
            "bth,nsh->btns", qt, all_dt,
            precision=jax.lax.Precision.DEFAULT,
        )                                                 # [b, Tq, N, Td]
        sims = jnp.where(all_dm[None, None, :, :] > 0, sims, -jnp.inf)
        best = jnp.max(sims, axis=3)                      # [b, Tq, N]
        best = jnp.where(jnp.isfinite(best), best, 0.0)
        best = best * (q_mask[:, :, None] > 0)
        # mean (not sum) over real query tokens: keeps the logit scale
        # commensurate with the pooled cosine's [-1, 1]
        n_q = jnp.maximum(jnp.sum(q_mask > 0, axis=1), 1)[:, None]
        ms_logits = jnp.sum(best, axis=1) / n_q / temperature
        loss = loss + maxsim_weight * jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                ms_logits, labels
            )
        )
    return loss


def make_train_step(
    cfg: EncoderConfig,
    optimizer: optax.GradientTransformation,
    mesh,
    temperature: float = 0.05,
    maxsim_weight: float = 0.0,
):
    """Build the jitted data-parallel train step.

    Returns ``step(params, opt_state, batch) -> (params, opt_state,
    loss)`` where ``batch = (q_ids, q_mask, d_ids, d_mask)`` with
    leading dim divisible by the mesh size. Params/opt state replicate;
    the batch shards along axis 0. ``maxsim_weight`` > 0 adds the
    token-level late-interaction InfoNCE term (see
    :func:`contrastive_loss_local`).
    """
    from jax.sharding import PartitionSpec as P

    def local_step(params, opt_state, q_ids, q_mask, d_ids, d_mask):
        loss, grads = jax.value_and_grad(contrastive_loss_local)(
            params, q_ids, q_mask, d_ids, d_mask, cfg, temperature,
            maxsim_weight,
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
