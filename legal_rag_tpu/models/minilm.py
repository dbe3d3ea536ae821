"""Pure-JAX MiniLM (6-layer BERT) sentence encoder.

TPU-native replacement for the reference's sentence-transformers
``all-MiniLM-L6-v2`` (reference create_vector_store.py:33,
retrieval_engine.py:31): a functional, jit-compiled BERT forward with
mean pooling + L2 normalization, batched as one ``[B, L]`` id matrix.

Parameters are a plain pytree (dict of arrays) so they convert 1:1
from an HF ``BertModel`` checkpoint (``convert.py``), shard with
``jax.device_put``/NamedSharding, and train with optax if fine-tuning
is ever needed. Architecture is post-LayerNorm BERT with erf-GELU —
numerically parity-tested against torch ``BertModel`` in
tests/test_minilm.py (cosine >= 0.9999 on random weights).

All matmuls carry ``preferred_element_type=float32``; the hidden size
(384 = 3 x 128 lanes) and head dim (32) tile cleanly onto the MXU.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from legal_rag_tpu.config import EncoderConfig

MiniLMParams = Dict[str, Any]


def _linear(x, p, precision):
    return (
        jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32,
                precision=precision)
        + p["bias"]
    )


def _layer_norm(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _attention(x, mask_bias, p, num_heads, precision):
    b, l, h = x.shape
    dh = h // num_heads

    def split(t):  # [B, L, H] -> [B, heads, L, dh]
        return t.reshape(b, l, num_heads, dh).transpose(0, 2, 1, 3)

    q = split(_linear(x, p["query"], precision))
    k = split(_linear(x, p["key"], precision))
    v = split(_linear(x, p["value"], precision))

    scores = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=precision)
        / jnp.sqrt(jnp.float32(dh))
        + mask_bias
    )
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v, precision=precision)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, h)
    return _linear(ctx, p["output"], precision)


def _encoder_layer(x, mask_bias, p, cfg: EncoderConfig, precision):
    attn = _attention(x, mask_bias, p["attention"], cfg.heads, precision)
    x = _layer_norm(x + attn, p["attention_ln"], cfg.layer_norm_eps)
    inter = jax.nn.gelu(
        _linear(x, p["intermediate"], precision), approximate=False
    )
    out = _linear(inter, p["output"], precision)
    return _layer_norm(x + out, p["output_ln"], cfg.layer_norm_eps)


def minilm_hidden_states(
    params: MiniLMParams,
    input_ids: jax.Array,   # [B, L] int32
    attention_mask: jax.Array,  # [B, L] int32/float
    cfg: EncoderConfig,
    precision=jax.lax.Precision.HIGHEST,
    token_type_ids: "jax.Array | None" = None,  # [B, L]; None = all 0
) -> jax.Array:
    """Full BERT encoder -> last hidden states ``[B, L, H]`` (f32).

    ``token_type_ids`` distinguishes the two segments of a pair input
    (cross-encoder scoring); single-text encoding leaves it None."""
    b, l = input_ids.shape
    emb = params["embeddings"]
    positions = jnp.arange(l, dtype=jnp.int32)[None, :]
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    # random-init tables are 2-row; HF MiniLM's is too — clip defensively
    tt = jnp.clip(token_type_ids, 0, emb["token_type"].shape[0] - 1)
    x = (
        emb["word"][input_ids]
        + emb["position"][positions]
        + emb["token_type"][tt]
    )
    x = _layer_norm(x, emb["ln"], cfg.layer_norm_eps)

    # additive attention bias: 0 for real tokens, -inf-ish for padding
    mask_bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
    mask_bias = mask_bias[:, None, None, :]  # [B, 1, 1, L]

    for layer_params in params["layers"]:
        x = _encoder_layer(x, mask_bias, layer_params, cfg, precision)
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def minilm_encode(
    params: MiniLMParams,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: EncoderConfig,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Sentence embeddings: mean-pool over the attention mask, then L2
    normalize — the sentence-transformers pooling recipe. ``[B, H]``."""
    hidden = minilm_hidden_states(params, input_ids, attention_mask, cfg, precision)
    mask = attention_mask.astype(jnp.float32)[:, :, None]
    pooled = jnp.sum(hidden * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-9
    )
    norm = jnp.sqrt(jnp.sum(pooled * pooled, axis=-1, keepdims=True))
    return pooled / jnp.maximum(norm, 1e-12)


def init_minilm_params(
    cfg: EncoderConfig, seed: int = 0, max_position: int = 512
) -> MiniLMParams:
    """Deterministic random init (normal 0.02, BERT-style). Used when no
    pretrained checkpoint is available (zero-egress deployments); the
    converter in convert.py fills the same pytree from HF weights."""
    key = jax.random.PRNGKey(seed)

    def take():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def dense(n_in, n_out):
        return {
            "kernel": 0.02 * jax.random.normal(take(), (n_in, n_out), jnp.float32),
            "bias": jnp.zeros((n_out,), jnp.float32),
        }

    def ln(n):
        return {"scale": jnp.ones((n,), jnp.float32),
                "bias": jnp.zeros((n,), jnp.float32)}

    h, i = cfg.hidden, cfg.intermediate
    layers = []
    for _ in range(cfg.layers):
        layers.append({
            "attention": {
                "query": dense(h, h),
                "key": dense(h, h),
                "value": dense(h, h),
                "output": dense(h, h),
            },
            "attention_ln": ln(h),
            "intermediate": dense(h, i),
            "output": dense(i, h),
            "output_ln": ln(h),
        })
    return {
        "embeddings": {
            "word": 0.02 * jax.random.normal(take(), (cfg.vocab_size, h), jnp.float32),
            "position": 0.02 * jax.random.normal(take(), (max_position, h), jnp.float32),
            "token_type": 0.02 * jax.random.normal(
                take(), (cfg.type_vocab_size, h), jnp.float32
            ),
            "ln": ln(h),
        },
        "layers": layers,
    }
