"""HF BertModel checkpoint -> MiniLM param pytree conversion.

Lets a user drop in the real ``sentence-transformers/all-MiniLM-L6-v2``
weights (or any BERT encoder) when a checkpoint is available; the
framework itself never needs torch at serve time — conversion is a
one-shot offline step whose output is saved as an npz artifact.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from legal_rag_tpu.config import EncoderConfig
from legal_rag_tpu.models.minilm import MiniLMParams


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    # torch Linear stores weight [out, in]; our kernels are [in, out]
    return {
        "kernel": np.ascontiguousarray(np.asarray(sd[prefix + ".weight"]).T),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def convert_hf_bert(
    state_dict: Mapping[str, Any], cfg: EncoderConfig
) -> MiniLMParams:
    """Convert an HF ``BertModel`` state_dict (tensors or ndarrays,
    key layout ``embeddings.* / encoder.layer.N.*``) into the pytree
    :func:`legal_rag_tpu.models.minilm.minilm_hidden_states` consumes."""
    sd = {
        k.removeprefix("bert."): np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v
        )
        for k, v in state_dict.items()
    }
    layers = []
    for n in range(cfg.layers):
        p = f"encoder.layer.{n}"
        layers.append({
            "attention": {
                "query": _dense(sd, f"{p}.attention.self.query"),
                "key": _dense(sd, f"{p}.attention.self.key"),
                "value": _dense(sd, f"{p}.attention.self.value"),
                "output": _dense(sd, f"{p}.attention.output.dense"),
            },
            "attention_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "intermediate": _dense(sd, f"{p}.intermediate.dense"),
            "output": _dense(sd, f"{p}.output.dense"),
            "output_ln": _ln(sd, f"{p}.output.LayerNorm"),
        })
    return {
        "embeddings": {
            "word": sd["embeddings.word_embeddings.weight"],
            "position": sd["embeddings.position_embeddings.weight"],
            "token_type": sd["embeddings.token_type_embeddings.weight"],
            "ln": _ln(sd, "embeddings.LayerNorm"),
        },
        "layers": layers,
    }


def save_params_npz(params: MiniLMParams, path) -> None:
    """Flatten the pytree into an npz archive (key = '/'-joined path)."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, f"{prefix}/{i}")
        else:
            flat[prefix] = np.asarray(node)

    walk(params, "")
    np.savez_compressed(path, **flat)


def load_params_npz(path) -> MiniLMParams:
    data = np.load(path)
    root: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)
