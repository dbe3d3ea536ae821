"""Train + gate the cross-encoder reranker ON TPU (VERDICT r2 item 4).

The round-2/3 CPU experiments capped CE training at a few hundred
11-s steps (~10k pair examples) — far below what a joint-attention
reranker needs, and the checkpoint failed its gate. On the TPU a step
is milliseconds, so this trains at the bi-encoder's optimization scale
(default 4000 steps) with the warmup-cosine schedule and the
random->hard curriculum, then runs the builder's validation gate
(held-out title MRR, alpha blend fit) and persists the checkpoint into
the store ONLY on a pass.

Usage:  RR_STEPS=4000 python scripts/train_reranker.py <store_dir>
"""

import dataclasses as dc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from legal_rag_tpu.utils.cache import enable_compile_cache

enable_compile_cache(os.path.expanduser("~/.cache/legal_rag_roofline"))

import numpy as np

from legal_rag_tpu.config import EncoderConfig, RetrievalConfig
from legal_rag_tpu.index.builder import _train_validated_reranker
from legal_rag_tpu.index.store import VectorStore
from legal_rag_tpu.models.encoder import SentenceEncoder
from legal_rag_tpu.models.wordpiece import WordPieceTokenizer

STEPS = int(os.environ.get("RR_STEPS", 4000))
# paraphrase-aware recipe (sibling positives) — training a sibling CE
# onto a COPY of a standard store gives a same-encoder A/B
# (EVAL_CE_PARAPHRASE.json compares the two recipes per split)
SIBLING = float(os.environ.get("RR_SIBLING", "0"))
STORE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_sib_store"


def main():
    import jax
    print(f"devices: {jax.devices()}  store={STORE}  steps={STEPS}",
          flush=True)
    store = VectorStore.load(STORE)
    info = dict(store.encoder_info)
    seed = info.pop("seed", 0)
    tok_impl = info.pop("tokenizer_impl", "python")
    cfg = dc.replace(
        EncoderConfig(),
        **{k: v for k, v in info.items()
           if k in EncoderConfig.__dataclass_fields__},
    )
    enc = SentenceEncoder(
        cfg=cfg, tokenizer=WordPieceTokenizer(store.wp_vocab), seed=seed,
        params=store.encoder_params, prefer_tokenizer=tok_impl,
    )
    texts = [c["text"] for c in store.chunks]
    config = RetrievalConfig()

    # RR_FRESH=1: drop a pre-existing checkpoint BEFORE training so the
    # pass/fail signal below reflects THIS run's gate — on a copied
    # store the old CE would otherwise survive a gate rejection and be
    # re-persisted as if the new recipe had passed.
    if os.environ.get("RR_FRESH", "0") == "1" and store.ce_params is not None:
        store.ce_params = None
        print("pre-existing cross-encoder checkpoint dropped (RR_FRESH=1)",
              flush=True)

    t0 = time.time()
    _train_validated_reranker(
        store, enc, texts, STEPS, config,
        log_fn=lambda m: print(f"[{time.time()-t0:6.0f}s] {m}", flush=True),
        sibling_prob=SIBLING,
    )
    passed = store.ce_params is not None
    print(json.dumps({
        "steps": STEPS,
        "passed": bool(passed),
        "alpha": getattr(store, "ce_alpha", None) if passed else None,
        "train_s": round(time.time() - t0, 1),
    }), flush=True)
    if passed and os.environ.get("RR_SAVE", "1") == "1":
        store.save(STORE)
        print(f"checkpoint persisted into {STORE}", flush=True)


if __name__ == "__main__":
    main()
