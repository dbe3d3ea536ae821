"""legal_rag_tpu — a TPU-native hybrid retrieval framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
MET4L-DS/Legal-RAG-engine (reference mounted at /root/reference):

- ingest:    stateful legal-markdown chunker with stable section IDs
             (reference: ingest_legal_docs.py)
- models:    pure-JAX MiniLM sentence encoder + WordPiece tokenizer
             (reference: sentence-transformers all-MiniLM-L6-v2)
- ops:       fused dense matmul+top-k (replaces FAISS IndexFlatIP),
             CSR BM25 scoring (replaces rank_bm25), on-device fusion
- parallel:  sharded multi-chip search over a jax.sharding.Mesh
- index:     versioned on-disk index artifacts, device-mapped shards
- retrieval: hybrid search engine, orchestrator, classifier, responder
- server:    HTTP serving + response layer (timeline anchors,
             answer units, sentence attribution, source fetching)

Everything on the device side is jit-compiled, statically shaped, and
batched: queries are a [Q, D] matrix, results are (scores, ids) arrays.
"""

__version__ = "0.1.0"
