# Serving image for legal_rag_tpu (deployment parity with the
# reference's Dockerfile/start.sh/render.yaml, reference Dockerfile:1-28).
# The index is built at image build time so boot only loads artifacts;
# the C++ tokenizer is compiled in-tree.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make curl && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY legal_rag_tpu ./legal_rag_tpu
COPY bench.py .

# build the native tokenizer; non-fatal (pure-Python fallback)
RUN make -C legal_rag_tpu/native || true

# Optional baked index: place your corpus (markdown tree or a
# chunks.json) in ./corpus/ inside the build context before building.
# The glob always matches (README.md anchors it), so a context without
# a corpus still builds; serving can also build at first start from a
# mounted corpus via LEGAL_RAG_CORPUS.
#
# RERANK_STEPS=auto is a guard against the CPU hang, NOT a TPU
# detector: CE training is ~11 s/step on CPU (measured, BASELINE.md
# reranker post-mortem), so a CPU build would spend ~36 h in this RUN.
# `docker build` does not pass accelerator devices into build
# containers, so auto resolves to 0 even on a TPU VM — to bake the
# cross-encoder you MUST pass --build-arg RERANK_STEPS=12000 (and run
# the build where that's affordable). The resolved count is echoed in
# the build log.
ARG FINETUNE_STEPS=4000
ARG RERANK_STEPS=auto
# Round-5 gated serving recipe (EVAL_GATE_COMBO.json /
# quality_report_combo.json): token co-training at 0.5 with a 32-token
# multi-vector slab — free for dense (structure RRF r@10 0.976,
# sibling dense 0.689, core quality 10/10) and lifts every MaxSim
# metric (structure full-scan MRR 0.949, best of any mode).
ARG FINETUNE_TOKEN_WEIGHT=0.5
ARG MULTI_VECTOR=32
COPY README.md corpus* /corpus/
RUN if ls /corpus/*.md /corpus/*.json >/dev/null 2>&1 \
        && [ "$(ls /corpus | grep -v '^README.md$' | head -1)" ]; then \
        RS="${RERANK_STEPS}"; \
        if [ "$RS" = "auto" ]; then \
            RS=$(python -c "import jax; print(12000 if jax.default_backend() == 'tpu' else 0)"); \
        fi; \
        echo "RERANK_STEPS resolved to ${RS} (auto=0 unless the build container itself sees a TPU; pass --build-arg RERANK_STEPS=12000 to bake the cross-encoder)"; \
        python -m legal_rag_tpu build --source /corpus --store /app/data/store --finetune-steps ${FINETUNE_STEPS} --finetune-token-weight ${FINETUNE_TOKEN_WEIGHT} --multi-vector ${MULTI_VECTOR} --rerank-steps ${RS}; \
    fi

ENV PORT=8000 LEGAL_RAG_STORE=/app/data/store
EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s \
    CMD curl -sf http://localhost:${PORT}/health || exit 1

# build-at-boot fallback: LEGAL_RAG_CORPUS=/mounted/corpus. The
# finetune count adapts to the boot platform (4000 on TPU = the swept
# serving default; 400 on CPU = the round-2 recipe that still passes
# the 10/10 quality gate at ~260 s build) unless pinned via
# LEGAL_RAG_BOOT_FINETUNE_STEPS.
CMD ["sh", "-c", "\
    if [ ! -f ${LEGAL_RAG_STORE}/manifest.json ] && [ -n \"${LEGAL_RAG_CORPUS}\" ]; then \
        FS=${LEGAL_RAG_BOOT_FINETUNE_STEPS:-$(python -c \"import jax; print(4000 if jax.default_backend() == 'tpu' else 400)\")}; \
        python -m legal_rag_tpu build --source ${LEGAL_RAG_CORPUS} --store ${LEGAL_RAG_STORE} --finetune-steps ${FS}; \
    fi; \
    python -m legal_rag_tpu serve --store ${LEGAL_RAG_STORE} --port ${PORT}"]
