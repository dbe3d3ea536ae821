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
COPY README.md corpus* /corpus/
RUN if ls /corpus/*.md /corpus/*.json >/dev/null 2>&1 \
        && [ "$(ls /corpus | grep -v '^README.md$' | head -1)" ]; then \
        python -m legal_rag_tpu build --source /corpus --store /app/data/store --finetune-steps 4000 --rerank-steps 12000; \
    fi

ENV PORT=8000 LEGAL_RAG_STORE=/app/data/store
EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s \
    CMD curl -sf http://localhost:${PORT}/health || exit 1

# build-at-boot fallback: LEGAL_RAG_CORPUS=/mounted/corpus
CMD ["sh", "-c", "\
    if [ ! -f ${LEGAL_RAG_STORE}/manifest.json ] && [ -n \"${LEGAL_RAG_CORPUS}\" ]; then \
        python -m legal_rag_tpu build --source ${LEGAL_RAG_CORPUS} --store ${LEGAL_RAG_STORE} --finetune-steps 4000; \
    fi; \
    python -m legal_rag_tpu serve --store ${LEGAL_RAG_STORE} --port ${PORT}"]
