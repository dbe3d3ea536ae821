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

# bake the index when a corpus is provided at build time
ARG DOCS_DIR=""
COPY ${DOCS_DIR:-/dev/null} /corpus
RUN if [ -d /corpus ]; then \
        python -m legal_rag_tpu build --source /corpus --store /app/data/store; \
    fi

ENV PORT=8000 LEGAL_RAG_STORE=/app/data/store
EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s \
    CMD curl -sf http://localhost:${PORT}/health || exit 1

CMD ["sh", "-c", "python -m legal_rag_tpu serve --store ${LEGAL_RAG_STORE} --port ${PORT}"]
