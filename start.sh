#!/bin/bash
# Deployment entry (the reference's start.sh equivalent, start.sh:14):
# pre-flight checks, PORT defaulting, then the asyncio server.
set -u
echo "Starting legal_rag_tpu pre-flight..."
echo "Current directory: $(pwd)"

STORE="${LEGAL_RAG_STORE:-data/vector_store}"
if [ -d "$STORE" ]; then
    echo "Store directory contents:"
    ls -l "$STORE"
elif [ -n "${LEGAL_RAG_CORPUS:-}" ] && [ -d "$LEGAL_RAG_CORPUS" ]; then
    echo "No store at $STORE; building from corpus $LEGAL_RAG_CORPUS..."
    python -m legal_rag_tpu build \
        --source "$LEGAL_RAG_CORPUS" --store "$STORE" --finetune-steps 4000
else
    echo "WARNING: no store at $STORE and no LEGAL_RAG_CORPUS set;" \
         "the server will report engine_status=error on /health"
fi

if [ -z "${PORT:-}" ]; then
    echo "PORT not set, defaulting to 10000"
    PORT=10000
fi
echo "Binding to PORT: $PORT"
exec env LEGAL_RAG_STORE="$STORE" PORT="$PORT" \
    python -m legal_rag_tpu serve --store "$STORE" --port "$PORT"
