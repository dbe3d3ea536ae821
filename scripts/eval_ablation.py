"""One-shot TPU run: random-vs-finetuned encoder retrieval ablation on
the full reference corpus. Writes EVAL_RETRIEVAL.json."""
import faulthandler, json, sys, time
faulthandler.dump_traceback_later(3000, exit=True)
sys.path.insert(0, "/root/repo")

import jax
print("devices:", jax.devices(), flush=True)

from legal_rag_tpu.ingest import parse_corpus
from legal_rag_tpu.evaluation import compare_encoders

t0 = time.time()
chunks = []
for c in parse_corpus("/root/reference/documents"):
    d = c.to_reference_dict(); d["section_id"] = c.section_id; chunks.append(d)
print(f"{len(chunks)} chunks parsed ({time.time()-t0:.1f}s)", flush=True)

def log(msg):
    print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

report = compare_encoders(
    chunks, finetune_steps=400, finetune_batch=64, ks=(1, 5, 10),
    log_fn=log,
)
with open("/root/repo/EVAL_RETRIEVAL.json", "w") as f:
    json.dump(report, f, indent=2)
print(json.dumps(report, indent=2), flush=True)
