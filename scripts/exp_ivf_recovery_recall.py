"""PQ/IVF oversample->recall recovery contract at 1M clustered docs —
RECALL-ONLY, platform-independent (VERDICT r3 item 5, CPU-runnable).

`exp_ivf_recovery.py` measures BOTH the scan cost (TPU slope method)
and the post-rescore recall; the cost half needs the real chip, but
the recall half is pure candidate-set math. When the TPU relay is
down, this script produces the decision-relevant part of the contract
on CPU: the PQ metric is mirrored in numpy (identical 4-bit ADC LUT
sums) and the IVF coarse probe logic is mirrored step-for-step from
ops/pq.py `_pq_ivf_topk_impl` (per-query guarantee + two-key shared
select), so the candidate sets match what the kernel dispatch returns
up to float-sum tie order.

Run:  python scripts/exp_ivf_recovery_recall.py
Env:  RECOVERY_N (default 1M), RECOVERY_Q (default 64),
      REPORT (default EVAL_IVF_RECOVERY.json at the repo root).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("RECOVERY_N", str(1 << 20)))
Q = int(os.environ.get("RECOVERY_Q", "64"))
D, M, K = 384, 48, 10
OVERSAMPLES = (4, 8, 16, 32, 64)
REPORT = os.environ.get("REPORT", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "EVAL_IVF_RECOVERY.json"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def unpack_codes(codes: np.ndarray) -> np.ndarray:
    """[N, m] packed uint8 -> [N, 2m] nibble codes (low first)."""
    lo = codes & 15
    hi = codes >> 4
    out = np.empty((codes.shape[0], codes.shape[1] * 2), np.uint8)
    out[:, 0::2] = lo
    out[:, 1::2] = hi
    return out


def pq_scores(qrot: np.ndarray, nibbles: np.ndarray,
              codebooks: np.ndarray) -> np.ndarray:
    """Exact ADC: score[q, n] = sum_j lut[q, j, nibbles[n, j]]."""
    n_sub = codebooks.shape[0]
    dsub = codebooks.shape[2]
    scores = np.zeros((qrot.shape[0], nibbles.shape[0]), np.float32)
    for j in range(n_sub):
        lut = qrot[:, j * dsub:(j + 1) * dsub] @ codebooks[j].T  # [Q, 16]
        scores += lut[:, nibbles[:, j]]
    return scores


def ivf_candidates(qrot, ivf, nibbles_cellorder, kk, probes):
    """Numpy mirror of ops/pq.py _pq_ivf_topk_impl's candidate set."""
    n_cells, cell_size = ivf.centroids.shape[0], ivf.cell_size
    cell_scores = qrot @ np.asarray(ivf.centroids).T       # [Q, n_cells]
    doc_ids = np.asarray(ivf.doc_ids)
    cell_valid = doc_ids.reshape(n_cells, cell_size)[:, 0] >= 0
    cell_scores[:, ~cell_valid] = -np.inf
    t = max(1, min(probes // qrot.shape[0], n_cells))
    per_q = np.argsort(-cell_scores, axis=1, kind="stable")[:, :t]
    picked = np.zeros(n_cells, np.float32)
    picked[per_q.reshape(-1)] = 1.0
    agg = cell_scores.max(axis=0)
    order = np.lexsort((np.arange(n_cells), -agg, -picked))
    sel = np.sort(order[:probes])
    rows = (sel[:, None] * cell_size
            + np.arange(cell_size, dtype=np.int64)[None, :]).reshape(-1)
    sub_scores = pq_scores(qrot, nibbles_cellorder[rows], CBS)
    sub_ids = doc_ids[rows]
    sub_scores[:, sub_ids < 0] = -np.inf
    kk = min(kk, len(rows))
    top = np.argsort(-sub_scores, axis=1, kind="stable")[:, :kk]
    return sub_ids[top]                                    # [Q, kk]


def main():
    global CBS
    t_start = time.time()
    log(f"recall-only recovery  N={N} Q={Q} m={M} k={K}")
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((2048, D)).astype(np.float32)
    docs = centers[rng.integers(0, 2048, N)] + 0.3 * (
        rng.standard_normal((N, D)).astype(np.float32)
    )
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    qs = docs[rng.integers(0, N, Q)] + 0.05 * (
        rng.standard_normal((Q, D)).astype(np.float32)
    )
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    from legal_rag_tpu.ops.pq import build_ivf, encode_pq, train_pq

    cb = train_pq(docs, m=M, iters=15, sample=32768, opq_iters=4)
    codes = encode_pq(docs, cb)
    ivf = build_ivf(docs, cb, codes, cell_size=1024)
    log(f"PQ+IVF trained ({ivf.n_cells} cells x {ivf.cell_size}) "
        f"[{time.time() - t_start:.0f}s]")

    CBS = np.asarray(cb.codebooks)
    qrot = np.asarray(cb.rotate(qs), np.float32)
    nib = unpack_codes(np.asarray(codes))
    nib_cell = unpack_codes(np.asarray(ivf.codes))

    # golden exact top-10
    gold = []
    for lo in range(0, Q, 16):
        sc = qs[lo:lo + 16] @ docs.T
        gold.extend(set(np.argsort(-sc[i], kind="stable")[:K])
                    for i in range(sc.shape[0]))

    def post_rescore_recall(cand):
        rec = []
        for i in range(Q):
            ids = np.unique(cand[i][cand[i] >= 0])
            sc = qs[i] @ docs[ids].T
            top = ids[np.argsort(-sc, kind="stable")[:K]]
            rec.append(len(set(top.tolist()) & gold[i]) / K)
        return float(np.mean(rec))

    flat_scores = pq_scores(qrot, nib, CBS)
    log(f"flat ADC scored [{time.time() - t_start:.0f}s]")

    rows = []
    for name in ("flat", "ivf256", "ivf512"):
        for x in OVERSAMPLES:
            kk = K * x
            if name == "flat":
                cand = np.argsort(-flat_scores, axis=1,
                                  kind="stable")[:, :kk]
            else:
                cand = ivf_candidates(qrot, ivf, nib_cell, kk,
                                      probes=int(name[3:]))
            rec = post_rescore_recall(cand)
            rows.append({"dispatch": name, "oversample": x,
                         "candidates": kk,
                         "post_rescore_recall@10": rec})
            log(f"{name:<7} oversample={x:<3} (cand {kk:4}): "
                f"post-rescore recall@{K} = {rec:.3f}")

    report = {
        "n_docs": N, "queries": Q, "pq_m": M, "k": K,
        "corpus": "clustered stress (2048 centers, 0.3 sigma)",
        "method": "numpy ADC + numpy mirror of _pq_ivf_topk_impl "
                  "coarse probe; recall is platform-independent — "
                  "scan timings live in exp_ivf_recovery.py (TPU)",
        "rows": rows,
    }
    with open(REPORT, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    log(f"report -> {REPORT} [{time.time() - t_start:.0f}s]")


if __name__ == "__main__":
    main()
