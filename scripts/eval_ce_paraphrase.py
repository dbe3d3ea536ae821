"""Cross-encoder value measurement where it can actually win
(VERDICT r3 item 3).

The round-3 CE gate passed on the held-out TITLE split with a lift of
+0.0065 MRR at alpha=0.1 — statistically indistinguishable from zero
and measured exactly where lexical/bi-encoder signals are strongest.
Joint attention should shine where they fail: the sibling-span
PARAPHRASE split. This script measures, per split:

  base RRF top-C  ->  CE rerank (alpha grid)  ->  MRR / recall@10,
  with a bootstrap 95% CI on the MRR delta at the best and the
  serving alpha.

Decision rule (pinned in VERDICT): keep `--rerank-steps 12000` in the
serving image only if some split shows a lift whose CI excludes zero.

Run:  python scripts/eval_ce_paraphrase.py [--store DIR] [--n 400]
      (CPU-feasible at n=400; the TPU queue runs the full splits)
Writes EVAL_CE_PARAPHRASE.json at the repo root by default.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mrr(ranked, relevant_sets):
    out = []
    for row, rel in zip(ranked, relevant_sets):
        rr = 0.0
        for pos, d in enumerate(row):
            if d in rel:
                rr = 1.0 / (pos + 1)
                break
        out.append(rr)
    return np.asarray(out)


def recall10(ranked, relevant_sets):
    out = []
    for row, rel in zip(ranked, relevant_sets):
        out.append(len(set(row[:10]) & rel) / max(1, min(len(rel), 10)))
    return np.asarray(out)


def bootstrap_ci(delta, n_boot=2000, seed=0):
    rng = np.random.default_rng(seed)
    n = len(delta)
    means = delta[rng.integers(0, n, (n_boot, n))].mean(axis=1)
    return float(np.quantile(means, 0.025)), float(np.quantile(means, 0.975))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/eval_sib_store")
    ap.add_argument("--n", type=int, default=400,
                    help="queries per split (CPU: 400 ~ tractable)")
    ap.add_argument("--candidates", type=int, default=20)
    ap.add_argument("--report", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "EVAL_CE_PARAPHRASE.json"))
    ap.add_argument("--ce-batch", type=int, default=256)
    ap.add_argument("--score-cache", default=None,
                    help="dir caching per-split candidates + CE scores "
                    "(keyed by store basename/n/candidates) so policy "
                    "re-evals skip the expensive CE forward")
    args = ap.parse_args()

    from legal_rag_tpu.utils.cache import enable_compile_cache
    enable_compile_cache(os.path.expanduser("~/.cache/legal_rag_ce_eval"))

    import dataclasses
    from legal_rag_tpu.config import DEFAULT_CONFIG, FusionConfig
    from legal_rag_tpu.evaluation import (
        labeled_pairs_from_chunks, sibling_span_pairs_from_chunks,
    )
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.models.cross_encoder import CrossEncoder, blend_scores
    from legal_rag_tpu.quality import _provenance
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    store = VectorStore.load(args.store)
    assert store.ce_params is not None, "store has no cross_encoder.npz"
    cfg = dataclasses.replace(DEFAULT_CONFIG, fusion=FusionConfig(mode="rrf"))
    engine = RetrievalEngine(store, config=cfg)
    ce = CrossEncoder(engine.encoder, params=store.ce_params)
    serving_alpha = getattr(store, "ce_alpha", None) or 0.1
    alphas = [0.0, 0.1, 0.2, 0.3, 0.5, 0.7, 1.0]
    c = args.candidates

    splits = {
        "structure": [
            (q, rel, None) for q, rel in labeled_pairs_from_chunks(
                store.chunks, max_pairs=args.n)
        ],
        "paraphrase": sibling_span_pairs_from_chunks(
            store.chunks, max_pairs=args.n),
    }

    report = {
        "store": args.store,
        "candidates": c,
        "serving_alpha": serving_alpha,
        "provenance": _provenance(engine),
        "splits": {},
    }
    for name, pairs in splits.items():
        queries = [p[0] for p in pairs]
        rels = [set(p[1]) for p in pairs]
        excludes = [p[2] for p in pairs]

        cache_file = None
        if args.score_cache:
            os.makedirs(args.score_cache, exist_ok=True)
            cache_file = os.path.join(
                args.score_cache,
                f"{os.path.basename(args.store.rstrip('/'))}"
                f"_{name}_{args.n}_{c}.npz",
            )
        if cache_file and os.path.exists(cache_file):
            z = np.load(cache_file)
            pad_ids, pad_base, lens = z["ids"], z["base"], z["lens"]
            cand_ids = [list(pad_ids[i][: lens[i]]) for i in range(len(lens))]
            cand_base = [list(pad_base[i][: lens[i]]) for i in range(len(lens))]
            ce_scores = z["ce"]
            print(f"  [{name}] scores from cache {cache_file}",
                  file=sys.stderr, flush=True)
        else:
            # +1 so dropping the masked source chunk still leaves C
            base = engine.search_batch(queries, k=c + 1, mode="rrf")
            cand_ids, cand_base = [], []
            for rows, ex in zip(base, excludes):
                ids = [r.doc_id for r in rows if r.doc_id != ex][:c]
                sc = [r.score for r in rows if r.doc_id != ex][:c]
                cand_ids.append(ids)
                cand_base.append(sc)

            # flat CE scoring in batches
            flat_q, flat_d = [], []
            for qi, ids in enumerate(cand_ids):
                for d in ids:
                    flat_q.append(queries[qi])
                    flat_d.append(store.chunks[d]["text"])
            ce_scores = np.zeros(len(flat_q), np.float32)
            for lo in range(0, len(flat_q), args.ce_batch):
                hi = min(lo + args.ce_batch, len(flat_q))
                ce_scores[lo:hi] = ce.score_pairs(flat_q[lo:hi], flat_d[lo:hi])
                print(f"  [{name}] CE {hi}/{len(flat_q)}",
                      file=sys.stderr, flush=True)
            if cache_file:
                lens = np.asarray([len(i) for i in cand_ids], np.int32)
                pad_ids = np.full((len(cand_ids), c), -1, np.int32)
                pad_base = np.zeros((len(cand_ids), c), np.float32)
                for i, (ids, sc) in enumerate(zip(cand_ids, cand_base)):
                    pad_ids[i, : len(ids)] = ids
                    pad_base[i, : len(sc)] = sc
                np.savez(cache_file, ids=pad_ids, base=pad_base,
                         lens=lens, ce=ce_scores)
        per_q_ce = {}
        pos = 0
        for qi, ids in enumerate(cand_ids):
            per_q_ce[qi] = ce_scores[pos:pos + len(ids)]
            pos += len(ids)

        base_ranked = cand_ids
        base_mrr = mrr(base_ranked, rels)
        base_r10 = recall10(base_ranked, rels)
        entry = {
            "n_queries": len(queries),
            "base": {"mrr": float(base_mrr.mean()),
                     "recall@10": float(base_r10.mean())},
            "alphas": {},
        }
        best = None
        for a in alphas:
            ranked = []
            for qi, ids in enumerate(cand_ids):
                if not ids:
                    ranked.append([])
                    continue
                blended = blend_scores(
                    per_q_ce[qi], np.asarray(cand_base[qi]), a
                )
                order = np.argsort(-blended, kind="stable")
                ranked.append([ids[j] for j in order])
            m = mrr(ranked, rels)
            r10 = recall10(ranked, rels)
            delta = m - base_mrr
            lo_ci, hi_ci = bootstrap_ci(delta)
            entry["alphas"][str(a)] = {
                "mrr": float(m.mean()),
                "recall@10": float(r10.mean()),
                "delta_mrr": float(delta.mean()),
                "delta_mrr_ci95": [lo_ci, hi_ci],
                "ci_excludes_zero": bool(lo_ci > 0 or hi_ci < 0),
            }
            if best is None or m.mean() > best[1]:
                best = (a, m.mean())
        entry["best_alpha"] = best[0]

        # form policy (models/cross_encoder.py ce_policy_alpha):
        # heading-like queries take the structure-optimum alpha,
        # everything else keeps the serving alpha — the serving-time
        # realization of the per-split pattern the grid above measures
        from legal_rag_tpu.models.cross_encoder import ce_policy_alpha
        from legal_rag_tpu.retrieval.classifier import classify_heuristic

        distress = [
            classify_heuristic(q).user_context == "victim_distress"
            for q in queries
        ]
        entry["policy"] = {}
        for a_h in (0.3, 0.5, 0.7):
            ranked = []
            n_head = 0
            for qi, ids in enumerate(cand_ids):
                if not ids:
                    ranked.append([])
                    continue
                a = ce_policy_alpha(
                    queries[qi], serving_alpha, a_h,
                    distress=distress[qi],
                )
                n_head += a == a_h and not distress[qi]
                blended = blend_scores(
                    per_q_ce[qi], np.asarray(cand_base[qi]), a
                )
                order = np.argsort(-blended, kind="stable")
                ranked.append([ids[j] for j in order])
            m = mrr(ranked, rels)
            delta = m - base_mrr
            lo_ci, hi_ci = bootstrap_ci(delta)
            entry["policy"][f"heading@{a_h}"] = {
                "mrr": float(m.mean()),
                "recall@10": float(recall10(ranked, rels).mean()),
                "delta_mrr": float(delta.mean()),
                "delta_mrr_ci95": [lo_ci, hi_ci],
                "ci_excludes_zero": bool(lo_ci > 0 or hi_ci < 0),
                "heading_rate": n_head / max(1, len(queries)),
            }
        report["splits"][name] = entry
        b = entry["base"]
        print(f"{name}: base MRR {b['mrr']:.4f} r@10 {b['recall@10']:.4f}")
        for a in alphas:
            e = entry["alphas"][str(a)]
            star = " *" if e["ci_excludes_zero"] else ""
            print(f"  alpha={a:<4} MRR {e['mrr']:.4f} "
                  f"(d={e['delta_mrr']:+.4f} "
                  f"CI[{e['delta_mrr_ci95'][0]:+.4f},"
                  f"{e['delta_mrr_ci95'][1]:+.4f}]{star}) "
                  f"r@10 {e['recall@10']:.4f}")
        for pol, e in entry["policy"].items():
            star = " *" if e["ci_excludes_zero"] else ""
            print(f"  policy {pol:<12} MRR {e['mrr']:.4f} "
                  f"(d={e['delta_mrr']:+.4f} "
                  f"CI[{e['delta_mrr_ci95'][0]:+.4f},"
                  f"{e['delta_mrr_ci95'][1]:+.4f}]{star}) "
                  f"heading_rate {e['heading_rate']:.2f}")

    with open(args.report, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
