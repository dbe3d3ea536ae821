"""Fusion-mode form policy, measured (round 5).

EVAL_RETRIEVAL.json says dense beats RRF on the paraphrase split
(r@10 0.690 vs 0.659, MRR 0.488 vs 0.461) while RRF wins structure
(0.975 vs 0.941), and the round-5 paraphrase E2E diagnosis shows RRF
burying targets the dense channel surfaced (dense rank 5-20, fused
null). The serving lever mirrors ce_policy_alpha: route each query's
FUSION by its form — heading-register queries (<= HEADING_MAX_WORDS
words) keep RRF, narrative/descriptive queries take the dense-leaning
mode the paraphrase measurements favor.

This script measures the policy BEFORE it ships, per split, with
bootstrap CIs on the delta vs pure RRF:

  rrf          pure RRF (current serving default)
  dense        pure dense
  policy_words narrative = more than HEADING_MAX_WORDS words
  policy_person narrative = words-test AND a person-marker token
                (pronouns/actors statute titles and spans rarely use)

Usage: python scripts/eval_fusion_policy.py [--store DIR]
       [--max-pairs N] [--bootstrap N] [--report PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


PERSON_MARKERS = frozenset(
    "i me my mine we our us you your yours he she him her his hers "
    "someone stranger neighbour neighbor husband wife ex boyfriend "
    "girlfriend cousin nephew niece son daughter family".split()
)

def is_narrative(query: str, variant: str) -> bool:
    from legal_rag_tpu.models.cross_encoder import HEADING_MAX_WORDS
    from legal_rag_tpu.retrieval import query_form

    words = query.lower().split()
    if len(words) <= HEADING_MAX_WORDS:
        return False
    if variant == "words":
        return True
    if variant == "person":
        return any(w in PERSON_MARKERS for w in query_form._tokens(query))
    if variant == "narrative":
        # the shipped detector (retrieval/query_form.py)
        return query_form.is_narrative(query)
    raise ValueError(variant)


def ranked_ids(engine, queries, kmax, mode, weights=None, chunk=256):
    out = np.full((len(queries), kmax), -1, dtype=np.int64)
    for lo in range(0, len(queries), chunk):
        sub = queries[lo:lo + chunk]
        rows = engine.search_batch(
            sub, k=kmax,
            hybrid_weights=None if weights is None else [weights] * len(sub),
            mode=mode,
        )
        for qi, row in enumerate(rows):
            for j, r in enumerate(row[:kmax]):
                out[lo + qi, j] = r.doc_id
    return out


def mask_excludes(ranked, excludes):
    filt = np.full_like(ranked, -1)
    for qi in range(ranked.shape[0]):
        row = [d for d in ranked[qi] if d != excludes[qi]]
        filt[qi, : len(row)] = row
    return filt


def score(ranked, relevants, ks=(1, 5, 10)):
    from legal_rag_tpu.evaluation import mrr_at_k, recall_at_k

    entry = {f"recall@{k}": round(recall_at_k(ranked, relevants, k), 4)
             for k in ks}
    entry["mrr"] = round(mrr_at_k(ranked, relevants, ranked.shape[1]), 4)
    return entry


def per_query_hits(ranked, relevants, k=10):
    hits = np.zeros(ranked.shape[0])
    rr = np.zeros(ranked.shape[0])
    for qi in range(ranked.shape[0]):
        rel = set(relevants[qi])
        for j, d in enumerate(ranked[qi]):
            if d in rel:
                rr[qi] = 1.0 / (j + 1)
                if j < k:
                    hits[qi] = 1.0
                break
    return hits, rr


def bootstrap_delta(a, b, n=1000, seed=0):
    """95% CI of mean(a) - mean(b) over query resamples."""
    rng = np.random.default_rng(seed)
    nq = len(a)
    deltas = [
        float(np.mean(a[idx]) - np.mean(b[idx]))
        for idx in (rng.integers(0, nq, nq) for _ in range(n))
    ]
    return (round(float(np.mean(a) - np.mean(b)), 4),
            round(float(np.percentile(deltas, 2.5)), 4),
            round(float(np.percentile(deltas, 97.5)), 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/store_aug03b")
    ap.add_argument("--max-pairs", type=int, default=None)
    ap.add_argument("--bootstrap", type=int, default=1000)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    from legal_rag_tpu.evaluation import (
        labeled_pairs_from_chunks, sibling_span_pairs_from_chunks,
    )
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.quality import _provenance
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    store = VectorStore.load(args.store)
    engine = RetrievalEngine(store)
    splits = {
        "structure": labeled_pairs_from_chunks(
            store.chunks, max_pairs=args.max_pairs),
        "sibling": sibling_span_pairs_from_chunks(
            store.chunks, max_pairs=args.max_pairs),
    }

    report = {"store": args.store, "splits": {},
              "provenance": _provenance(engine)}
    for name, pairs in splits.items():
        queries = [p[0] for p in pairs]
        relevants = [p[1] for p in pairs]
        excludes = [p[2] if len(p) > 2 else None for p in pairs]
        extra = int(any(e is not None for e in excludes))
        kmax = min(10 + extra, store.n_docs)

        # cache the two base rankings per (store, split): detector
        # iteration is then free (retrieval is the expensive part)
        cache = f"/tmp/fusion_rank_cache_{os.path.basename(args.store)}_{name}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            rrf, dense = z["rrf"], z["dense"]
        else:
            rrf = ranked_ids(engine, queries, kmax, "rrf")
            dense = ranked_ids(engine, queries, kmax, "weighted",
                               weights=0.0)
            if extra:
                rrf, dense = mask_excludes(rrf, excludes), mask_excludes(
                    dense, excludes)
            np.savez(cache, rrf=rrf, dense=dense)

        rows = {"rrf": rrf, "dense": dense}
        for pol, variant in (("policy_words", "words"),
                             ("policy_person", "person"),
                             ("policy_narrative", "narrative")):
            narr = np.array(
                [is_narrative(q, variant=variant) for q in queries])
            rows[pol] = np.where(narr[:, None], dense, rrf)
            rows[f"{pol}:narrative_rate"] = narr

        # the SHIPPED variant (orchestrator._union_interleave):
        # narrative rows take the dense-first rank interleave of both
        # rankings instead of pure replacement — keeps BM25-carried
        # hits that replacement drops
        union = np.full_like(rrf, -1)
        for qi in range(rrf.shape[0]):
            seen, merged = set(), []
            for j in range(kmax):
                for d in (dense[qi, j], rrf[qi, j]):
                    if d >= 0 and d not in seen:
                        seen.add(d)
                        merged.append(d)
            union[qi, : len(merged[:kmax])] = merged[:kmax]
        narr = rows["policy_narrative:narrative_rate"]
        rows["policy_union"] = np.where(narr[:, None], union, rrf)
        rows["policy_union:narrative_rate"] = narr

        out = {}
        base_hits, base_rr = per_query_hits(rows["rrf"], relevants)
        for mode in ("rrf", "dense", "policy_words", "policy_person",
                     "policy_narrative", "policy_union"):
            entry = score(rows[mode], relevants)
            if mode != "rrf":
                hits, rr = per_query_hits(rows[mode], relevants)
                entry["delta_r10_vs_rrf_ci95"] = bootstrap_delta(
                    hits, base_hits, n=args.bootstrap)
                entry["delta_mrr_vs_rrf_ci95"] = bootstrap_delta(
                    rr, base_rr, n=args.bootstrap)
            if f"{mode}:narrative_rate" in rows:
                entry["narrative_rate"] = round(
                    float(rows[f"{mode}:narrative_rate"].mean()), 3)
            out[mode] = entry
            print(f"[{name}] {mode}: {entry}", flush=True)
        report["splits"][name] = {"n_queries": len(queries), "modes": out}

    print(json.dumps(report))
    if args.report:
        with open(args.report, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
