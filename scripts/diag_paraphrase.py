"""Paraphrase E2E leak diagnosis (VERDICT r4 item 3).

The 2,029-query sibling split measures dense r@10 = 0.69 at the
serving recipe, yet only 2/10 of the vocabulary-free paraphrase suite
ground end-to-end. This script replays each suite query through the
orchestrator's stages ONE AT A TIME (mirroring
``LegalOrchestrator.orchestrate``, orchestrator.py:75-118) and records
where the expected section is lost:

  encoder_miss   not in the per-query fetch pool at all (k_fetch deep)
                 -> the bi-encoder/BM25 never surfaced it; encoder
                    ceiling, feeds VERDICT item 5
  rerank_loss    entered the pool, CE blend pushed it below k
  boost_loss     ranked <= k before the rule boosts, > k after
  cutoff_loss    in the merged pool but > k both before and after
                 boosts (the k=5 serving cut is the loss)
  expansion_dilution  main-query rank <= k but merged-pool position
                 pushed out by concept-expansion results
  served         grounded (pass)

Usage: python scripts/diag_paraphrase.py [--store DIR] [--mode rrf]
       [--k 5] [--report PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def best_rank(rows, prefixes):
    """1-based rank of the first chunk matching any prefix; None if absent.

    ``rows`` is a list of dicts with ["chunk"]["section_id"].
    """
    for i, r in enumerate(rows):
        sid = r["chunk"].get("section_id") or ""
        if any(sid.startswith(p) for p in prefixes):
            return i + 1
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/r4_store_base")
    ap.add_argument("--mode", default=None, help="fusion mode (None=config)")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()

    from legal_rag_tpu.quality import PARAPHRASE_SUITE
    from legal_rag_tpu.retrieval.facade import LegalEngine
    from legal_rag_tpu.retrieval.orchestrator import expansion_queries

    eng = LegalEngine(store_dir=args.store)
    orch = eng.orchestrator
    engine = orch.engine
    fusion_cfg = engine.config.fusion
    k = args.k

    rows_out = []
    for query, _, prefixes in PARAPHRASE_SUITE:
        intent = orch.classifier.classify(query)

        queries = [query]
        if intent.user_context == "victim_distress":
            queries.extend(expansion_queries(intent))
        queries = queries[: engine.config.max_expanded_queries]
        weights = [
            fusion_cfg.procedural_weight
            if intent.category == "procedure" or "procedure" in q.lower()
            else fusion_cfg.hybrid_weight
            for q in queries
        ]

        k_fetch = max(k, orch.rerank_candidates) if orch.reranker else k
        batched = engine.search_batch(
            queries, k=k_fetch, hybrid_weights=weights, mode=args.mode
        )

        # per-list diagnostics on the MAIN query: how deep does each
        # retrieval channel bury the expected section?
        deep = engine.search_batch(
            [query], k=30, hybrid_weights=[0.0], mode="weighted"
        )[0]
        dense_rank = best_rank([r.to_dict() for r in deep], prefixes)
        deep_kw = engine.search_batch(
            [query], k=30, hybrid_weights=[1.0], mode="weighted"
        )[0]
        bm25_rank = best_rank([r.to_dict() for r in deep_kw], prefixes)
        deep_fused = engine.search_batch(
            [query], k=30, hybrid_weights=[weights[0]], mode=args.mode
        )[0]
        fused_rank30 = best_rank([r.to_dict() for r in deep_fused], prefixes)

        main_rows = [r.to_dict() for r in batched[0]]
        main_rank = best_rank(main_rows, prefixes)

        # merge in query order, dedupe by canonical header (orchestrate)
        merged, seen = [], set()
        for rows in batched:
            for r in rows:
                header = r.chunk.get("canonical_header")
                if header and header not in seen:
                    seen.add(header)
                    merged.append(r.to_dict())
        merged_rank = best_rank(merged, prefixes)

        stagelog = {
            "query": query,
            "expected": list(prefixes),
            "intent": {
                "category": intent.category,
                "user_context": intent.user_context,
            },
            "n_expansion": len(queries) - 1,
            "dense_rank@30": dense_rank,
            "bm25_rank@30": bm25_rank,
            "fused_rank@30": fused_rank30,
            "main_rank@fetch": main_rank,
            "merged_pool_rank": merged_rank,
            "pool_size": len(merged),
        }

        reranked = list(merged)
        if orch.reranker is not None:
            reranked = orch.rerank_results(
                query, [dict(r) for r in merged], k=k, intent=intent
            )
            stagelog["rerank_rank"] = best_rank(reranked, prefixes)

        prioritized = orch.prioritize_results(
            [dict(r) for r in reranked], intent
        )
        stagelog["boosted_rank"] = best_rank(prioritized, prefixes)
        final = orch.expand_results(prioritized[:k])
        served_rank = best_rank(final, prefixes)
        stagelog["served_rank"] = served_rank

        # classify the leak
        if served_rank is not None:
            leak = "served"
        elif merged_rank is None:
            leak = "encoder_miss"
        elif (
            orch.reranker is not None
            and stagelog.get("rerank_rank") is None
        ):
            leak = "rerank_pool_cut"   # dropped past the CE pool cap
        elif (
            orch.reranker is not None
            and merged_rank is not None
            and stagelog["rerank_rank"] is not None
            and stagelog["rerank_rank"] > k >= merged_rank
        ):
            leak = "rerank_loss"
        elif (
            stagelog["boosted_rank"] is not None
            and stagelog["boosted_rank"] > k
            and (stagelog.get("rerank_rank") or merged_rank) <= k
        ):
            leak = "boost_loss"
        elif main_rank is not None and main_rank <= k and merged_rank > k:
            leak = "expansion_dilution"
        else:
            leak = "cutoff_loss"
        stagelog["leak"] = leak
        rows_out.append(stagelog)
        print(json.dumps(stagelog, ensure_ascii=False))

    summary = {}
    for r in rows_out:
        summary[r["leak"]] = summary.get(r["leak"], 0) + 1
    out = {
        "store": args.store,
        "mode": args.mode or engine.config.fusion.mode,
        "k": k,
        "summary": summary,
        "rows": rows_out,
    }
    print("SUMMARY:", json.dumps(summary))
    if args.report:
        with open(args.report, "w", encoding="utf-8") as f:
            json.dump(out, f, indent=2, ensure_ascii=False)


if __name__ == "__main__":
    main()
