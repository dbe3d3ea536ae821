"""Sparse-side levers for the paraphrase (sibling-span) split — CPU-only.

The sibling-span split (evaluation.sibling_span_pairs_from_chunks) is
the instrument where word-level BM25 is weakest: the query span's exact
text occurs nowhere in the relevant sibling chunks, so lexical overlap
is limited to shared section vocabulary. Two classic sparse levers can
recover signal without touching the encoder (and therefore measure on
one CPU core, no accelerator, no finetune):

1. character n-gram BM25 — morphology-level overlap ("punishable" ~
   "punishment", "abetment" ~ "abets") that word tokens miss entirely;
2. pseudo-relevance feedback (PRF / RM-style) — expand the query with
   the highest-impact terms of the first-pass top docs, which for a
   span query pulls in the section vocabulary its siblings share.

This experiment scores both (plus their RRF fusions with word BM25) on
the full sibling + structure splits of a store's chunks and prints a
table; the integration decision (engine tier or not) follows the
numbers. Everything mirrors ops/sparse.py build_bm25 exactly — the
variants differ only in tokenization / query construction.

Usage:
    python scripts/exp_paraphrase_sparse.py --store /tmp/eval_sib_store \
        [--report EVAL_SPARSE_PARAPHRASE.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from legal_rag_tpu.evaluation import (  # noqa: E402
    labeled_pairs_from_chunks,
    mrr_at_k,
    recall_at_k,
    sibling_span_pairs_from_chunks,
)
from legal_rag_tpu.ops.sparse import BM25Index, build_bm25, tokenize  # noqa: E402


# ---------------------------------------------------------------------------
# Char-ngram tokenization (fastText-style word-boundary markers)
# ---------------------------------------------------------------------------


def char_ngrams(word: str, nmin: int, nmax: int) -> List[str]:
    w = f"<{word}>"
    out = []
    for n in range(nmin, nmax + 1):
        if len(w) < n:
            break
        out.extend(w[i : i + n] for i in range(len(w) - n + 1))
    return out


def to_ngram_text(text: str, nmin: int, nmax: int) -> str:
    grams: List[str] = []
    for word in tokenize(text):
        grams.extend(char_ngrams(word, nmin, nmax))
    return " ".join(grams)


# ---------------------------------------------------------------------------
# Dense (full-corpus) BM25 scoring straight from the CSR index
# ---------------------------------------------------------------------------


def bm25_scores(index: BM25Index, query: str) -> np.ndarray:
    """Full [N] score vector for one query (numpy mirror of the device
    segsum scorer — fine at experiment scale)."""
    scores = np.zeros(index.n_docs, dtype=np.float64)
    counts: Dict[int, int] = {}
    for t in index.query_term_ids(query):
        counts[t] = counts.get(t, 0) + 1
    for t, mult in counts.items():
        lo, hi = int(index.indptr[t]), int(index.indptr[t + 1])
        scores[index.doc_ids[lo:hi]] += index.weights[lo:hi] * mult
    return scores


def scores_from_terms(
    index: BM25Index, term_weights: Dict[int, float]
) -> np.ndarray:
    scores = np.zeros(index.n_docs, dtype=np.float64)
    for t, wt in term_weights.items():
        lo, hi = int(index.indptr[t]), int(index.indptr[t + 1])
        scores[index.doc_ids[lo:hi]] += index.weights[lo:hi] * wt
    return scores


def prf_scores(
    index: BM25Index,
    query: str,
    fb_docs: int,
    fb_terms: int,
    beta: float,
    doc_term_cache: List[Optional[Dict[int, float]]],
    exclude: Optional[int] = None,
) -> np.ndarray:
    """Round 1 word BM25, expand with the top-``fb_terms`` impact terms
    of the top-``fb_docs`` docs, add beta-weighted expansion score."""
    base = bm25_scores(index, query)
    ranked = np.argsort(-base, kind="stable")
    picked: List[int] = []
    for d in ranked:
        if exclude is not None and int(d) == exclude:
            continue
        if base[d] <= 0.0:
            break
        picked.append(int(d))
        if len(picked) >= fb_docs:
            break
    agg: Dict[int, float] = {}
    qset = set(index.query_term_ids(query))
    for d in picked:
        terms = doc_term_cache[d]
        for t, impact in terms.items():
            if t in qset:
                continue
            agg[t] = agg.get(t, 0.0) + impact
    if not agg:
        return base
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:fb_terms]
    # normalize expansion weights to sum 1 so beta is comparable across
    # queries regardless of feedback-doc length
    total = sum(w for _, w in top)
    exp_terms = {t: w / total for t, w in top}
    return base + beta * scores_from_terms(index, exp_terms)


def build_doc_term_cache(index: BM25Index) -> List[Dict[int, float]]:
    """Per-doc map term -> BM25 impact (weight), from the CSR postings."""
    cache: List[Dict[int, float]] = [dict() for _ in range(index.n_docs)]
    v = index.vocab_size
    for t in range(v):
        lo, hi = int(index.indptr[t]), int(index.indptr[t + 1])
        w = index.weights[lo:hi]
        for off, d in enumerate(index.doc_ids[lo:hi]):
            cache[int(d)][t] = float(w[off])
    return cache


# ---------------------------------------------------------------------------
# Eval plumbing
# ---------------------------------------------------------------------------


def rrf_ranks(score_rows: Sequence[np.ndarray], k0: float = 60.0) -> np.ndarray:
    """RRF-fuse full score vectors: rank each, sum 1/(k0+rank)."""
    fused = np.zeros_like(score_rows[0])
    for s in score_rows:
        order = np.argsort(-s, kind="stable")
        ranks = np.empty_like(order)
        ranks[order] = np.arange(len(order))
        fused += 1.0 / (k0 + ranks + 1.0)
    return fused


def evaluate(
    name: str,
    score_fn,
    pairs: Sequence[Tuple],
    ks=(1, 5, 10),
    kmax: int = 11,
) -> Dict:
    n = len(pairs)
    ranked = np.full((n, kmax), -1, dtype=np.int64)
    for qi, p in enumerate(pairs):
        query = p[0]
        exclude = p[2] if len(p) > 2 else None
        s = score_fn(query, exclude)
        order = np.argsort(-s, kind="stable")[: kmax + 1]
        row = [int(d) for d in order if exclude is None or int(d) != exclude]
        ranked[qi, : min(len(row), kmax)] = row[:kmax]
    relevants = [p[1] for p in pairs]
    out = {f"recall@{k}": round(recall_at_k(ranked, relevants, k), 4) for k in ks}
    out["mrr"] = round(mrr_at_k(ranked, relevants, 10), 4)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", default="/tmp/eval_sib_store")
    ap.add_argument("--report", default=None)
    ap.add_argument("--nmin", type=int, default=3)
    ap.add_argument("--nmax", type=int, default=5)
    ap.add_argument("--fb-docs", type=int, default=3)
    ap.add_argument("--fb-terms", type=int, default=10)
    ap.add_argument("--beta", type=float, default=0.5)
    args = ap.parse_args()

    chunks = json.loads(
        (Path(args.store) / "chunks.json").read_text()
    )
    texts = [c["text"] for c in chunks]
    print(f"{len(chunks)} chunks from {args.store}")

    t0 = time.time()
    word_idx = build_bm25(texts)
    ngram_texts = [to_ngram_text(t, args.nmin, args.nmax) for t in texts]
    char_idx = build_bm25(ngram_texts)
    doc_terms = build_doc_term_cache(word_idx)
    print(
        f"indexes built in {time.time()-t0:.1f}s — word V={word_idx.vocab_size}, "
        f"char[{args.nmin},{args.nmax}] V={char_idx.vocab_size}"
    )

    splits = {
        "sibling": sibling_span_pairs_from_chunks(chunks),
        "structure": labeled_pairs_from_chunks(chunks),
    }
    for name, pairs in splits.items():
        print(f"split {name}: {len(pairs)} queries")

    def word_fn(q, _excl):
        return bm25_scores(word_idx, q)

    def char_fn(q, _excl):
        return bm25_scores(char_idx, to_ngram_text(q, args.nmin, args.nmax))

    def rrf_word_char(q, _excl):
        return rrf_ranks([word_fn(q, None), char_fn(q, None)])

    def prf_fn(q, _excl):
        return prf_scores(
            word_idx, q, args.fb_docs, args.fb_terms, args.beta, doc_terms
        )

    def prf_noself_fn(q, excl):
        # honest variant: the sibling split's source chunk (rank-1
        # lexical self-match) is barred from the feedback set, matching
        # real serving where no exact-match doc exists
        return prf_scores(
            word_idx, q, args.fb_docs, args.fb_terms, args.beta, doc_terms,
            exclude=excl,
        )

    def rrf_word_char_prf(q, excl):
        return rrf_ranks(
            [prf_noself_fn(q, excl), char_fn(q, None)]
        )

    variants = [
        ("word", word_fn),
        (f"char{args.nmin}{args.nmax}", char_fn),
        ("rrf(word,char)", rrf_word_char),
        (f"prf(b={args.beta},d={args.fb_docs},t={args.fb_terms})", prf_fn),
        ("prf-noself", prf_noself_fn),
        ("rrf(prf-noself,char)", rrf_word_char_prf),
    ]

    report = {"store": args.store, "params": vars(args), "splits": {}}
    for split_name, pairs in splits.items():
        report["splits"][split_name] = {"n_queries": len(pairs), "modes": {}}
        for vname, fn in variants:
            t0 = time.time()
            entry = evaluate(vname, fn, pairs)
            report["splits"][split_name]["modes"][vname] = entry
            print(
                f"[{split_name}] {vname:28s} r@10={entry['recall@10']:.4f} "
                f"mrr={entry['mrr']:.4f}  ({time.time()-t0:.0f}s)"
            )

    if args.report:
        Path(args.report).write_text(json.dumps(report, indent=2))
        print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
