"""Command-line interface.

Replaces the reference's loose scripts (``python ingest_legal_docs.py``,
``python create_vector_store.py``, ``uvicorn src.server.app:app`` —
reference README.md:139-142) with one entry point:

    python -m legal_rag_tpu ingest  --docs DIR --out chunks.json
    python -m legal_rag_tpu build   --source DIR_OR_JSON --store DIR
    python -m legal_rag_tpu search  --store DIR --query "..." [--k 5]
    python -m legal_rag_tpu serve   --store DIR [--port 8000]
    python -m legal_rag_tpu eval    --store DIR [--report out.json]
    python -m legal_rag_tpu eval-retrieval --store DIR [--finetune-steps N]
    python -m legal_rag_tpu finetune --store DIR --out tuned.npz
    python -m legal_rag_tpu convert --checkpoint model.bin --out params.npz
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_ingest(args) -> int:
    from legal_rag_tpu.ingest import parse_corpus
    from legal_rag_tpu.ingest.pipeline import law_counts

    chunks = parse_corpus(args.docs)
    data = []
    for c in chunks:
        d = c.to_reference_dict()
        d["section_id"] = c.section_id
        data.append(d)
    with open(args.out, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=2)
    if args.debug_dump:
        # human-auditable dry-run dump (reference
        # ingest_legal_docs.py:300-307 writes debug_chunks.txt)
        with open(args.debug_dump, "w", encoding="utf-8") as f:
            for i, (c, d) in enumerate(zip(chunks, data)):
                meta = {
                    k: v for k, v in d.get("metadata", {}).items()
                    if v is not None
                }
                f.write(f"--- CHUNK {i+1} ---\n")
                f.write(f"METADATA: {json.dumps(meta, ensure_ascii=False)}\n")
                f.write(f"CONTENT:\n{d['text']}\n\n")
        print(f"debug dump -> {args.debug_dump}")
    print(f"{len(chunks)} chunks -> {args.out}")
    for law, count in law_counts(chunks).items():
        print(f"  {law}: {count}")
    return 0


def _cmd_build(args) -> int:
    from legal_rag_tpu.index.builder import build_index

    store = build_index(
        args.source,
        store_dir=args.store,
        finetune_steps=args.finetune_steps,
        finetune_token_weight=args.finetune_token_weight,
        finetune_augment=args.finetune_augment,
        finetune_augment_kinds=args.finetune_augment_kinds,
        pq_m=args.pq_m,
        ivf_cell_size=args.ivf_cell_size,
        rerank_steps=args.rerank_steps,
        rerank_sibling_prob=args.rerank_sibling_prob,
        multi_vector=args.multi_vector,
        log_fn=(
            print
            if (args.finetune_steps or args.pq_m or args.rerank_steps
                or args.multi_vector or args.ivf_cell_size)
            else None
        ),
    )
    print(
        f"index built: {store.n_docs} docs x {store.dim}d, "
        f"bm25 vocab {store.bm25.vocab_size} -> {args.store}"
    )
    return 0


def _cmd_search(args) -> int:
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    store = VectorStore.load(args.store)
    engine = RetrievalEngine(store)
    if args.mode:
        rows = engine.search_batch(
            [args.query], k=args.k, hybrid_weights=[args.weight],
            mode=args.mode,
        )[0]
        results = [r.to_dict() for r in rows]
    else:
        results = engine.search(
            args.query, k=args.k, hybrid_weight=args.weight
        )
    for i, r in enumerate(results, 1):
        header = r["chunk"]["canonical_header"].replace("\n", " | ")
        print(
            f"[{i}] score={r['score']:.4f} sem={r['semantic']:.4f} "
            f"kw={r['keyword']:.4f}  {header}"
        )
    return 0


def _cmd_serve(args) -> int:
    import asyncio
    import logging

    from legal_rag_tpu.server.app import run_server

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    )
    config = None
    if args.dense_dtype:
        import dataclasses

        from legal_rag_tpu.config import DEFAULT_CONFIG

        config = dataclasses.replace(
            DEFAULT_CONFIG,
            dense=dataclasses.replace(
                DEFAULT_CONFIG.dense, dtype=args.dense_dtype
            ),
        )
    asyncio.run(
        run_server(store_dir=args.store, port=args.port, config=config)
    )
    return 0


def _cmd_finetune(args) -> int:
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.models.convert import save_params_npz
    from legal_rag_tpu.models.finetune import finetune_encoder
    from legal_rag_tpu.parallel.mesh import make_mesh
    from legal_rag_tpu.retrieval.engine import RetrievalEngine

    store = VectorStore.load(args.store)
    engine = RetrievalEngine(store)
    mesh = make_mesh()
    tuned, losses = finetune_encoder(
        engine.encoder,
        [c["text"] for c in store.chunks],
        mesh,
        steps=args.steps,
        batch_size=args.batch,
        learning_rate=args.lr,
        log_fn=print,
        chunks=store.chunks,
    )
    save_params_npz(tuned.params, args.out)
    print(
        f"fine-tuned {args.steps} steps "
        f"(loss {losses[0]:.3f} -> {losses[-1]:.3f}); params -> {args.out}\n"
        f"rebuild the index with these weights to serve them."
    )
    return 0


def _cmd_convert(args) -> int:
    """Convert an HF BertModel checkpoint directory to framework npz."""
    from legal_rag_tpu.config import EncoderConfig
    from legal_rag_tpu.models.convert import convert_hf_bert, save_params_npz

    import torch  # local conversion only; never needed at serve time

    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    params = convert_hf_bert(sd, EncoderConfig())
    save_params_npz(params, args.out)
    print(f"converted {args.checkpoint} -> {args.out}")
    return 0


def _cmd_eval(args) -> int:
    from legal_rag_tpu.quality import run_quality_eval

    report = run_quality_eval(
        args.store, report_path=args.report,
        include_paraphrase=args.include_paraphrase,
    )
    passed = sum(1 for r in report["results"] if r["passed"])
    print(f"quality eval: {passed}/{len(report['results'])} passed")
    ok = passed == len(report["results"])
    if args.include_paraphrase:
        para = report["paraphrase"]
        print(
            f"paraphrase gate: {para['passed']}/{para['total']} grounded "
            f"(threshold {para['threshold']}) -> "
            f"{'PASS' if para['gate_passed'] else 'FAIL'}"
        )
        ok = ok and para["gate_passed"]
    return 0 if ok else 1


def _cmd_eval_gate(args) -> int:
    """Big-split retrieval gate: pinned serving thresholds over the
    structure + sibling-span splits (quality.py
    RETRIEVAL_GATE_THRESHOLDS)."""
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.quality import run_retrieval_gate

    store = VectorStore.load(args.store)
    report = run_retrieval_gate(
        store, max_queries=args.max_queries, report_path=args.report
    )
    for c in report["checks"]:
        status = "PASS" if c["passed"] else "FAIL"
        print(
            f"  [{status}] {c['split']}/{c['mode']} {c['metric']}: "
            f"{c['measured']:.4f} (floor {c['threshold']})"
        )
    print(f"retrieval gate: {'PASS' if report['gate_passed'] else 'FAIL'}")
    return 0 if report["gate_passed"] else 1


def _cmd_eval_retrieval(args) -> int:
    """Retrieval-quality recall@k over corpus-structure queries, per
    mode (dense/bm25/weighted/rrf); optionally the random-vs-fine-tuned
    encoder ablation."""
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.evaluation import (
        compare_encoders, evaluate_store, labeled_pairs_from_chunks,
    )

    store = VectorStore.load(args.store)

    def show(title, modes):
        print(title)
        for mode, m in modes.items():
            cells = "  ".join(f"{k}={v:.3f}" for k, v in m.items())
            print(f"  {mode:<9} {cells}")

    if args.rerank_steps:
        from legal_rag_tpu.evaluation import evaluate_rerank
        from legal_rag_tpu.models.cross_encoder import (
            CrossEncoder, train_cross_encoder,
        )
        from legal_rag_tpu.retrieval.engine import RetrievalEngine

        engine = RetrievalEngine(store)
        ce = CrossEncoder(engine.encoder)
        train_cross_encoder(
            ce, [c["text"] for c in store.chunks],
            steps=args.rerank_steps, log_fn=print,
        )
        pairs = labeled_pairs_from_chunks(
            store.chunks, max_pairs=args.max_pairs
        )
        print(f"{len(pairs)} labeled structure queries")
        report = evaluate_rerank(store, pairs, ce, engine=engine)
        show(f"rerank over {report['base_mode']} top-"
             f"{report['candidates']}:", report["modes"])
    elif args.finetune_steps:
        report = compare_encoders(
            store.chunks,
            finetune_steps=args.finetune_steps,
            max_pairs=args.max_pairs,
            log_fn=print,
        )
        show("random-init encoder:", report["random_encoder"])
        show("fine-tuned encoder:", report["finetuned_encoder"])
    else:
        from legal_rag_tpu.evaluation import sibling_span_pairs_from_chunks
        from legal_rag_tpu.retrieval.engine import RetrievalEngine

        pairs = labeled_pairs_from_chunks(
            store.chunks, max_pairs=args.max_pairs
        )
        print(f"{len(pairs)} labeled structure queries")
        modes = ["dense", "bm25", "weighted", "rrf"]
        if args.include_pq:
            modes.append("pq")   # capacity-tier candidate coverage
        if args.include_maxsim:
            # full-scan + capacity-safe dense-first variants
            modes.extend(["maxsim", "maxsim-rerank"])
        engine = RetrievalEngine(store)
        report = evaluate_store(
            store, pairs, modes=tuple(modes), engine=engine
        )
        show("store encoder (structure/title split):", report["modes"])

        # paraphrase split: a natural span from one chunk of a
        # multi-chunk section retrieves the section's OTHER chunks
        # (source masked) — winnable only through section-level
        # semantics, the thing the sibling fine-tune trains
        para = sibling_span_pairs_from_chunks(
            store.chunks, max_pairs=args.max_pairs
        )
        print(f"{len(para)} sibling-span (paraphrase) queries")
        para_report = evaluate_store(
            store, para, modes=tuple(m for m in modes if m != "pq"),
            engine=engine,
        )
        show("store encoder (paraphrase/sibling-span split):",
             para_report["modes"])
        from legal_rag_tpu.quality import _provenance

        report = {
            "structure": report,
            "paraphrase": para_report,
            "provenance": _provenance(engine),
        }
    if args.report:
        with open(args.report, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)
        print(f"report -> {args.report}")
    return 0


def main(argv=None) -> int:
    # warm-restart amortization: honor LEGAL_RAG_COMPILE_CACHE_DIR for
    # every subcommand (must run before the first jit compile)
    from legal_rag_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    parser = argparse.ArgumentParser(prog="legal_rag_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("ingest", help="parse legal markdown into chunks")
    p.add_argument("--docs", required=True)
    p.add_argument("--out", default="legal_chunks.json")
    p.add_argument(
        "--debug-dump", default="debug_chunks.txt",
        help="human-auditable chunk dump (reference "
             "ingest_legal_docs.py:300-307); '' disables",
    )
    p.set_defaults(fn=_cmd_ingest)

    p = sub.add_parser("build", help="build the vector store")
    p.add_argument("--source", required=True,
                   help="documents dir or chunks json")
    p.add_argument("--store", required=True)
    p.add_argument(
        "--finetune-steps", type=int, default=0,
        help="contrastive encoder fine-tune steps before encoding "
             "(0 = off; ~300 lifts dense recall materially)",
    )
    p.add_argument(
        "--pq-m", type=int, default=0,
        help="train product-quantization codebooks with m subspaces "
             "(m bytes/doc; 0 = off) so serving can use the "
             "dense.dtype='pq' capacity tier without boot-time k-means",
    )
    p.add_argument(
        "--ivf-cell-size", type=int, default=0, dest="ivf_cell_size",
        help="with --pq-m: cluster the corpus into balanced cells of "
             "this many docs for IVF coarse pruning — serving scans "
             "only dense.ivf_probes cells/shard (o(N)) instead of all "
             "codes; 0 = off, 1024 is a good cell size at 1M+ docs. "
             "Measured recovery contract at 1M clustered docs "
             "(EVAL_IVF_RECOVERY.json): serve with dense.ivf_probes=512 "
             "and dense.pq_oversample=64 for post-rescore recall@10 "
             ">= 0.95; lower probe counts trade recall for scan time",
    )
    p.add_argument(
        "--rerank-steps", type=int, default=0, dest="rerank_steps",
        help="train + persist the cross-encoder reranker checkpoint "
             "(0 = off); stores carrying it serve with the joint-"
             "attention precision stage auto-enabled",
    )
    p.add_argument(
        "--finetune-token-weight", type=float, default=0.0,
        dest="finetune_token_weight", metavar="W",
        help="blend a token-level late-interaction InfoNCE term into "
             "the encoder finetune (trains the per-token states the "
             "--multi-vector tier serves). Measured at W=0.5: free for "
             "dense, lifts every MaxSim metric (full-scan structure "
             "MRR 0.926->0.949, EVAL_RETRIEVAL_TOKCO.json) — use 0.5 "
             "when building a --multi-vector store; 0 (default) keeps "
             "the pooled-only recipe",
    )
    p.add_argument(
        "--finetune-augment", type=float, default=0.0,
        dest="finetune_augment", metavar="P",
        help="probability a finetune query span is augmented (register "
             "substitution / word dropout / unique-token rebuild, "
             "models/finetune.py augment_query) — trains the everyday-"
             "register bridge the paraphrase E2E diagnosis showed the "
             "pooled recipe lacks; 0 (default) keeps the round-4 recipe",
    )
    p.add_argument(
        "--finetune-augment-kinds", default="",
        dest="finetune_augment_kinds", metavar="K1,K2",
        help="restrict the augmentation mix to a comma-separated subset "
             "of register,dropout,unique (with --finetune-augment). The "
             "uniform 3-kind mix measured as a regression on every gate "
             "(BASELINE.md round-5 augmentation table); empty (default) "
             "keeps the uniform mix",
    )
    p.add_argument(
        "--rerank-sibling-prob", type=float, default=0.0,
        dest="rerank_sibling_prob", metavar="P",
        help="probability a CE training group's positive is a SIBLING "
             "chunk of the span's section (paraphrase-aware candidate "
             "recipe — measured at P=0.5/12k steps it FAILS the "
             "held-out gate, see EVAL_CE_SIBLING_GATE.json); 0 (the "
             "serving default) keeps the span/title recipe",
    )
    p.add_argument(
        "--multi-vector", type=int, default=0, metavar="TOKEN_BUDGET",
        help="persist per-chunk token embeddings (first N WordPiece "
             "tokens) enabling the ColBERT-style late-interaction tier "
             "(`search --mode maxsim`); 0 = off, 32 is a good budget",
    )
    p.set_defaults(fn=_cmd_build)

    p = sub.add_parser("search", help="query a store from the CLI")
    p.add_argument("--store", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--weight", type=float, default=0.5)
    p.add_argument(
        "--mode", default=None,
        choices=["weighted", "rrf", "maxsim", "maxsim-rerank"],
        help="fusion/scoring mode (default: config fusion mode; "
             "maxsim/maxsim-rerank need a store built with "
             "--multi-vector; -rerank late-interacts only the dense "
             "top-C candidates — the capacity-safe variant)",
    )
    p.set_defaults(fn=_cmd_search)

    p = sub.add_parser("serve", help="run the HTTP server")
    p.add_argument("--store", required=True)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument(
        "--dense-dtype", default=None,
        choices=["float32", "bfloat16", "int8", "pq"],
        help="dense storage tier for serving: exact fp32 (default), "
             "bf16 (2x less HBM), int8 (4x, exact via rescore), or pq "
             "(32x, build the store with --pq-m first). Env equivalent: "
             "LEGAL_RAG_DENSE_DTYPE",
    )
    p.set_defaults(fn=_cmd_serve)

    p = sub.add_parser("eval", help="run the quality gate")
    p.add_argument("--store", required=True)
    p.add_argument("--report", default="quality_report.json")
    p.add_argument(
        "--include-paraphrase", action="store_true",
        help="also run the 10-query paraphrase grounding gate "
             "(serving stores must ground >= the pinned threshold; "
             "untrained stores are expected to fail it)",
    )
    p.set_defaults(fn=_cmd_eval)

    p = sub.add_parser(
        "eval-gate",
        help="big-split retrieval gate with pinned serving thresholds "
             "(structure RRF + sibling dense recall floors)",
    )
    p.add_argument("--store", required=True)
    p.add_argument("--report", default=None)
    p.add_argument(
        "--max-queries", type=int, default=None,
        help="cap each split (CI / smoke runs); serving gate runs full",
    )
    p.set_defaults(fn=_cmd_eval_gate)

    p = sub.add_parser(
        "eval-retrieval",
        help="recall@k per retrieval mode over corpus-structure queries",
    )
    p.add_argument("--store", required=True)
    p.add_argument("--report", default=None)
    p.add_argument("--max-pairs", type=int, default=None)
    p.add_argument(
        "--finetune-steps", type=int, default=0,
        help="also run the random-vs-fine-tuned encoder ablation",
    )
    p.add_argument(
        "--rerank-steps", type=int, default=0,
        help="train a cross-encoder reranker for N steps and report "
             "base-vs-reranked recall/MRR",
    )
    p.add_argument(
        "--include-pq", action="store_true",
        help="also score the PQ capacity tier (dense-only through the "
             "4-bit codes + rescore) — its gap vs 'dense' is the "
             "measured cost of 32x compression on this corpus",
    )
    p.add_argument(
        "--include-maxsim", action="store_true",
        help="also score the late-interaction (MaxSim) tier — needs a "
             "store built with --multi-vector; its delta vs 'dense' is "
             "what token-level interaction buys",
    )
    p.set_defaults(fn=_cmd_eval_retrieval)

    p = sub.add_parser(
        "finetune", help="contrastively adapt the encoder to the corpus"
    )
    p.add_argument("--store", required=True)
    p.add_argument("--out", default="encoder_tuned.npz")
    def _positive(v):
        iv = int(v)
        if iv < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return iv

    p.add_argument("--steps", type=_positive, default=200)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-5)
    p.set_defaults(fn=_cmd_finetune)

    p = sub.add_parser(
        "convert", help="convert an HF BertModel state_dict to npz params"
    )
    p.add_argument("--checkpoint", required=True,
                   help="path to pytorch_model.bin / .pt state_dict")
    p.add_argument("--out", default="encoder_params.npz")
    p.set_defaults(fn=_cmd_convert)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
