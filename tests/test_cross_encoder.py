"""Cross-encoder reranker: pair encoding, scoring shapes, listwise
training, and rerank-improves-ranking on a separable toy task."""

import numpy as np
import pytest

from legal_rag_tpu.config import RetrievalConfig, EncoderConfig
from legal_rag_tpu.models.cross_encoder import (
    CrossEncoder, train_cross_encoder,
)
from legal_rag_tpu.models.encoder import SentenceEncoder

CFG = EncoderConfig(
    vocab_size=600, hidden=32, layers=1, heads=4,
    intermediate=64, max_len=64,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    words = [f"tok{i}" for i in range(40)]
    texts = []
    for i in range(12):
        own = words[3 * (i % 13) : 3 * (i % 13) + 3]
        texts.append(" ".join(list(own) * 4))
    return texts


@pytest.fixture(scope="module")
def ce(corpus):
    enc = SentenceEncoder(cfg=CFG, vocab_corpus=corpus)
    return CrossEncoder(enc, seed=0)


def test_pair_encoding_structure(ce):
    ids, mask, tt = ce.encode_pairs(
        ["tok0 tok1", "tok3"], ["tok0 tok0 tok1", "tok9 tok10"]
    )
    assert ids.shape == mask.shape == tt.shape
    tok = ce.tokenizer
    for row_ids, row_mask, row_tt in zip(ids, mask, tt):
        real = row_ids[row_mask > 0]
        assert real[0] == tok.cls_id
        assert (real == tok.sep_id).sum() == 2
        # segment 0 covers [CLS]+query+[SEP], segment 1 the doc+[SEP]
        n_real = int(row_mask.sum())
        seg = row_tt[:n_real]
        flip = int(np.argmax(seg))       # first 1
        assert (seg[:flip] == 0).all() and (seg[flip:] == 1).all()
        # padding is type 0
        assert (row_tt[n_real:] == 0).all()


def test_query_never_squeezes_out_doc(ce):
    ids, mask, tt = ce.encode_pairs(
        ["tok0 " * 200], ["tok5 tok6 tok7"], max_len=64
    )
    # the doc segment survives truncation
    assert (tt[0][mask[0] > 0] == 1).sum() >= 4


def test_scores_and_rerank_shapes(ce, corpus):
    s = ce.score_pairs(["tok0 tok1"] * 3, corpus[:3])
    assert s.shape == (3,)
    order = ce.rerank("tok0 tok1 tok2", corpus[:5])
    assert sorted(order) == list(range(5))


def test_listwise_training_learns_toy_relevance(corpus):
    enc = SentenceEncoder(cfg=CFG, vocab_corpus=corpus)
    ce = CrossEncoder(enc, seed=0)
    losses = train_cross_encoder(
        ce, corpus, steps=120, batch_size=4, learning_rate=1e-3,
        max_len=32, seed=0,
    )
    assert np.mean(losses[-5:]) < 0.8 * np.mean(losses[:5])
    # after training, the matching doc ranks clearly above chance:
    # random MRR over 12 docs is ~0.26; measured ~0.52 at these params
    rr = []
    for i in range(12):
        own = corpus[i].split()[0:3]
        order = ce.rerank(" ".join(own), corpus)
        rr.append(1.0 / (order.index(i) + 1))
    assert np.mean(rr) > 0.38


def test_evaluate_rerank_report(corpus):
    from legal_rag_tpu.evaluation import evaluate_rerank
    from legal_rag_tpu.index.builder import build_index

    chunks = [
        {"text": f"H\n\n{t}", "canonical_header": "H",
         "metadata": {"law": "BNS", "section": str(i),
                      "section_title": f"Topic number {i}"}}
        for i, t in enumerate(corpus)
    ]
    rcfg = RetrievalConfig(encoder=CFG)
    store = build_index(chunks, config=rcfg)
    enc = SentenceEncoder(cfg=CFG, vocab_corpus=[c["text"] for c in chunks])
    ce = CrossEncoder(enc)
    pairs = [(corpus[i].split()[0], [i]) for i in range(4)]
    report = evaluate_rerank(store, pairs, ce, candidates=8, ks=(1, 5),
                             config=rcfg)
    assert set(report["modes"]) == {"base", "reranked"}
    for m in report["modes"].values():
        assert 0.0 <= m["mrr"] <= 1.0

    # the one-pass alpha grid must match separate per-alpha calls (the
    # gate runs the expensive retrieval + CE forward once and blends
    # host-side per alpha)
    grid = (0.25, 1.0)
    multi = evaluate_rerank(store, pairs, ce, candidates=8, ks=(1, 5),
                            config=rcfg, alphas=grid)
    assert multi["best_alpha"] in grid
    for a in grid:
        single = evaluate_rerank(store, pairs, ce, candidates=8,
                                 ks=(1, 5), config=rcfg, alpha=a)
        assert (multi["modes"][f"reranked@{a}"]
                == single["modes"]["reranked"])


def test_ce_checkpoint_roundtrip_and_facade_autoenable(
    corpus, tmp_path, monkeypatch,
):
    """build(rerank_steps=N) persists the trained cross-encoder in the
    store (cross_encoder.npz, sha256'd) WHEN it passes the validation
    gate; LegalEngine auto-enables the precision stage for such stores
    and its reranked results carry retrieval_score/rerank_score
    provenance. (The gate itself is deterministic-stubbed here; its
    reject path has its own test.)"""
    from legal_rag_tpu import evaluation as eval_mod
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.index.store import VectorStore
    from legal_rag_tpu.retrieval.facade import LegalEngine

    monkeypatch.setattr(
        eval_mod, "evaluate_rerank",
        lambda *a, alphas=(0.1,), **kw: {
            "best_alpha": alphas[0],
            "modes": {
                "base": {"mrr": 0.5},
                "reranked": {"mrr": 0.6},
                **{f"reranked@{al}": {"mrr": 0.6} for al in alphas},
            },
        },
    )

    chunks = [
        {"text": t, "canonical_header": f"H{i}",
         "metadata": {"law": "BNS", "section": str(i),
                      "section_title": f"Topic number {i}",
                      "unit_type": "section"},
         "section_id": f"BNS_{i}"}
        for i, t in enumerate(corpus)
    ]
    rcfg = RetrievalConfig(encoder=CFG)
    store = build_index(
        chunks, config=rcfg, store_dir=tmp_path, rerank_steps=4,
    )
    assert store.ce_params is not None
    assert "cross_encoder.npz" in store.manifest["artifacts"]

    loaded = VectorStore.load(tmp_path)
    assert loaded.ce_params is not None

    eng = LegalEngine(store=loaded, config=rcfg, use_llm=False)
    assert eng.orchestrator.reranker is not None   # auto-enabled
    out = eng.orchestrator.orchestrate(corpus[2].split()[0], k=3)
    res = out["results"]
    assert res and all("rerank_score" in r for r in res)
    assert all("retrieval_score" in r for r in res)

    # forced off: no reranker, results carry plain retrieval scores
    eng_off = LegalEngine(
        store=loaded, config=rcfg, use_llm=False, rerank=False,
    )
    assert eng_off.orchestrator.reranker is None
    out_off = eng_off.orchestrator.orchestrate(corpus[2].split()[0], k=3)
    assert all("rerank_score" not in r for r in out_off["results"])


def test_rerank_stage_orders_by_ce_score(corpus):
    """The orchestrator's rerank stage must reorder the pool by the
    cross-encoder's joint score (desc) and normalize scores to [0,1]."""
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.engine import RetrievalEngine
    from legal_rag_tpu.retrieval.orchestrator import LegalOrchestrator

    chunks = [
        {"text": t, "canonical_header": f"H{i}",
         "metadata": {"law": "BNS", "section": str(i),
                      "unit_type": "section"}}
        for i, t in enumerate(corpus)
    ]
    rcfg = RetrievalConfig(encoder=CFG)
    store = build_index(chunks, config=rcfg)
    engine = RetrievalEngine(store, config=rcfg)

    class FakeCE:
        def score_pairs(self, queries, docs):
            # longer text = more relevant, a deterministic fake signal
            return np.array([float(len(d)) for d in docs])

    orch = LegalOrchestrator(
        engine, llm=None, reranker=FakeCE(), rerank_candidates=6,
    )
    reranked = orch.rerank_results(
        "q", [
            {"score": 0.9, "chunk": chunks[0]},
            {"score": 0.5, "chunk": {"text": "x" * 500,
                                     "canonical_header": "L",
                                     "metadata": {}}},
            {"score": 0.1, "chunk": chunks[1]},
        ],
    )
    assert reranked[0]["chunk"]["canonical_header"] == "L"
    scores = [r["score"] for r in reranked]
    assert scores == sorted(scores, reverse=True)
    assert max(scores) == 1.0 and min(scores) == 0.0


def test_ce_validation_gate_rejects_harmful_reranker(
    corpus, tmp_path, monkeypatch,
):
    """Measured on the real corpus: an undertrained cross-encoder can
    DESTROY ranking (RRF recall@1 0.86 -> 0.09). Since serving
    auto-enables the stage whenever a checkpoint exists, the build gate
    must refuse to persist a reranker that scores worse than the base
    retrieval on the corpus-structure eval queries."""
    from legal_rag_tpu import evaluation as eval_mod
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.facade import LegalEngine

    monkeypatch.setattr(
        eval_mod, "evaluate_rerank",
        lambda *a, alphas=(0.1,), **kw: {
            "best_alpha": alphas[0],
            "modes": {
                "base": {"mrr": 0.9},
                "reranked": {"mrr": 0.2},
                **{f"reranked@{al}": {"mrr": 0.2} for al in alphas},
            },
        },
    )
    chunks = [
        {"text": t, "canonical_header": f"H{i}",
         "metadata": {"law": "BNS", "section": str(i),
                      "section_title": f"Topic number {i}",
                      "unit_type": "section"},
         "section_id": f"BNS_{i}"}
        for i, t in enumerate(corpus)
    ]
    rcfg = RetrievalConfig(encoder=CFG)
    logs = []
    store = build_index(
        chunks, config=rcfg, store_dir=tmp_path, rerank_steps=4,
        log_fn=logs.append,
    )
    assert store.ce_params is None
    assert "cross_encoder.npz" not in store.manifest["artifacts"]
    assert any("REJECTED" in m for m in logs)

    # serving therefore does NOT auto-enable, and forcing it on is a
    # loud error rather than silent quality loss
    eng = LegalEngine(store=store, config=rcfg, use_llm=False)
    assert eng.orchestrator.reranker is None
    with pytest.raises(ValueError):
        LegalEngine(store=store, config=rcfg, use_llm=False, rerank=True)


def test_hard_negative_miner_excludes_positives(corpus):
    from legal_rag_tpu.models.cross_encoder import make_hard_negative_miner

    mine = make_hard_negative_miner(corpus)
    rng = np.random.default_rng(0)
    # corpus[0] and its lexical twins share tokens; excluding {0, 1}
    # must keep both out even when BM25 ranks them on top
    negs = mine(corpus[0].split()[0], [0, 1], 5, rng)
    assert len(negs) == 5
    assert 0 not in negs and 1 not in negs
    assert all(0 <= d < len(corpus) for d in negs)


def test_hard_negative_training_learns_toy_relevance(corpus):
    from legal_rag_tpu.models.cross_encoder import train_cross_encoder_hard

    enc = SentenceEncoder(cfg=CFG, vocab_corpus=corpus)
    ce = CrossEncoder(enc, seed=0)
    # titles made of the chunk's own tokens, so the title-query half of
    # the training mix is learnable under the toy corpus-only vocab
    chunks = [
        {"text": t, "canonical_header": "H",
         "metadata": {"law": "BNS", "section": str(i),
                      "section_title": " ".join(t.split()[:3])}}
        for i, t in enumerate(corpus)
    ]
    # the listwise loss plateaus near ln(group) for ~100 steps before
    # breaking out (same shape as the B x B trainer's curve) — 200
    # steps lands well past the knee
    losses = train_cross_encoder_hard(
        ce, corpus, chunks=chunks, steps=200, batch_queries=4, n_neg=3,
        learning_rate=2e-3, max_len=32, seed=0,
    )
    assert np.mean(losses[-5:]) < 0.8 * np.mean(losses[:5])
    rr = []
    for i in range(12):
        own = corpus[i].split()[0:3]
        order = ce.rerank(" ".join(own), corpus)
        rr.append(1.0 / (order.index(i) + 1))
    assert np.mean(rr) > 0.38


def test_sibling_positive_training_runs_and_excludes(corpus):
    """Round-4 paraphrase-aware recipe: sibling groups sample a span
    from one chunk with ANOTHER chunk of the same section as the
    positive; the whole section is excluded from negative mining. On
    the warmup (random-negative) phase the loss must fall, proving the
    group construction feeds the listwise loss coherently."""
    from legal_rag_tpu.models.cross_encoder import (
        CrossEncoder, train_cross_encoder_hard,
    )

    enc = SentenceEncoder(cfg=CFG, vocab_corpus=corpus)
    ce = CrossEncoder(enc, seed=0)
    # two chunks per section (same law+section metadata)
    chunks = [
        {"text": t, "canonical_header": "H",
         "metadata": {"law": "BNS", "section": str(i // 2),
                      "section_title": " ".join(t.split()[:2])}}
        for i, t in enumerate(corpus)
    ]
    losses = train_cross_encoder_hard(
        ce, corpus, chunks=chunks, steps=80, batch_queries=4, n_neg=3,
        learning_rate=2e-3, max_len=32, seed=0, sibling_prob=1.0,
        warmup_frac=1.0,
    )
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sibling_prob_without_chunks_raises(corpus):
    from legal_rag_tpu.models.cross_encoder import (
        CrossEncoder, train_cross_encoder_hard,
    )

    enc = SentenceEncoder(cfg=CFG, vocab_corpus=corpus)
    ce = CrossEncoder(enc, seed=0)
    with pytest.raises(ValueError, match="sibling_prob"):
        train_cross_encoder_hard(
            ce, corpus, chunks=None, steps=2, sibling_prob=0.5,
        )


def test_ce_policy_alpha_by_query_form():
    """Per-query CE blend: heading-like (short) queries take the
    measured structure-split alpha; long descriptive queries and any
    victim-distress query keep the conservative serving alpha; None
    disables the policy entirely."""
    from legal_rag_tpu.models.cross_encoder import (
        HEADING_MAX_WORDS, ce_policy_alpha,
    )

    short = "punishment for robbery"
    long_q = " ".join(["word"] * (HEADING_MAX_WORDS + 1))
    assert ce_policy_alpha(short, 0.1, 0.7) == 0.7
    assert ce_policy_alpha(long_q, 0.1, 0.7) == 0.1
    assert ce_policy_alpha(short, 0.1, 0.7, distress=True) == 0.1
    assert ce_policy_alpha(short, 0.1, None) == 0.1
    assert ce_policy_alpha(long_q, 0.1, None) == 0.1


def test_rerank_stage_applies_heading_alpha(corpus):
    """With rerank_alpha_heading set, a short heading-like query blends
    at the heading alpha (CE dominates) while rerank_alpha=0 would have
    left base order untouched."""
    from legal_rag_tpu.index.builder import build_index
    from legal_rag_tpu.retrieval.engine import RetrievalEngine
    from legal_rag_tpu.retrieval.orchestrator import LegalOrchestrator

    chunks = [
        {"text": t, "canonical_header": f"H{i}",
         "metadata": {"law": "BNS", "section": str(i),
                      "unit_type": "section"}}
        for i, t in enumerate(corpus)
    ]
    rcfg = RetrievalConfig(encoder=CFG)
    store = build_index(chunks, config=rcfg)
    engine = RetrievalEngine(store, config=rcfg)

    class FakeCE:
        def score_pairs(self, queries, docs):
            return np.array([float(len(d)) for d in docs])

    pool = [
        {"score": 0.9, "chunk": chunks[0]},
        {"score": 0.5, "chunk": {"text": "x" * 500,
                                 "canonical_header": "L",
                                 "metadata": {}}},
        {"score": 0.1, "chunk": chunks[1]},
    ]
    # alpha=0 (CE silenced) but heading alpha 1.0: a short query must
    # still be reordered by the CE
    orch = LegalOrchestrator(
        engine, llm=None, reranker=FakeCE(), rerank_candidates=6,
        rerank_alpha=0.0, rerank_alpha_heading=1.0,
    )
    out = orch.rerank_results("short query", [dict(r) for r in pool])
    assert out[0]["chunk"]["canonical_header"] == "L"

    # the same pool under a LONG query keeps base order (alpha=0)
    long_q = " ".join(["w"] * 20)
    out2 = orch.rerank_results(long_q, [dict(r) for r in pool])
    assert out2[0]["chunk"]["canonical_header"] == "H0"
