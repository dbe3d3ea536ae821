"""Contrastive fine-tuning: the loss must decrease on the virtual mesh
and the tuned encoder must invalidate build caches."""

import numpy as np
import pytest

from legal_rag_tpu.config import RetrievalConfig, EncoderConfig
from legal_rag_tpu.models.encoder import SentenceEncoder
from legal_rag_tpu.models.finetune import finetune_encoder, make_pairs
from legal_rag_tpu.parallel.mesh import make_mesh

TINY = EncoderConfig(
    vocab_size=2000, hidden=32, layers=2, heads=4,
    intermediate=64, max_len=32,
)


@pytest.fixture(scope="module")
def corpus(corpus_texts):
    return corpus_texts


def test_make_pairs_shapes(corpus):
    rng = np.random.default_rng(0)
    stream = make_pairs(corpus, rng)
    for _ in range(10):
        q, d = next(stream)
        assert q and d
        assert all(w in d.split() for w in q.split()[:1])


def test_make_pairs_rejects_empty_corpus():
    with pytest.raises(ValueError):
        next(make_pairs(["", "   "], np.random.default_rng(0)))


def test_finetune_reduces_loss(corpus):
    encoder = SentenceEncoder(cfg=TINY, vocab_corpus=corpus)
    mesh = make_mesh(4)
    tuned, losses = finetune_encoder(
        encoder, corpus, mesh, steps=30, batch_size=16,
        learning_rate=1e-3, seed=0,
    )
    assert len(losses) == 30
    assert all(np.isfinite(losses))
    # substantial improvement over the first steps
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses[:5] + losses[-5:]
    # params actually changed; tokenizer shared
    assert tuned.tokenizer is encoder.tokenizer
    w0 = np.asarray(encoder.params["embeddings"]["word"])
    w1 = np.asarray(tuned.params["embeddings"]["word"])
    assert not np.allclose(w0, w1)


def test_tuned_encoder_invalidates_build_cache(corpus, tmp_path):
    import dataclasses

    from legal_rag_tpu.index.builder import build_index

    cfg = RetrievalConfig(encoder=TINY)
    chunks = [
        {"text": t, "metadata": {}, "canonical_header": f"H{i}"}
        for i, t in enumerate(corpus[:20])
    ]
    enc = SentenceEncoder(cfg=TINY, vocab_corpus=[c["text"] for c in chunks])
    s1 = build_index(chunks, encoder=enc, config=cfg, store_dir=tmp_path)
    mesh = make_mesh(2)
    tuned, _ = finetune_encoder(
        enc, corpus, mesh, steps=3, batch_size=8, learning_rate=1e-3
    )
    s2 = build_index(chunks, encoder=tuned, config=cfg, store_dir=tmp_path)
    assert s2.corpus_hash != s1.corpus_hash  # cache invalidated
    assert not np.allclose(s1.embeddings, s2.embeddings)


def _chunks_with_sections(corpus):
    # two multi-chunk sections + singletons
    chunks = []
    for i, t in enumerate(corpus[:12]):
        law, sec = ("BNS", str(1 + i % 2)) if i < 6 else ("BNSS", None)
        meta = {"law": law}
        if sec:
            meta["section"] = sec
        chunks.append({"text": t, "metadata": meta})
    return chunks


def test_sibling_pairs_bridge_sections(corpus):
    from legal_rag_tpu.models.finetune import make_sibling_pairs, section_groups

    chunks = _chunks_with_sections(corpus)
    groups = section_groups(chunks)
    assert sorted(len(g) for g in groups if len(g) >= 2) == [3, 3]
    texts = [c["text"] for c in chunks]
    by_text = {t: i for i, t in enumerate(texts)}
    section_of = {}
    for gi, g in enumerate(groups):
        for i in g:
            section_of[i] = gi

    rng = np.random.default_rng(0)
    stream = make_sibling_pairs(chunks, rng, sibling_prob=0.5)
    sibling_seen = same_seen = 0
    for _ in range(200):
        q, pos = next(stream)
        pos_id = by_text[pos]
        if all(w in pos.split() for w in q.split()):
            same_seen += 1
        else:
            # cross-chunk positive: the span's source must share pos's section
            src_candidates = [
                i for i in range(len(texts))
                if i != pos_id and all(w in texts[i].split() for w in q.split())
            ]
            assert any(
                section_of.get(i) == section_of.get(pos_id)
                for i in src_candidates
            ), (q, pos_id)
            sibling_seen += 1
    assert sibling_seen > 30 and same_seen > 30  # both modes exercised


def test_sibling_pairs_fall_back_without_groups(corpus):
    from legal_rag_tpu.models.finetune import make_sibling_pairs

    chunks = [{"text": t, "metadata": {}} for t in corpus[:5]]
    rng = np.random.default_rng(0)
    stream = make_sibling_pairs(chunks, rng, sibling_prob=0.9)
    for _ in range(20):
        q, pos = next(stream)  # no multi-chunk sections -> same-chunk only
        assert all(w in pos.split() for w in q.split())


def test_token_maxsim_cotraining_improves_maxsim_retrieval(corpus):
    """Round-4 late-interaction co-training: with token_maxsim_weight
    the loss stays finite on the mesh, params diverge from the
    pooled-only run (the term contributes gradient), and the tuned
    token states retrieve better under MaxSim than the untrained ones
    on a self-retrieval probe."""
    import jax.numpy as jnp
    from legal_rag_tpu.ops.maxsim import maxsim_topk

    mesh = make_mesh(4)
    enc0 = SentenceEncoder(cfg=TINY, vocab_corpus=corpus)
    base, _ = finetune_encoder(
        enc0, corpus, mesh, steps=25, batch_size=16,
        learning_rate=1e-3, seed=0,
    )
    enc1 = SentenceEncoder(cfg=TINY, vocab_corpus=corpus)
    tok, losses = finetune_encoder(
        enc1, corpus, mesh, steps=25, batch_size=16,
        learning_rate=1e-3, seed=0, token_maxsim_weight=1.0,
    )
    assert all(np.isfinite(losses))
    w_base = np.asarray(base.params["embeddings"]["word"])
    w_tok = np.asarray(tok.params["embeddings"]["word"])
    assert not np.allclose(w_base, w_tok)

    # MaxSim self-retrieval probe over 24 chunks: query = first words
    # of the chunk; the co-trained token states must beat random-init
    from legal_rag_tpu.ops.maxsim import minilm_token_embeddings

    subset = corpus[:24]
    queries = [" ".join(t.split()[:4]) for t in subset]

    def maxsim_r1(encoder):
        tokzr = encoder.tokenizer
        d_ids, d_mask = tokzr.encode_batch(list(subset), max_len=16)
        q_ids, q_mask = tokzr.encode_batch(queries, max_len=16)
        dt = minilm_token_embeddings(
            encoder.params, jnp.asarray(d_ids), jnp.asarray(d_mask),
            encoder.cfg,
        )
        qt = minilm_token_embeddings(
            encoder.params, jnp.asarray(q_ids), jnp.asarray(q_mask),
            encoder.cfg,
        )
        _, ids = maxsim_topk(
            qt, jnp.asarray(q_mask), dt, jnp.asarray(d_mask), k=1,
            block_n=8,
        )
        return float(np.mean(np.asarray(ids)[:, 0] == np.arange(24)))

    rand = maxsim_r1(SentenceEncoder(cfg=TINY, vocab_corpus=corpus))
    trained = maxsim_r1(tok)
    assert trained >= rand, (rand, trained)
    assert trained > 0.25, trained


def test_augment_query_register_substitution():
    from legal_rag_tpu.models.finetune import REGISTER_FORMS, augment_query

    rng = np.random.default_rng(0)
    span = "punishment for theft of movable property"
    # sample until the register branch fires; it must replace the
    # statute term with one of its everyday forms
    saw_register = False
    for _ in range(50):
        out = augment_query(span, "irrelevant positive text", rng)
        if "theft" not in out and any(
            f in out for f in REGISTER_FORMS["theft"]
        ):
            saw_register = True
            break
    assert saw_register


def test_augment_query_unique_rebuild_disjoint_from_positive():
    from legal_rag_tpu.models.finetune import augment_query

    rng = np.random.default_rng(1)
    span = "alpha bravo charlie delta echo foxtrot golf"
    pos = "charlie delta lives in the target document"
    saw_unique = False
    for _ in range(50):
        out = augment_query(span, pos, rng)
        toks = set(out.split())
        if toks and toks <= {"alpha", "bravo", "echo", "foxtrot", "golf"} \
                and len(toks) >= 3:
            saw_unique = True
            break
    assert saw_unique


def test_augment_query_never_empty():
    from legal_rag_tpu.models.finetune import augment_query

    rng = np.random.default_rng(2)
    for span in ("one two", "a b c d e f", "theft", "x"):
        for _ in range(30):
            out = augment_query(span, "", rng)
            assert out.split(), (span, out)


def test_sibling_pairs_augment_prob_changes_stream_only_when_set():
    from legal_rag_tpu.models.finetune import make_sibling_pairs

    chunks = [
        {"text": f"section body words theft robbery assault {i} "
                 f"extra tokens here", "metadata": {
            "law": "BNS", "section": str(i // 2)}}
        for i in range(8)
    ]
    base = [next_pair for next_pair, _ in zip(
        make_sibling_pairs(chunks, np.random.default_rng(7)), range(40))]
    same = [next_pair for next_pair, _ in zip(
        make_sibling_pairs(chunks, np.random.default_rng(7),
                           augment_prob=0.0), range(40))]
    aug = [next_pair for next_pair, _ in zip(
        make_sibling_pairs(chunks, np.random.default_rng(7),
                           augment_prob=1.0), range(40))]
    # augment_prob=0.0 is byte-identical to the round-4 stream
    assert base == same
    # augmentation changes at least some query spans, never positives
    assert [p for _, p in aug] == [p for _, p in base] or any(
        q1 != q2 for (q1, _), (q2, _) in zip(aug, base)
    )
    assert any(q1 != q2 for (q1, _), (q2, _) in zip(aug, base))
    assert all(q.split() for q, _ in aug)


def test_build_index_fingerprints_augment(tmp_path, corpus):
    """An augmented build must not hash-match a non-augmented store."""
    from legal_rag_tpu.index.builder import build_index

    chunks = [
        {"text": t, "metadata": {"law": "BNS", "section": str(i // 2)},
         "canonical_header": f"h{i}", "section_id": f"BNS_{i//2}"}
        for i, t in enumerate(corpus[:8])
    ]
    cfg = RetrievalConfig(encoder=TINY)
    s1 = build_index(chunks, config=cfg, store_dir=tmp_path / "a",
                     finetune_steps=2)
    s2 = build_index(chunks, config=cfg, store_dir=tmp_path / "b",
                     finetune_steps=2, finetune_augment=0.3)
    assert s1.corpus_hash != s2.corpus_hash
    assert s2.build_params["finetune_augment"] == 0.3
    # a kind-restricted mix is a different recipe than the uniform one
    s3 = build_index(chunks, config=cfg, store_dir=tmp_path / "c",
                     finetune_steps=2, finetune_augment=0.3,
                     finetune_augment_kinds="register,dropout")
    assert s3.corpus_hash != s2.corpus_hash
    assert s3.build_params["finetune_augment_kinds"] == "register,dropout"


def test_augment_query_kinds_restriction():
    """kinds=('register','dropout') must never emit a unique-rebuild:
    every output keeps word order / subset semantics of the span (no
    query built exclusively from positive-absent tokens)."""
    from legal_rag_tpu.models.finetune import augment_query

    rng = np.random.default_rng(3)
    span = "alpha bravo charlie delta echo foxtrot golf"
    pos = "charlie delta lives in the target document"
    for _ in range(200):
        out = augment_query(span, pos, rng, kinds=("dropout",))
        # dropout-only: output tokens are a subsequence of the span
        toks = out.split()
        it = iter(span.split())
        assert all(any(t == s for s in it) for t in toks), out
