"""Cross-encoder reranker: joint (query, document) scoring.

A capability beyond the reference (whose ranking is bi-encoder + BM25
only, retrieval_engine.py:59-96): the query and a candidate document
run through ONE BERT forward as a ``[CLS] q [SEP] d [SEP]`` pair with
segment ids, and a linear head on the [CLS] state emits a relevance
score. Joint attention sees query-document token interactions that no
single-vector dot product can — the standard precision stage on top of
a fast candidate retriever.

TPU shape discipline: pairs pad to power-of-two length buckets (shared
``pad_and_bucket`` contract) and candidates per query pad to a fixed C,
so reranking a batch is one jitted ``[B*C, L]`` forward regardless of
ragged candidate counts.

Training reuses the corpus span-pair generator (models/finetune.py):
each batch row is a pseudo-query with its source chunk as positive;
the OTHER rows' positives serve as in-batch negatives under a listwise
softmax — the cross-encoder analogue of the bi-encoder's InfoNCE.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from legal_rag_tpu.config import EncoderConfig
from legal_rag_tpu.models.encoder import SentenceEncoder
from legal_rag_tpu.models.minilm import minilm_hidden_states
from legal_rag_tpu.models.wordpiece import pad_and_bucket


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def cross_encode_scores(
    params,                  # {"trunk": MiniLMParams, "head": {"w","b"}}
    input_ids: jax.Array,    # [B, L] pair-encoded
    attention_mask: jax.Array,
    token_type_ids: jax.Array,
    cfg: EncoderConfig,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Relevance score per pair: linear head on the masked mean-pooled
    hidden states.

    Mean pooling (not [CLS]): the shared trunk is contrastively trained
    under mean pooling (models/train.py), so the pooled state is the
    only representation the warm start actually organizes — the round-2
    CLS-head variant started from an untrained token position and
    needed MS-MARCO-scale signal to recover (BASELINE.md reranker
    post-mortem)."""
    hidden = minilm_hidden_states(
        params["trunk"], input_ids, attention_mask, cfg,
        precision=precision, token_type_ids=token_type_ids,
    )
    m = attention_mask[:, :, None].astype(hidden.dtype)
    pooled = jnp.sum(hidden * m, axis=1) / jnp.clip(
        jnp.sum(m, axis=1), 1e-9, None
    )
    return pooled @ params["head"]["w"] + params["head"]["b"]


class CrossEncoder:
    """Pair scorer sharing the bi-encoder's trunk and tokenizer.

    ``params``: adopt previously trained weights (e.g. the store's
    ``cross_encoder.npz`` artifact) instead of initializing a fresh
    head on the bi-encoder trunk — training moves the trunk too, so a
    trained cross-encoder is a full ``{"trunk", "head"}`` checkpoint.
    """

    def __init__(
        self, encoder: SentenceEncoder, seed: int = 0, params=None,
    ):
        self.cfg = encoder.cfg
        self.tokenizer = encoder.tokenizer
        if params is not None:
            self.params = jax.tree.map(jnp.asarray, params)
            return
        rng = np.random.default_rng(seed)
        head = {
            "w": jnp.asarray(
                (0.02 * rng.standard_normal(self.cfg.hidden)).astype(
                    np.float32
                )
            ),
            "b": jnp.zeros((), jnp.float32),
        }
        self.params = {"trunk": encoder.params, "head": head}

    # -- pair encoding -------------------------------------------------------

    def encode_pairs(
        self,
        queries: Sequence[str],
        docs: Sequence[str],
        max_len: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """``[CLS] q [SEP] d [SEP]`` ids + mask + segment ids, padded to
        a shared pow2 length bucket. The query keeps at most half the
        budget so the document is never squeezed out."""
        tok = self.tokenizer
        max_len = max_len or min(self.cfg.max_len, 256)
        q_budget = max_len // 2 - 2
        encoded, types = [], []
        for q, d in zip(queries, docs):
            q_ids = tok.encode(q, max_len=max_len, add_special=False)
            q_ids = q_ids[:q_budget]
            d_cap = max_len - len(q_ids) - 3
            d_ids = tok.encode(d, max_len=max_len, add_special=False)[:d_cap]
            ids = (
                [tok.cls_id] + q_ids + [tok.sep_id] + d_ids + [tok.sep_id]
            )
            encoded.append(ids)
            types.append([0] * (len(q_ids) + 2) + [1] * (len(d_ids) + 1))
        ids, mask = pad_and_bucket(encoded, max_len, tok.pad_id)
        tt = np.zeros_like(ids)
        for i, t in enumerate(types):
            t = t[: ids.shape[1]]
            tt[i, : len(t)] = t
        return ids, mask, tt

    # -- scoring -------------------------------------------------------------

    def score_pairs(
        self, queries: Sequence[str], docs: Sequence[str]
    ) -> np.ndarray:
        ids, mask, tt = self.encode_pairs(queries, docs)
        return np.asarray(
            cross_encode_scores(
                self.params, jnp.asarray(ids), jnp.asarray(mask),
                jnp.asarray(tt), self.cfg,
            )
        )

    def rerank(
        self,
        query: str,
        docs: Sequence[str],
        top_m: Optional[int] = None,
        base_scores: Optional[Sequence[float]] = None,
        alpha: float = 1.0,
    ) -> List[int]:
        """Indices of ``docs`` reordered by joint relevance (desc,
        stable).

        With ``base_scores`` the CE acts as a REFINEMENT, not a
        replacement: both score vectors min-max normalize over the pool
        and blend as ``(1-alpha)*base + alpha*ce``. ``alpha`` is fit by
        the build-time gate (index/builder.py) on held-out queries —
        small alphas let a CE with real-but-noisy signal improve the
        base order without the authority to destroy it."""
        scores = self.score_pairs([query] * len(docs), list(docs))
        if base_scores is not None and alpha < 1.0:
            scores = blend_scores(scores, np.asarray(base_scores), alpha)
        order = np.argsort(-scores, kind="stable")
        return order[: top_m or len(docs)].tolist()


def blend_scores(
    ce_scores: np.ndarray, base_scores: np.ndarray, alpha: float
) -> np.ndarray:
    """``(1-alpha)*minmax(base) + alpha*minmax(ce)`` over one candidate
    pool. Normalizing per pool makes the two scales commensurable
    (CE logits are unbounded; base scores are fusion scores)."""

    def norm(x):
        x = np.asarray(x, np.float64)
        lo, hi = float(x.min()), float(x.max())
        return (x - lo) / ((hi - lo) or 1.0)

    return (1.0 - alpha) * norm(base_scores) + alpha * norm(ce_scores)


# Queries at most this many words count as "heading-like" — the
# register the CE was trained on (title -> chunk pairs with BM25 hard
# negatives, train_cross_encoder_hard). EVAL_CE_PARAPHRASE.json
# measures the CE's value by query form: heading-register (structure
# split, titles) peaks at alpha=0.7 (+0.052 MRR, CI>0) while long
# descriptive queries (paraphrase split, 12-word spans) are already
# significantly HURT at alpha=0.3 — the blend should follow the form.
HEADING_MAX_WORDS = 8


def ce_policy_alpha(
    query: str,
    serving_alpha: float,
    heading_alpha: "Optional[float]" = None,
    distress: bool = False,
) -> float:
    """Per-query CE blend weight: give the reranker authority only on
    queries inside its training distribution.

    ``heading_alpha`` (measured structure-split optimum) applies to
    short heading-like queries; everything else — long descriptive
    queries and any victim-distress query — keeps the conservative
    ``serving_alpha`` the build gate fit. Disabled (pure
    ``serving_alpha``) when ``heading_alpha`` is None. The policy's
    per-split value is measured by scripts/eval_ce_paraphrase.py's
    policy rows, not assumed.
    """
    if heading_alpha is None or distress:
        return serving_alpha
    if len(query.split()) <= HEADING_MAX_WORDS:
        return heading_alpha
    return serving_alpha


def make_ce_train_step(cfg: EncoderConfig, optimizer):
    """Listwise in-batch training step: row i's positive is doc i; all
    other rows' docs are its negatives. One [B*B, L] pair forward per
    step (B small), softmax CE on the diagonal."""

    @functools.partial(jax.jit, static_argnames=())
    def step(params, opt_state, ids, mask, tt):
        b2 = ids.shape[0]
        b = int(np.sqrt(b2))

        def loss_fn(p):
            scores = cross_encode_scores(
                p, ids, mask, tt, cfg,
                precision=jax.lax.Precision.DEFAULT,
            ).reshape(b, b)                      # [query, doc]
            logp = jax.nn.log_softmax(scores, axis=1)
            return -jnp.mean(jnp.diag(logp))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_ce_train_step_grouped(cfg: EncoderConfig, optimizer, group: int):
    """Listwise training step over explicit candidate groups: pair rows
    arrive query-major as ``[B*group, L]`` with each query's POSITIVE in
    column 0 and its mined hard negatives after it; softmax CE pushes
    the positive above exactly the candidates the serving stage will
    ask the reranker to separate."""

    @jax.jit
    def step(params, opt_state, ids, mask, tt):
        def loss_fn(p):
            scores = cross_encode_scores(
                p, ids, mask, tt, cfg,
                precision=jax.lax.Precision.DEFAULT,
            ).reshape(-1, group)
            logp = jax.nn.log_softmax(scores, axis=1)
            return -jnp.mean(logp[:, 0])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_hard_negative_miner(texts: Sequence[str]):
    """BM25 hard-negative miner (VERDICT r2 item 4): for a query,
    return the indices of the lexically closest corpus chunks — the
    candidates a retrieval stage would actually surface, and therefore
    the confusions the cross-encoder must learn to resolve. In-batch
    random negatives (the round-2 recipe) never show the model a
    near-miss, which is why that checkpoint failed its gate.

    Returns ``mine(query, exclude, n_neg, rng) -> List[int]``;
    ``exclude`` ids (the query's true positives) never appear."""
    from legal_rag_tpu.ops.sparse import build_bm25

    idx = build_bm25(texts)

    def mine(query, exclude, n_neg, rng):
        excl = set(int(e) for e in np.atleast_1d(exclude))
        scores = np.zeros(idx.n_docs, np.float32)
        counts: Dict[int, int] = {}
        for t in idx.query_term_ids(query):
            counts[t] = counts.get(t, 0) + 1
        for t, c in counts.items():
            lo, hi = int(idx.indptr[t]), int(idx.indptr[t + 1])
            np.add.at(
                scores, idx.doc_ids[lo:hi], c * idx.weights[lo:hi]
            )
        top = np.argsort(-scores, kind="stable")[: 3 * n_neg + len(excl)]
        cands = [int(d) for d in top if int(d) not in excl and scores[d] > 0]
        if len(cands) > n_neg:
            sel = rng.choice(len(cands), size=n_neg, replace=False)
            cands = [cands[int(j)] for j in sel]
        while len(cands) < n_neg:          # pad with random negatives
            d = int(rng.integers(idx.n_docs))
            if d not in excl:
                cands.append(d)
        return cands

    return mine


def train_cross_encoder_hard(
    ce: CrossEncoder,
    texts: Sequence[str],
    chunks: Optional[Sequence[dict]] = None,
    steps: int = 600,
    batch_queries: int = 8,
    n_neg: int = 7,
    learning_rate: float = 5e-5,
    max_len: int = 128,
    seed: int = 0,
    log_fn=None,
    title_pairs: Optional[Sequence[Tuple[str, Sequence[int]]]] = None,
    title_prob: float = 0.5,
    warmup_frac: float = 0.25,
    n_hard: Optional[int] = None,
    sibling_prob: float = 0.0,
) -> List[float]:
    """Hard-negative listwise training — the round-3 recipe that passes
    the builder's validation gate (BASELINE.md reranker table).

    Each step scores ``batch_queries`` query groups of ``1 + n_neg``
    docs (positive first, BM25-mined hard negatives after). Queries mix
    two corpus-derived distributions: keyword spans of a chunk
    (paraphrase-style, as the bi-encoder fine-tune uses) and, when
    ``chunks`` metadata is given, section/topic titles (the serving
    eval's query style) whose FULL relevant set is excluded from
    negative mining so duplicate-title sections are never punished.

    ``title_pairs`` overrides the derived title set — the builder's
    gate passes only its TRAIN split here so validation titles stay
    held out; ``title_prob`` sets the title-vs-span sampling mix.

    Curriculum (round-3 finding): on ALL-hard groups from a cold-ish
    trunk the loss never left chance (ln(1+n_neg)) — the model cannot
    find the gradient between a positive and 7 near-misses before it
    can tell a positive from anything at all. The first
    ``warmup_frac`` of steps therefore use random negatives only
    (which the same model drives to ~0 loss in tens of steps), after
    which each group mixes ``n_hard`` mined negatives (default
    ceil(n_neg/2)) with random fill — separation first, precision
    second.

    ``sibling_prob`` (round 4): with this probability a group's
    positive is a SIBLING chunk of the span's source section (the
    whole section excluded from negative mining) — the paraphrase
    task the round-4 CI measurement showed the span/title-trained CE
    never learned (EVAL_CE_PARAPHRASE.json: neutral at the serving
    alpha, harmful at alpha>=0.5 on the sibling-span split). Requires
    ``chunks`` metadata; 0.0 keeps the round-3 recipe byte-identical.
    """
    from legal_rag_tpu.models.finetune import make_pairs, section_groups

    rng = np.random.default_rng(seed)
    mine = make_hard_negative_miner(texts)
    span_stream = make_pairs(texts, rng)
    # Key positives by text VALUE and exclude every duplicate: legal
    # corpora repeat verbatim chunks (boilerplate sub-sections), and a
    # textually identical twin of the positive mined as a "hard
    # negative" hands the listwise loss a contradictory label. (Value
    # keys also survive make_pairs ever yielding a copied string,
    # where an id() lookup would KeyError.)
    span_index: dict = {}
    for _i, _t in enumerate(texts):
        span_index.setdefault(_t, []).append(_i)

    if title_pairs is None:
        title_pairs = []
        if chunks is not None:
            from legal_rag_tpu.evaluation import labeled_pairs_from_chunks

            title_pairs = labeled_pairs_from_chunks(chunks)

    sib_groups: List[List[int]] = []
    if sibling_prob > 0:
        if chunks is None:
            raise ValueError("sibling_prob > 0 requires chunks metadata")
        sib_groups = [g for g in section_groups(chunks) if len(g) >= 2]
        if not sib_groups:
            sibling_prob = 0.0

    if n_hard is None:
        n_hard = -(-n_neg // 2)

    def rand_negs(exclude, count):
        out: List[int] = []
        excl = set(int(e) for e in exclude)
        while len(out) < count:
            d = int(rng.integers(len(texts)))
            if d not in excl:
                out.append(d)
        return out

    def sample_sibling_group():
        """Span from one chunk, positive = another chunk of the SAME
        section (source masked from the pool exactly like the
        sibling-span eval split), whole section excluded from
        mining."""
        g = sib_groups[int(rng.integers(len(sib_groups)))]
        src = int(g[int(rng.integers(len(g)))])
        others = [i for i in g if i != src]
        pos = int(others[int(rng.integers(len(others)))])
        words = texts[src].split()
        if not words:
            return None
        take = min(int(rng.integers(3, 13)), len(words))
        lo = int(rng.integers(0, len(words) - take + 1))
        q = " ".join(words[lo:lo + take])
        return q, pos, list(g)

    def sample_group(hard: int):
        u = rng.random()
        if sib_groups and u < sibling_prob:
            sampled = sample_sibling_group()
            if sampled is not None:
                q, pos, exclude = sampled
                negs = mine(q, exclude, hard, rng) if hard else []
                negs += rand_negs(list(exclude) + negs, n_neg - len(negs))
                return q, [texts[pos]] + [texts[d] for d in negs]
            u = 1.0  # empty source chunk: fall through to the mix below
        if title_pairs and u < sibling_prob + title_prob * (
            1.0 - sibling_prob
        ):
            q, rel = title_pairs[int(rng.integers(len(title_pairs)))]
            pos = int(rel[int(rng.integers(len(rel)))])
            exclude = rel
        else:
            q, pos_text = next(span_stream)
            same = span_index[pos_text]
            pos = same[0]
            exclude = list(same)
        negs = mine(q, exclude, hard, rng) if hard else []
        negs += rand_negs(list(exclude) + negs, n_neg - len(negs))
        return q, [texts[pos]] + [texts[d] for d in negs]

    group = 1 + n_neg
    # warmup + cosine decay: the trunk is corpus-contrastively trained,
    # not MS-MARCO-pretrained — a flat tiny LR never escapes chance on
    # listwise groups within an affordable step budget (the round-2/3
    # post-mortems), while an unwarmed large LR destroys the trunk
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=max(1, steps // 10), decay_steps=steps,
        end_value=learning_rate * 0.05,
    )
    optimizer = optax.adamw(schedule)
    opt_state = optimizer.init(ce.params)
    step = make_ce_train_step_grouped(ce.cfg, optimizer, group)
    max_len = min(max_len, ce.cfg.max_len)

    warmup = int(steps * warmup_frac)
    losses: List[float] = []
    for i in range(steps):
        hard = 0 if i < warmup else n_hard
        grid_q: List[str] = []
        grid_d: List[str] = []
        for _ in range(batch_queries):
            q, docs = sample_group(hard)
            grid_q.extend([q] * group)
            grid_d.extend(docs)
        ids, mask, tt = ce.encode_pairs(grid_q, grid_d, max_len=max_len)
        full = np.full(
            (ids.shape[0], max_len), ce.tokenizer.pad_id, np.int32
        )
        full[:, : ids.shape[1]] = ids
        fm = np.zeros_like(full)
        fm[:, : mask.shape[1]] = mask
        ft = np.zeros_like(full)
        ft[:, : tt.shape[1]] = tt
        ce.params, opt_state, loss = step(
            ce.params, opt_state,
            jnp.asarray(full), jnp.asarray(fm), jnp.asarray(ft),
        )
        losses.append(float(loss))
        if log_fn and (i % 20 == 0 or i == steps - 1):
            log_fn(f"ce-hard step {i}: loss {losses[-1]:.4f}")
    return losses


def train_cross_encoder(
    ce: CrossEncoder,
    texts: Sequence[str],
    steps: int = 100,
    batch_size: int = 8,
    learning_rate: float = 2e-5,
    max_len: int = 128,
    seed: int = 0,
    log_fn=None,
) -> List[float]:
    """In-place listwise training on corpus span pairs. ``batch_size``
    queries per step -> ``batch_size**2`` pair forwards; keep it small.
    """
    from legal_rag_tpu.models.finetune import make_pairs

    rng = np.random.default_rng(seed)
    stream = make_pairs(texts, rng)
    optimizer = optax.adamw(learning_rate)
    opt_state = optimizer.init(ce.params)
    step = make_ce_train_step(ce.cfg, optimizer)
    max_len = min(max_len, ce.cfg.max_len)

    losses: List[float] = []
    for i in range(steps):
        queries, docs = zip(*(next(stream) for _ in range(batch_size)))
        # full B x B pair grid, row-major (query major)
        grid_q = [q for q in queries for _ in range(batch_size)]
        grid_d = [d for _ in range(batch_size) for d in docs]
        ids, mask, tt = ce.encode_pairs(grid_q, grid_d, max_len=max_len)
        # fixed-length batches: one executable across sampled texts
        full = np.full(
            (ids.shape[0], max_len), ce.tokenizer.pad_id, np.int32
        )
        full[:, : ids.shape[1]] = ids
        fm = np.zeros_like(full)
        fm[:, : mask.shape[1]] = mask
        ft = np.zeros_like(full)
        ft[:, : tt.shape[1]] = tt
        ce.params, opt_state, loss = step(
            ce.params, opt_state,
            jnp.asarray(full), jnp.asarray(fm), jnp.asarray(ft),
        )
        losses.append(float(loss))
        if log_fn and (i % 20 == 0 or i == steps - 1):
            log_fn(f"ce step {i}: loss {losses[-1]:.4f}")
    return losses
