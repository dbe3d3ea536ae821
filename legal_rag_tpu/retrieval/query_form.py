"""Query-form detection for per-query serving policies.

Two measured form policies key off the same split: the CE blend
(models/cross_encoder.py ce_policy_alpha: heading-like queries take
the structure-split-optimal alpha) and the round-5 fusion policy
(narrative queries take dense-leaning fusion; heading queries keep
RRF). The discriminator is cheap and deterministic so it can run on
the serving hot path before the batched device program is built.

Measured basis (EVAL_FUSION_POLICY.json, augmented r5 store,
n=1042 structure / 2029 sibling, bootstrap CI95): pure narrative
routing by word count alone (>8 words) captures the full sibling
dense gain (+0.027 r@10, CI>0) but exposes 41.7% of structure titles
to dense and costs −0.006 r@10 there (CI<0). Requiring a
function-word / interrogative marker alongside the length test cuts
structure exposure to 14.7% while keeping 64% sibling capture and
100% of the paraphrase E2E suite — long section titles are noun
phrases; statute sentences and user narratives carry auxiliaries,
pronouns, deictics, or question openers.
"""

from __future__ import annotations

from legal_rag_tpu.models.cross_encoder import HEADING_MAX_WORDS

# Tokens long section TITLES lack but statute sentences / user
# narratives contain (auxiliaries, pronouns, deictics).
FUNCTION_WORDS = frozenset(
    "shall is are was were be been being has have had he she his her "
    "him my me i we you such any said whoever who whom it that may "
    "must".split()
)
# Question openers; section titles are never interrogative.
INTERROGATIVES = frozenset(
    "what how can when where which who why does do is are am should "
    "could will".split()
)


def _tokens(query: str):
    return [w.strip(".,?!'\"()–-—;:") for w in query.lower().split()]


def is_heading(query: str) -> bool:
    """Heading-register: short title-like queries, the CE's training
    distribution (models/cross_encoder.py HEADING_MAX_WORDS)."""
    return len(query.split()) <= HEADING_MAX_WORDS


def is_narrative(query: str) -> bool:
    """Narrative/descriptive form: longer than a heading AND carrying
    a marker section titles lack (function word, interrogative opener,
    or a question mark). These are the queries the paraphrase
    measurements say dense fusion serves better than RRF."""
    if is_heading(query):
        return False
    toks = _tokens(query)
    return (
        any(w in FUNCTION_WORDS for w in toks)
        or (bool(toks) and toks[0] in INTERROGATIVES)
        or "?" in query
    )
