"""Candidate generation with person-name coreference, candidate-list
padding and training-time negative sampling.

≙ reference CandidateGeneratorExactMatch
(doc_preprocessing/candidate_generator.py:28-159):

- T7  surface → PEM probe (probabilities sorted desc)
- D5  person coref: a multi-word person mention ("ada lovelace")
      registers its human candidates under each name part, so later
      (or, with backward_coref, earlier) short mentions ("ada") inherit
      them — capped at pem 0.80, only parts with pem > 0.05
- O1  candidate lists padded with ("Q0", 0.0) to max_candidates
- O5  seeded negative sampling: half popular (head of the list), half
      uniform-random from the tail, gold kept iff in the top-30

The coref dict is DOC-LOCAL state: it lives inside one map call per
document and never crosses batches (SURVEY §2.9; the reference resets
it per doc at refined_model.py:440-451).
"""

from __future__ import annotations

import numpy as np

from ..functions.normalize import normalize_surface_form

MAX_CANDIDATES = 30
PAD = ("Q0", 0.0)
PERSON_COREF_PEM_CAP = 0.80
PERSON_COREF_PEM_MIN = 0.05


def get_candidates(
    surface_form: str,
    pem: dict[str, list[tuple[str, float]]],
    human_qcodes: set[str],
    person_coref: dict[str, list[tuple[str, float]]],
    max_candidates: int = MAX_CANDIDATES,
    sample_k: int | None = None,
    gold_qcode: str | None = None,
    rng: np.random.Generator | None = None,
) -> list[tuple[str, float]]:
    """Candidates for one mention; updates ``person_coref`` in place."""
    max_cands = sample_k if sample_k is not None else max_candidates
    norm = normalize_surface_form(surface_form)

    if norm not in pem:
        cands = person_coref.get(norm, [])
        return (cands + [PAD] * max_cands)[:max_cands]

    direct = pem[norm]

    # propagate human candidates to the name's parts
    parts = norm.split(" ")
    short_name_cands = [(q, min(v, PERSON_COREF_PEM_CAP))
                        for q, v in direct
                        if q in human_qcodes and v > PERSON_COREF_PEM_MIN]
    if short_name_cands and len(parts) > 1:
        for part in parts:
            person_coref[part] = short_name_cands

    if norm in person_coref:
        pool = sorted(direct + person_coref[norm], key=lambda x: -x[1])
        seen, cands = set(), []
        for q, v in pool:  # dedup by qcode, keep best (stable: direct first on ties)
            if q not in seen:
                seen.add(q)
                cands.append((q, v))
    else:
        cands = direct

    if sample_k is not None:
        if gold_qcode is None:
            raise ValueError("gold_qcode must be set when sample_k is set")
        popular = sample_k // 2
        n_random = max(sample_k - popular - 1, 0)
        top = cands[:MAX_CANDIDATES]
        negatives = [c for c in top if c[0] != gold_qcode]
        gold = [c for c in top if c[0] == gold_qcode]  # kept iff in top-30
        sampled = negatives[:popular]
        tail = negatives[popular:]
        if tail and n_random:
            rng = rng or np.random.default_rng(0)
            take = min(n_random, len(tail))
            idx = rng.choice(len(tail), size=take, replace=False)
            sampled += [tail[i] for i in sorted(idx)]
        cands = gold + sampled

    return (cands + [PAD] * max_cands)[:max_cands]


def add_candidates_to_doc(
    surfaces: list[str],
    pem: dict[str, list[tuple[str, float]]],
    human_qcodes: set[str],
    max_candidates: int = MAX_CANDIDATES,
    backward_coref: bool = False,
    sample_k: int | None = None,
    gold_qcodes: list[str] | None = None,
    seed: int = 0,
) -> list[list[tuple[str, float]]]:
    """One document's mentions → per-mention candidate lists.

    ``backward_coref`` runs a first pass that only populates the coref
    dict, so a short name BEFORE its full mention still inherits
    (≙ add_candidates_to_spans backward_coref=True,
    candidate_generator.py:146-152)."""
    coref: dict[str, list[tuple[str, float]]] = {}
    rng = np.random.default_rng(seed)
    golds = gold_qcodes or [None] * len(surfaces)
    if backward_coref:
        for s, g in zip(surfaces, golds):
            get_candidates(s, pem, human_qcodes, coref,
                           max_candidates=max_candidates,
                           sample_k=sample_k, gold_qcode=g, rng=rng)
    return [get_candidates(s, pem, human_qcodes, coref,
                           max_candidates=max_candidates,
                           sample_k=sample_k, gold_qcode=g, rng=rng)
            for s, g in zip(surfaces, golds)]
